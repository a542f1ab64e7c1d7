"""Shape/initialization tests for the Flax NHWC UNet (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.models import InpaintingUNet, UNet, UNetConfig

TINY = UNetConfig(
    image_size=16,
    in_channels=3,
    model_channels=32,
    out_channels=6,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    num_heads=2,
    num_head_channels=16,
    use_scale_shift_norm=True,
    resblock_updown=True,
    dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet(TINY)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    return model, params


def test_unet_output_shape(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.array([10, 500])
    out = model.apply(params, x, t)
    assert out.shape == (2, 16, 16, 6)
    assert out.dtype == jnp.float32


def test_unet_zero_init_output(tiny_unet):
    """Zero-initialized final conv -> output is exactly zero at init
    (reference zero_module semantics, nn.py:39-43, unet.py:148-152)."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    out = model.apply(params, x, jnp.array([3]))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_resblock_zero_init_makes_identity_plus_skip(tiny_unet):
    """At init, each ResBlock's zero out-conv means block(x) == skip(x)."""
    from fidm_tpu.models.layers import ResBlock

    block = ResBlock(out_channels=32, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 64))
    params = block.init(jax.random.PRNGKey(2), x, emb)
    out = block.apply(params, x, emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_attention_zero_init_is_identity():
    from fidm_tpu.models.layers import AttentionBlock

    attn = AttentionBlock(num_heads=2, num_head_channels=16, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 32))
    params = attn.init(jax.random.PRNGKey(1), x)
    out = attn.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_timestep_embedding_matches_reference_formula():
    from fidm_tpu.models.layers import timestep_embedding

    t = jnp.array([0.0, 1.0, 500.0])
    dim = 32
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000) * np.arange(half, dtype=np.float64) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # f32 device trig vs f64 numpy: ~1e-3 absolute agreement at t=500
    np.testing.assert_allclose(emb, expected, atol=2e-3)


def test_inpainting_unet_9channel_concat():
    cfg = UNetConfig(
        image_size=16, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, dtype=jnp.float32,
    )
    model = InpaintingUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    mi = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 1))
    t = jnp.array([7])
    params = model.init(jax.random.PRNGKey(2), x, t, mi, mask)
    # first conv consumes 9 channels
    kernel = params["params"]["base"]["in_0_conv"]["kernel"]
    assert kernel.shape == (3, 3, 9, 32)
    out = model.apply(params, x, t, mi, mask)
    assert out.shape == (1, 16, 16, 6)


def test_unet_jit_and_grad():
    model = UNet(TINY)
    x = jnp.ones((1, 16, 16, 3))
    t = jnp.array([5])
    params = model.init(jax.random.PRNGKey(0), x, t)

    @jax.jit
    def loss(p):
        return jnp.sum(model.apply(p, x, t) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_canonical_config_structure():
    """The FFHQ-256 architecture builds with the exact reference shape
    (train_inpainting.py:208-224) — smoke-init at reduced image size is not
    possible (GroupNorm(32) needs the real channel widths), so init lazily
    with abstract evaluation only."""
    from fidm_tpu.models import ffhq256_config

    cfg = ffhq256_config(dtype=jnp.float32)
    model = InpaintingUNet(cfg)
    x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    mi = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    mask = jax.ShapeDtypeStruct((1, 256, 256, 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda *a: model.init(jax.random.PRNGKey(0), *a), x, t, mi, mask
    )
    params = shapes["params"]["base"]
    # 9-channel first conv
    assert params["in_0_conv"]["kernel"].shape == (3, 3, 9, 128)
    # 6-channel learned-variance output
    assert params["out_conv"]["kernel"].shape[-1] == 6
    # parameter count in the ADM-256 ballpark
    total = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(shapes))
    assert 50e6 < total < 300e6


# ---------------------------------------------------------- split-skip path

def test_split_decoder_skips_param_tree_identical():
    """split_decoder_skips=True must create the exact same parameter tree
    (names + shapes), so checkpoints work with either path."""
    import dataclasses

    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.zeros((1,), jnp.int32)
    p_cat = UNet(TINY).init(jax.random.PRNGKey(0), x, t)
    p_split = UNet(dataclasses.replace(TINY, split_decoder_skips=True)).init(
        jax.random.PRNGKey(0), x, t)
    flat_cat = jax.tree_util.tree_flatten_with_path(p_cat)[0]
    flat_split = jax.tree_util.tree_flatten_with_path(p_split)[0]
    keys_cat = {jax.tree_util.keystr(k): v.shape for k, v in flat_cat}
    keys_split = {jax.tree_util.keystr(k): v.shape for k, v in flat_split}
    assert keys_cat == keys_split


def test_split_decoder_skips_matches_concat_path():
    """Same params, same inputs: the concat-free decoder must compute the
    same function as the concatenating one (float reassociation only)."""
    import dataclasses

    model_cat = UNet(TINY)
    model_split = UNet(dataclasses.replace(TINY, split_decoder_skips=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.5
    t = jnp.array([10, 500])
    params = model_cat.init(jax.random.PRNGKey(0), x, t)
    # non-degenerate weights for the zero-initialized convs
    params = jax.tree_util.tree_map(
        lambda v: v + 0.01 * np.random.default_rng(0).standard_normal(v.shape)
        .astype(v.dtype),
        params,
    )
    with jax.default_matmul_precision("highest"):
        a = model_cat.apply(params, x, t)
        b = model_split.apply(params, x, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=1e-4)


def test_split_decoder_skips_bf16_close():
    import dataclasses

    cfg16 = dataclasses.replace(TINY, dtype=jnp.bfloat16)
    model_cat = UNet(cfg16)
    model_split = UNet(dataclasses.replace(cfg16, split_decoder_skips=True))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.5
    t = jnp.array([10, 500])
    params = model_cat.init(jax.random.PRNGKey(0), x, t)
    a = np.asarray(model_cat.apply(params, x, t), np.float32)
    b = np.asarray(model_split.apply(params, x, t), np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2)


def test_split_skip_identity_residual_falls_back_to_concat():
    """out_ch == in_ch + skip_ch means the standard path uses an identity
    residual (no skip_conv params). The split path must transparently fall
    back to concat there — same param tree, same output (ADVICE r1)."""
    from fidm_tpu.models.layers import ResBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32)) * 0.5
    skip = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32)) * 0.5
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    blk = ResBlock(out_channels=64)  # == 32 + 32 -> identity residual
    cat_in = jnp.concatenate([x, skip], axis=-1)
    p_cat = blk.init(jax.random.PRNGKey(3), cat_in, emb)
    p_split = blk.init(jax.random.PRNGKey(3), x, emb, skip=skip)
    assert jax.tree_util.tree_map(lambda v: v.shape, p_cat) == \
        jax.tree_util.tree_map(lambda v: v.shape, p_split)
    a = blk.apply(p_cat, cat_in, emb)
    b = blk.apply(p_cat, x, emb, skip=skip)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_policies_match_no_remat():
    """remat full/convs (selective: save conv/attn outputs, recompute glue)
    must be numerically identical to no-remat in value AND gradient."""
    import dataclasses

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)) * 0.5
    t = jnp.array([10, 500])
    params = UNet(TINY).init(jax.random.PRNGKey(0), x, t)

    def loss(cfg):
        def f(p):
            return jnp.mean(UNet(cfg).apply(p, x, t) ** 2)
        return f

    base_cfg = dataclasses.replace(TINY, remat=False)
    with jax.default_matmul_precision("highest"):
        v0, g0 = jax.value_and_grad(loss(base_cfg))(params)
        for policy in ("full", "convs"):
            cfg = dataclasses.replace(TINY, remat=True, remat_policy=policy)
            v, g = jax.value_and_grad(loss(cfg))(params)
            np.testing.assert_allclose(float(v), float(v0), rtol=1e-6)
            for a, b in zip(jax.tree_util.tree_leaves(g),
                            jax.tree_util.tree_leaves(g0)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, rtol=1e-4)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="remat_policy"):
        UNet(dataclasses.replace(TINY, remat=True, remat_policy="bogus")
             ).apply(params, x, t)
