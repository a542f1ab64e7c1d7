"""Encoder-feature reuse across sampler steps (Faster-Diffusion/DeepCache
style, SamplerConfig.encoder_cache_period).

Key properties: the cache kwargs are exact at the UNet level (same input ->
bit-identical output with or without cache), period=1 is byte-identical to
the baseline sampler program, period>1 changes the trajectory but keeps
every contract (finiteness, known-pixel preservation, determinism), and the
compiled whole-loop program provably does less work (XLA cost analysis).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig

CFG = UNetConfig(
    image_size=16, in_channels=9, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=2, num_head_channels=16, dtype=jnp.float32,
)


def _randomize(variables, scale=0.05, seed=1):
    """Perturb ALL params — the zero-init out_conv would otherwise make the
    model output (and thus any caching effect) invisible."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])


def _pipe():
    cfg = PipelineConfig(
        unet=CFG,
        sampler=SamplerConfig(method="ddim", num_steps=8, eta=0.9,
                              injection=True),
    )
    pipe = InpaintingPipeline.create(cfg)
    pipe.variables = _randomize(pipe.variables)
    return pipe


def _data():
    rng = np.random.default_rng(0)
    gt = np.clip(rng.standard_normal((2, 16, 16, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    mask = np.zeros((2, 16, 16, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    return gt, mask


def test_unet_cache_kwargs_exact():
    m = InpaintingUNet(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    t = jnp.array([5, 300], jnp.int32)
    mi = x * 0.5
    mask = jnp.ones((2, 16, 16, 1), jnp.float32)
    v = _randomize(m.init(jax.random.PRNGKey(0), x, t, mi, mask))

    out_plain = m.apply(v, x, t, mi, mask)
    out_full, cache = m.apply(v, x, t, mi, mask, return_cache=True)
    out_cached = m.apply(v, x, t, mi, mask, cache=cache)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_full))
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_cached))

    # fresh timestep embedding flows through the decoder even with a cache
    out_t2 = m.apply(v, x, jnp.array([100, 100], jnp.int32), mi, mask,
                     cache=cache)
    assert not np.allclose(np.asarray(out_t2), np.asarray(out_plain))


def test_period1_identical_and_period4_contracts():
    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)

    base = np.asarray(pipe.inpaint(gt, mask, key))
    s1 = dataclasses.replace(pipe.config.sampler, encoder_cache_period=1)
    np.testing.assert_array_equal(
        base, np.asarray(pipe.inpaint(gt, mask, key, sampler=s1)))

    s4 = dataclasses.replace(pipe.config.sampler, encoder_cache_period=4)
    out4 = np.asarray(pipe.inpaint(gt, mask, key, sampler=s4))
    assert np.isfinite(out4).all()
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out4[keep], gt[keep])
    assert not np.array_equal(out4, base)  # trajectory actually changed
    np.testing.assert_array_equal(
        out4, np.asarray(pipe.inpaint(gt, mask, key, sampler=s4)))


def test_decoder_only_program_is_cheaper():
    """The cached-step program provably does less work. (Whole-loop static
    cost analysis can't show this — XLA compiles BOTH lax.cond branches into
    the program, so the saving is runtime-only; we compare the per-call
    programs instead.)"""
    pipe = _pipe()
    gt, mask = _data()
    x = jnp.asarray(gt)
    m = jnp.asarray(mask)
    t = jnp.zeros((2,), jnp.int32)

    full = jax.jit(
        lambda v, x, t, mi, m: pipe.model.apply(v, x, t, mi, m,
                                                return_cache=True)
    ).lower(pipe.variables, x, t, x, m).compile()
    flops_full = full.cost_analysis()["flops"]
    cache = full(pipe.variables, x, t, x, m)[1]

    dec = jax.jit(
        lambda v, x, t, mi, m, c: pipe.model.apply(v, x, t, mi, m, cache=c)
    ).lower(pipe.variables, x, t, x, m, cache).compile()
    flops_dec = dec.cost_analysis()["flops"]
    assert flops_dec < 0.8 * flops_full, (flops_full, flops_dec)


def test_ddpm_method_supports_encoder_cache():
    pipe = _pipe()
    gt, mask = _data()
    s = dataclasses.replace(pipe.config.sampler, method="ddpm", num_steps=6,
                            encoder_cache_period=3)
    out = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(1), sampler=s))
    assert np.isfinite(out).all()
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])


def test_unconditional_sample_supports_encoder_cache():
    from fidm_tpu.models import UNet
    from fidm_tpu.sampling.sampler import sample

    cfg3 = dataclasses.replace(CFG, in_channels=3)
    m = UNet(cfg3)
    x0 = jnp.zeros((2, 16, 16, 3))
    v = _randomize(m.init(jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32)))

    from fidm_tpu.diffusion import DiffusionSchedule
    sched = DiffusionSchedule.create("cosine", 100)
    s = SamplerConfig(method="ddim", num_steps=6, eta=0.0, injection=False,
                      final_blend=False, encoder_cache_period=3)
    ca = (
        lambda x, t: m.apply(v, x, t, return_cache=True),
        lambda x, t, c: m.apply(v, x, t, cache=c),
    )
    out = sample(lambda x, t: m.apply(v, x, t), sched, s,
                 shape=(2, 16, 16, 3), key=jax.random.PRNGKey(0),
                 cache_apply=ca)
    assert np.isfinite(np.asarray(out)).all()

    s1 = dataclasses.replace(s, encoder_cache_period=1)
    base = sample(lambda x, t: m.apply(v, x, t), sched, s1,
                  shape=(2, 16, 16, 3), key=jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(out), np.asarray(base))


def test_deep_cache_kwargs_exact():
    """cache_depth=b: a cached call with a fresh same-input cache is
    bit-identical to the plain forward (the shallow stacks recompute, the
    trunk is replayed), at every legal branch depth — including a 3-level
    config so b=2 exercises the inter-level downsample in the deep-cached
    encoder prefix and the decoder upsample-resume bookkeeping (ADVICE r2:
    a 2-level config makes b=1 the only legal depth)."""
    import pytest

    for cfg in (CFG, dataclasses.replace(CFG, channel_mult=(1, 2, 2),
                                         attention_resolutions=(4,))):
        m = InpaintingUNet(cfg)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
        t = jnp.array([5, 300], jnp.int32)
        mi = x * 0.5
        mask = jnp.ones((2, 16, 16, 1), jnp.float32)
        v = _randomize(m.init(jax.random.PRNGKey(0), x, t, mi, mask))

        out_plain = m.apply(v, x, t, mi, mask)
        assert len(cfg.channel_mult) >= 3 or cfg is CFG
        for b in range(1, len(cfg.channel_mult)):
            out_full, cache = m.apply(v, x, t, mi, mask, return_cache=True,
                                      cache_depth=b)
            assert cache.shape[1] == 16 // 2 ** (b - 1)  # level b-1 res
            out_cached = m.apply(v, x, t, mi, mask, cache=cache,
                                 cache_depth=b)
            np.testing.assert_array_equal(np.asarray(out_plain),
                                          np.asarray(out_full))
            np.testing.assert_array_equal(np.asarray(out_plain),
                                          np.asarray(out_cached))
            # fresh timestep embedding flows through the shallow stacks
            out_t2 = m.apply(v, x, jnp.array([100, 100], jnp.int32), mi,
                             mask, cache=cache, cache_depth=b)
            assert not np.allclose(np.asarray(out_t2), np.asarray(out_plain))

        with pytest.raises(ValueError):
            m.apply(v, x, t, mi, mask, return_cache=True,
                    cache_depth=len(cfg.channel_mult))


def test_deep_cache_program_cheaper_than_encoder_mode():
    """The deep-b1 cached step skips strictly more work than the
    encoder-mode cached step (everything at/below level 1 vs just
    encoder+middle)."""
    pipe = _pipe()
    gt, mask = _data()
    x = jnp.asarray(gt)
    m = jnp.asarray(mask)
    t = jnp.zeros((2,), jnp.int32)

    def flops(fn, *args):
        return jax.jit(fn).lower(*args).compile().cost_analysis()["flops"]

    full = jax.jit(
        lambda v, x, t, mi, mk: pipe.model.apply(v, x, t, mi, mk,
                                                 return_cache=True,
                                                 cache_depth=1)
    ).lower(pipe.variables, x, t, x, m).compile()
    deep_cache = full(pipe.variables, x, t, x, m)[1]
    enc_cache = pipe.model.apply(pipe.variables, x, t, x, m,
                                 return_cache=True)[1]

    f_full = full.cost_analysis()["flops"]
    f_deep = flops(lambda v, x, t, mi, mk, c: pipe.model.apply(
        v, x, t, mi, mk, cache=c, cache_depth=1),
        pipe.variables, x, t, x, m, deep_cache)
    f_enc = flops(lambda v, x, t, mi, mk, c: pipe.model.apply(
        v, x, t, mi, mk, cache=c),
        pipe.variables, x, t, x, m, enc_cache)
    assert f_deep < f_enc < f_full, (f_full, f_enc, f_deep)


def test_deep_cache_sampling_contracts():
    """cache_branch=1 through the whole sampler scan: finite, keeps known
    pixels, deterministic, differs from both exact and encoder-mode
    trajectories, and a full tail recovers bit-exactness."""
    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)

    base = np.asarray(pipe.inpaint(gt, mask, key))
    s_deep = dataclasses.replace(pipe.config.sampler,
                                 encoder_cache_period=4, cache_branch=1)
    out = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_deep))
    assert np.isfinite(out).all()
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    assert not np.array_equal(out, base)
    np.testing.assert_array_equal(
        out, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_deep)))

    s_enc = dataclasses.replace(pipe.config.sampler, encoder_cache_period=4)
    assert not np.array_equal(
        out, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_enc)))

    s_tail = dataclasses.replace(s_deep, encoder_cache_tail=8)
    np.testing.assert_array_equal(
        base, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_tail)))


def test_encoder_cache_tail_recovers_exactness():
    """With tail >= num_steps every step is a key step -> bit-identical to
    exact sampling; a partial tail changes the output vs no-tail caching."""
    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)

    base = np.asarray(pipe.inpaint(gt, mask, key))
    s_all_tail = dataclasses.replace(pipe.config.sampler,
                                     encoder_cache_period=4,
                                     encoder_cache_tail=8)
    np.testing.assert_array_equal(
        base, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_all_tail)))

    s_plain = dataclasses.replace(pipe.config.sampler, encoder_cache_period=4)
    s_tail = dataclasses.replace(s_plain, encoder_cache_tail=3)
    out_plain = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_plain))
    out_tail = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_tail))
    assert not np.array_equal(out_plain, out_tail)
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out_tail[keep], gt[keep])


def test_cache_keysteps_reproduces_periodic_gate():
    """An explicit grid equal to the periodic+tail key steps is
    bit-identical to the periodic config (same program semantics), and a
    DIFFERENT grid at the same budget actually changes the trajectory."""
    import pytest

    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)

    from fidm_tpu.sampling.sampler import (_cache_keymask, _respaced_seq,
                                           host_alphas_cumprod)

    s_per = dataclasses.replace(pipe.config.sampler, encoder_cache_period=3,
                                encoder_cache_tail=2)
    # NOTE: uniform respacing yields K+1 grid entries for num_steps=K —
    # derive the periodic key steps rather than hardcoding them
    K = len(_respaced_seq(pipe.sched, s_per, host_alphas_cumprod(pipe.sched)))
    keys = tuple(int(i) for i in np.nonzero(_cache_keymask(s_per, K))[0])
    s_exp = dataclasses.replace(pipe.config.sampler, encoder_cache_period=3,
                                cache_keysteps=keys)
    out_per = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_per))
    out_exp = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_exp))
    np.testing.assert_array_equal(out_per, out_exp)

    # same eval budget, different placement -> different output
    s_alt = dataclasses.replace(s_exp, cache_keysteps=tuple(range(len(keys))))
    out_alt = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_alt))
    assert not np.array_equal(out_alt, out_exp)
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out_alt[keep], gt[keep])

    # grid covering every step == exact sampling
    s_all = dataclasses.replace(s_exp, cache_keysteps=tuple(range(K)))
    np.testing.assert_array_equal(
        np.asarray(pipe.inpaint(gt, mask, key)),
        np.asarray(pipe.inpaint(gt, mask, key, sampler=s_all)))


def test_cache_keysteps_validation():
    import pytest

    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)
    base = pipe.config.sampler

    # missing step 0: the zero-init cache would be consumed
    s = dataclasses.replace(base, encoder_cache_period=2,
                            cache_keysteps=(1, 4))
    with pytest.raises(ValueError, match="step 0"):
        pipe.inpaint(gt, mask, key, sampler=s)

    # out of range for the 8-step grid
    s = dataclasses.replace(base, encoder_cache_period=2,
                            cache_keysteps=(0, 9))
    with pytest.raises(ValueError, match="out of range"):
        pipe.inpaint(gt, mask, key, sampler=s)

    # not strictly ascending
    s = dataclasses.replace(base, encoder_cache_period=2,
                            cache_keysteps=(0, 4, 4))
    with pytest.raises(ValueError, match="ascending"):
        pipe.inpaint(gt, mask, key, sampler=s)

    # silently-ignored grid (period <= 1) rejected at config time
    s = dataclasses.replace(base, cache_keysteps=(0, 4))
    with pytest.raises(ValueError, match="encoder_cache_period"):
        pipe.inpaint(gt, mask, key, sampler=s)

    # direct library entry point: the repaint branch returns before the
    # period>1 machinery, so the guard must fire BEFORE the method branch
    from fidm_tpu.sampling import inpaint_sample, sample

    s = dataclasses.replace(base, method="repaint", cache_keysteps=(0, 4))
    apply_fn = lambda x, t, mi, m: jnp.zeros_like(x)
    with pytest.raises(ValueError, match="encoder_cache_period"):
        inpaint_sample(apply_fn, pipe.sched, s, gt=gt, mask=mask, key=key)
    with pytest.raises(ValueError, match="encoder_cache_period"):
        sample(lambda x, t: jnp.zeros_like(x), pipe.sched, s,
               shape=gt.shape, key=key)


def test_nonuniform_keysteps_generator():
    from fidm_tpu.sampling import nonuniform_keysteps

    for center in (0.0, 0.3, 0.5, 1.0):
        for power in (0.5, 1.0, 2.0):
            ks = nonuniform_keysteps(50, 10, center=center, power=power)
            a = np.asarray(ks)
            assert a[0] == 0 and a[-1] <= 49
            assert (np.diff(a) > 0).all()
            assert len(a) <= 11  # n_key (+ forced 0), deduped

    # power > 1 concentrates key steps near the center: the middle third
    # holds more keys than for power < 1 (K large enough to avoid rounding
    # collisions masking the effect)
    dense = np.asarray(nonuniform_keysteps(300, 30, center=0.5, power=2.0))
    sparse = np.asarray(nonuniform_keysteps(300, 30, center=0.5, power=0.5))
    mid = lambda a: ((a >= 100) & (a < 200)).sum()
    assert mid(dense) > mid(sparse)

    import pytest
    with pytest.raises(ValueError):
        nonuniform_keysteps(50, 0)
    with pytest.raises(ValueError):
        nonuniform_keysteps(50, 10, center=1.5)
    with pytest.raises(ValueError):
        nonuniform_keysteps(50, 10, power=0.0)


def test_keysteps_from_spec():
    from fidm_tpu.sampling.sampler import keysteps_from_spec

    assert keysteps_from_spec("0,3,7", 10) == (0, 3, 7)
    g = keysteps_from_spec("9@1.0:2.0", 51)
    assert g[0] == 0 and g[-1] == 50 and len(g) <= 10
    # default power applies when ':power' is omitted
    assert keysteps_from_spec("9@0.5", 51) == keysteps_from_spec(
        "9@0.5:1.2", 51)


def test_output_reuse_mode_contracts():
    """cache_branch=-1: non-key steps run NO model. Contracts: finite,
    known pixels preserved, deterministic, differs from both exact and
    deep-trunk at the same schedule; a keystep grid covering every step is
    bit-identical to exact sampling; works without a cache-capable model
    (the pipeline builds no cache_apply)."""
    pipe = _pipe()
    gt, mask = _data()
    key = jax.random.PRNGKey(0)
    base = np.asarray(pipe.inpaint(gt, mask, key))

    s_out = dataclasses.replace(pipe.config.sampler, encoder_cache_period=3,
                                cache_branch=-1)
    out = np.asarray(pipe.inpaint(gt, mask, key, sampler=s_out))
    assert np.isfinite(out).all()
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    assert not np.array_equal(out, base)
    np.testing.assert_array_equal(
        out, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_out)))

    s_trunk = dataclasses.replace(s_out, cache_branch=1)
    assert not np.array_equal(
        out, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_trunk)))

    from fidm_tpu.sampling.sampler import (_respaced_seq,
                                           host_alphas_cumprod)
    K = len(_respaced_seq(pipe.sched, s_out, host_alphas_cumprod(pipe.sched)))
    s_all = dataclasses.replace(s_out, cache_keysteps=tuple(range(K)))
    np.testing.assert_array_equal(
        base, np.asarray(pipe.inpaint(gt, mask, key, sampler=s_all)))


def test_output_reuse_unconditional_and_program_cost():
    """sample() output-reuse runs without cache_apply, and the compiled
    loop costs measurably fewer FLOPs than exact sampling (output reuse
    drops whole model evaluations, so even with both lax.cond branches
    compiled in, the static per-iteration cost can't exceed one forward —
    compare against the exact loop which runs one forward per step)."""
    from fidm_tpu.models import UNet
    from fidm_tpu.sampling.sampler import sample

    cfg3 = dataclasses.replace(CFG, in_channels=3)
    m = UNet(cfg3)
    x0 = jnp.zeros((2, 16, 16, 3))
    v = _randomize(m.init(jax.random.PRNGKey(0), x0,
                          jnp.zeros((2,), jnp.int32)))

    from fidm_tpu.diffusion import DiffusionSchedule
    sched = DiffusionSchedule.create("cosine", 100)
    s = SamplerConfig(method="ddim", num_steps=6, eta=0.0, injection=False,
                      final_blend=False, encoder_cache_period=3,
                      cache_branch=-1)
    out = sample(lambda x, t: m.apply(v, x, t), sched, s,
                 shape=(2, 16, 16, 3), key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()

    s1 = dataclasses.replace(s, encoder_cache_period=1, cache_branch=0)
    base = sample(lambda x, t: m.apply(v, x, t), sched, s1,
                  shape=(2, 16, 16, 3), key=jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(out), np.asarray(base))
