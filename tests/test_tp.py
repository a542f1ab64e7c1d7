"""Tensor-parallel and spatial-partitioning tests (virtual 8-device mesh).

The reference has no distributed code at all (SURVEY.md §2); these validate
the TPU-native latency-scaling layouts in `parallel/tp.py`: Megatron
column/row channel sharding of the UNet and GSPMD spatial partitioning,
both of which must be *exactly* the unsharded function (XLA inserts the
collectives; the math is identical up to reduction order).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.parallel import (
    create_mesh,
    tp_param_specs,
    tp_shard_params,
)
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _small_cfg(image_size=16, model_channels=32):
    return UNetConfig(
        image_size=image_size, in_channels=9, model_channels=model_channels,
        out_channels=6, num_res_blocks=1, attention_resolutions=(2,),
        channel_mult=(1, 2), num_heads=2, num_head_channels=16,
        dtype=jnp.float32,
    )


def _init(cfg, B=4):
    model = InpaintingUNet(cfg)
    S = cfg.image_size
    x = jnp.zeros((B, S, S, 3))
    t = jnp.zeros((B,), jnp.int32)
    mi = jnp.zeros((B, S, S, 3))
    m = jnp.ones((B, S, S, 1))
    variables = model.init(jax.random.PRNGKey(0), x, t, mi, m)
    return model, variables


def test_tp_specs_follow_megatron_pattern():
    mesh = create_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "fsdp": 1, "model": 4}
    _, variables = _init(_small_cfg())
    specs = tp_param_specs(variables["params"], mesh)
    base = specs["base"]
    # find one ResBlock and one attention block by name
    res = next(v for k, v in base.items() if k.endswith("_res"))
    attn = next(v for k, v in base.items() if k.endswith("_attn"))
    assert tuple(res["in_conv"]["kernel"]) == (None, None, None, "model")
    assert tuple(res["out_conv"]["kernel"]) == (None, None, "model", None)
    assert tuple(res["out_conv"]["bias"]) == ()          # row output psummed
    assert tuple(res["emb_proj"]["kernel"])[-1] == "model"
    assert tuple(res["out_norm"]["GroupNorm_0"]["scale"]) == ("model",)
    # top-level final norm acts on the replicated stream
    assert tuple(base["out_norm"]["GroupNorm_0"]["scale"]) == ()
    assert tuple(attn["qkv"]["kernel"]) == (None, "model")
    assert tuple(attn["proj"]["kernel"]) == ("model", None)
    # block-boundary streams stay replicated
    assert tuple(base["in_0_conv"]["kernel"]) == ()
    assert tuple(base["out_conv"]["kernel"]) == ()
    assert tuple(base["time_embed_0"]["kernel"]) == ()
    # non-divisible tensors are replicated, not mis-sharded
    mesh3 = create_mesh(data=2, model=4)
    odd = {"base": {"x_res": {"in_conv": {"kernel": jnp.zeros((3, 3, 8, 10))}}}}
    s = tp_param_specs(odd, mesh3)
    assert tuple(s["base"]["x_res"]["in_conv"]["kernel"]) == ()


def test_tp_forward_parity_vs_replicated():
    """TP-sharded apply == single-device apply (same params, same inputs)."""
    cfg = _small_cfg()
    model, variables = _init(cfg)
    B, S = 4, cfg.image_size
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    t = jnp.asarray(rng.integers(0, 100, (B,)), jnp.int32)
    mi = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    m = jnp.asarray((rng.random((B, S, S, 1)) > 0.5), jnp.float32)

    ref = model.apply(variables, x, t, mi, m)

    mesh = create_mesh(data=2, model=4)
    params, specs = tp_shard_params(variables["params"], mesh)
    shard_names = {
        ax for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda v: isinstance(v, P))
        for ax in tuple(s) if ax
    }
    assert "model" in shard_names, "nothing was TP-sharded"

    with mesh:
        out = jax.jit(
            lambda p, *a: model.apply({"params": p}, *a)
        )(params, x, t, mi, m)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_train_step_matches_unsharded():
    """One TP+DP-sharded train step produces the same loss as unsharded."""
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step
    from fidm_tpu.training.lr import make_lr_schedule

    cfg = _small_cfg()
    model, variables = _init(cfg)
    sched = DiffusionSchedule.create("linear", 50)
    B, S = 8, cfg.image_size
    rng = np.random.default_rng(2)
    batch = {
        "image": jnp.asarray(
            np.clip(rng.standard_normal((B, S, S, 3)) * 0.4, -1, 1),
            jnp.float32),
        "masked_image": jnp.zeros((B, S, S, 3), jnp.float32),
        "mask": jnp.ones((B, S, S, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(3)

    def run(mesh, params):
        tx = make_optimizer(make_lr_schedule("cosine", 1e-4, 100, 10))
        state = TrainState.create(
            apply_fn=lambda v, *a: model.apply(v, *a), params=params, tx=tx)
        step = make_train_step(sched, mesh=mesh, donate=False)
        if mesh is None:
            return step(state, batch, key)
        with mesh:
            from fidm_tpu.parallel import shard_batch

            return step(state, shard_batch(batch, mesh), key)

    _, ref_metrics = run(None, variables["params"])

    mesh = create_mesh(data=2, fsdp=2, model=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}
    params, _ = tp_shard_params(variables["params"], mesh, fsdp_min_size=1024)
    new_state, metrics = run(mesh, params)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-5, atol=1e-6)
    # updated params keep their TP placement (no silent gather-to-replicated)
    leaf = new_state.params["base"]["mid_res0"]["in_conv"]["kernel"]
    assert "model" in tuple(leaf.sharding.spec)


def _toy_inpaint_inputs(S=16, B=8, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.clip(rng.standard_normal((B, S, S, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    mask = np.zeros((B, S, S, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    return gt, mask


def test_pipeline_tp_sampling_parity():
    cfg = PipelineConfig(
        unet=_small_cfg(), schedule="linear", num_timesteps=50,
        sampler=SamplerConfig(method="ddim", num_steps=4, eta=0.0,
                              injection=True),
    )
    gt, mask = _toy_inpaint_inputs()
    key = jax.random.PRNGKey(0)

    ref_pipe = InpaintingPipeline.create(cfg, key=jax.random.PRNGKey(7))
    ref = np.asarray(ref_pipe.inpaint(gt, mask, key))

    mesh = create_mesh(data=2, model=4)
    with mesh:
        pipe = InpaintingPipeline(
            ref_pipe.model, {"params": ref_pipe.variables["params"]},
            ref_pipe.sched, cfg, mesh=mesh, tp_params=True)
        out = np.asarray(pipe.inpaint(gt, mask, key))
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pipeline_spatial_sampling_parity():
    cfg = PipelineConfig(
        unet=_small_cfg(), schedule="linear", num_timesteps=50,
        sampler=SamplerConfig(method="ddim", num_steps=4, eta=0.0,
                              injection=True),
    )
    gt, mask = _toy_inpaint_inputs()
    key = jax.random.PRNGKey(0)

    ref_pipe = InpaintingPipeline.create(cfg, key=jax.random.PRNGKey(7))
    ref = np.asarray(ref_pipe.inpaint(gt, mask, key))

    mesh = create_mesh(data=2, model=4)  # H=16 -> 4 spatial shards of 4 rows
    with mesh:
        pipe = InpaintingPipeline(
            ref_pipe.model, {"params": ref_pipe.variables["params"]},
            ref_pipe.sched, cfg, mesh=mesh, shard_spatial=True)
        out = np.asarray(pipe.inpaint(gt, mask, key))
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pipeline_tp_validation_errors():
    cfg = PipelineConfig(
        unet=_small_cfg(), schedule="linear", num_timesteps=50,
        sampler=SamplerConfig(method="ddim", num_steps=2),
    )
    mesh = create_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="model"):
        InpaintingPipeline.create(cfg, mesh=create_mesh(), tp_params=True)
    with pytest.raises(ValueError, match="pick one"):
        InpaintingPipeline.create(cfg, mesh=mesh, tp_params=True,
                                  shard_spatial=True)


def test_spatial_train_step_matches_unsharded():
    """Spatially-partitioned training (H sharded over the model axis) is
    exactly the unsharded step: XLA inserts the conv halo exchanges AND
    their backward-pass transposes, so loss and the updated parameters must
    match to reduction-order tolerance."""
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.parallel import shard_batch
    from fidm_tpu.training import TrainState, make_optimizer, make_train_step
    from fidm_tpu.training.lr import make_lr_schedule

    cfg = _small_cfg()
    model, variables = _init(cfg)
    sched = DiffusionSchedule.create("linear", 50)
    B, S = 8, cfg.image_size
    rng = np.random.default_rng(5)
    gt, mask = _toy_inpaint_inputs(S=S, B=B, seed=5)
    batch = {
        "image": jnp.asarray(gt),
        "masked_image": jnp.asarray(gt * (1 - mask)),
        "mask": jnp.asarray(mask),
        # rank-1 leaf must survive spatial sharding (batch-sharded only)
        "label": jnp.asarray(rng.integers(0, 4, (B,)), jnp.int32),
    }
    key = jax.random.PRNGKey(9)

    def run(mesh, spatial):
        tx = make_optimizer(make_lr_schedule("cosine", 1e-4, 100, 10))
        state = TrainState.create(
            apply_fn=lambda v, *a: model.apply(v, *a),
            params=variables["params"], tx=tx)
        step = make_train_step(sched, mesh=mesh, donate=False,
                               spatial=spatial, use_labels=False)
        if mesh is None:
            return step(state, batch, key)
        with mesh:
            return step(state, shard_batch(batch, mesh, spatial=spatial),
                        key)

    ref_state, ref_metrics = run(None, False)
    mesh = create_mesh(data=2, model=4)  # H=16 -> 4 spatial shards of 4 rows
    new_state, metrics = run(mesh, True)

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]),
                               rtol=1e-5, atol=1e-6)
    ref_flat = jax.tree_util.tree_leaves(ref_state.params)
    new_flat = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(ref_flat, new_flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=2e-5)


def test_spatial_train_step_validation():
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.training import make_train_step

    sched = DiffusionSchedule.create("linear", 50)
    with pytest.raises(ValueError, match="mesh"):
        make_train_step(sched, spatial=True)
    with pytest.raises(ValueError, match="model"):
        make_train_step(sched, mesh=create_mesh(data=4, fsdp=2),
                        spatial=True)


def test_shard_batch_spatial_layout():
    """Image leaves H-shard over 'model'; low-rank leaves stay batch-only;
    non-divisible H falls back to batch sharding."""
    from fidm_tpu.parallel import shard_batch

    mesh = create_mesh(data=2, model=4)
    batch = {
        "image": jnp.zeros((8, 16, 16, 3)),
        "mask": jnp.zeros((8, 16, 16, 1)),
        "label": jnp.zeros((8,), jnp.int32),
        "odd": jnp.zeros((8, 6, 6, 3)),  # 6 % 4 != 0
    }
    out = shard_batch(batch, mesh, spatial=True)
    assert tuple(out["image"].sharding.spec) == ("data", "model")
    assert tuple(out["mask"].sharding.spec) == ("data", "model")
    assert tuple(out["label"].sharding.spec) == ("data",)
    assert tuple(out["odd"].sharding.spec) == ("data",)
