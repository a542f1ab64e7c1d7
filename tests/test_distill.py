"""Progressive distillation + v-parameterization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fidm_tpu.diffusion import (
    DiffusionSchedule,
    ModelMeanType,
    predict_xstart_from_v,
    q_sample,
    velocity_from_eps_xstart,
)
from fidm_tpu.distill import distill_boundaries, make_distill_step

SCHED = DiffusionSchedule.create("cosine", 100)


def test_velocity_roundtrip():
    """x0 recoverable from (x_t, v)."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 3)) * 0.5
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([10, 70])
    x_t = q_sample(SCHED, x0, t, eps)
    v = velocity_from_eps_xstart(SCHED, t, eps, x0)
    x0_hat = predict_xstart_from_v(SCHED, x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)


def test_velocity_training_target_and_sampler():
    """v-param training target matches the definition; DDIM sampler with a
    perfect v-model recovers x0."""
    from fidm_tpu.sampling import SamplerConfig, inpaint_sample

    x0 = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)) * 0.5, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def apply_fn(x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        # exact v for this x0: v = (a*x - x0)/s  (from x0 = a x - s v)
        v = (a * x - x0) / s
        return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=20, eta=0.0,
                        injection=False, final_blend=False,
                        mean_type=ModelMeanType.VELOCITY)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=x0,
                         mask=jnp.ones((2, 8, 8, 1)),
                         key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)


def test_distill_boundaries():
    b = distill_boundaries(1000, 8)
    assert len(b) == 9 and b[0] == 999 and b[-1] == 0
    assert all(np.diff(b) < 0)
    with pytest.raises(AssertionError):
        distill_boundaries(1000, 7)


def test_distill_target_equals_x0_for_perfect_teacher():
    """With an exact-eps teacher and no clipping, two DDIM steps are exactly
    consistent with one step predicting the true x0 — so a student that
    predicts the true x0 has ~zero loss."""
    x0_true = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3)) * 0.4, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def teacher_apply(params, x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        eps = (x - a * x0_true) / s
        return eps

    def student_apply(params, x, t, mi, m):
        # student predicts v for the true x0
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        return (a * x - x0_true * (1 + params["b"])) / s

    from flax.training import train_state

    state = train_state.TrainState.create(
        apply_fn=None, params={"b": jnp.zeros(())},
        tx=optax.sgd(0.0),
    )
    step = make_distill_step(
        SCHED, teacher_apply, student_apply, teacher_steps=10,
        clip_denoised=False,
    )
    batch = {
        "image": x0_true,
        "masked_image": x0_true,
        "mask": jnp.zeros((4, 8, 8, 1)),
    }
    _, metrics = step(state, {}, batch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) < 1e-4


def test_distill_step_reduces_loss_tiny_model():
    """Distill a randomly-initialized tiny teacher into a student copy: the
    student loss must drop over a few optimizer steps."""
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.training import TrainState, make_optimizer

    cfg = UNetConfig(
        image_size=8, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=32, dtype=jnp.float32,
    )
    model = InpaintingUNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(key, x, jnp.zeros((1,), jnp.int32), x,
                           jnp.ones((1, 8, 8, 1)))
    # perturb so the teacher isn't the zero function
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(key, len(leaves))
    teacher_params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )

    def apply(params, xx, t, mi, m):
        return model.apply({"params": params}, xx, t, mi, m)

    state = TrainState.create(
        apply_fn=None, params=teacher_params,
        tx=make_optimizer(optax.constant_schedule(1e-3)),
    )
    step = make_distill_step(
        SCHED, apply, apply, teacher_steps=10,
        teacher_mean_type=ModelMeanType.EPSILON,
        student_mean_type=ModelMeanType.EPSILON,
    )
    img = jax.random.normal(jax.random.fold_in(key, 9), (4, 8, 8, 3)) * 0.5
    mask = jnp.zeros((4, 8, 8, 1)).at[:, :4].set(1.0)
    batch = {"image": img, "masked_image": img * (1 - mask), "mask": mask}
    losses = []
    for i in range(14):
        state, m = step(state, teacher_params, batch, jax.random.PRNGKey(5))
        losses.append(float(m["loss"]))
    # per-step loss is noisy (random timestep segments); compare window means
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert np.isfinite(losses).all()


# ------------------------------------------------------- consistency distillation

def test_consistency_grid():
    from fidm_tpu.distill import consistency_grid

    g = consistency_grid(1000, 5)
    assert len(g) == 6 and g[0] == 999 and g[-1] == 0
    assert all(np.diff(g) < 0)
    assert consistency_grid(1000, 1).tolist() == [999, 0]


def test_consistency_perfect_teacher_and_target_zero_loss():
    """Exact-eps teacher + a student/target that already predicts the true
    x0: the consistency objective is ~zero (f is already consistent)."""
    from fidm_tpu.distill import make_consistency_step
    from fidm_tpu.training import TrainState

    x0_true = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3)) * 0.4, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def teacher_apply(params, x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        return (x - a * x0_true) / s  # exact eps

    def student_apply(params, x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        return (a * x - x0_true * (1 + params["b"])) / s  # exact v at b=0

    state = TrainState.create(
        apply_fn=None, params={"b": jnp.zeros(())},
        ema_params={"b": jnp.zeros(())}, tx=optax.sgd(0.0),
    )
    step = make_consistency_step(
        SCHED, teacher_apply, student_apply, grid_size=10,
        clip_denoised=False,
    )
    batch = {
        "image": x0_true,
        "masked_image": x0_true,
        "mask": jnp.zeros((4, 8, 8, 1)),
    }
    _, metrics = step(state, {}, batch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) < 1e-4


def test_consistency_sample_perfect_model():
    """A perfect v-model samples the true x0 in ONE step (and in four), is
    key-deterministic, and preserves injected known pixels exactly."""
    from fidm_tpu.distill import consistency_sample

    x0 = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)) * 0.5, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def apply_fn(x, t):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        return (a * x - x0) / s

    key = jax.random.PRNGKey(1)
    for steps in (1, 4):
        out = consistency_sample(apply_fn, SCHED, steps, x0.shape, key)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)
    out2 = consistency_sample(apply_fn, SCHED, 4, x0.shape, key)
    out3 = consistency_sample(apply_fn, SCHED, 4, x0.shape, key)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out3))

    mask = jnp.zeros((2, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    out_inp = consistency_sample(apply_fn, SCHED, 2, x0.shape, key,
                                 gt=x0, mask=mask)
    keep = np.asarray(mask[..., 0]) < 0.5
    np.testing.assert_array_equal(np.asarray(out_inp)[keep],
                                  np.asarray(x0)[keep])


def test_consistency_step_reduces_loss_tiny_model():
    """Distill a tiny random teacher with the real step: loss drops, the
    EMA target network moves toward the student."""
    from fidm_tpu.distill import make_consistency_step
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.training import TrainState, make_optimizer

    cfg = UNetConfig(
        image_size=8, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=32, dtype=jnp.float32,
    )
    model = InpaintingUNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(key, x, jnp.zeros((1,), jnp.int32), x,
                           jnp.ones((1, 8, 8, 1)))
    leaves, treedef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(key, len(leaves))
    teacher_params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )

    def apply(params, xx, t, mi, m):
        return model.apply({"params": params}, xx, t, mi, m)

    state = TrainState.create(
        apply_fn=None, params=teacher_params, ema_params=teacher_params,
        tx=make_optimizer(optax.constant_schedule(1e-3)),
    )
    step = make_consistency_step(
        SCHED, apply, apply, grid_size=10,
        teacher_mean_type=ModelMeanType.EPSILON,
        student_mean_type=ModelMeanType.EPSILON,
        ema_decay=0.9,
    )
    img = jax.random.normal(jax.random.fold_in(key, 9), (4, 8, 8, 3)) * 0.5
    mask = jnp.zeros((4, 8, 8, 1)).at[:, :4].set(1.0)
    batch = {"image": img, "masked_image": img * (1 - mask), "mask": mask}
    losses = []
    for i in range(14):
        state, m = step(state, teacher_params, batch, jax.random.PRNGKey(5))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])
    assert np.isfinite(losses).all()
    # the target network must have moved off its init toward the student
    d_tgt = optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: a - b, state.ema_params, teacher_params))
    assert float(d_tgt) > 0.0


def test_sampler_consistency_method_perfect_model():
    """method="consistency" through the unified sampler: a perfect v-model
    recovers x0 at 1 and 2 steps, preserves known pixels, and the preset
    configs are wired."""
    from fidm_tpu.pipeline import SAMPLER_PRESETS
    from fidm_tpu.sampling import SamplerConfig, inpaint_sample

    x0 = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)) * 0.5, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def apply_fn(x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        v = (a * x - x0) / s
        return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)

    mask = jnp.zeros((2, 8, 8, 1)).at[:, 2:6, 2:6].set(1.0)
    for steps in (1, 2):
        cfg = SamplerConfig(method="consistency", num_steps=steps,
                            injection=True,
                            mean_type=ModelMeanType.VELOCITY)
        out = inpaint_sample(apply_fn, SCHED, cfg, gt=x0, mask=mask,
                             key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=5e-3)
        keep = np.asarray(mask[..., 0]) < 0.5
        np.testing.assert_array_equal(np.asarray(out)[keep],
                                      np.asarray(x0)[keep])

    for name in ("consistency-1", "consistency-2"):
        p = SAMPLER_PRESETS[name]
        assert p.method == "consistency"
        assert p.mean_type == ModelMeanType.VELOCITY
    assert SAMPLER_PRESETS["consistency-1"].num_steps == 1

    # num_steps=K must mean exactly K model evaluations: the grid is the
    # first K consistency_grid boundaries, NOT the uniform DDIM respacing
    # (which appends a t=0 row the student never trains on)
    from fidm_tpu.distill import consistency_grid
    from fidm_tpu.sampling.sampler import _consistency_seq

    T = SCHED.num_timesteps
    for K in (1, 2, 4):
        seq = _consistency_seq(
            SCHED, SamplerConfig(method="consistency", num_steps=K))
        assert len(seq) == K
        assert list(seq) == [int(t) for t in consistency_grid(T, K)[:K]]
    assert _consistency_seq(
        SCHED, SamplerConfig(method="consistency", num_steps=1)
    )[0] == T - 1


def test_consistency_training_no_teacher_zero_loss_and_runs():
    """teacher_apply=None (consistency TRAINING): the pair is built from
    data with a shared noise draw — a student/target already predicting the
    true x0 has ~zero loss, and the step runs without any teacher params."""
    from fidm_tpu.distill import make_consistency_step
    from fidm_tpu.training import TrainState

    x0_true = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 3)) * 0.4, -1, 1
    )
    acp = SCHED.sqrt_alphas_cumprod
    s1m = SCHED.sqrt_one_minus_alphas_cumprod

    def student_apply(params, x, t, mi, m):
        a = acp[t][:, None, None, None]
        s = s1m[t][:, None, None, None]
        return (a * x - x0_true * (1 + params["b"])) / s

    state = TrainState.create(
        apply_fn=None, params={"b": jnp.zeros(())},
        ema_params={"b": jnp.zeros(())}, tx=optax.sgd(0.0),
    )
    step = make_consistency_step(
        SCHED, None, student_apply, grid_size=10, clip_denoised=False,
    )
    batch = {
        "image": x0_true,
        "masked_image": x0_true,
        "mask": jnp.zeros((4, 8, 8, 1)),
    }
    _, metrics = step(state, None, batch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) < 1e-4

    # and with a real tiny model from random init: finite, decreasing-ish
    from fidm_tpu.models import InpaintingUNet, UNetConfig
    from fidm_tpu.training import make_optimizer

    cfg = UNetConfig(
        image_size=8, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=32, dtype=jnp.float32,
    )
    model = InpaintingUNet(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(key, x, jnp.zeros((1,), jnp.int32), x,
                        jnp.ones((1, 8, 8, 1)))["params"]

    def apply(p, xx, t, mi, m):
        return model.apply({"params": p}, xx, t, mi, m)

    st = TrainState.create(
        apply_fn=None, params=params, ema_params=params,
        tx=make_optimizer(optax.constant_schedule(1e-3)),
    )
    ct_step = make_consistency_step(SCHED, None, apply, grid_size=10,
                                    ema_decay=0.9)
    img = jax.random.normal(jax.random.fold_in(key, 9), (4, 8, 8, 3)) * 0.5
    batch = {"image": img, "masked_image": jnp.zeros_like(img),
             "mask": jnp.ones((4, 8, 8, 1))}
    losses = []
    for i in range(10):
        st, m = ct_step(st, None, batch, jax.random.PRNGKey(5))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
