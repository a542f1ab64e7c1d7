"""Tests for the scan-based DDPM/DDIM inpainting sampler.

Includes a step-by-step float64 numpy re-implementation of the reference
eval-loop algorithm (`test_inpainting_better.py:478-586`) as an oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from fidm_tpu.diffusion import DiffusionSchedule, ddim_timestep_sequence
from fidm_tpu.diffusion.schedules import get_named_beta_schedule
from fidm_tpu.sampling import SamplerConfig, inpaint_sample, sample

T = 50
SCHED = DiffusionSchedule.create("linear", T)
SHAPE = (2, 8, 8, 3)


def _acp64():
    betas = get_named_beta_schedule("linear", T)
    return np.cumprod(1.0 - betas)


def test_ddim_eta0_perfect_model_recovers_x0():
    """With a model that predicts the exact eps for a fixed x0, deterministic
    DDIM converges to that x0 from any start."""
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), SHAPE) * 0.5, -1, 1)
    acp = jnp.asarray(_acp64(), jnp.float32)

    def apply_fn(x, t, masked_image, mask):
        a = acp[t][:, None, None, None]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=25, eta=0.0,
                        injection=False, final_blend=False, clip_denoised=True)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=x0,
                         mask=jnp.ones(SHAPE[:-1] + (1,)),
                         key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)


def _numpy_ddim_oracle(x_init, eps_fn, K, eta=0.0, clip=True):
    """Float64 re-implementation of the reference accelerated DDIM update."""
    acp = _acp64()
    seq = ddim_timestep_sequence(T, K)
    x = np.asarray(x_init, np.float64)
    for i, t in enumerate(seq):
        a_t = acp[t]
        a_prev = acp[seq[i + 1]] if i < len(seq) - 1 else 1.0
        eps = eps_fn(x, t)
        pred_x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        if clip:
            pred_x0 = np.clip(pred_x0, -1, 1)
        sigma = eta * np.sqrt((1 - a_prev) / (1 - a_t)) * np.sqrt(1 - a_t / a_prev)
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(1 - a_prev - sigma**2) * eps
    return x


def test_ddim_matches_numpy_oracle():
    """Deterministic dummy model: jax scan output == float64 numpy loop."""
    acp32 = jnp.asarray(_acp64(), jnp.float32)

    def apply_fn(x, t, masked_image, mask):
        eps = 0.3 * x + 0.05 * jnp.float32(1.0) * (t[:, None, None, None] / T)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    def eps_fn(x, t):
        return 0.3 * x + 0.05 * (t / T)

    x_init = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    cfg = SamplerConfig(method="ddim", num_steps=10, eta=0.0,
                        injection=False, final_blend=False)
    out = inpaint_sample(apply_fn, SCHED, cfg,
                         gt=jnp.zeros(SHAPE), mask=jnp.ones(SHAPE[:-1] + (1,)),
                         key=jax.random.PRNGKey(1), x_init=x_init)
    oracle = _numpy_ddim_oracle(np.asarray(x_init), eps_fn, 10)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-4)


def test_final_blend_preserves_known_pixels_exactly():
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), SHAPE), -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, 2:5, 2:5].set(1.0)

    def apply_fn(x, t, masked_image, mask):
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=5, eta=0.9, injection=True)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                         key=jax.random.PRNGKey(4))
    keep = np.asarray(1 - mask)[..., 0] > 0.5
    np.testing.assert_array_equal(np.asarray(out)[keep], np.asarray(gt)[keep])


def test_sampler_determinism_and_key_sensitivity():
    gt = jnp.zeros(SHAPE)
    mask = jnp.ones(SHAPE[:-1] + (1,))

    def apply_fn(x, t, masked_image, mask):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=5, eta=0.5, injection=False,
                        final_blend=False)
    a = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    b = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    c = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_ddpm_inpaint_runs_and_is_finite():
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), SHAPE), -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, :4].set(1.0)

    def apply_fn(x, t, masked_image, mask):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    cfg = SamplerConfig(method="ddpm", num_steps=None, injection=True)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                         key=jax.random.PRNGKey(8))
    assert out.shape == SHAPE
    assert np.all(np.isfinite(np.asarray(out)))
    keep = np.asarray(1 - mask)[..., 0] > 0.5
    np.testing.assert_array_equal(np.asarray(out)[keep], np.asarray(gt)[keep])


def test_pre_injection_library_mode():
    """Library-style pre-model injection (gaussian_diffusion.py:368-376)."""
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), SHAPE), -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, :4].set(1.0)
    seen_x = []

    def apply_fn(x, t, masked_image, mask):
        seen_x.append(x)
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=5, injection=True,
                        injection_point="pre")
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                         key=jax.random.PRNGKey(8))
    assert np.all(np.isfinite(np.asarray(out)))


def test_unconditional_sample_paths():
    def apply_fn(x, t):
        return jnp.concatenate([0.2 * x, jnp.zeros_like(x)], axis=-1)

    for method, steps in [("ddim", 5), ("ddpm", None)]:
        cfg = SamplerConfig(method=method, num_steps=steps, injection=False)
        out = sample(apply_fn, SCHED, cfg, shape=SHAPE, key=jax.random.PRNGKey(0))
        assert out.shape == SHAPE and np.all(np.isfinite(np.asarray(out)))


def test_injection_cached_noise_reproducible_across_calls():
    """Same key -> identical injected noise at identical timesteps (the
    reference's GT-noise-cache contract, gaussian_diffusion.py:85-108)."""
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), SHAPE), -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, :4].set(1.0)

    def apply_fn(x, t, masked_image, mask):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=5, eta=0.0, injection=True,
                        final_blend=False)
    a = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    b = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jit_compiles_whole_loop():
    def apply_fn(x, t, masked_image, mask):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    cfg = SamplerConfig(method="ddim", num_steps=10, eta=0.9)
    gt = jnp.zeros(SHAPE)
    mask = jnp.ones(SHAPE[:-1] + (1,))

    @jax.jit
    def run(key):
        return inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask, key=key)

    out = run(jax.random.PRNGKey(0))
    assert out.shape == SHAPE


def test_respaced_ddpm_matches_numpy_oracle():
    """SpacedDiffusion-style DDPM-K: jax scan output == float64 numpy loop
    over the respaced chain (a capability the reference lacks). The model
    emits a huge negative LEARNED log-variance so the ancestral noise term
    vanishes and the mean path is exactly comparable."""
    from fidm_tpu.diffusion import ModelVarType
    from fidm_tpu.diffusion.schedules import ddim_timestep_sequence

    K = 10
    acp = _acp64()
    seq = ddim_timestep_sequence(T, K)

    x_init = np.random.default_rng(3).standard_normal((2, 8, 8, 3)).astype(
        np.float32
    )
    x = x_init.astype(np.float64)
    for i, t in enumerate(seq):
        a_cur = acp[t]
        a_prev = acp[seq[i + 1]] if i < len(seq) - 1 else 1.0
        beta_r = 1 - a_cur / a_prev
        eps = 0.3 * x + 0.05 * (t / T)
        x0 = np.clip((x - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur), -1, 1)
        c1 = beta_r * np.sqrt(a_prev) / (1 - a_cur)
        c2 = (1 - a_prev) * np.sqrt(1 - beta_r) / (1 - a_cur)
        x = c1 * x0 + c2 * x  # noise term suppressed (logvar -> -inf)

    def apply_fn(xx, t, mi, m):
        tt = t[:, None, None, None] / T
        eps = 0.3 * xx + 0.05 * tt
        return jnp.concatenate([eps, jnp.full_like(eps, -60.0)], axis=-1)

    cfg = SamplerConfig(method="ddpm", num_steps=K, injection=False,
                        final_blend=False, var_type=ModelVarType.LEARNED)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=jnp.zeros((2, 8, 8, 3)),
                         mask=jnp.ones((2, 8, 8, 1)),
                         key=jax.random.PRNGKey(0),
                         x_init=jnp.asarray(x_init))
    np.testing.assert_allclose(np.asarray(out, np.float64), x, atol=5e-4)


def test_respaced_ddpm_full_T_matches_plain():
    """num_steps=T must reproduce the unrespaced chain exactly."""
    def apply_fn(x, t, mi, m):
        eps = 0.1 * x
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    gt = jnp.zeros(SHAPE)
    mask = jnp.ones(SHAPE[:-1] + (1,))
    a = inpaint_sample(apply_fn, SCHED,
                       SamplerConfig(method="ddpm", num_steps=None,
                                     injection=False, final_blend=False),
                       gt=gt, mask=mask, key=jax.random.PRNGKey(0))
    b = inpaint_sample(apply_fn, SCHED,
                       SamplerConfig(method="ddpm", num_steps=T,
                                     injection=False, final_blend=False),
                       gt=gt, mask=mask, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_respaced_ddpm_k_steps_runs_model_k_times():
    calls = []

    def apply_fn(x, t, mi, m):
        calls.append(1)
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=-1)

    cfg = SamplerConfig(method="ddpm", num_steps=10, injection=True)
    with jax.disable_jit():
        inpaint_sample(apply_fn, SCHED, cfg, gt=jnp.zeros((1, 8, 8, 3)),
                       mask=jnp.ones((1, 8, 8, 1)), key=jax.random.PRNGKey(0))
    assert len(calls) == 11  # ddim_timestep_sequence(50, 10) appends T-1


def test_ddpm_trailing_spacing_terminal_step_is_noiseless():
    """Under "trailing" spacing the final retained step has t > 0, but its
    respaced transition still lands at x0 (a_prev == 1) — the noise gate
    must key on the TARGET level, not `t > 0` (regression: spurious
    ~0.15-std noise baked into every returned image)."""
    from fidm_tpu.sampling.sampler import _ddpm_tables

    for spacing in ("uniform", "trailing"):
        tab = _ddpm_tables(
            SCHED, SamplerConfig(method="ddpm", num_steps=10,
                                 time_spacing=spacing))
        assert tab["noise_gate"][-1] == 0.0, spacing
        assert tab["noise_gate"][:-1].all(), spacing
    # trailing really does end above t=0 (the condition that exposed it)
    tab = _ddpm_tables(SCHED, SamplerConfig(method="ddpm", num_steps=10,
                                            time_spacing="trailing"))
    assert tab["t"][-1] > 0


def test_consistency_seq_near_full_chain_dedups():
    """num_steps=None ("all T") must not crash on rounded-grid collisions;
    the grid stays strictly descending with no duplicate evals."""
    from fidm_tpu.sampling.sampler import _consistency_seq

    for K in (None, T, T - 1):
        seq = _consistency_seq(
            SCHED, SamplerConfig(method="consistency", num_steps=K))
        arr = np.asarray(seq)
        assert (np.diff(arr) < 0).all()
        assert arr[0] == T - 1
    # and the full method runs end to end at that grid
    x0 = jnp.zeros((1, 8, 8, 3))
    out = inpaint_sample(
        lambda x, t, mi, m: jnp.concatenate(
            [jnp.zeros_like(x), jnp.zeros_like(x)], -1),
        SCHED,
        SamplerConfig(method="consistency", num_steps=None, injection=False),
        gt=x0, mask=jnp.ones((1, 8, 8, 1)), key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_inpaint_sample_accepts_bf16_inputs():
    """bf16 gt/x_init must not break the scan carry (f32 tables promote the
    carry mid-scan otherwise); sampler math runs in f32."""
    gt = jnp.zeros(SHAPE, jnp.bfloat16)
    mask = jnp.ones(SHAPE[:3] + (1,), jnp.bfloat16)
    cfg = SamplerConfig(method="ddim", num_steps=5, eta=0.9, injection=True)

    def apply_fn(x, t, mi, m):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

    out = inpaint_sample(apply_fn, SCHED, cfg, gt=gt, mask=mask,
                         key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out, np.float32)).all()
    out_u = sample(lambda x, t: jnp.concatenate(
        [jnp.zeros_like(x), jnp.zeros_like(x)], -1), SCHED,
        SamplerConfig(method="ddpm"), shape=SHAPE, key=jax.random.PRNGKey(1),
        x_init=jnp.zeros(SHAPE, jnp.bfloat16))
    assert np.isfinite(np.asarray(out_u, np.float32)).all()


def test_host_alphas_cumprod_f64_for_custom_betas():
    """Custom (unnamed) schedules keep full f64 beta precision for the
    sampler coefficient tables (betas_host), instead of rebuilding from the
    f32-rounded device table."""
    from fidm_tpu.sampling.sampler import host_alphas_cumprod

    betas64 = np.linspace(1e-4, 0.02, 200, dtype=np.float64) * (
        1 + 1e-9)  # not exactly representable in f32
    sched = DiffusionSchedule.from_betas(betas64, name="")
    acp = host_alphas_cumprod(sched)
    np.testing.assert_array_equal(acp, np.cumprod(1.0 - betas64))
    # the f32 fallback would NOT be exactly equal
    acp32 = np.cumprod(1.0 - np.asarray(np.float32(betas64), np.float64))
    assert not np.array_equal(acp, acp32)
