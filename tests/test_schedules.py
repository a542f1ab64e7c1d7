"""Golden-value tests for beta schedules and derived diffusion tables.

Independent float64 recomputation of the reference formulas
(`utils/schedules.py:9-66`, `gaussian_diffusion.py:47-80`) — the device
tables must match to float32 resolution.
"""
import math

import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule, ddim_timestep_sequence
from fidm_tpu.diffusion.schedules import get_named_beta_schedule


def test_linear_schedule_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    assert betas.dtype == np.float64
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # scale-invariance in the T->inf limit: T=500 doubles the endpoints
    betas500 = get_named_beta_schedule("linear", 500)
    assert betas500[0] == pytest.approx(2e-4)
    assert betas500[-1] == pytest.approx(0.04)


def test_cosine_schedule_golden():
    betas = get_named_beta_schedule("cosine", 1000)
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    for i in [0, 1, 250, 500, 998, 999]:
        expected = min(1 - f((i + 1) / 1000) / f(i / 1000), 0.999)
        assert betas[i] == pytest.approx(expected, rel=1e-12)
    assert betas.max() <= 0.999


def test_quadratic_schedule_golden():
    T = 1000
    betas = get_named_beta_schedule("quadratic", T)
    t = np.linspace(0, 1, T) ** 2
    expected = 1e-4 + (0.02 - 1e-4) * t
    np.testing.assert_allclose(betas, expected, rtol=1e-12)


def test_sqrt_schedules():
    for name in ("sqrt", "sqrt_linear"):
        betas = get_named_beta_schedule(name, 100)
        np.testing.assert_allclose(
            betas, np.sqrt(np.linspace(1e-4, 0.02, 100)), rtol=1e-12
        )


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        get_named_beta_schedule("nope", 10)


@pytest.mark.parametrize("name", ["linear", "cosine", "quadratic"])
def test_derived_tables_match_float64(name):
    T = 200
    betas = get_named_beta_schedule(name, T)
    sched = DiffusionSchedule.create(name, T)

    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)

    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alphas_cumprod), np.sqrt(acp), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - acp), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_variance), post_var, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped),
        np.log(np.append(post_var[1], post_var[1:])),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1.0 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
        rtol=1e-5,
    )
    # FIXED_LARGE table: [posterior_var[1], betas[1:]]
    np.testing.assert_allclose(
        np.asarray(sched.fixed_large_variance),
        np.append(post_var[1], betas[1:]),
        rtol=1e-6,
    )
    assert sched.num_timesteps == T


def test_ddim_timestep_sequence_matches_reference_logic():
    # reference: stride T//K from 0, append T-1 if missing, reversed
    seq = ddim_timestep_sequence(1000, 100)
    assert seq[0] == 999 and seq[-1] == 0
    assert len(seq) == 101  # 0..990 step 10 plus appended 999
    assert list(seq[1:]) == list(range(990, -1, -10))

    seq50 = ddim_timestep_sequence(1000, 50)
    assert seq50[0] == 999 and len(seq50) == 51
    seq30 = ddim_timestep_sequence(1000, 30)
    assert seq30[0] == 999 and seq30[-1] == 0
    # strictly decreasing
    for s in (seq, seq50, seq30):
        assert all(np.diff(s) < 0)


def test_ddim_sequence_exact_divisor_no_append():
    seq = ddim_timestep_sequence(100, 100)
    assert len(seq) == 100 and seq[0] == 99


def test_timestep_sequence_spacings():
    """trailing/lambda grids: descending, unique, in-range, correct size;
    uniform is reference parity."""
    import numpy as np
    from fidm_tpu.diffusion.schedules import (
        ddim_timestep_sequence,
        get_named_beta_schedule,
        timestep_sequence,
    )

    T, K = 1000, 20
    acp = np.cumprod(1 - get_named_beta_schedule("quadratic", T))
    np.testing.assert_array_equal(
        timestep_sequence(T, K, "uniform"), ddim_timestep_sequence(T, K)
    )
    for spacing in ("trailing", "lambda", "karras"):
        seq = timestep_sequence(T, K, spacing, alphas_cumprod=acp)
        assert (np.diff(seq) < 0).all()
        assert len(np.unique(seq)) == len(seq) == K
        assert seq[0] == T - 1 and seq[-1] >= 0
    # trailing anchors at T-1 and skips t=0's duplicate neighborhood
    tr = timestep_sequence(T, K, "trailing")
    assert tr[-1] == T // K - 1
    # lambda concentrates steps near t=0 where log-SNR moves fastest
    lam = timestep_sequence(T, K, "lambda", alphas_cumprod=acp)
    assert lam[-1] == 0 and lam[-2] < tr[-2]
    # karras endpoints hit the chain's sigma extremes exactly, and the rho=7
    # grid maps back to the target sigma ramp (nearest-timestep rounding)
    ka = timestep_sequence(T, K, "karras", alphas_cumprod=acp)
    assert ka[0] == T - 1 and ka[-1] == 0
    sigma = np.sqrt((1 - acp) / acp)
    rho, ramp = 7.0, np.linspace(0, 1, K)
    want = (sigma[T - 1] ** (1 / rho)
            + ramp * (sigma[0] ** (1 / rho) - sigma[T - 1] ** (1 / rho))) ** rho
    got = sigma[ka]
    np.testing.assert_allclose(np.log(got[1:-1]), np.log(want[1:-1]), rtol=0.2)


def test_sampler_time_spacing_integration():
    """time_spacing changes the trajectory but keeps all sampler contracts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.sampling import SamplerConfig, inpaint_sample

    sched = DiffusionSchedule.create("linear", 50)
    shape = (1, 8, 8, 3)
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), shape), -1, 1)
    mask = jnp.zeros(shape[:-1] + (1,)).at[:, 2:6, 2:6].set(1.0)

    def apply_fn(x, t, mi, m):
        eps = 0.3 * x + 0.05 * (t[:, None, None, None] / 50.0)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    outs = {}
    for spacing in ("uniform", "trailing", "lambda", "karras"):
        for method in ("ddim", "dpm++2m"):
            cfg = SamplerConfig(method=method, num_steps=10, eta=0.0,
                                injection=True, time_spacing=spacing)
            out = inpaint_sample(apply_fn, sched, cfg, gt=gt, mask=mask,
                                 key=jax.random.PRNGKey(0))
            assert np.all(np.isfinite(np.asarray(out)))
            keep = np.asarray(1 - mask)[..., 0] > 0.5
            np.testing.assert_array_equal(np.asarray(out)[keep],
                                          np.asarray(gt)[keep])
            outs[(spacing, method)] = np.asarray(out)
    assert not np.allclose(outs[("uniform", "ddim")],
                           outs[("trailing", "ddim")])
    assert not np.allclose(outs[("uniform", "dpm++2m")],
                           outs[("lambda", "dpm++2m")])
