"""Classifier-guidance function tests (reference parity for
condition_mean/condition_score, gaussian_diffusion.py:326-355)."""
import jax
import jax.numpy as jnp
import numpy as np

from fidm_tpu.diffusion import (
    DiffusionSchedule,
    condition_mean,
    condition_score,
    p_mean_variance,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_posterior_mean_variance,
)

SCHED = DiffusionSchedule.create("linear", 100)


def _pmv():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3)) * 0.1
    t = jnp.array([10, 60])
    out = jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)
    return p_mean_variance(SCHED, out, x, t, clip_denoised=False), x, t


def test_condition_mean_shifts_by_variance_times_grad():
    pmv, x, t = _pmv()
    grad = jnp.ones_like(x) * 0.5
    out = condition_mean(pmv, grad)
    np.testing.assert_allclose(
        np.asarray(out.mean), np.asarray(pmv.mean + pmv.variance * 0.5),
        rtol=1e-6,
    )
    # zero grad is identity
    np.testing.assert_array_equal(
        np.asarray(condition_mean(pmv, jnp.zeros_like(x)).mean),
        np.asarray(pmv.mean),
    )


def test_condition_score_manual_recomputation():
    pmv, x, t = _pmv()
    grad = jnp.full_like(x, 0.3)
    out = condition_score(SCHED, pmv, x, t, grad)
    # manual: eps' = eps - sqrt(1-acp)*grad; x0' from eps'; mean' posterior
    acp = jnp.take(SCHED.alphas_cumprod, t).reshape(-1, 1, 1, 1)
    eps = predict_eps_from_xstart(SCHED, x, t, pmv.pred_xstart)
    eps2 = eps - jnp.sqrt(1 - acp) * grad
    x0 = predict_xstart_from_eps(SCHED, x, t, eps2)
    mean, _, _ = q_posterior_mean_variance(SCHED, x0, x, t)
    np.testing.assert_allclose(np.asarray(out.pred_xstart), np.asarray(x0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.mean), np.asarray(mean),
                               rtol=1e-5, atol=1e-6)
    # variance untouched
    np.testing.assert_array_equal(np.asarray(out.variance),
                                  np.asarray(pmv.variance))
