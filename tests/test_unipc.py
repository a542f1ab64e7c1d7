"""UniPC sampler tests (SamplerConfig.method="unipc", arXiv:2302.04867).

Validation mirrors tests/test_dpm_solver.py:
1. step-by-step float64 numpy oracle of the published UniP/UniC updates
   (direct per-step Vandermonde solves — independent of the sampler's
   host-table construction);
2. an exact algebraic anchor: with the corrector off, UniP order 2 with
   B(h)=e^h-1 is DPM-Solver++(2M) on ANY grid (the bh2 design point) —
   asserted bitwise-ish against our dpm++2m scan;
3. convergence: the corrector buys measurable integrator accuracy over
   dpm++2m at equal NFE against the CLOSED-FORM solution of the analytic
   ODE (the reason to ship the method);
4. contracts: injection/final-blend known-pixel preservation, determinism,
   x0 recovery with a perfect model, guidance guard.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule, ddim_timestep_sequence
from fidm_tpu.diffusion.schedules import get_named_beta_schedule
from fidm_tpu.sampling import SamplerConfig, inpaint_sample, sample

T = 50
SCHED = DiffusionSchedule.create("linear", T)
SHAPE = (2, 8, 8, 3)


def _acp64():
    betas = get_named_beta_schedule("linear", T)
    return np.cumprod(1.0 - betas)


def _eps_fn64(x, t):
    return 0.3 * x + 0.05 * (t / T)


def _eps_apply_fn(x, t, masked_image, mask):
    eps = 0.3 * x + 0.05 * (t[:, None, None, None] / T)
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)


def _lam(a):
    return 0.5 * (np.log(a) - np.log1p(-a))


def _rhos(rks, h, order, corrector):
    """Float64 solve of the UniPC system, written directly from the paper
    (R_ij = r_i^j Vandermonde rows, b_k = h phi_{k+1}(-h) k!/B(h), bh2)."""
    hh = -h
    B_h = np.expm1(hh)
    R = np.vstack([np.asarray(rks) ** k for k in range(order)])
    b = np.empty(order)
    h_phi_k = np.expm1(hh) / hh - 1.0
    fact = 1.0
    for k in range(1, order + 1):
        b[k - 1] = h_phi_k * fact / B_h
        fact *= k + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    if corrector:
        return np.array([0.5]) if order == 1 else np.linalg.solve(R, b)
    return np.array([0.5]) if order == 2 else np.linalg.solve(
        R[:-1, :-1], b[:-1])


def _numpy_unipc_oracle(x_init, eps_fn, K, order=3, corrector=True,
                        clip=True):
    acp = _acp64()
    seq = ddim_timestep_sequence(T, K)
    n = len(seq)
    lams = [_lam(acp[t]) for t in seq]
    x = np.asarray(x_init, np.float64)
    last_x = None
    hist = []  # x0 predictions, newest first (hist[0] at t_{i-1})
    for i, t in enumerate(seq):
        a_t = acp[t]
        alpha_t, sigma_t = np.sqrt(a_t), np.sqrt(1 - a_t)
        eps = eps_fn(x, t)
        m_new = (x - sigma_t * eps) / alpha_t
        if clip:
            m_new = np.clip(m_new, -1, 1)
        if corrector and i >= 1:
            co = min(order, i, n - (i - 1))  # order of the last predictor
            h_c = lams[i] - lams[i - 1]
            a_s0 = acp[seq[i - 1]]
            sigma_s0 = np.sqrt(1 - a_s0)
            rks = [(lams[i - 1 - j] - lams[i - 1]) / h_c
                   for j in range(1, co)] + [1.0]
            rhos = _rhos(rks, h_c, co, corrector=True)
            B_hc = np.expm1(-h_c)
            x_ = (sigma_t / sigma_s0) * last_x - alpha_t * B_hc * hist[0]
            res = rhos[co - 1] * (m_new - hist[0])
            for j in range(1, co):
                res = res + rhos[j - 1] * (hist[j] - hist[0]) / rks[j - 1]
            x = x_ - alpha_t * B_hc * res
        p = min(order, i + 1, n - i)
        a_next = acp[seq[i + 1]] if i < n - 1 else 1.0
        if a_next >= 1.0:
            x_next = m_new
        else:
            alpha_p, sigma_p = np.sqrt(a_next), np.sqrt(1 - a_next)
            h = _lam(a_next) - lams[i]
            B_h = np.expm1(-h)
            x_next = (sigma_p / sigma_t) * x - alpha_p * B_h * m_new
            if p >= 2:
                rks = [(lams[i - j] - lams[i]) / h
                       for j in range(1, p)] + [1.0]
                rhos = _rhos(rks, h, p, corrector=False)
                res = 0.0
                for j in range(p - 1):
                    res = res + rhos[j] * (hist[j] - m_new) / rks[j]
                x_next = x_next - alpha_p * B_h * res
        last_x = x
        hist = [m_new] + hist
        x = x_next
    return x


@pytest.mark.parametrize("order,corrector", [(2, True), (3, True),
                                             (3, False), (1, True)])
def test_unipc_matches_numpy_oracle(order, corrector):
    x_init = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    cfg = SamplerConfig(method="unipc", num_steps=10, injection=False,
                        final_blend=False, unipc_order=order,
                        unipc_corrector=corrector)
    out = inpaint_sample(_eps_apply_fn, SCHED, cfg,
                         gt=jnp.zeros(SHAPE), mask=jnp.ones(SHAPE[:-1] + (1,)),
                         key=jax.random.PRNGKey(1), x_init=x_init)
    oracle = _numpy_unipc_oracle(np.asarray(x_init), _eps_fn64, 10,
                                 order=order, corrector=corrector)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=3e-4)


def test_unip2_no_corrector_equals_dpm2m():
    """bh2 design point: UniP order-2 == DPM-Solver++(2M) on any grid."""
    x_init = jax.random.normal(jax.random.PRNGKey(9), SHAPE)
    for spacing in ("uniform", "lambda"):
        outs = []
        for method, kw in (("dpm++2m", {}),
                           ("unipc", {"unipc_order": 2,
                                      "unipc_corrector": False})):
            cfg = SamplerConfig(method=method, num_steps=12, injection=False,
                                final_blend=False, time_spacing=spacing, **kw)
            outs.append(np.asarray(inpaint_sample(
                _eps_apply_fn, SCHED, cfg, gt=jnp.zeros(SHAPE),
                mask=jnp.ones(SHAPE[:-1] + (1,)),
                key=jax.random.PRNGKey(1), x_init=x_init)))
        np.testing.assert_allclose(outs[1], outs[0], atol=1e-5, rtol=1e-5,
                                   err_msg=spacing)


def test_unipc_corrector_beats_dpm2m_at_same_nfe():
    """The corrector's extra order must show up as lower integrator error
    at equal NFE — else don't ship it.

    Truth: for the linear model eps = C*x the probability-flow ODE has a
    CLOSED FORM — with y = x/sigma, dy/dlam = (1 - C*sigma(lam))*y and
    integral(sigma dlam) = -asinh(e^-lam), so
        x_final = (x_init/alpha_0) * exp(-C * asinh(e^{-lam_0})).
    (A full-T DDIM rollout is NOT a valid truth here: it is itself a
    first-order discretization whose O(1/T) bias — measured ~24 MSE in
    this setup vs the exact solution — dominates and randomizes the
    solver comparison at K <= 20.)

    Measured landscape (uniform/lambda x K in {5..20}): order 2 +
    corrector beats dpm++2m at every K >= 8 on BOTH spacings (e.g.
    uniform-20: 6.7e-4 vs 3.8e-2); order 3 is erratic exactly like
    dpm++3m. Hence the shipped default unipc_order=2; asserted on the
    stable region.
    """
    C = 0.3
    betas = get_named_beta_schedule("linear", T)
    acp = np.cumprod(1.0 - betas)
    a0 = acp[T - 1]
    lam0 = 0.5 * (np.log(a0) - np.log1p(-a0))
    x_init = np.random.default_rng(7).standard_normal(SHAPE).astype(np.float32)
    truth = (x_init / np.sqrt(a0)) * np.exp(-C * np.arcsinh(np.exp(-lam0)))

    def apply_fn(x, t, masked_image, mask):
        eps = C * x
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    def run(method, K, spacing, **kw):
        cfg = SamplerConfig(method=method, num_steps=K, eta=0.0,
                            injection=False, final_blend=False,
                            clip_denoised=False, time_spacing=spacing, **kw)
        out = inpaint_sample(apply_fn, SCHED, cfg,
                             gt=jnp.zeros(SHAPE),
                             mask=jnp.ones(SHAPE[:-1] + (1,)),
                             key=jax.random.PRNGKey(1),
                             x_init=jnp.asarray(x_init))
        return float(np.mean((np.asarray(out, np.float64) - truth) ** 2))

    for spacing in ("uniform", "lambda"):
        for K in (10, 15, 20):
            err_2m = run("dpm++2m", K, spacing)
            err_uni = run("unipc", K, spacing)
            assert err_uni < err_2m, (spacing, K, err_uni, err_2m)
            # the corrector IS the difference: off == dpm++2m at order 2
            err_nc = run("unipc", K, spacing, unipc_corrector=False)
            np.testing.assert_allclose(err_nc, err_2m, rtol=1e-4)


def test_unipc_perfect_model_recovers_x0():
    x0 = jnp.clip(jax.random.normal(jax.random.PRNGKey(0), SHAPE) * 0.5, -1, 1)
    acp = jnp.asarray(_acp64(), jnp.float32)

    def apply_fn(x, t, masked_image, mask):
        a = acp[t][:, None, None, None]
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1 - a)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    cfg = SamplerConfig(method="unipc", num_steps=12, injection=False,
                        final_blend=False)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=x0,
                         mask=jnp.ones(SHAPE[:-1] + (1,)),
                         key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)


def test_unipc_injection_blend_determinism_and_guards():
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(2), SHAPE) * 0.5, -1, 1)
    mask = np.zeros(SHAPE[:-1] + (1,), np.float32)
    mask[:, 2:6, 2:6] = 1.0
    mask = jnp.asarray(mask)
    cfg = SamplerConfig(method="unipc", num_steps=8, injection=True)

    run = jax.jit(lambda k: inpaint_sample(
        _eps_apply_fn, SCHED, cfg, gt=gt, mask=mask, key=k))
    o1 = np.asarray(run(jax.random.PRNGKey(3)))
    o2 = np.asarray(run(jax.random.PRNGKey(3)))
    assert np.array_equal(o1, o2)
    assert np.isfinite(o1).all()
    keep = 1 - np.asarray(mask)
    np.testing.assert_allclose(o1 * keep, np.asarray(gt) * keep, atol=1e-6)

    with pytest.raises(ValueError, match="guidance"):
        inpaint_sample(_eps_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0), cond_fn=lambda x, t: x)
    with pytest.raises(ValueError, match="unipc_order"):
        inpaint_sample(_eps_apply_fn, SCHED,
                       dataclasses.replace(cfg, unipc_order=4), gt=gt,
                       mask=mask, key=jax.random.PRNGKey(0))


def test_unipc_unconditional_and_strength():
    def apply_fn(x, t):
        return 0.2 * x

    cfg = SamplerConfig(method="unipc", num_steps=8, injection=False)
    out = sample(apply_fn, SCHED, cfg, shape=SHAPE, key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    ref = jnp.clip(jax.random.normal(jax.random.PRNGKey(4), SHAPE) * 0.3, -1, 1)
    out = sample(apply_fn, SCHED,
                 dataclasses.replace(cfg, strength=0.4), shape=SHAPE,
                 key=jax.random.PRNGKey(1), x_init=ref)
    assert np.isfinite(np.asarray(out)).all()
