"""Tests for RePaint time-travel resampling (method="repaint").

The reference's per-step injection (`gaussian_diffusion.py:114-157`) is
RePaint's conditioning step; `method="repaint"` adds the resampling walk
(arXiv:2201.09865 §4.2) the reference lacks. Oracle: a float64 numpy
re-implementation of the walk with the noise terms suppressed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule, ModelVarType
from fidm_tpu.diffusion.schedules import (
    ddim_timestep_sequence,
    get_named_beta_schedule,
)
from fidm_tpu.sampling import (
    SamplerConfig,
    inpaint_sample,
    repaint_level_sequence,
    sample,
)

T = 50
SCHED = DiffusionSchedule.create("linear", T)
SHAPE = (2, 8, 8, 3)


def _acp64():
    betas = get_named_beta_schedule("linear", T)
    return np.cumprod(1.0 - betas)


# ---------------------------------------------------------------- schedule

def test_level_sequence_degenerates_without_resampling():
    np.testing.assert_array_equal(repaint_level_sequence(10, 3, 1),
                                  np.arange(10))
    np.testing.assert_array_equal(repaint_level_sequence(10, 0, 5),
                                  np.arange(10))
    np.testing.assert_array_equal(repaint_level_sequence(1, 3, 5),
                                  np.arange(1))


def test_level_sequence_walk_properties():
    K, j, r = 20, 4, 3
    lv = repaint_level_sequence(K, j, r)
    assert lv[0] == 0 and lv[-1] == K - 1
    assert lv.min() >= 0 and lv.max() <= K - 1
    d = np.diff(lv)
    assert set(np.unique(d)) <= {-1, 1}, "walk moves one level at a time"
    # every level is visited; jump segments are revisited
    assert set(lv.tolist()) == set(range(K))
    # denoise-transition count: K-1 walk steps + (r-1)*j per jump site
    n_sites = len(range(j, K, j))
    assert (d == 1).sum() == (K - 1) + n_sites * (r - 1) * j
    assert (d == -1).sum() == n_sites * (r - 1) * j


def test_level_sequence_paper_scale():
    # the paper's T=250, j=10, r=10 recipe: ~2400 denoise steps
    lv = repaint_level_sequence(250, 10, 10)
    denoise = (np.diff(lv) == 1).sum() + 1  # + final step to x0
    assert denoise == 250 + 24 * 9 * 10


# ---------------------------------------------------------------- sampler

def _toy_apply(x, t, mi, m):
    tt = t[:, None, None, None] / T
    eps = 0.3 * x + 0.05 * tt
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)


def test_repaint_r1_bitwise_equals_ddpm():
    """jump_n_sample=1 must reproduce plain (respaced) DDPM bit-for-bit:
    identical tables, identical noise keys."""
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(7), SHAPE) * 0.4, -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, 2:6, 2:6].set(1.0)
    for steps in (None, 10):
        a = inpaint_sample(_toy_apply, SCHED,
                           SamplerConfig(method="ddpm", num_steps=steps,
                                         injection=True),
                           gt=gt, mask=mask, key=jax.random.PRNGKey(0))
        b = inpaint_sample(_toy_apply, SCHED,
                           SamplerConfig(method="repaint", num_steps=steps,
                                         jump_n_sample=1, injection=True),
                           gt=gt, mask=mask, key=jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_repaint_known_pixels_preserved_and_finite():
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(1), SHAPE) * 0.4, -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, 2:6, 2:6].set(1.0)
    cfg = SamplerConfig(method="repaint", num_steps=12, jump_length=3,
                        jump_n_sample=3, injection=True)
    out = np.asarray(inpaint_sample(_toy_apply, SCHED, cfg, gt=gt, mask=mask,
                                    key=jax.random.PRNGKey(2)))
    keep = np.asarray(mask)[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], np.asarray(gt)[keep])
    assert np.isfinite(out).all()


def test_repaint_determinism_and_key_sensitivity():
    gt = jnp.zeros(SHAPE)
    mask = jnp.ones(SHAPE[:-1] + (1,))
    cfg = SamplerConfig(method="repaint", num_steps=10, jump_length=4,
                        jump_n_sample=2, injection=False, final_blend=False)
    a = inpaint_sample(_toy_apply, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    b = inpaint_sample(_toy_apply, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(0))
    c = inpaint_sample(_toy_apply, SCHED, cfg, gt=gt, mask=mask,
                       key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_repaint_model_called_only_on_denoise_steps():
    calls = []

    def apply_fn(x, t, mi, m):
        calls.append(int(t[0]))
        return jnp.concatenate([jnp.zeros_like(x)] * 2, axis=-1)

    K, j, r = 10, 3, 2
    cfg = SamplerConfig(method="repaint", num_steps=K, jump_length=j,
                        jump_n_sample=r, injection=True)
    with jax.disable_jit():
        inpaint_sample(apply_fn, SCHED, cfg, gt=jnp.zeros((1, 8, 8, 3)),
                       mask=jnp.ones((1, 8, 8, 1)), key=jax.random.PRNGKey(0))
    lv = repaint_level_sequence(len(ddim_timestep_sequence(T, K)), j, r)
    expected = (np.diff(lv) == 1).sum() + 1  # + final step to x0
    assert len(calls) == expected


def test_repaint_matches_numpy_oracle():
    """The full time-travel walk against a float64 numpy loop.

    Denoise steps follow the respaced posterior mean path (ancestral noise
    suppressed via a huge negative LEARNED log-variance); renoise steps use
    the exact same normals as the device walk by replicating its
    `fold_in(step_key, step)` key sequence on the host.
    """
    K, j, r = 8, 2, 2
    acp = _acp64()
    seq = ddim_timestep_sequence(T, K)
    lv = repaint_level_sequence(len(seq), j, r)
    cur = np.append(lv[:-1], len(seq) - 1)
    nxt = np.append(lv[1:], len(seq))

    x_init = np.random.default_rng(5).standard_normal(SHAPE).astype(np.float32)
    key = jax.random.PRNGKey(9)
    _, step_key, _ = jax.random.split(key, 3)  # inpaint_sample's split

    x = x_init.astype(np.float64)
    for i, (a, b) in enumerate(zip(cur, nxt)):
        if b == a + 1:  # denoise (mean path; logvar -> -inf)
            a_cur = acp[seq[a]]
            a_prev = acp[seq[b]] if b < len(seq) else 1.0
            beta_r = 1 - a_cur / a_prev
            t = seq[a]
            eps = 0.3 * x + 0.05 * (t / T)
            x0 = np.clip((x - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur), -1, 1)
            c1 = beta_r * np.sqrt(a_prev) / (1 - a_cur)
            c2 = (1 - a_prev) * np.sqrt(1 - beta_r) / (1 - a_cur)
            x = c1 * x0 + c2 * x
        else:  # renoise: same normals as the device walk (fold_in by step)
            ratio = acp[seq[b]] / acp[seq[a]]
            z = np.asarray(
                jax.random.normal(jax.random.fold_in(step_key, i), SHAPE),
                np.float64,
            )
            x = np.sqrt(ratio) * x + np.sqrt(1 - ratio) * z

    def apply_fn(xx, t, mi, m):
        tt = t[:, None, None, None] / T
        eps = 0.3 * xx + 0.05 * tt
        return jnp.concatenate([eps, jnp.full_like(eps, -60.0)], axis=-1)

    cfg = SamplerConfig(method="repaint", num_steps=K, jump_length=j,
                        jump_n_sample=r, injection=False, final_blend=False,
                        var_type=ModelVarType.LEARNED)
    out = inpaint_sample(apply_fn, SCHED, cfg, gt=jnp.zeros(SHAPE),
                         mask=jnp.ones(SHAPE[:-1] + (1,)), key=key,
                         x_init=jnp.asarray(x_init))
    np.testing.assert_allclose(np.asarray(out, np.float64), x, atol=5e-4)


def test_repaint_unconditional_sample_runs():
    def apply_fn(x, t):
        eps = 0.1 * x
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    cfg = SamplerConfig(method="repaint", num_steps=8, jump_length=3,
                        jump_n_sample=2)
    out = sample(apply_fn, SCHED, cfg, shape=SHAPE, key=jax.random.PRNGKey(0))
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()


def test_repaint_rejects_encoder_cache():
    cfg = SamplerConfig(method="repaint", num_steps=8, encoder_cache_period=2)
    with pytest.raises(ValueError, match="encoder_cache"):
        inpaint_sample(_toy_apply, SCHED, cfg, gt=jnp.zeros(SHAPE),
                       mask=jnp.ones(SHAPE[:-1] + (1,)),
                       key=jax.random.PRNGKey(0))


def test_repaint_jit_compiles_whole_walk():
    gt = jnp.zeros(SHAPE)
    mask = jnp.ones(SHAPE[:-1] + (1,))
    cfg = SamplerConfig(method="repaint", num_steps=10, jump_length=5,
                        jump_n_sample=2, injection=True)

    @jax.jit
    def run(key):
        return inpaint_sample(_toy_apply, SCHED, cfg, gt=gt, mask=mask,
                              key=key)

    out = run(jax.random.PRNGKey(0))
    assert out.shape == SHAPE
