"""Tests for SamplerConfig.trajectory_every — the progressive-sampling API
(reference `gaussian_diffusion.py:415-445,508-538`: `*_loop_progressive`
yield every intermediate state; ours emits every k-th scan state into a
fixed device buffer).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule, ddim_timestep_sequence
from fidm_tpu.sampling import SamplerConfig, inpaint_sample, sample

T = 50
SCHED = DiffusionSchedule.create("linear", T)
SHAPE = (2, 8, 8, 3)


def _apply_fn(x, t, masked_image, mask):
    eps = 0.3 * x + 0.01 * t[:, None, None, None].astype(jnp.float32)
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)


def _gt_mask():
    gt = jnp.clip(jax.random.normal(jax.random.PRNGKey(3), SHAPE), -1, 1)
    mask = jnp.zeros(SHAPE[:-1] + (1,)).at[:, 2:5, 2:5].set(1.0)
    return gt, mask


def test_trajectory_shape_and_final_frame():
    """N = (K-1)//k + 1 frames (K = actual respaced length — the uniform
    spacing appends T-1 when off-grid, reference semantics); last frame is
    the pre-blend final state."""
    gt, mask = _gt_mask()
    for k, steps in ((1, 10), (3, 10), (3, 9), (5, 7)):
        K = len(ddim_timestep_sequence(T, steps))
        cfg = SamplerConfig(method="ddim", num_steps=steps, eta=0.9,
                            injection=True, trajectory_every=k)
        out, traj = inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                                   key=jax.random.PRNGKey(0))
        assert traj.shape == ((K - 1) // k + 1,) + SHAPE, (k, steps)
        # final output = last frame with the final blend applied
        blended = traj[-1] * mask + gt * (1 - mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(blended),
                                   atol=1e-6)


def test_trajectory_subsampling_matches_every_step():
    """frames@k == frames@1 taken at steps k-1, 2k-1, ..., plus the last."""
    gt, mask = _gt_mask()
    k = 3
    K = len(ddim_timestep_sequence(T, 10))
    base = SamplerConfig(method="ddim", num_steps=10, eta=0.9, injection=True)
    _, full = inpaint_sample(
        _apply_fn, SCHED, dataclasses.replace(base, trajectory_every=1),
        gt=gt, mask=mask, key=jax.random.PRNGKey(0))
    _, sub = inpaint_sample(
        _apply_fn, SCHED, dataclasses.replace(base, trajectory_every=k),
        gt=gt, mask=mask, key=jax.random.PRNGKey(0))
    idx = list(range(k - 1, K, k))
    if idx[-1] != K - 1:
        idx.append(K - 1)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full)[idx],
                               atol=1e-6)


def test_trajectory_frame_resumes_split_run():
    """Frame j of a full run, fed back as x_init with the remaining timestep
    grid, reproduces the tail of the trajectory — the frames really are the
    scan states (the '2-call split run' parity of VERDICT round 2 #6).
    Deterministic DDIM; injection noise is keyed by timestep (not step
    index), so the same key reproduces it in the resumed run."""
    gt, mask = _gt_mask()
    K, j = 10, 4
    key = jax.random.PRNGKey(11)
    seq = ddim_timestep_sequence(T, K)
    cfg = SamplerConfig(method="ddim", num_steps=K, eta=0.0, injection=True,
                        final_blend=False, trajectory_every=1)
    out_a, traj_a = inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                                   key=key)
    cfg_b = dataclasses.replace(cfg, num_steps=None,
                                timesteps=tuple(int(t) for t in seq[j + 1:]))
    out_b, traj_b = inpaint_sample(_apply_fn, SCHED, cfg_b, gt=gt, mask=mask,
                                   key=key, x_init=traj_a[j])
    np.testing.assert_allclose(np.asarray(traj_b),
                               np.asarray(traj_a)[j + 1:], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_a),
                               atol=1e-5)


def test_trajectory_all_methods_run():
    gt, mask = _gt_mask()
    for method, extra in (("ddpm", {}), ("dpm++2m", {}), ("dpm++3m", {}),
                          ("repaint", {"jump_length": 2, "jump_n_sample": 2})):
        cfg = SamplerConfig(method=method, num_steps=6, injection=True,
                            trajectory_every=2, **extra)
        out, traj = inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                                   key=jax.random.PRNGKey(0))
        assert traj.ndim == 5 and traj.shape[1:] == SHAPE
        assert np.isfinite(np.asarray(traj)).all(), method
        # repaint visits more transitions than num_steps
        if method != "repaint":
            K = len(ddim_timestep_sequence(T, 6))
            assert traj.shape[0] == (K - 1) // 2 + 1


def test_trajectory_with_encoder_cache():
    """The cached-scan body records frames too."""
    gt, mask = _gt_mask()

    def full_fn(x, t, mi, m):
        return _apply_fn(x, t, mi, m), x.mean(axis=(1, 2, 3))

    def cached_fn(x, t, mi, m, cache):
        return _apply_fn(x, t, mi, m)

    cfg = SamplerConfig(method="ddim", num_steps=8, eta=0.0, injection=True,
                        encoder_cache_period=2, trajectory_every=4)
    out, traj = inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                               key=jax.random.PRNGKey(0),
                               cache_apply=(full_fn, cached_fn))
    K = len(ddim_timestep_sequence(T, 8))
    assert traj.shape == ((K - 1) // 4 + 1,) + SHAPE
    blended = traj[-1] * mask + gt * (1 - mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(blended),
                               atol=1e-6)


def test_trajectory_unconditional_sample():
    def apply_fn(x, t):
        eps = 0.3 * x
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=-1)

    for method in ("ddim", "ddpm", "repaint"):
        cfg = SamplerConfig(method=method, num_steps=6, injection=False,
                            trajectory_every=2, jump_length=2,
                            jump_n_sample=2)
        out, traj = sample(apply_fn, SCHED, cfg, shape=SHAPE,
                           key=jax.random.PRNGKey(0))
        assert traj.ndim == 5 and traj.shape[1:] == SHAPE
        np.testing.assert_allclose(np.asarray(out), np.asarray(traj[-1]),
                                   atol=1e-6)


def test_trajectory_off_returns_array():
    gt, mask = _gt_mask()
    cfg = SamplerConfig(method="ddim", num_steps=5, injection=True)
    out = inpaint_sample(_apply_fn, SCHED, cfg, gt=gt, mask=mask,
                         key=jax.random.PRNGKey(0))
    assert isinstance(out, jax.Array) and out.shape == SHAPE


def test_pipeline_validates_cache_branch():
    """ADVICE r2: cache_branch must be rejected at config time when it would
    be silently ignored (period <= 1) or out of range for the UNet."""
    from fidm_tpu.pipeline import InpaintingPipeline
    from test_pipeline import TINY

    pipe = InpaintingPipeline.create(TINY)
    gt = jnp.zeros((1, 16, 16, 3))
    mask = jnp.ones((1, 16, 16, 1))
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="no effect"):
        pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
            method="ddim", num_steps=4, cache_branch=1))
    # TINY has channel_mult=(1, 2): only branch 1 is legal
    with pytest.raises(ValueError, match="cache_branch must be"):
        pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
            method="ddim", num_steps=4, encoder_cache_period=2,
            cache_branch=2))
