"""Refinement / partial diffusion (SamplerConfig.strength, SDEdit-style).

strength < 1 truncates the timestep grid to its last round(strength * K)
entries and starts from the CLEAN input q_sampled to the kept grid's first
timestep — harmonizing existing hole content instead of sampling from pure
noise (arXiv:2108.01073; no reference equivalent — its only partial-chain
machinery is step subsetting from full noise).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import UNetConfig
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.sampling.sampler import _respaced_seq, host_alphas_cumprod

CFG = PipelineConfig(
    unet=UNetConfig(
        image_size=16, in_channels=9, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=2, num_head_channels=16, dtype=jnp.float32,
    ),
    schedule="linear", num_timesteps=100,
    sampler=SamplerConfig(method="ddim", num_steps=10, eta=0.0,
                          injection=True),
)


@pytest.fixture(scope="module")
def pipe():
    return InpaintingPipeline.create(CFG)


def _data(B=2, fill=True):
    rng = np.random.default_rng(0)
    gt = np.clip(rng.standard_normal((B, 16, 16, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    mask = np.zeros((B, 16, 16, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    # gt carries hole CONTENT (the refinement contract) — here the true
    # pixels, i.e. a perfect init the sampler should roughly preserve
    return gt, mask


def test_grid_truncation():
    sched = DiffusionSchedule.create("linear", 100)
    acp = host_alphas_cumprod(sched)
    base = SamplerConfig(method="ddim", num_steps=10)
    full = _respaced_seq(sched, base, acp)
    half = _respaced_seq(sched, dataclasses.replace(base, strength=0.5), acp)
    k = max(1, int(round(0.5 * len(full))))
    assert len(half) == k
    np.testing.assert_array_equal(half, full[-k:])  # the LOW-t tail
    tiny = _respaced_seq(sched, dataclasses.replace(base, strength=0.01), acp)
    assert len(tiny) == 1 and tiny[0] == full[-1]
    with pytest.raises(ValueError, match="strength"):
        _respaced_seq(sched, dataclasses.replace(base, strength=0.0), acp)
    with pytest.raises(ValueError, match="strength"):
        _respaced_seq(sched, dataclasses.replace(base, strength=1.5), acp)


def test_strength_one_is_plain_sampling(pipe):
    gt, mask = _data()
    key = jax.random.PRNGKey(0)
    a = np.asarray(pipe.inpaint(gt, mask, key))
    b = np.asarray(pipe.inpaint(gt, mask, key, strength=1.0))
    np.testing.assert_array_equal(a, b)


def test_refinement_preserves_good_init_monotonically(pipe):
    """With a perfect init (gt itself), hole error grows with strength:
    small strength = light harmonization pass, large = mostly resampled.
    (The fixture model's zero-init out_conv makes eta=0 DDIM telescope, so
    the residual is exactly the injected init noise — scaled by
    sqrt((1-a0)/a0), monotone in the start timestep.)"""
    gt, mask = _data()
    key = jax.random.PRNGKey(7)
    errs = []
    for s in (0.1, 0.5, 0.9):
        out = np.asarray(pipe.inpaint(gt, mask, key, strength=s))
        keep = mask[..., 0] < 0.5
        np.testing.assert_array_equal(out[keep], gt[keep])  # blend contract
        hole = mask > 0.5
        errs.append(float(np.mean((out - gt)[np.broadcast_to(hole,
                                                             out.shape)] ** 2)))
        assert np.isfinite(out).all()
    assert errs[0] < errs[1] < errs[2], errs


def test_refinement_deterministic_and_key_batched(pipe):
    from fidm_tpu.serving.server import _request_keys

    gt, mask = _data()
    keys = _request_keys([3, 9])
    a = np.asarray(pipe.inpaint(gt, mask, keys, strength=0.4))
    b = np.asarray(pipe.inpaint(gt, mask, keys, strength=0.4))
    np.testing.assert_array_equal(a, b)
    solo = np.asarray(pipe.inpaint(gt[1:], mask[1:], keys[1:], strength=0.4))
    np.testing.assert_allclose(a[1], solo[0], rtol=1e-5, atol=1e-5)


def test_strength_composes_with_deepcache(pipe):
    """strength truncation and deep-trunk caching share the grid: the tail
    logic counts from the TRUNCATED K, and the combined program keeps
    every contract (finite, known pixels exact)."""
    gt, mask = _data()
    cfg = dataclasses.replace(
        CFG.sampler, strength=0.5, encoder_cache_period=2, cache_branch=1,
        encoder_cache_tail=2)
    out = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(1),
                                  sampler=cfg))
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    assert np.isfinite(out).all()


def test_strength_validation(pipe):
    gt, mask = _data()
    key = jax.random.PRNGKey(0)
    repaint = SamplerConfig(method="repaint", num_steps=10, jump_length=2,
                            jump_n_sample=2, strength=0.5)
    with pytest.raises(ValueError, match="strength"):
        pipe.inpaint(gt, mask, key, sampler=repaint)
    from fidm_tpu.sampling import sample

    with pytest.raises(ValueError, match="x_init"):
        sample(lambda x, t: jnp.zeros(x.shape[:-1] + (6,)), pipe.sched,
               SamplerConfig(method="ddim", num_steps=4, strength=0.5),
               shape=(1, 16, 16, 3), key=key)
