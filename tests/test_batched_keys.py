"""Per-sample (batched) PRNG keys in the sampler.

The serving determinism contract: with one key per sample ([B, 2] raw
uint32 / [B] typed), every noise draw — init, per-step, injection — is
made independently per sample, so row i of a batched run equals the
batch-1 run with key i EXACTLY, regardless of batch composition
(sampling/sampler.py `_is_batched_key` et al.; serving/server.py builds
one key per request). A single unbatched key keeps the historical
whole-batch draws bit-for-bit (the numpy-oracle tests in test_sampler.py
anchor that path).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fidm_tpu.models import UNetConfig
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.serving.server import _request_keys

CFG = UNetConfig(
    image_size=16, in_channels=9, model_channels=32, out_channels=6,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=2, num_head_channels=16, dtype=jnp.float32,
)


def _randomize(variables, scale=0.05, seed=1):
    """Perturb ALL params — the zero-init out_conv would otherwise make the
    model output invisible and the test vacuous."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree_util.tree_unflatten(treedef, [
        l + scale * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)
    ])


def _pipe(sampler):
    pipe = InpaintingPipeline.create(PipelineConfig(unet=CFG, sampler=sampler))
    pipe.variables = _randomize(pipe.variables)
    return pipe


def _data(B=3):
    rng = np.random.default_rng(0)
    gt = np.clip(rng.standard_normal((B, 16, 16, 3)).astype(np.float32) * 0.4,
                 -1, 1)
    mask = np.zeros((B, 16, 16, 1), np.float32)
    mask[:, 4:12, 4:12] = 1.0
    return gt, mask


def test_request_keys_match_prngkey_layout():
    """The host-side key construction (serving/server.py:_request_keys) is
    bit-identical to jax.random.PRNGKey for every seed — the server's
    per-request keys ARE the keys a user would build themselves."""
    seeds = [0, 1, 12345, 2**31, 2**32 - 1]
    ours = _request_keys(seeds)
    for s, row in zip(seeds, ours):
        np.testing.assert_array_equal(row, np.asarray(jax.random.PRNGKey(s)))


SAMPLERS = {
    "ddim": SamplerConfig(method="ddim", num_steps=6, eta=0.9,
                          injection=True),
    "ddpm": SamplerConfig(method="ddpm", num_steps=6, injection=True),
    "dpm-sde": SamplerConfig(method="dpm++2m-sde", num_steps=6,
                             injection=True),
    "repaint": SamplerConfig(method="repaint", num_steps=6, jump_length=2,
                             jump_n_sample=2, injection=True),
    "ddim-deepcache": SamplerConfig(method="ddim", num_steps=6, eta=0.9,
                                    injection=True, encoder_cache_period=2,
                                    cache_branch=1),
}


@pytest.mark.parametrize("name", sorted(SAMPLERS))
def test_batched_key_rows_equal_solo_runs(name):
    """Row i of a batched run == the batch-1 run with key i: results are
    independent of batch composition (every stochastic sampler family +
    the DeepCache path)."""
    cfg = SAMPLERS[name]
    pipe = _pipe(cfg)
    gt, mask = _data(B=3)
    keys = _request_keys([5, 77, 901])

    batched = np.asarray(pipe.inpaint(gt, mask, keys))
    assert np.isfinite(batched).all()
    # every RNG draw is identical between the two runs; what remains is
    # batch-1 vs batch-3 conv reduction ordering (XLA tiles the shapes
    # differently), which the 2M multistep extrapolation amplifies — hence
    # the looser bound for the dpm solver (observed max ~1e-4 there,
    # <1e-5 everywhere else)
    tol = 5e-4 if name == "dpm-sde" else 1e-5
    for i in range(3):
        solo = np.asarray(
            pipe.inpaint(gt[i:i + 1], mask[i:i + 1], keys[i:i + 1]))
        np.testing.assert_allclose(batched[i], solo[0], rtol=tol, atol=tol)
    # distinct keys produce distinct hole content (the test isn't vacuous)
    hole = mask[0, ..., 0] > 0.5
    assert not np.array_equal(batched[0][hole], batched[1][hole])


def test_single_key_path_unchanged_and_distinct():
    """A plain unbatched key still works (historical whole-batch draws) and
    keys of either layout validate their batch dimension."""
    cfg = SAMPLERS["ddim"]
    pipe = _pipe(cfg)
    gt, mask = _data(B=2)
    out = np.asarray(pipe.inpaint(gt, mask, jax.random.PRNGKey(3)))
    assert np.isfinite(out).all()
    keep = mask[..., 0] < 0.5
    np.testing.assert_array_equal(out[keep], gt[keep])
    with pytest.raises(ValueError, match="key batch"):
        pipe.inpaint(gt, mask, _request_keys([1, 2, 3]))  # 3 keys, batch 2


def test_aot_programs_distinguish_key_layouts(tmp_path):
    """A program compiled for a single key never loads/dispatches for
    batched keys (and vice versa): exact-shape executables with mismatched
    key inputs would fail at execution time."""
    from fidm_tpu.serving import aot

    cfg = SAMPLERS["ddim"]
    pipe1 = _pipe(cfg)
    gt, mask = _data(B=1)
    keys = _request_keys([9])

    assert aot.save_programs(pipe1, str(tmp_path), [1], batched_key=True) == 1
    # the single-key layout is a DIFFERENT artifact (own fingerprint)
    assert aot.load_programs(pipe1, str(tmp_path), [1], batched_key=False) == 0

    pipe2 = InpaintingPipeline(pipe1.model, pipe1.variables, pipe1.sched,
                               pipe1.config)
    assert aot.load_programs(pipe2, str(tmp_path), [1], batched_key=True) == 1
    out = np.asarray(pipe2.inpaint(gt, mask, keys))
    assert not pipe2._jitted  # dispatched to the AOT program, no jit
    np.testing.assert_array_equal(out, np.asarray(pipe1.inpaint(gt, mask,
                                                                keys)))
    # a single-key call on the same pipeline takes the jit path (the
    # batched-key AOT program must not capture it)
    out_single = np.asarray(pipe2.inpaint(gt, mask, jax.random.PRNGKey(9)))
    assert len(pipe2._jitted) == 1
    assert np.isfinite(out_single).all()
