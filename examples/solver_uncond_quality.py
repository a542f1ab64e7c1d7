"""Solver-order study on UNCONDITIONAL toy generation (no injection anchor).

The analytic integrator study (tests/test_dpm_solver.py) shows dpm++3m
tracks the probability-flow ODE tightest; the inpainting toy
(solver_quality.py) shows per-step injection breaks its smoothness
assumption and 3M loses there. This closes the loop: does solver order
help ACTUAL generation quality where its assumptions hold? Unconditional
sampling of the sharp multimodal palette toy (same data/model as
toy_distillation_uncond.py), scored by proxy-FID against a large real set.

Run (TPU, ~10-20 min first time; teacher params cached):
    python examples/solver_uncond_quality.py
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from toy_distillation_uncond import BATCH, CFG, S, T, synth_batch

from fidm_tpu.diffusion import DiffusionSchedule, ModelMeanType
from fidm_tpu.metrics import RandomConvFeatureExtractor, fid_from_features
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.sampling import sample as uncond_sample
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

TEACH_STEPS = 1200
N_EVAL = 512
N_REAL = 2048
CACHE = "/tmp/fidm_uncond_solver_teacher.pkl"


def train_teacher(key, sched, model):
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    b0 = synth_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(make_lr_schedule("cosine", 3e-4, TEACH_STEPS, 50)),
    )
    step = make_train_step(sched, mean_type=ModelMeanType.VELOCITY)
    t0 = time.time()
    m = {}
    for i in range(TEACH_STEPS):
        state, m = step(state, synth_batch(jax.random.fold_in(key, i), BATCH),
                        jax.random.PRNGKey(1))
    print(f"teacher trained: loss={float(m['loss']):.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    params = jax.device_get(state.params)
    with open(CACHE, "wb") as f:
        pickle.dump(params, f)
    return params


def main():
    key = jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    teacher = jax.tree_util.tree_map(jnp.asarray,
                                     train_teacher(key, sched, model))

    extractor = RandomConvFeatureExtractor(image_size=S)
    real = synth_batch(jax.random.PRNGKey(555), N_REAL)["image"]
    real_feats = extractor(np.asarray((real + 1) / 2))
    zeros_mi = jnp.zeros((BATCH, S, S, 3))
    ones_m = jnp.ones((BATCH, S, S, 1))

    def apply_fn(x, t):
        return model.apply({"params": teacher}, x, t, zeros_mi, ones_m)

    def gen_fid(cfg, salt):
        feats = []
        for b in range(N_EVAL // BATCH):
            out = uncond_sample(
                apply_fn, sched, cfg, shape=(BATCH, S, S, 3),
                key=jax.random.fold_in(jax.random.PRNGKey(8), salt * 100 + b),
            )
            feats.append(extractor(np.asarray((jnp.clip(out, -1, 1) + 1) / 2)))
        return fid_from_features(real_feats, np.concatenate(feats))

    v = ModelMeanType.VELOCITY
    rows, salt = [], 0
    for K in (6, 8, 12, 16):
        for method in ("ddim", "dpm++2m", "dpm++3m"):
            for spacing in ("uniform", "lambda"):
                salt += 1
                cfg = SamplerConfig(method=method, num_steps=K, eta=0.0,
                                    injection=False, mean_type=v,
                                    time_spacing=spacing)
                fid = gen_fid(cfg, salt)
                rows.append((f"{method}-{K}/{spacing}", fid))
                print(f"{method}-{K}/{spacing:8s} proxy-FID {fid:7.2f}",
                      flush=True)

    best = min(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} at proxy-FID {best[1]:.2f}")
    assert np.isfinite([r[1] for r in rows]).all()


if __name__ == "__main__":
    main()
