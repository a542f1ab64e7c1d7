"""Progressive distillation demonstration on synthetic data (TPU, ~15 min).

Trains a v-prediction teacher, progressively distills 16 -> 8 -> 4 -> 2 DDIM
steps, and scores samplers by *distributional* quality: proxy-FID between
inpainted outputs and a large real set (PSNR is the wrong yardstick here —
few-step naive sampling degrades toward the blurry posterior mean, which
*raises* PSNR while destroying realism; distillation preserves the sharp
sample distribution at few steps).

Observed on this toy (recorded 2026-08-16, one v5e chip):
  teacher trained 600 steps; three distill rounds converge to loss ~8e-4;
  proxy-FID: teacher@16=1.79, teacher@4=1.76, student@4=1.72,
             teacher@2=1.75, student@2=1.74.
All samplers are statistically indistinguishable — per-step known-region
injection anchors this easy toy task so strongly that naive 2-step sampling
is already near-reference, leaving no gap for distillation to close. The
mechanism itself is verified by unit tests (tests/test_distill.py: the
distill target is exactly x0 under a perfect teacher; the loss converges on
a real UNet); its payoff is expected on hard, real-data distributions where
few-step naive sampling visibly degrades.

Run: python examples/toy_distillation.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from fidm_tpu.diffusion import DiffusionSchedule, ModelMeanType
from fidm_tpu.distill import distill_boundaries, make_distill_step
from fidm_tpu.metrics import RandomConvFeatureExtractor, fid_from_features
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

from toy_convergence import CFG, synth_batch

T = 200
TEACH_STEPS = 600
DISTILL_STEPS = 500
BATCH = 64
N_EVAL = 256
N_REAL = 1024


def main():
    key = jax.random.PRNGKey(0)
    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    b0 = synth_batch(key, 1)
    variables = model.init(key, b0["image"], jnp.zeros((1,), jnp.int32),
                           b0["masked_image"], b0["mask"])
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(make_lr_schedule("cosine", 3e-4, TEACH_STEPS, 50)),
    )
    step = make_train_step(sched, mean_type=ModelMeanType.VELOCITY)
    t0 = time.time()
    for i in range(TEACH_STEPS):
        state, m = step(state, synth_batch(jax.random.fold_in(key, i), BATCH),
                        jax.random.PRNGKey(1))
    print(f"teacher trained: loss={float(m['loss']):.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    teacher = state.params

    def apply(params, x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    # progressive ladder, keeping each stage's student
    students = {}
    cur, cur_steps = teacher, 16
    while cur_steps > 2:
        dstate = TrainState.create(
            apply_fn=None, params=cur,
            tx=make_optimizer(
                make_lr_schedule("cosine", 1e-4, DISTILL_STEPS, 30),
                weight_decay=0.0,
            ),
        )
        dstep = make_distill_step(
            sched, apply, apply, teacher_steps=cur_steps,
            teacher_mean_type=ModelMeanType.VELOCITY,
            student_mean_type=ModelMeanType.VELOCITY,
        )
        t0 = time.time()
        for i in range(DISTILL_STEPS):
            dstate, dm = dstep(
                dstate, cur,
                synth_batch(jax.random.fold_in(key, 10_000 * cur_steps + i),
                            BATCH),
                jax.random.PRNGKey(2),
            )
        cur = dstate.params
        cur_steps //= 2
        students[cur_steps] = cur
        print(f"distilled ->{cur_steps}: loss={float(dm['loss']):.5f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # ---- distributional evaluation: proxy-FID vs a large real set ----
    extractor = RandomConvFeatureExtractor(image_size=CFG.image_size)
    real = synth_batch(jax.random.PRNGKey(555), N_REAL)["image"]
    real_feats = extractor(np.asarray((real + 1) / 2))

    def grid_for(steps):
        return tuple(distill_boundaries(T, 2 * steps)[::2][:-1].tolist())

    def sample_fid(params, cfg, salt):
        feats = []
        for b in range(N_EVAL // BATCH):
            test = synth_batch(jax.random.fold_in(jax.random.PRNGKey(777),
                                                  salt * 100 + b), BATCH)
            out = inpaint_sample(
                lambda x, t, mi, m: apply(params, x, t, mi, m),
                sched, cfg, gt=test["image"], mask=test["mask"],
                key=jax.random.fold_in(jax.random.PRNGKey(8), b),
            )
            feats.append(extractor(np.asarray((jnp.clip(out, -1, 1) + 1) / 2)))
        return fid_from_features(real_feats, np.concatenate(feats))

    v = ModelMeanType.VELOCITY
    results = {
        "teacher@16": sample_fid(
            teacher, SamplerConfig("ddim", num_steps=16, eta=0.0,
                                   injection=True, mean_type=v), 1),
        "teacher@4": sample_fid(
            teacher, SamplerConfig("ddim", timesteps=grid_for(4), eta=0.0,
                                   injection=True, mean_type=v), 2),
        "student@4": sample_fid(
            students[4], SamplerConfig("ddim", timesteps=grid_for(4), eta=0.0,
                                       injection=True, mean_type=v), 3),
        "teacher@2": sample_fid(
            teacher, SamplerConfig("ddim", timesteps=grid_for(2), eta=0.0,
                                   injection=True, mean_type=v), 4),
        "student@2": sample_fid(
            students[2], SamplerConfig("ddim", timesteps=grid_for(2), eta=0.0,
                                       injection=True, mean_type=v), 5),
    }
    for k, fid in results.items():
        print(f"proxy-FID {k}: {fid:.2f}")
    # sanity: the distilled student must stay within noise of the reference
    # sampler (see module docstring for why this toy shows no separation)
    assert np.isfinite(list(results.values())).all()
    assert results["student@2"] <= results["teacher@16"] * 1.25, (
        "distilled 2-step student regressed far beyond the reference sampler"
    )
    print("DISTILLATION MECHANISM OK (see docstring for interpretation)")


if __name__ == "__main__":
    main()
