"""Consistency distillation measured where few-step sampling degrades:
UNCONDITIONAL generation of the sharp multimodal palette toy (the same
benchmark that demonstrated the progressive-distillation lever,
`toy_distillation_uncond.py`).

Question answered: can ONE consistency student sample at 1-4 steps what the
teacher needs 16 for — without progressive's ladder of 3 separate
distillation rounds? Scored by proxy-FID against a large real set.

Run (TPU, ~15-25 min): python examples/toy_consistency.py
With --ct: consistency TRAINING instead — the student starts from RANDOM
init and never evaluates a teacher (paper Alg. 3); the teacher is still
trained for the baseline rows only (~25-35 min).
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
from fidm_tpu.distill import consistency_sample, make_consistency_step
from fidm_tpu.metrics import RandomConvFeatureExtractor, fid_from_features
from fidm_tpu.models import InpaintingUNet, UNetConfig
from fidm_tpu.sampling import SamplerConfig
from fidm_tpu.sampling import sample as uncond_sample
from fidm_tpu.training import TrainState, make_optimizer, make_train_step
from fidm_tpu.training.lr import make_lr_schedule

# same toy as toy_distillation_uncond.py (keep results comparable)
from toy_distillation_uncond import CFG, S, T, synth_batch  # noqa: E402

TEACH_STEPS = 1200
CD_STEPS = 3000
BATCH = 128
N_EVAL = 512
N_REAL = 2048


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ct", action="store_true",
                    help="consistency TRAINING (no teacher, random init)")
    ap.add_argument("--steps", type=int, default=None,
                    help="distill/training steps (default: 3000 CD, 6000 CT)")
    cli = ap.parse_args()
    cd_steps = cli.steps or (6000 if cli.ct else CD_STEPS)

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

    # ---- consistency distillation (or, with --ct, consistency TRAINING:
    # random init, no teacher evaluations): ONE student, every step count ----
    if cli.ct:
        init = model.init(jax.random.PRNGKey(99), b0["image"],
                          jnp.zeros((1,), jnp.int32), b0["masked_image"],
                          b0["mask"])["params"]
    else:
        init = teacher
    cd_state = TrainState.create(
        apply_fn=None, params=init, ema_params=init,
        tx=make_optimizer(
            make_lr_schedule("cosine", 1e-4, cd_steps, 50), weight_decay=0.0),
    )
    cd_step = make_consistency_step(
        sched, None if cli.ct else apply, apply, grid_size=40,
        teacher_mean_type=ModelMeanType.VELOCITY,
        student_mean_type=ModelMeanType.VELOCITY,
        ema_decay=0.95,
    )
    t0 = time.time()
    for i in range(cd_steps):
        cd_state, cm = cd_step(
            cd_state, None if cli.ct else teacher,
            synth_batch(jax.random.fold_in(key, 777_000 + i), BATCH),
            jax.random.PRNGKey(2),
        )
        if (i + 1) % 1000 == 0:
            print(f"  {'ct' if cli.ct else 'cd'} step {i+1}: "
                  f"loss={float(cm['loss']):.5f}", flush=True)
    student = cd_state.ema_params  # the target network is the sampler
    print(f"{'consistency-trained' if cli.ct else 'consistency-distilled'}: "
          f"loss={float(cm['loss']):.5f} ({time.time()-t0:.0f}s)", flush=True)

    # ---- distributional evaluation: proxy-FID, same yardstick ----
    extractor = RandomConvFeatureExtractor(image_size=S)
    real = synth_batch(jax.random.PRNGKey(555), N_REAL)["image"]
    real_feats = extractor(np.asarray((real + 1) / 2))

    zeros_mi = jnp.zeros((BATCH, S, S, 3))
    ones_m = jnp.ones((BATCH, S, S, 1))
    v = ModelMeanType.VELOCITY

    def teacher_fid(steps, salt):
        def apply_fn(x, t):
            return apply(teacher, x, t, zeros_mi, ones_m)

        feats = []
        for b in range(N_EVAL // BATCH):
            out = uncond_sample(
                apply_fn, sched,
                SamplerConfig("ddim", num_steps=steps, eta=0.0,
                              injection=False, mean_type=v),
                shape=(BATCH, S, S, 3),
                key=jax.random.fold_in(jax.random.PRNGKey(8),
                                       salt * 100 + b),
            )
            feats.append(extractor(np.asarray((jnp.clip(out, -1, 1) + 1) / 2)))
        return fid_from_features(real_feats, np.concatenate(feats))

    def student_fid(steps, salt):
        def apply_fn(x, t):
            return apply(student, x, t, zeros_mi, ones_m)

        fn = jax.jit(lambda k: consistency_sample(
            apply_fn, sched, steps, (BATCH, S, S, 3), k, mean_type=v))
        feats = []
        for b in range(N_EVAL // BATCH):
            out = fn(jax.random.fold_in(jax.random.PRNGKey(9),
                                        salt * 100 + b))
            feats.append(extractor(np.asarray((jnp.clip(out, -1, 1) + 1) / 2)))
        return fid_from_features(real_feats, np.concatenate(feats))

    tag = "ct-student" if cli.ct else "cd-student"
    results = {
        "teacher@16 (ddim)": teacher_fid(16, 1),
        "teacher@2 (ddim)": teacher_fid(2, 2),
        "teacher@1 (ddim)": teacher_fid(1, 3),
        f"{tag}@4": student_fid(4, 4),
        f"{tag}@2": student_fid(2, 5),
        f"{tag}@1": student_fid(1, 6),
    }
    for k, fid in results.items():
        print(f"proxy-FID {k}: {fid:.2f}", flush=True)

    assert np.isfinite(list(results.values())).all()
    ref = results["teacher@16 (ddim)"]
    gap_naive = results["teacher@1 (ddim)"] - ref
    gap_cd = results[f"{tag}@1"] - ref
    print(f"teacher@1 degradation: +{gap_naive:.2f} proxy-FID; "
          f"{tag}@1: +{gap_cd:.2f}")
    print(("CONSISTENCY TRAINING" if cli.ct else
           "CONSISTENCY DISTILLATION") + (
        " SEPARATION DEMONSTRATED"
        if gap_naive > 0.5 and gap_cd < 0.5 * gap_naive
        else " RESULT RECORDED (see numbers above)"))


if __name__ == "__main__":
    main()
