"""Consistency distillation measured on the PRODUCT task: inpainting.

The unconditional study (`toy_consistency.py`) proved the lever on raw
generation; this one asks what a consistency student buys for
*mask-conditioned inpainting* — the reference's actual workload — by
distilling the trained toy inpainting UNet (`toy_convergence.train_toy`,
cached) and scoring hole-region PSNR at 1/2/4 steps against the teacher's
DDIM ladder, on both easy box masks and hard irregular brush masks.

Run (TPU, ~10-15 min warm cache): python examples/toy_consistency_inpaint.py
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from examples.toy_convergence import BATCH, CFG, T, synth_batch, train_toy
from fidm_tpu.diffusion import DiffusionSchedule, ModelMeanType
from fidm_tpu.distill import make_consistency_step
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample
from fidm_tpu.training import TrainState, make_optimizer
from fidm_tpu.training.lr import make_lr_schedule


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=3000)
    p.add_argument("--cd_steps", type=int, default=3000)
    p.add_argument("--cache", default="/tmp/fidm_toy_params_{}.pkl")
    args = p.parse_args()

    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    teacher, _, _ = train_toy(args.train_steps,
                              args.cache.format(args.train_steps))

    def apply(params, x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    # ---- consistency-distill the inpainting teacher (eps -> velocity);
    # the CD batches carry the same masked_image/mask conditioning the
    # teacher trained with, so the student learns the conditional map ----
    key = jax.random.PRNGKey(0)
    cd_state = TrainState.create(
        apply_fn=None, params=teacher, ema_params=teacher,
        tx=make_optimizer(
            make_lr_schedule("cosine", 1e-4, args.cd_steps, 50),
            weight_decay=0.0),
    )
    cd_step = make_consistency_step(
        sched, apply, apply, grid_size=40,
        teacher_mean_type=ModelMeanType.EPSILON,
        student_mean_type=ModelMeanType.VELOCITY,
        ema_decay=0.95,
    )
    t0 = time.time()
    for i in range(args.cd_steps):
        cd_state, cm = cd_step(
            cd_state, teacher,
            synth_batch(jax.random.fold_in(key, 50_000 + i), BATCH),
            jax.random.PRNGKey(2),
        )
    student = cd_state.ema_params
    print(f"consistency-distilled: loss={float(cm['loss']):.5f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- hole-PSNR on held-out images, box + brush masks ----
    def eval_set(name, test):
        hole = test["mask"]
        gt01 = (test["image"] + 1) / 2

        def hole_psnr(params, cfg):
            out = inpaint_sample(
                lambda x, t, mi, m: apply(params, x, t, mi, m),
                sched, cfg, gt=test["image"], mask=test["mask"],
                key=jax.random.PRNGKey(7))
            out01 = (jnp.clip(out, -1, 1) + 1) / 2
            mse = float((((out01 - gt01) ** 2) * hole).sum()
                        / (hole.sum() * 3))
            return 10 * np.log10(1.0 / mse)

        rows = {}
        for K in (12, 4, 2, 1):
            rows[f"teacher ddim-{K}"] = hole_psnr(
                teacher, SamplerConfig("ddim", num_steps=K, eta=0.0,
                                       injection=True))
        for K in (4, 2, 1):
            rows[f"cd-student consistency-{K}"] = hole_psnr(
                student, SamplerConfig("consistency", num_steps=K,
                                       injection=True,
                                       mean_type=ModelMeanType.VELOCITY))
        print(f"\n[{name}]")
        for k, v in rows.items():
            print(f"  {k:28s} {v:6.2f} dB hole-PSNR", flush=True)
        return rows

    test = synth_batch(jax.random.PRNGKey(999), 16)
    box = eval_set("box masks", test)

    from fidm_tpu.data.masks import random_brush_mask

    rng = np.random.default_rng(3)
    S = test["image"].shape[1]
    brush = np.stack([random_brush_mask(rng, S, coverage=(0.25, 0.45))
                      for _ in range(16)])
    test_b = dict(test)
    test_b["mask"] = jnp.asarray(brush.reshape(16, S, S, 1), jnp.float32)
    test_b["masked_image"] = test["image"] * (1 - test_b["mask"])
    brush_rows = eval_set("brush masks", test_b)

    for rows in (box, brush_rows):
        assert np.isfinite(list(rows.values())).all()
    d1 = box["cd-student consistency-1"] - box["teacher ddim-1"]
    d2 = box["cd-student consistency-2"] - box["teacher ddim-2"]
    print(f"\nstudent-vs-teacher at matched evals (box): "
          f"+{d1:.2f} dB @1, +{d2:.2f} dB @2")


if __name__ == "__main__":
    main()
