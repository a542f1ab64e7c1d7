"""Consistency distillation at CANONICAL depth and PRODUCTION width.

VERDICT r4 weak #3: the serving fast tier (consistency-1, p50 0.084 s)
advertised quality measured only on a 3-level toy; the round-4 lesson is
that capacity transfer fails. This study distills a consistency student
from the width-128 (default; --width for the 64 variant) 6-level canonical
teacher (`canonical_frontier.train_canonical` cache) and scores the
teacher's DDIM ladder vs the student's consistency-1/-2/-4 on the product
task — masked inpainting with injection, box + brush protocols, the
round-5 three-metric scoring (hole-PSNR / hole-SSIM / LPIPS-proxy).

eps -> velocity re-parameterization (the toy protocol,
examples/toy_consistency_inpaint.py): the student is initialized FROM the
teacher and trained with the EMA target network; sampling uses the
`consistency-K` preset semantics (first K boundaries of the 40-point
training grid — NOT uniform DDIM respacing).

Run (TPU; teacher cache hit => ~30-45 min dominated by the CD-step
compile + cd_steps):
    python examples/canonical_consistency.py
    python examples/canonical_consistency.py --smoke   # tiny CPU smoke
Results stream to /tmp/canonical_consistency*.json.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__) or ".")

import argparse
import json
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from canonical_frontier import (add_deltas, brush_bank, make_box_masks,
                                make_quality_fns, make_synth_face,
                                train_canonical)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--steps", type=int, default=6000,
                   help="teacher training steps (cache key)")
    p.add_argument("--cd_steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=128)
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fidm_tpu.diffusion import DiffusionSchedule, ModelMeanType
    from fidm_tpu.distill import make_consistency_step
    from fidm_tpu.models import ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.training import TrainState, make_optimizer
    from fidm_tpu.training.lr import make_lr_schedule

    if args.smoke:
        S, T, steps, cd_steps, batch, n_eval, grid = 64, 50, 3, 5, 2, 2, 8
        cache_path = student_path = None
    else:
        S, T, steps, cd_steps, batch, n_eval, grid = (
            256, 1000, args.steps, args.cd_steps, args.batch, 16, 40)
        cache_path = f"/tmp/fidm_canon{args.width}.pkl"
        student_path = f"/tmp/fidm_canon{args.width}_cd{cd_steps}.pkl"

    width = 32 if args.smoke else args.width  # smoke: keep CPU compiles short
    cfg = ffhq256_config(image_size=S, model_channels=width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, teacher = train_canonical(cfg, sched, steps, batch, cache_path)

    def apply(params, x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    # ---- distill (or load the cached student) ----
    synth = make_synth_face(S)
    bank = brush_bank(S, 64)

    def make_batch(key, n):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        img = jax.vmap(synth)(jax.random.split(k1, n))
        box = make_box_masks(k2, n, S)
        idx = jax.random.randint(k3, (n,), 0, bank.shape[0])
        use_brush = jax.random.bernoulli(k4, 0.5, (n,))
        mask = jnp.where(use_brush[:, None, None, None], bank[idx], box)
        return {"image": img, "masked_image": img * (1 - mask), "mask": mask}

    student = None
    if student_path and os.path.exists(student_path):
        with open(student_path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("cd_steps") == cd_steps and blob.get("width") == args.width:
            print(f"loaded CD student from {student_path}", flush=True)
            student = jax.tree_util.tree_map(jnp.asarray, blob["params"])
    if student is None:
        cd_state = TrainState.create(
            apply_fn=None, params=teacher, ema_params=teacher,
            tx=make_optimizer(
                make_lr_schedule("cosine", 1e-4, cd_steps, 50),
                weight_decay=0.0))
        cd_step = make_consistency_step(
            sched, apply, apply, grid_size=grid,
            teacher_mean_type=ModelMeanType.EPSILON,
            student_mean_type=ModelMeanType.VELOCITY,
            ema_decay=0.95)

        # fuse data generation into the step (batches never cross the
        # tunnel); fold the loop index into the data AND noise keys.
        # teacher MUST be an argument, not a closure capture: captured
        # params trace as CONSTANTS and the 374 MB (width-128) constant
        # blob overflows the remote-compile tunnel's request-body limit
        # (HTTP 413 — a real failure this script hit)
        @jax.jit
        def gen_and_cd(state, teacher_params, key):
            i = state.step
            b = make_batch(jax.random.fold_in(key, 90_000 + i), batch)
            return cd_step(state, teacher_params, b,
                           jax.random.fold_in(key, 50_000 + i))

        key = jax.random.PRNGKey(11)
        t0 = time.time()
        for i in range(cd_steps):
            cd_state, cm = gen_and_cd(cd_state, teacher, key)
            if i % 500 == 0 or i == cd_steps - 1:
                print(f"cd step {i}: loss={float(cm['loss']):.5f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        student = cd_state.ema_params
        if student_path:
            with open(student_path, "wb") as f:
                pickle.dump({"cd_steps": cd_steps, "width": args.width,
                             "params": jax.tree_util.tree_map(
                                 np.asarray, student)}, f)
            print(f"saved CD student to {student_path}", flush=True)

    # ---- evaluate: teacher ladder vs student, both mask protocols ----
    pcfg = PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T)
    t_pipe = InpaintingPipeline(model, {"params": teacher}, sched, pcfg)
    s_pipe = InpaintingPipeline(model, {"params": student}, sched, pcfg)

    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {"box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
             "brush": brush_bank(S, n_eval, seed=123, coverage=(0.25, 0.45))}
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    out_path = ("/tmp/canonical_consistency_smoke.json" if args.smoke
                else f"/tmp/canonical_consistency_w{args.width}.json")
    results = {"width": args.width, "cd_steps": cd_steps, "S": S, "rows": []}

    def emit(row):
        results["rows"].append(row)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(row), flush=True)

    K_ANCHOR = 10 if args.smoke else 100
    ladder = [1, 2] if args.smoke else [1, 2, 4]
    anchor_cfg = SamplerConfig(method="ddim", num_steps=K_ANCHOR, eta=0.9,
                               injection=True)
    for mk, mask in masks.items():
        out = t_pipe.inpaint(gt, mask, key, sampler=anchor_cfg)
        anchor = score(out, mask)
        emit({"cfg": f"teacher ddim-{K_ANCHOR} (anchor)", "mask": mk,
              **anchor})
        for K in ladder:
            out = t_pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
                method="ddim", num_steps=K, eta=0.0, injection=True))
            emit(add_deltas({"cfg": f"teacher ddim-{K} (naive)", "mask": mk,
                             "evals": K, **score(out, mask)}, anchor))
        for K in ladder:
            out = s_pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
                method="consistency", num_steps=K, injection=True,
                mean_type=ModelMeanType.VELOCITY))
            emit(add_deltas({"cfg": f"student consistency-{K}", "mask": mk,
                             "evals": K, **score(out, mask)}, anchor))
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
