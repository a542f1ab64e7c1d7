"""Progressive distillation at CANONICAL depth and PRODUCTION width.

Completes the few-step-student story next to canonical_consistency.py
(VERDICT r4 #3 "and progressive, if budget allows"): the ladder
16 -> 8 -> 4 -> 2 (Salimans & Ho, arXiv:2202.00512 — each round trains a
student whose ONE step matches the previous model's TWO DDIM steps) run
against the width-128 6-level canonical teacher, scored on the product
task (box/brush inpainting with injection, three-metric scoring) against
the exact DDIM-100 anchor and the naive teacher ladder.

Round 1 re-parameterizes eps -> velocity (stable x0 at high noise);
students sample with plain DDIM on THEIR training grid
(`timesteps=distill_boundaries(T, 2K)[::2][:-1]` — the even boundaries),
not uniform respacing.

Run (TPU; teacher cache hit => ~1-1.5 h: 3 distill rounds of
--pd_steps each + a handful of sampling-program compiles):
    python examples/canonical_progressive.py
    python examples/canonical_progressive.py --smoke   # tiny CPU smoke
Results stream to /tmp/canonical_progressive*.json.
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
    p.add_argument("--pd_steps", type=int, default=2500,
                   help="distillation steps per halving round")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=128)
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fidm_tpu.diffusion import DiffusionSchedule, ModelMeanType
    from fidm_tpu.distill import distill_boundaries, make_distill_step
    from fidm_tpu.models import ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.training import TrainState, make_optimizer
    from fidm_tpu.training.lr import make_lr_schedule

    if args.smoke:
        S, T, steps, pd_steps, batch, n_eval = 64, 50, 3, 5, 2, 2
        ladder_top = 4  # 4 -> 2, one round
        cache_path = student_path = None
    else:
        S, T, steps, pd_steps, batch, n_eval = (
            256, 1000, args.steps, args.pd_steps, args.batch, 16)
        ladder_top = 16
        cache_path = f"/tmp/fidm_canon{args.width}.pkl"
        student_path = f"/tmp/fidm_canon{args.width}_pd{pd_steps}.pkl"

    width = 32 if args.smoke else args.width
    cfg = ffhq256_config(image_size=S, model_channels=width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, teacher = train_canonical(cfg, sched, steps, batch, cache_path)

    def apply(params, x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

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

    # ---- the halving ladder (or load the cached students) ----
    students = None
    if student_path and os.path.exists(student_path):
        with open(student_path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("pd_steps") == pd_steps and blob.get("width") == width:
            print(f"loaded PD students from {student_path}", flush=True)
            students = {int(k): jax.tree_util.tree_map(jnp.asarray, v)
                        for k, v in blob["students"].items()}
    if students is None:
        students = {}
        cur, cur_steps = teacher, ladder_top
        cur_mean = ModelMeanType.EPSILON  # the canonical teacher is eps
        key = jax.random.PRNGKey(13)
        while cur_steps > 2:
            dstate = TrainState.create(
                apply_fn=None, params=cur,
                tx=make_optimizer(
                    make_lr_schedule("cosine", 1e-4, pd_steps, 50),
                    weight_decay=0.0))
            dstep = make_distill_step(
                sched, apply, apply, teacher_steps=cur_steps,
                teacher_mean_type=cur_mean,
                student_mean_type=ModelMeanType.VELOCITY)

            # teacher/current params as jit ARGUMENTS — closure capture
            # would bake 374 MB of constants into the remote-compile
            # payload (HTTP 413; see canonical_consistency.py)
            @jax.jit
            def gen_and_pd(state, cur_params, key, _dstep=dstep):
                i = state.step
                b = make_batch(jax.random.fold_in(key, 70_000 + i), batch)
                return _dstep(state, cur_params, b,
                              jax.random.fold_in(key, 30_000 + i))

            t0 = time.time()
            for i in range(pd_steps):
                dstate, dm = gen_and_pd(dstate, cur, key)
                if i % 500 == 0 or i == pd_steps - 1:
                    print(f"pd {cur_steps}->{cur_steps//2} step {i}: "
                          f"loss={float(dm['loss']):.5f} "
                          f"({time.time()-t0:.0f}s)", flush=True)
            cur = dstate.params
            cur_mean = ModelMeanType.VELOCITY
            cur_steps //= 2
            students[cur_steps] = cur
        if student_path:
            with open(student_path, "wb") as f:
                pickle.dump({"pd_steps": pd_steps, "width": width,
                             "students": {k: jax.tree_util.tree_map(
                                 np.asarray, v)
                                 for k, v in students.items()}}, f)
            print(f"saved PD students to {student_path}", flush=True)

    # ---- evaluate on the product task ----
    pcfg = PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T)
    t_pipe = InpaintingPipeline(model, {"params": teacher}, sched, pcfg)

    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {"box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
             "brush": brush_bank(S, n_eval, seed=123,
                                 coverage=(0.25, 0.45))}
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    out_path = ("/tmp/canonical_progressive_smoke.json" if args.smoke
                else f"/tmp/canonical_progressive_w{width}.json")
    results = {"width": width, "pd_steps": pd_steps, "S": S, "rows": []}

    def emit(row):
        results["rows"].append(row)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(row), flush=True)

    def grid_for(K):
        return tuple(distill_boundaries(T, 2 * K)[::2][:-1].tolist())

    K_ANCHOR = 10 if args.smoke else 100
    anchor_cfg = SamplerConfig(method="ddim", num_steps=K_ANCHOR, eta=0.9,
                               injection=True)
    for mk, mask in masks.items():
        out = t_pipe.inpaint(gt, mask, key, sampler=anchor_cfg)
        anchor = score(out, mask)
        emit({"cfg": f"teacher ddim-{K_ANCHOR} (anchor)", "mask": mk,
              **anchor})
        for K, params in sorted(students.items()):
            # teacher run on the SAME grid (the honest matched-eval naive)
            out = t_pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
                method="ddim", timesteps=grid_for(K), eta=0.0,
                injection=True))
            emit(add_deltas({"cfg": f"teacher ddim-{K} (naive, pd grid)",
                             "mask": mk, "evals": K, **score(out, mask)},
                            anchor))
            s_pipe = InpaintingPipeline(model, {"params": params}, sched,
                                        pcfg)
            out = s_pipe.inpaint(gt, mask, key, sampler=SamplerConfig(
                method="ddim", timesteps=grid_for(K), eta=0.0,
                injection=True, mean_type=ModelMeanType.VELOCITY))
            emit(add_deltas({"cfg": f"pd-student ddim-{K}", "mask": mk,
                             "evals": K, **score(out, mask)}, anchor))
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
