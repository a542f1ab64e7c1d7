"""Few-step solver quality at CANONICAL DEPTH (6-level UNet, product task).

The solver-quality evidence so far lives on two substrates: the analytic
ODE with a closed-form solution (tests/test_unipc.py — integrator accuracy
in isolation) and 3-level toys (examples/solver_quality.py). This study
runs the actual product task — masked face inpainting with injection — on
the 6-level canonical-topology UNet trained from scratch on-chip (the
round-4 `canonical_frontier` protocol: synthetic faces + box/brush masks),
and measures hole-PSNR for every few-step method at matched model-eval
budgets:

    ddim-K (eta 0.9 and 0.0), dpm++2m-K, dpm++2m-sde-K, dpm++3m-K,
    unipc-K (order 2, corrector on/off)

for K in a small budget ladder, anchored to exact DDIM-100. This is the
table that tells a user which `--preset` to pick at a given eval budget on
a real-depth model, and whether UniPC's analytic-ODE edge survives contact
with a trained network (the toy studies say solver ordering is
regime-dependent: well-trained => task saturates, undertrained =>
extrapolation amplifies noise — docs/TUNING.md §2b).

Reuses the trained canonical model cache (/tmp/fidm_canon{width}.pkl) from
examples/canonical_frontier.py; trains one (~12 min on-chip at width 64)
if absent.

Run (TPU; ~10 sampling-program compiles through the tunnel):
    python examples/canonical_solver_quality.py
    python examples/canonical_solver_quality.py --smoke   # CPU smoke
Results stream to /tmp/canonical_solver_quality*.json.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json

import jax
import numpy as np
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
    p.add_argument("--presets_only", action="store_true",
                   help="re-qualification mode: only the methods behind "
                        "shipped presets (ddim eta.9, dpm++2m, dpm++2m-sde, "
                        "unipc) — 4 compiled programs per budget instead "
                        "of 7")
    p.add_argument("--budgets", type=int, nargs="+", default=[10, 20],
                   help="model-eval budgets K (each (method, K) pair is one "
                        "compiled program — through the tunnel, keep the "
                        "ladder short)")
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.models import ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig

    if args.smoke:
        S, T, steps, batch, n_eval = 64, 50, 3, 2, 2
        budgets, K_ANCHOR = [6], 10
        cache_path = None
    else:
        S, T, steps, batch, n_eval = 256, 1000, args.steps, args.batch, 16
        budgets, K_ANCHOR = args.budgets, 100
        cache_path = f"/tmp/fidm_canon{args.width}.pkl"

    cfg = ffhq256_config(image_size=S, model_channels=args.width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, params = train_canonical(cfg, sched, steps, batch, cache_path)
    pipe = InpaintingPipeline(
        model, {"params": params}, sched,
        PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T))

    synth = make_synth_face(S)
    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {
        "box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
        "brush": brush_bank(S, n_eval, seed=123, coverage=(0.25, 0.45)),
    }
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    results = {"width": args.width, "steps": steps, "S": S, "rows": []}
    out_path = ("/tmp/canonical_solver_quality_smoke.json" if args.smoke
                else f"/tmp/canonical_solver_quality_w{args.width}.json")

    def emit(row):
        results["rows"].append(row)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(row), flush=True)

    def methods_at(K):
        rows = [
            (f"ddim-{K} (eta .9)",
             SamplerConfig(method="ddim", num_steps=K, eta=0.9,
                           injection=True)),
            (f"ddim-{K} (eta 0)",
             SamplerConfig(method="ddim", num_steps=K, eta=0.0,
                           injection=True)),
            (f"dpm++2m-{K}",
             SamplerConfig(method="dpm++2m", num_steps=K, injection=True)),
            (f"dpm++2m-sde-{K}",
             SamplerConfig(method="dpm++2m-sde", num_steps=K,
                           injection=True)),
            (f"dpm++3m-{K}",
             SamplerConfig(method="dpm++3m", num_steps=K, injection=True)),
            (f"unipc-{K}",
             SamplerConfig(method="unipc", num_steps=K, injection=True)),
            (f"unipc-{K} (no corrector)",
             SamplerConfig(method="unipc", num_steps=K, injection=True,
                           unipc_corrector=False)),
        ]
        if args.presets_only:
            keep = {f"ddim-{K} (eta .9)", f"dpm++2m-{K}",
                    f"dpm++2m-sde-{K}", f"unipc-{K}"}
            rows = [r for r in rows if r[0] in keep]
        return rows

    anchor_cfg = SamplerConfig(method="ddim", num_steps=K_ANCHOR, eta=0.9,
                               injection=True)
    for mk, mask in masks.items():
        out = pipe.inpaint(gt, mask, key, sampler=anchor_cfg)
        anchor = score(out, mask)
        emit({"cfg": f"ddim-{K_ANCHOR} exact (anchor)", "mask": mk, **anchor})
        for K in budgets:
            for name, c in methods_at(K):
                out = pipe.inpaint(gt, mask, key, sampler=c)
                emit(add_deltas({"cfg": name, "mask": mk, "evals": K,
                                 **score(out, mask)}, anchor))

    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
