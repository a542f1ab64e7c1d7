"""Single-chip memory frontier at 1024² (round-3 verdict #7).

Extends the 512² near-linearity result (BENCH.md "Resolution scaling") to
the canonical architecture at 1024²: where does one v5e chip's HBM run
out, for BOTH halves of the workload?

  1. sampling: DDIM-K batch 1/2, exact vs deep-cache (the scan carries the
     cache pytree — the memory-relevant delta);
  2. training: one fused train step at batch 1/2 with remat none / convs /
     full (remat is the HBM lever for training; spatial partitioning over
     the "model" mesh axis is the hand-off when even remat-full OOMs).

At 1024² the attention level sits at 64² (seq 4096) — quadratic attention
memory is the expected first cliff. Each configuration reports either a
per-step time (extrapolatable: sampler cost is linear in steps) or OOM.

Results stream to /tmp/resolution_1024.json. Run (TPU; expect long
compiles through the remote-compile tunnel — budget ~1-2 h):
    python examples/resolution_1024.py [--steps 8]
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _oom(e) -> bool:
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Out of memory" in s
            or "out of memory" in s or "exceeds the limit" in s
            or "OOM" in s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8,
                   help="sampling steps (per-step cost is what transfers)")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--train_batches", type=int, nargs="+", default=[1, 2])
    p.add_argument("--width", type=int, default=None,
                   help="override model_channels (CPU smoke)")
    args = p.parse_args()
    S = args.size

    from fidm_tpu.models import InpaintingUNet, ffhq256_config
    from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
    from fidm_tpu.sampling import SamplerConfig
    from fidm_tpu.diffusion import DiffusionSchedule
    from fidm_tpu.training import (TrainState, make_optimizer,
                                   make_train_step)
    from fidm_tpu.training.lr import make_lr_schedule

    kw = {"model_channels": args.width} if args.width else {}
    cfg = ffhq256_config(image_size=S, **kw)  # canonical depth, attn@ds16
    results = {"size": S, "rows": []}
    out_path = f"/tmp/resolution_{S}.json"

    def emit(row):
        results["rows"].append(row)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(row), flush=True)

    # ---------------------------------------------------------- sampling
    pipe_cfg = PipelineConfig(unet=cfg, schedule="quadratic",
                              num_timesteps=1000)
    pipe = InpaintingPipeline.create(pipe_cfg)
    for B in (1, 2):
        gt = jnp.zeros((B, S, S, 3), jnp.float32)
        mask = jnp.ones((B, S, S, 1), jnp.float32)
        for name, sc in (
            ("exact", SamplerConfig(method="ddim", num_steps=args.steps,
                                    eta=0.9, injection=True)),
            ("deep-p3b1", SamplerConfig(method="ddim", num_steps=args.steps,
                                        eta=0.9, injection=True,
                                        encoder_cache_period=3,
                                        cache_branch=1,
                                        encoder_cache_tail=2)),
        ):
            tag = f"sample/{name}/b{B}"
            try:
                t0 = time.time()
                out = pipe.inpaint(gt, mask, jax.random.PRNGKey(0),
                                   sampler=sc)
                float(jnp.sum(out[0, :2, :2]))  # sync (tunnel)
                compile_s = time.time() - t0
                t0 = time.perf_counter()
                out = pipe.inpaint(gt, mask, jax.random.PRNGKey(1),
                                   sampler=sc)
                float(jnp.sum(out[0, :2, :2]))
                dt = time.perf_counter() - t0
                emit({"cfg": tag, "ok": True,
                      "s_per_sample": round(dt / B, 4),
                      "s_per_step_per_sample": round(dt / B / args.steps, 4),
                      "compile_s": round(compile_s, 1)})
            except Exception as e:
                if not _oom(e):
                    raise
                emit({"cfg": tag, "ok": False, "oom": True})

    # ---------------------------------------------------------- training
    sched = DiffusionSchedule.create("quadratic", 1000)
    for B in args.train_batches:
        for remat in ("none", "convs", "full"):
            tag = f"train/remat-{remat}/b{B}"
            try:
                import dataclasses as dc

                mcfg = dc.replace(cfg, remat_policy=remat)
                model = InpaintingUNet(mcfg)
                img = jnp.zeros((B, S, S, 3), jnp.float32)
                m = jnp.ones((B, S, S, 1), jnp.float32)
                variables = model.init(jax.random.PRNGKey(0), img[:1],
                                       jnp.zeros((1,), jnp.int32), img[:1],
                                       m[:1])
                tx = make_optimizer(make_lr_schedule("cosine", 1e-4, 100, 10))
                state = TrainState.create(apply_fn=model.apply,
                                          params=variables["params"], tx=tx)
                step = make_train_step(sched, donate=False)
                batch = {"image": img, "masked_image": img * (1 - m),
                         "mask": m}
                t0 = time.time()
                state, metrics = step(state, batch, jax.random.PRNGKey(1))
                float(metrics["loss"])
                compile_s = time.time() - t0
                t0 = time.perf_counter()
                state, metrics = step(state, batch, jax.random.PRNGKey(2))
                float(metrics["loss"])
                dt = time.perf_counter() - t0
                emit({"cfg": tag, "ok": True, "s_per_step": round(dt, 3),
                      "img_per_s": round(B / dt, 2),
                      "compile_s": round(compile_s, 1)})
                del state, step, variables
            except Exception as e:
                if not _oom(e):
                    raise
                emit({"cfg": tag, "ok": False, "oom": True})

    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
