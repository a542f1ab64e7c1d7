"""Find a quality-sane ddim-100-turbo replacement at production width.

Width-128 requalification showed branch-1 caching (the turbo preset's
b=1 p=3) costs -5.4 dB box — a draft tier. The b=2 frontier between the
shipped deep preset (p=3, 1.21x) and turbo's speed (1.47x) was never
measured at width 128: higher periods and a shorter tail trade quality
for speed WITHIN the quality-safe branch. This probes b=2 at p=4/p=5
(t=10) and p=3 t=4 against the cached exact anchor + the shipped deep
point, three-metric scoring.

Run (TPU; reuses /tmp/fidm_canon128.pkl + cached anchor programs; ~4
fresh sampling-program compiles): python examples/turbo_requalify.py
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__) or ".")

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
from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import ffhq256_config
from fidm_tpu.pipeline import InpaintingPipeline, PipelineConfig
from fidm_tpu.sampling import SamplerConfig


def main():
    S, T, n_eval, width = 256, 1000, 16, 128
    cfg = ffhq256_config(image_size=S, model_channels=width)
    sched = DiffusionSchedule.create("quadratic", T)
    model, params = train_canonical(cfg, sched, 6000, 16,
                                    f"/tmp/fidm_canon{width}.pkl")
    pipe = InpaintingPipeline(
        model, {"params": params}, sched,
        PipelineConfig(unet=cfg, schedule="quadratic", num_timesteps=T))

    synth = make_synth_face(S)
    gt = jax.vmap(synth)(jax.random.split(jax.random.PRNGKey(999), n_eval))
    masks = {"box": make_box_masks(jax.random.PRNGKey(555), n_eval, S),
             "brush": brush_bank(S, n_eval, seed=123,
                                 coverage=(0.25, 0.45))}
    key = jax.random.PRNGKey(7)
    score = make_quality_fns(gt)

    base = SamplerConfig(method="ddim", num_steps=100, eta=0.9,
                         injection=True)
    grid = [
        ("exact", base),
        ("b=2 p=3 t=10 (deep)", dataclasses.replace(
            base, encoder_cache_period=3, cache_branch=2,
            encoder_cache_tail=10)),
        ("b=2 p=4 t=10", dataclasses.replace(
            base, encoder_cache_period=4, cache_branch=2,
            encoder_cache_tail=10)),
        ("b=2 p=5 t=10", dataclasses.replace(
            base, encoder_cache_period=5, cache_branch=2,
            encoder_cache_tail=10)),
        ("b=2 p=3 t=4", dataclasses.replace(
            base, encoder_cache_period=3, cache_branch=2,
            encoder_cache_tail=4)),
        ("b=2 p=4 t=4", dataclasses.replace(
            base, encoder_cache_period=4, cache_branch=2,
            encoder_cache_tail=4)),
    ]
    rows, anchors = [], {}
    out_path = "/tmp/turbo_requalify_w128.json"
    for name, c in grid:
        for mk, mask in masks.items():
            out = pipe.inpaint(gt, mask, key, sampler=c)
            float(jnp.sum(out[0, :2, :2]))
            t0 = time.perf_counter()
            out = pipe.inpaint(gt, mask, key, sampler=c)
            float(jnp.sum(out[0, :2, :2]))
            dt = (time.perf_counter() - t0) / n_eval
            row = {"cfg": name, "mask": mk, **score(out, mask),
                   "s_per_sample": round(dt, 4)}
            if name == "exact":
                anchors[mk] = row
            else:
                add_deltas(row, anchors[mk])
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(rows, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
