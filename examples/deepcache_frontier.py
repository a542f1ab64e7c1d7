"""DeepCache deep-trunk quality/speed frontier on the toy-convergence model.

Measures hole-PSNR for the full cache grid — branch in {0 (encoder mode),
1, 2} x period in {2, 3, 5} x tail in {0, 10} — at DDIM-50 on the 600-step
toy model (the protocol of BENCH.md "Encoder-feature reuse": same model,
same masks, same metric as the published encoder-mode curve, so rows are
directly comparable). Timing for the same grid at 256^2 is measured
separately by bench.py env overrides (FIDM_BENCH_ENCODER_CACHE /
FIDM_BENCH_CACHE_BRANCH); this script is the quality half.

branch=0 caches encoder+middle ("Faster Diffusion"); branch=b caches the
decoder trunk at depth b (DeepCache, arXiv:2312.00858) — at the same period
it skips strictly MORE compute, so the interesting question is whether its
quality holds.

Run (TPU, ~5 min with a warm /tmp/fidm_toy600.pkl):
    python examples/deepcache_frontier.py [--brush_masks]

--brush_masks swaps the random boxes for irregular brush strokes (the
hard-mask protocol of the RePaint study, where deterministic DDIM is
already weakest) — the stress test for whether the `ddim-100-deep`
preset's quality delta survives off the easy-mask regime.
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample

from toy_convergence import CFG, T, synth_batch, train_toy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--brush_masks", action="store_true",
                   help="irregular brush-stroke masks (~36%% coverage) "
                        "instead of the easy random boxes")
    args = p.parse_args()

    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    params, _, _ = train_toy(600, cache_path="/tmp/fidm_toy600.pkl")

    test = synth_batch(jax.random.PRNGKey(999), 16)
    if args.brush_masks:
        from fidm_tpu.data.masks import random_brush_mask

        S = CFG.image_size
        rng = np.random.default_rng(123)
        brush = np.stack([random_brush_mask(rng, S, coverage=(0.25, 0.45))
                          for _ in range(16)])
        test["mask"] = jnp.asarray(brush.reshape(16, S, S, 1), jnp.float32)
        test["masked_image"] = test["image"] * (1 - test["mask"])
        print(f"brush masks, coverage {float(test['mask'].mean()):.2f}")
    hole = test["mask"]
    gt01 = (test["image"] + 1) / 2

    def apply_fn(x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    def make_cache_apply(depth):
        return (
            lambda x, t, mi, m: model.apply({"params": params}, x, t, mi, m,
                                            return_cache=True,
                                            cache_depth=depth),
            lambda x, t, mi, m, c: model.apply({"params": params}, x, t, mi,
                                               m, cache=c, cache_depth=depth),
        )

    def hole_psnr(out):
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        return 10 * np.log10(1.0 / mse)

    base_cfg = SamplerConfig(method="ddim", num_steps=50, eta=0.0,
                             injection=True)
    rows = []

    out = inpaint_sample(apply_fn, sched, base_cfg, gt=test["image"],
                         mask=test["mask"], key=jax.random.PRNGKey(7))
    exact_db = hole_psnr(out)
    rows.append({"period": 1, "branch": None, "tail": 0,
                 "hole_psnr_db": round(exact_db, 2)})
    print(f"exact DDIM-50: {exact_db:.2f} dB", flush=True)

    for branch in (0, 1, 2):
        for period in (2, 3, 5):
            for tail in (0, 10):
                cfg = dataclasses.replace(
                    base_cfg, encoder_cache_period=period,
                    encoder_cache_tail=tail, cache_branch=branch)
                out = inpaint_sample(
                    apply_fn, sched, cfg, gt=test["image"],
                    mask=test["mask"], key=jax.random.PRNGKey(7),
                    cache_apply=make_cache_apply(branch or None))
                db = hole_psnr(out)
                rows.append({"period": period, "branch": branch,
                             "tail": tail, "hole_psnr_db": round(db, 2),
                             "delta_vs_exact": round(db - exact_db, 2)})
                print(f"branch={branch} period={period} tail={tail}: "
                      f"{db:.2f} dB ({db - exact_db:+.2f})", flush=True)

    out_path = ("/tmp/deepcache_quality_brush.json" if args.brush_masks
                else "/tmp/deepcache_quality.json")
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
