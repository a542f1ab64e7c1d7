"""Solver/spacing quality matrix on the trained toy model.

Trains the toy inpainting UNet once (params cached across runs via
`toy_convergence.train_toy`), then measures hole-region PSNR for every
sampler method x step count x spacing combination — the honest quality
evidence behind the preset recommendations in docs/TUNING.md §2/§2b.

Run (TPU):  python examples/solver_quality.py [--train_steps 3000]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fidm_jax_cache")

from examples.toy_convergence import CFG, T, synth_batch, train_toy
from fidm_tpu.diffusion import DiffusionSchedule
from fidm_tpu.models import InpaintingUNet
from fidm_tpu.sampling import SamplerConfig, inpaint_sample


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train_steps", type=int, default=3000)
    p.add_argument("--cache", default="/tmp/fidm_toy_params_{}.pkl")
    p.add_argument("--brush_masks", action="store_true",
                   help="irregular brush-stroke masks (~36%% coverage) "
                        "instead of the easy box masks — the regime where "
                        "RePaint resampling shows its full gain")
    args = p.parse_args()

    sched = DiffusionSchedule.create("cosine", T)
    model = InpaintingUNet(CFG)
    params, _, _ = train_toy(args.train_steps,
                             args.cache.format(args.train_steps))

    def apply_fn(x, t, mi, m):
        return model.apply({"params": params}, x, t, mi, m)

    test = synth_batch(jax.random.PRNGKey(999), 16)
    if args.brush_masks:
        from fidm_tpu.data.masks import random_brush_mask

        rng = np.random.default_rng(3)
        S = test["image"].shape[1]
        brush = np.stack([random_brush_mask(rng, S, coverage=(0.25, 0.45))
                          for _ in range(16)])
        test["mask"] = jnp.asarray(brush.reshape(16, S, S, 1), jnp.float32)
        test["masked_image"] = test["image"] * (1 - test["mask"])
        print(f"brush masks, coverage {float(test['mask'].mean()):.2f}")
    hole = test["mask"]
    gt01 = (test["image"] + 1) / 2

    def hole_psnr(cfg):
        out = inpaint_sample(apply_fn, sched, cfg, gt=test["image"],
                             mask=test["mask"], key=jax.random.PRNGKey(7))
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        return 10 * np.log10(1.0 / mse)

    rows = []
    for K in (8, 12, 25):
        for method, eta in (("ddim", 0.0), ("ddim", 0.9),
                            ("dpm++2m", 0.0), ("dpm++2m-sde", 0.0),
                            ("dpm++3m", 0.0), ("unipc", 0.0)):
            for spacing in ("uniform", "trailing", "lambda", "karras"):
                cfg = SamplerConfig(method=method, num_steps=K, eta=eta,
                                    injection=True, time_spacing=spacing)
                tag = f"{method}{'-eta0.9' if eta else ''}-{K}/{spacing}"
                db = hole_psnr(cfg)
                rows.append((tag, db))
                print(f"{tag:34s} {db:6.2f} dB", flush=True)

    # RePaint time-travel resampling vs the plain ancestral chain at the
    # same K (j*r rows cost ~r x the model evals of the r=1 baseline)
    for K, j, r in ((25, 5, 1), (25, 5, 3), (25, 5, 5), (50, 10, 3)):
        cfg = SamplerConfig(method="repaint", num_steps=K, jump_length=j,
                            jump_n_sample=r, injection=True)
        tag = f"repaint-{K}/j{j}r{r}"
        db = hole_psnr(cfg)
        rows.append((tag, db))
        print(f"{tag:34s} {db:6.2f} dB", flush=True)

    best = max(rows, key=lambda r: r[1])
    print(f"\nbest: {best[0]} at {best[1]:.2f} dB")


if __name__ == "__main__":
    main()
