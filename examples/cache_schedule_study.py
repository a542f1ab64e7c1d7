"""Non-uniform DeepCache schedules vs the periodic gate, at MATCHED budgets.

DeepCache (arXiv:2312.00858 §4.2) reports that non-uniformly placed full
evaluations — concentrated where features change fastest — beat the uniform
1:N schedule at the same cost. `SamplerConfig.cache_keysteps` +
`nonuniform_keysteps(center, power)` expose that knob here; this study asks
whether it actually pays on the inpainting task, with the same protocol as
the published deep-trunk frontier (examples/deepcache_frontier.py: 600-step
toy model, DDIM-50, hole-PSNR on 16 held-out images; --brush_masks for the
hard-mask stress variant).

For each full-evaluation budget (the budgets of periodic p3/p5 with and
without tail 10), every schedule shape is generated at EXACTLY that budget
(binary search over n_key, then topped up with the latest unused steps), so
rows differ only in placement — never in cost. Wall-clock at equal budget is
identical by construction (the scan runs the same number of full/cached
branches), so quality is the only axis.

Run (TPU, ~5 min warm / ~15 min cold):
    python examples/cache_schedule_study.py [--brush_masks]
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
from fidm_tpu.sampling import SamplerConfig, inpaint_sample, nonuniform_keysteps
from fidm_tpu.sampling.sampler import (_cache_keymask, _respaced_seq,
                                       host_alphas_cumprod)

from toy_convergence import CFG, T, synth_batch, train_toy


def grid_at_budget(K, budget, center, power):
    """A nonuniform_keysteps grid with EXACTLY `budget` entries.

    Rounding dedup makes len(grid) non-monotone-ish in n_key; scan upward
    from n_key=budget for the smallest n_key reaching it (no binary search
    — the length is not guaranteed monotone in n_key). If the found grid
    overshoots, thin the most CLOSELY spaced entries (their neighbors cover
    them, so removal barely moves the shape) — truncating the tail instead
    would delete exactly the high-index evaluations an end-heavy shape is
    supposed to concentrate, biasing the study against it. If it
    undershoots, top up with the latest unused steps."""
    g = None
    for n in range(budget, K + 1):
        cand = nonuniform_keysteps(K, n, center=center, power=power)
        if len(cand) >= budget:
            g = list(cand)
            break
    if g is None:
        g = list(nonuniform_keysteps(K, K, center=center, power=power))
    while len(g) > budget:
        # drop the entry (never index 0) with the smallest gap to its
        # predecessor — the densest cluster loses one redundant member
        gaps = [(g[i] - g[i - 1], i) for i in range(1, len(g))]
        _, i_drop = min(gaps)
        g.pop(i_drop)
    missing = budget - len(g)
    if missing > 0:
        extra = [i for i in range(K - 1, -1, -1) if i not in set(g)][:missing]
        g = sorted(set(g) | set(extra))
    assert len(g) == budget and g[0] == 0
    return tuple(g)


SHAPES = [
    ("start-heavy", 0.0, 2.0),   # full evals at high noise (structure)
    ("end-heavy", 1.0, 2.0),     # full evals at low noise (fine detail)
    ("center-heavy", 0.5, 2.0),  # DeepCache-paper shape for SD
    ("ends-heavy", 0.5, 0.5),    # full evals at both ends, cache the middle
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--brush_masks", action="store_true")
    p.add_argument("--num_steps", type=int, default=50,
                   help="DDIM step count — 100 reproduces the flagship "
                        "ddim-100-deep grid geometry (K=101)")
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

    cache_apply = (
        lambda x, t, mi, m: model.apply({"params": params}, x, t, mi, m,
                                        return_cache=True, cache_depth=1),
        lambda x, t, mi, m, c: model.apply({"params": params}, x, t, mi, m,
                                           cache=c, cache_depth=1),
    )

    def hole_psnr(out):
        out01 = (jnp.clip(out, -1, 1) + 1) / 2
        mse = float((((out01 - gt01) ** 2) * hole).sum() / (hole.sum() * 3))
        return 10 * np.log10(1.0 / mse)

    base_cfg = SamplerConfig(method="ddim", num_steps=args.num_steps, eta=0.0,
                             injection=True, cache_branch=1)
    K = len(_respaced_seq(sched, base_cfg, host_alphas_cumprod(sched)))

    out = inpaint_sample(apply_fn, sched,
                         dataclasses.replace(base_cfg, cache_branch=0),
                         gt=test["image"], mask=test["mask"],
                         key=jax.random.PRNGKey(7))
    exact_db = hole_psnr(out)
    print(f"exact DDIM-{args.num_steps} ({K} evals): {exact_db:.2f} dB",
          flush=True)

    rows = [{"schedule": "exact", "budget": K,
             "hole_psnr_db": round(exact_db, 2)}]

    def run(cfg, name, budget):
        out = inpaint_sample(apply_fn, sched, cfg, gt=test["image"],
                             mask=test["mask"], key=jax.random.PRNGKey(7),
                             cache_apply=cache_apply)
        db = hole_psnr(out)
        rows.append({"schedule": name, "budget": budget,
                     "hole_psnr_db": round(db, 2),
                     "delta_vs_exact": round(db - exact_db, 2)})
        print(f"{name:22s} budget={budget:2d}: {db:.2f} dB "
              f"({db - exact_db:+.2f})", flush=True)

    for period, tail in ((3, 0), (3, 10), (5, 0), (5, 10)):
        cfg = dataclasses.replace(base_cfg, encoder_cache_period=period,
                                  encoder_cache_tail=tail)
        budget = int(_cache_keymask(cfg, K).sum())
        run(cfg, f"periodic p{period} t{tail}", budget)
        for name, center, power in SHAPES:
            ks = grid_at_budget(K, budget, center, power)
            cfg_n = dataclasses.replace(base_cfg, encoder_cache_period=period,
                                        cache_keysteps=ks)
            run(cfg_n, f"{name} (b={budget})", budget)
        # ablation: output-reuse (cache_branch=-1) at the SAME budget — how
        # much does carrying deep-trunk features buy over skipping the
        # model outright? (the "skip" baseline of the caching literature)
        cfg_o = dataclasses.replace(base_cfg, encoder_cache_period=period,
                                    encoder_cache_tail=tail, cache_branch=-1)
        run(cfg_o, f"output-reuse p{period} t{tail}", budget)

    tag = "brush" if args.brush_masks else "box"
    out_path = f"/tmp/cache_schedule_{tag}_k{args.num_steps}.json"
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
