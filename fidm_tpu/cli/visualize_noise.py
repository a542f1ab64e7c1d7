"""Noise-schedule visualization CLI.

Capability port of the reference's standalone `noise.py` study tool
(`NoiseScheduleVisualizer`, `noise.py:38-376`): forward-noise an image at
chosen timesteps under each beta schedule, save side-by-side grids, plot
beta / alpha-bar / SNR curves, and print an SNR table. Implemented over the
shared schedule library instead of duplicated schedule code
(the reference redefines its schedules inline at `noise.py:18-35`).

    python -m fidm_tpu.cli.visualize_noise --image face.png --out noise_vis/
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Visualize beta schedules")
    p.add_argument("--image", default=None,
                   help="input image (synthetic gradient if omitted)")
    p.add_argument("--out", default="noise_visualization")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--schedules", nargs="+",
                   default=["linear", "cosine", "quadratic"])
    p.add_argument("--timesteps", nargs="+", type=int,
                   default=[0, 50, 100, 250, 500, 750, 999])
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..data.dataset import load_image
    from ..diffusion import DiffusionSchedule, q_sample
    from ..utils import save_comparison_grid, to_uint8

    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    if args.image:
        img = load_image(args.image, args.image_size)
    else:
        # synthetic radial gradient test image
        yy, xx = np.mgrid[0 : args.image_size, 0 : args.image_size]
        r = np.sqrt((yy - args.image_size / 2) ** 2 + (xx - args.image_size / 2) ** 2)
        img = np.stack([np.cos(r / 8), np.sin(r / 13), np.cos(r / 21)], -1)
        img = img.astype(np.float32) * 0.8

    x0 = jnp.asarray(img)[None]
    key = jax.random.PRNGKey(args.seed)
    noise = jax.random.normal(key, x0.shape)

    rows = []
    snr_table = {}
    for name in args.schedules:
        sched = DiffusionSchedule.create(name, args.steps)
        row = []
        for t in args.timesteps:
            xt = q_sample(sched, x0, jnp.array([t]), noise)
            row.append(to_uint8(np.asarray(xt[0])))
        rows.append(row)
        acp = np.asarray(sched.alphas_cumprod, np.float64)
        snr_table[name] = acp / (1 - acp)

    save_comparison_grid(rows, os.path.join(args.out, "noising_grid.png"))
    print(f"grid (rows={args.schedules}, cols=t{args.timesteps}) -> "
          f"{args.out}/noising_grid.png")

    # curves
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for name in args.schedules:
            sched = DiffusionSchedule.create(name, args.steps)
            axes[0].plot(np.asarray(sched.betas), label=name)
            axes[1].plot(np.asarray(sched.alphas_cumprod), label=name)
            axes[2].semilogy(snr_table[name], label=name)
        for ax, title in zip(axes, ["beta_t", "alpha_bar_t", "SNR (log)"]):
            ax.set_title(title)
            ax.set_xlabel("t")
            ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "schedule_curves.png"), dpi=120)
        print(f"curves -> {args.out}/schedule_curves.png")
    except ImportError:
        print("matplotlib unavailable; skipped curves")

    # SNR table at the sampled timesteps
    print(f"{'t':>6} " + " ".join(f"{n:>14}" for n in args.schedules))
    for t in args.timesteps:
        print(f"{t:>6} " + " ".join(
            f"{snr_table[n][t]:>14.4f}" for n in args.schedules))


if __name__ == "__main__":
    main()
