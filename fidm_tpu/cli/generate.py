"""Unconditional generation CLI (base FFHQ model, no inpainting).

Library-parity path for `p_sample_loop` / `ddim_sample_loop` without
injection (`gaussian_diffusion.py:390-538`) — e.g. the DDPM-1000 baseline
sanity check of a pretrained model.

    python -m fidm_tpu.cli.generate --checkpoint ffhq.pt --num_samples 16
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Unconditional sampling")
    p.add_argument("--checkpoint", default=None, help="torch .pt (3-channel)")
    p.add_argument("--output_dir", default="generated")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[16])
    p.add_argument("--method", default="ddpm",
                   choices=["ddpm", "ddim", "dpm++2m", "dpm++3m"],
                   help="dpm++3m: third-order solver — its sweet spot is "
                        "unconditional generation (docs/TUNING.md 2b)")
    p.add_argument("--ddim_timesteps", type=int, default=None)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--schedule", default="linear")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..diffusion import DiffusionSchedule
    from ..models import UNet, ffhq256_config
    from ..sampling import SamplerConfig, sample
    from ..utils import save_comparison_grid, save_png, to_uint8

    args = parse_args(argv)
    cfg = ffhq256_config(
        image_size=args.image_size, in_channels=3,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
    )
    model = UNet(cfg)
    sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)

    if args.checkpoint:
        from ..models.torch_import import load_torch_checkpoint

        variables = load_torch_checkpoint(args.checkpoint, cfg,
                                          wrap_base=False)
    else:
        S = args.image_size
        variables = model.init(jax.random.PRNGKey(args.seed),
                               jnp.zeros((1, S, S, 3)),
                               jnp.zeros((1,), jnp.int32))

    scfg = SamplerConfig(
        method=args.method,
        num_steps=(args.ddim_timesteps if args.method != "ddpm"
                   else None),
        eta=args.eta, injection=False, final_blend=False,
    )

    @jax.jit
    def run(key):
        def apply_fn(x, t):
            return model.apply(variables, x, t)

        return sample(apply_fn, sched, scfg,
                      shape=(args.batch_size, args.image_size,
                             args.image_size, 3), key=key)

    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    done, imgs = 0, []
    while done < args.num_samples:
        out = np.asarray(run(jax.random.fold_in(key, done)))
        for i in range(min(args.batch_size, args.num_samples - done)):
            save_png(to_uint8(out[i]),
                     os.path.join(args.output_dir, f"{done + i:05d}.png"))
            imgs.append(to_uint8(out[i]))
        done += args.batch_size
    rows = [imgs[i : i + 4] for i in range(0, min(len(imgs), 16), 4)]
    save_comparison_grid(rows, os.path.join(args.output_dir, "grid.png"))
    print(f"saved {min(done, args.num_samples)} samples to {args.output_dir}")


if __name__ == "__main__":
    main()
