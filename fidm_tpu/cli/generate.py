"""Unconditional generation CLI (base FFHQ model, no inpainting).

Library-parity path for `p_sample_loop` / `ddim_sample_loop` without
injection (`gaussian_diffusion.py:390-538`) — e.g. the DDPM-1000 baseline
sanity check of a pretrained model.

    python -m fidm_tpu.cli.generate --checkpoint ffhq.pt --num_samples 16

`--checkpoint` accepts a torch `.pt` (the 3-channel base UNet) or a native
training/distill checkpoint DIRECTORY — the latter holds the 9-channel
inpainting model, which is run unconditionally with full-hole conditioning
(masked_image = 0, mask = 1), and its recorded mean_type is applied
automatically. That makes consistency students directly sampleable:

    python -m fidm_tpu.cli.generate --checkpoint distilled/consistency \\
        --method consistency --num_samples 16
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Unconditional sampling")
    p.add_argument("--checkpoint", default=None,
                   help="torch .pt (3-channel base UNet) or a native "
                        "checkpoint dir (9-channel inpainting model, run "
                        "with full-hole conditioning)")
    p.add_argument("--use_ema", action="store_true",
                   help="native dir: sample the EMA parameters")
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
                   choices=["ddpm", "ddim", "dpm++2m", "dpm++3m",
                            "unipc", "consistency"],
                   help="dpm++3m/unipc: higher-order solvers — their sweet "
                        "spot is unconditional generation (docs/TUNING.md "
                        "2b/2b'); "
                        "consistency: 1-2 step sampling from a "
                        "consistency-trained/distilled model (defaults to "
                        "2 steps; pair with --mean_type velocity)")
    p.add_argument("--mean_type", default=None,
                   choices=["epsilon", "xstart", "velocity"],
                   help="default: checkpoint metadata if present, else "
                        "velocity for --method consistency, else epsilon")
    p.add_argument("--ddim_timesteps", type=int, default=None)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--schedule", default="linear")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..diffusion import DiffusionSchedule, ModelMeanType
    from ..models import UNet, ffhq256_config
    from ..sampling import SamplerConfig, sample
    from ..utils import save_comparison_grid, save_png, to_uint8

    args = parse_args(argv)
    sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)
    S = args.image_size
    arch = dict(
        image_size=S,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
    )

    meta_mt = None
    if args.checkpoint and os.path.isdir(args.checkpoint):
        # native training/distill checkpoint: the 9-channel inpainting
        # model, sampled unconditionally with full-hole conditioning
        # (masked_image = 0, mask = 1 — the model sees no known pixels)
        from ..models import InpaintingUNet
        from ..training import CheckpointManager

        mgr = CheckpointManager(args.checkpoint)
        params = mgr.restore_params("latest", prefer_ema=args.use_ema)
        meta = mgr.restore_metadata("latest")
        mgr.close()
        if meta and meta.get("mean_type"):
            meta_mt = meta["mean_type"]
            print(f"mean_type '{meta_mt}' from checkpoint metadata")
        model9 = InpaintingUNet(ffhq256_config(**arch))
        variables = {"params": params}

        def model_apply(x, t):
            B = x.shape[0]
            return model9.apply(variables, x, t,
                                jnp.zeros((B, S, S, 3), x.dtype),
                                jnp.ones((B, S, S, 1), x.dtype))
    else:
        cfg = ffhq256_config(in_channels=3, **arch)
        model = UNet(cfg)
        if args.checkpoint:
            from ..models.torch_import import load_torch_checkpoint

            variables = load_torch_checkpoint(args.checkpoint, cfg,
                                              wrap_base=False)
        else:
            variables = model.init(jax.random.PRNGKey(args.seed),
                                   jnp.zeros((1, S, S, 3)),
                                   jnp.zeros((1,), jnp.int32))

        def model_apply(x, t):
            return model.apply(variables, x, t)

    num_steps = args.ddim_timesteps if args.method != "ddpm" else None
    if args.method == "consistency" and num_steps is None:
        num_steps = 2  # 1-2 evals is the method's operating point
    if args.mean_type is not None:
        mean_type = ModelMeanType.from_name(args.mean_type)
    elif meta_mt is not None:
        mean_type = ModelMeanType.from_name(meta_mt)
    else:
        # consistency students are velocity-parameterized by default
        # (cli.distill --student_mean_type); everything else epsilon
        mean_type = (ModelMeanType.VELOCITY
                     if args.method == "consistency"
                     else ModelMeanType.EPSILON)
    scfg = SamplerConfig(
        method=args.method,
        num_steps=num_steps,
        eta=args.eta, injection=False, final_blend=False,
        mean_type=mean_type,
    )

    @jax.jit
    def run(key):
        return sample(model_apply, sched, scfg,
                      shape=(args.batch_size, S, S, 3), key=key)

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
