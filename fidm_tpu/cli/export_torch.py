"""Export TPU-trained weights to an ADM-layout PyTorch checkpoint.

Closes the converter loop: `torch_import.load_torch_checkpoint` brings
reference checkpoints (`train_inpainting.py:227-242` layout) in; this CLI
writes fine-tuned Flax/Orbax weights back out as a `.pt` state_dict that the
reference's `UNetModel` / `DiffusionInpaintingModel` load with strict=True
(validated in tests/test_torch_parity.py::test_export_round_trip_state_dict).

    python -m fidm_tpu.cli.export_torch --checkpoint runs/ckpt --out model.pt
    python -m fidm_tpu.cli.export_torch --checkpoint model_int8.npz --out model.pt
"""
from __future__ import annotations

import argparse
import json
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Export weights to torch .pt")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir, quantized .npz, or torch .pt")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--which", default=None,
                   help="orbax selector: latest | best | step number "
                        "(default: best if present, else latest)")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[32, 16, 8])
    return p.parse_args(argv)


def _load_params(args, cfg):
    ckpt = args.checkpoint
    if os.path.isdir(ckpt):
        from ..training import CheckpointManager

        which = args.which or ("best" if os.path.isdir(
            os.path.join(ckpt, "best")) else "latest")
        mgr = CheckpointManager(ckpt)
        params = mgr.restore_params(which)
        mgr.close()
        return params
    if ckpt.endswith(".npz"):
        from ..quant import dequantize_params
        from .quantize import load_quantized

        return dequantize_params(load_quantized(ckpt))
    from ..models.torch_import import load_torch_checkpoint

    return load_torch_checkpoint(ckpt, cfg)["params"]


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from ..models import ffhq256_config
    from ..models.torch_import import save_torch_checkpoint

    args = parse_args(argv)
    cfg = ffhq256_config(
        dtype=jnp.float32,
        image_size=args.image_size,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
    )
    params = _load_params(args, cfg)
    save_torch_checkpoint(args.out, params, cfg)
    report = {
        "out": args.out,
        "bytes": os.path.getsize(args.out),
        "in_channels": cfg.in_channels,
        "image_size": cfg.image_size,
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
