"""Post-training quantization CLI.

Replaces `scripts/quantize_model.py` (which depends on the unvendored
external PTQ4DM package and double-concatenates the 9-channel input —
`scripts/quantize_model.py:128-129` vs `unet.py:199`, a bug we do not
reproduce). Loads a checkpoint, applies int8 weight-only quantization, and
saves the quantized parameter tree (numpy .npz) plus a size report.

    python -m fidm_tpu.cli.quantize --checkpoint model.pt --out model_int8.npz
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="int8 weight-only PTQ")
    p.add_argument("--checkpoint", required=True, help="torch .pt to quantize")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--image_size", type=int, default=256)
    # model-shape overrides (same flags as cli.evaluate; defaults = the
    # canonical FFHQ-256 architecture, ffhq256_config)
    p.add_argument("--model_channels", type=int, default=128)
    p.add_argument("--channel_mult", type=int, nargs="+",
                   default=[1, 1, 2, 2, 4, 4])
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_head_channels", type=int, default=64)
    p.add_argument("--attention_resolutions", type=int, nargs="+",
                   default=[16])
    p.add_argument("--min_size", type=int, default=4096,
                   help="min tensor elements to quantize")
    p.add_argument("--calibrate", default=None, metavar="DATA_DIR",
                   help="activation-aware calibration (quant/calibrate.py): "
                        "run ~--calib_samples images from DATA_DIR through "
                        "the model at random diffusion timesteps, record "
                        "per-input-channel activation energy, and fit "
                        "per-output-channel clipping scales minimizing the "
                        "weighted weight error (the reference's 128-sample "
                        "calibration protocol, scripts/quantize_model.py:"
                        "96-117). Default: plain absmax scales")
    p.add_argument("--calib_mask_dir", default=None,
                   help="mask dir for calibration (default: procedural "
                        "masks)")
    p.add_argument("--calib_samples", type=int, default=128)
    p.add_argument("--calib_batch", type=int, default=8)
    p.add_argument("--schedule", default="quadratic",
                   help="beta schedule for calibration noising")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _calibration_moments(args, model, variables):
    """Input-channel activation moments from real data at random timesteps
    (x_t ~ q(x_t | x_0), the distribution inference actually visits)."""
    import jax
    import jax.numpy as jnp

    from ..data.dataset import InpaintingDataset
    from ..diffusion import DiffusionSchedule, q_sample
    from ..quant import collect_input_moments

    sched = DiffusionSchedule.create(args.schedule, args.diffusion_steps)
    mask_mode = "serial" if args.calib_mask_dir else "procedural"
    ds = InpaintingDataset(args.calibrate, args.calib_mask_dir, split="",
                           img_size=args.image_size, mask_mode=mask_mode,
                           seed=args.seed)
    n = min(args.calib_samples, len(ds))
    key = jax.random.PRNGKey(args.seed)
    batches = []
    for start in range(0, n, args.calib_batch):
        items = [ds[i] for i in range(start, min(start + args.calib_batch,
                                                 n))]
        import numpy as _np

        x0 = jnp.asarray(_np.stack([it["image"] for it in items]))
        mask = jnp.asarray(_np.stack([it["mask"] for it in items]))
        mi = jnp.asarray(_np.stack([it["masked_image"] for it in items]))
        key, kt, kn = jax.random.split(key, 3)
        t = jax.random.randint(kt, (x0.shape[0],), 0, args.diffusion_steps)
        xt = q_sample(sched, x0, t, jax.random.normal(kn, x0.shape))
        batches.append((xt, t, mi, mask))
    print(f"calibrating on {n} samples / {len(batches)} batches")
    return collect_input_moments(model, variables, batches)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..models import InpaintingUNet, ffhq256_config
    from ..models.torch_import import load_torch_checkpoint
    from ..quant import (
        quantize_params,
        quantize_params_calibrated,
        quantized_size_bytes,
    )

    args = parse_args(argv)
    cfg = ffhq256_config(
        image_size=args.image_size,
        model_channels=args.model_channels,
        channel_mult=tuple(args.channel_mult),
        num_heads=args.num_heads,
        num_head_channels=args.num_head_channels,
        attention_resolutions=tuple(args.attention_resolutions),
    )
    variables = load_torch_checkpoint(args.checkpoint, cfg)
    params = variables["params"]

    if args.calibrate:
        moments = _calibration_moments(args, InpaintingUNet(cfg), variables)
        qp = quantize_params_calibrated(params, moments,
                                        min_size=args.min_size)
    else:
        qp = quantize_params(params, min_size=args.min_size)
    before = quantized_size_bytes(params)
    after = quantized_size_bytes(qp)

    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            p = f"{prefix}{k}"
            if isinstance(v, dict) and set(v) == {"q", "scale"}:
                flat[p + ".__q__"] = np.asarray(v["q"])
                flat[p + ".__scale__"] = np.asarray(v["scale"])
            elif isinstance(v, dict):
                walk(v, p + "/")
            else:
                flat[p] = np.asarray(v)

    walk(qp)
    np.savez_compressed(args.out, **flat)
    report = {
        "bytes_before": before,
        "bytes_after": after,
        "compression": round(before / after, 3),
        "tensors_quantized": sum(1 for k in flat if k.endswith(".__q__")),
        "calibrated": bool(args.calibrate),
    }
    print(json.dumps(report, indent=2))
    return report


def load_quantized(path: str):
    """Rebuild the quantized param tree from a .npz written by main()."""
    import jax.numpy as jnp

    data = np.load(path)
    tree = {}
    for key in data.files:
        if key.endswith(".__scale__"):
            continue
        path_parts = key.replace(".__q__", "").split("/")
        node = tree
        for p in path_parts[:-1]:
            node = node.setdefault(p, {})
        if key.endswith(".__q__"):
            node[path_parts[-1]] = {
                "q": jnp.asarray(data[key]),
                "scale": jnp.asarray(data[key.replace(".__q__", ".__scale__")]),
            }
        else:
            node[path_parts[-1]] = jnp.asarray(data[key])
    return tree


if __name__ == "__main__":
    main()
