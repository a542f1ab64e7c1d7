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
    p.add_argument("--min_size", type=int, default=4096,
                   help="min tensor elements to quantize")
    return p.parse_args(argv)


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from ..models import ffhq256_config
    from ..models.torch_import import load_torch_checkpoint
    from ..quant import quantize_params, quantized_size_bytes

    args = parse_args(argv)
    cfg = ffhq256_config(image_size=args.image_size)
    variables = load_torch_checkpoint(args.checkpoint, cfg)
    params = variables["params"]

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
