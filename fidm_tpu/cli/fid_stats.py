"""Precompute FID reference statistics (mu, sigma) for an image directory.

Real-world FID evaluation compares generated samples against a FIXED
reference distribution — recomputing InceptionV3 features of the full real
set on every eval run is wasted work. This mirrors pytorch-fid's
`--save-stats` flow (the reference pipeline shells out to pytorch-fid,
`test_inpainting_better.py:151-223`): run the extractor once over the
dataset, save `{mu, sigma, num_images, dim}` as an .npz, and pass it to
`cli.evaluate --fid_stats stats.npz` (with the same `--fid_weights`) to
score runs against it.

    python -m fidm_tpu.cli.fid_stats --data_dir ffhq_test/ \
        --fid_weights pt_inception-2015-12-05.pth --out ffhq_test_stats.npz
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Precompute FID reference statistics for a dataset")
    p.add_argument("--data_dir", required=True, help="image directory")
    p.add_argument("--fid_weights", required=True,
                   help="pt_inception-2015-12-05-layout torch checkpoint")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--num_samples", type=int, default=None,
                   help="cap the number of images (default: all)")
    return p.parse_args(argv)


def compute_stats_for_dir(data_dir: str, extractor, batch_size: int = 32,
                          image_size: int = 256, num_samples=None):
    """(mu, sigma, n, features) of pool3 features over a directory."""
    import glob
    import os

    from ..data.dataset import load_image
    from ..metrics.fid import compute_statistics

    exts = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.webp")
    paths = sorted(p for e in exts
                   for p in glob.glob(os.path.join(data_dir, "**", e),
                                      recursive=True))
    if not paths:
        raise FileNotFoundError(f"no images under {data_dir}")
    if num_samples is not None:
        paths = paths[:num_samples]
    feats = []
    for start in range(0, len(paths), batch_size):
        imgs = np.stack([load_image(p, image_size)
                         for p in paths[start:start + batch_size]])
        feats.append(extractor((imgs + 1.0) / 2.0))  # [-1,1] -> [0,1]
    feats = np.concatenate(feats, axis=0)
    mu, sigma = compute_statistics(feats)
    return mu, sigma, len(paths), feats


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from ..metrics import InceptionFeatureExtractor

    args = parse_args(argv)
    extractor = InceptionFeatureExtractor.from_torch_file(
        args.fid_weights, jit=jax.default_backend() != "cpu")
    mu, sigma, n, feats = compute_stats_for_dir(
        args.data_dir, extractor, batch_size=args.batch_size,
        image_size=args.image_size, num_samples=args.num_samples)
    # raw features ride along (f16, ~4 MB per 1k images) so evaluate can
    # also compute KID against the fixed reference set; (mu, sigma) alone
    # only supports the Frechet distance
    np.savez(args.out, mu=mu, sigma=sigma, num_images=n, dim=extractor.dim,
             features=feats.astype(np.float16))
    print(f"wrote {args.out}: {n} images, dim {extractor.dim}")
    return {"num_images": n, "dim": extractor.dim, "out": args.out}


if __name__ == "__main__":
    main()
