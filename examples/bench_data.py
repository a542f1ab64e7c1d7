"""Data-path microbenchmark: PIL re-decode vs packed uint8 memmap shards.

Generates a synthetic 256x256 dataset, measures epoch time through
InpaintingDataset+DataLoader both ways (the full item path: decode/memmap ->
normalize/compose -> mask pairing -> batch stacking). Run:

    python examples/bench_data.py [--num_images 64] [--epochs 3]

On the 1-core host the packed path skips the per-item JPEG decode that
dominates the reference's input pipeline (reference re-decodes per
__getitem__, `data/dataset.py:38-42`).
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fidm_tpu.data import DataLoader, InpaintingDataset, pack_dataset  # noqa: E402


def epoch_time(data_dir, mask_dir, batch_size, epochs):
    ds = InpaintingDataset(data_dir, mask_dir, "train", 256, "serial")
    loader = DataLoader(ds, batch_size, shuffle=True, drop_last=True)
    # warm one epoch (page cache, native-lib build)
    for _ in loader:
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for batch in loader:
            n += batch["image"].shape[0]
    return (time.perf_counter() - t0) / max(n, 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_images", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    root = Path(tempfile.mkdtemp(prefix="fidm_bench_data_"))
    try:
        img_dir = root / "images"
        mask_dir = root / "masks" / "train"
        img_dir.mkdir(parents=True)
        mask_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(args.num_images):
            arr = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
            Image.fromarray(arr).save(img_dir / f"{i:04d}.jpg", quality=92)
        m = np.full((256, 256), 255, np.uint8)
        m[64:192, 64:192] = 0
        Image.fromarray(m).save(mask_dir / "mask_0.png")

        packed = root / "packed"
        t0 = time.perf_counter()
        pack_dataset(img_dir, packed, img_size=256)
        pack_s = time.perf_counter() - t0

        pil_s = epoch_time(img_dir, root / "masks", args.batch_size, args.epochs)
        packed_s = epoch_time(packed, root / "masks", args.batch_size, args.epochs)
        print(json.dumps({
            "pil_s_per_item": round(pil_s, 6),
            "packed_s_per_item": round(packed_s, 6),
            "speedup": round(pil_s / packed_s, 2),
            "one_time_pack_s": round(pack_s, 3),
            "num_images": args.num_images,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
