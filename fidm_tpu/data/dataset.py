"""Torch-free data pipeline for inpainting training and evaluation.

Clean-room NHWC/numpy re-design of `/root/reference/code/data/dataset.py`:

- `InpaintingDataset` — image dir + split mask dirs (`mask_dir/{train,val,test}`)
  with serial (masks repeat in order to cover the image list,
  `data/dataset.py:84-105`), random (seeded), ordered (`idx % n_masks`,
  `data/dataset.py:273`), or *procedural* mask assignment (the README-promised
  generator the reference never implemented).
- Images decode via the native C++ loader (native/imgload.cpp — libjpeg/
  libpng + Pillow bit-compatible resize; PIL fallback per item), resize to
  `img_size`, normalize to [-1, 1] (`data/dataset.py:38-42`); masks follow
  black=inpaint inversion (`data/dataset.py:136-142`).
- `DataLoader` — a lightweight multi-epoch batcher (shuffle / drop-last /
  optional subset) yielding dicts of stacked NHWC numpy arrays, with an
  optional double-buffered device prefetcher for TPU feeding.

Every item is `{image, masked_image, mask, image_path, mask_path}` exactly as
the reference emits (`data/dataset.py:144-150`), but channel-last.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .masks import load_mask, random_mask

__all__ = [
    "list_images",
    "load_image",
    "InpaintingDataset",
    "DataLoader",
    "create_inpainting_dataloaders",
    "create_inference_dataloader",
]

IMAGE_EXTENSIONS = (".jpg", ".png", ".jpeg", ".bmp", ".tiff")


def list_images(directory) -> List[Path]:
    """Sorted, deduplicated image listing (`data/dataset.py:47-55`)."""
    directory = Path(directory)
    files = [
        p
        for p in directory.iterdir()
        if p.is_file() and p.suffix.lower() in IMAGE_EXTENSIONS
    ]
    return sorted(set(files))


def _decode_rgb_u8(path, size: int) -> np.ndarray:
    """uint8 [size, size, 3] via the native decoder (imgload.cpp,
    bit-identical to PIL), falling back to PIL per item."""
    from ..native.imgload import decode_resize

    u8 = decode_resize(path, size, "RGB")
    if u8 is not None:
        return u8
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def load_image(path, size: int) -> np.ndarray:
    """RGB image resized to size x size, float32 NHWC in [-1, 1]."""
    arr = _decode_rgb_u8(path, size).astype(np.float32) / 255.0
    return arr * 2.0 - 1.0


def _normalize_compose(u8: np.ndarray, mask: np.ndarray):
    """uint8 HWC -> ([-1,1] image, masked_image) via the C++ fused
    normalize+compose kernel (native/maskgen.cpp) when built; numpy
    fallback otherwise."""
    from ..native.build import load as load_native

    lib = load_native()
    if lib is None:
        image = u8.astype(np.float32) / 255.0 * 2.0 - 1.0
        return image, image * (1.0 - mask)

    import ctypes

    size_h, size_w = u8.shape[:2]
    u8 = np.ascontiguousarray(u8)
    m = np.ascontiguousarray(mask[..., 0], np.float32)
    image = np.empty((size_h, size_w, 3), np.float32)
    masked = np.empty((size_h, size_w, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fidm_normalize_compose(
        u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.ctypes.data_as(f32p),
        image.ctypes.data_as(f32p),
        masked.ctypes.data_as(f32p),
        size_h, size_w,
    )
    return image, masked


def _decode_normalize_compose(path, mask: np.ndarray, size: int):
    """(image, masked_image) from an image file: native (or PIL)
    decode+resize, then the fused normalize/compose kernel."""
    return _normalize_compose(_decode_rgb_u8(path, size), mask)


class InpaintingDataset:
    """Image + mask pairing with serial/random/ordered/procedural masks."""

    def __init__(
        self,
        data_dir,
        mask_dir=None,
        split: str = "train",
        img_size: int = 256,
        mask_mode: str = "serial",  # serial | random | ordered | procedural
        seed: int = 42,
        coverage=(0.05, 0.60),
        invert_mask: bool = True,
    ):
        """invert_mask=True applies black=inpaint inversion
        (`data/dataset.py:136-142`); False uses the file as-is with white=1
        = hole — the legacy `data/dataset1.py:105-110` convention."""
        self.img_size = img_size
        self.mask_mode = mask_mode
        self.seed = seed
        self.coverage = coverage
        self.invert_mask = invert_mask
        from .shards import ShardReader, is_packed_dir

        # decoded-mask cache: serial/ordered modes assign the same few mask
        # files to MANY images, and re-decoding them every item would be
        # the per-epoch bottleneck left after packed shards remove the
        # image decode (masks are tiny and read-only; procedural masks are
        # per-index and skip it)
        self._mask_cache: Dict[str, np.ndarray] = {}
        self.reader = None
        if is_packed_dir(data_dir):
            # packed uint8 shard dir (fidm_tpu.cli.pack_data) — memmap reads
            # instead of per-item JPEG decode
            self.reader = ShardReader(data_dir)
            self.images = [Path(p) for p in self.reader.paths]
            if getattr(self.reader, "img_size", img_size) != img_size:
                print(
                    f"WARNING: packed shards were written at "
                    f"{self.reader.img_size}px but img_size={img_size}: "
                    f"images will be resized twice (pack once per "
                    f"resolution for exact single-resize parity)"
                )
        else:
            self.images = list_images(data_dir)
        if not self.images:
            raise ValueError(f"No images found in {data_dir}")

        self.masks: List[Path] = []
        if mask_mode != "procedural":
            if mask_dir is None:
                raise ValueError("mask_dir required unless mask_mode='procedural'")
            mask_split_dir = Path(mask_dir) / split
            if not mask_split_dir.exists():
                # also accept a flat mask dir
                mask_split_dir = Path(mask_dir)
            self.masks = list_images(mask_split_dir)
            if not self.masks:
                raise ValueError(f"No masks found in {mask_split_dir}")

        if mask_mode == "serial":
            # repeat the mask list in order to cover all images
            # (`data/dataset.py:84-105`). NOTE: this assigns exactly the
            # same sequence as "ordered" below — both names exist only for
            # reference parity (its training and inference datasets built
            # the identical cycling two different ways)
            reps = -(-len(self.images) // len(self.masks))
            self.mask_sequence = (self.masks * reps)[: len(self.images)]
        elif mask_mode == "random":
            rng = np.random.default_rng(seed)
            self.mask_sequence = [
                self.masks[rng.integers(0, len(self.masks))]
                for _ in range(len(self.images))
            ]
        elif mask_mode == "ordered":
            # cycle masks by index (`data/dataset.py:273`)
            self.mask_sequence = [
                self.masks[i % len(self.masks)] for i in range(len(self.images))
            ]
        elif mask_mode == "procedural":
            self.mask_sequence = [None] * len(self.images)
        else:
            raise ValueError(f"unknown mask_mode: {mask_mode}")

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int) -> Dict:
        img_path = self.images[idx]
        mask_path = self.mask_sequence[idx]
        if mask_path is None:
            rng = np.random.default_rng(self.seed * 1_000_003 + idx)
            mask = random_mask(rng, self.img_size, self.coverage)
            mask_path = f"<procedural:{idx}>"
        elif (cached := self._mask_cache.get(str(mask_path))) is not None:
            mask = cached
        else:
            if self.invert_mask:
                mask = load_mask(mask_path, self.img_size)
            else:
                from PIL import Image

                m = Image.open(mask_path).convert("L").resize(
                    (self.img_size, self.img_size), Image.BILINEAR
                )
                mask = (np.asarray(m, np.float32) / 255.0)[..., None]
            mask.flags.writeable = False  # shared across items
            self._mask_cache[str(mask_path)] = mask
        if self.reader is not None:
            image, masked_image = _normalize_compose(
                self.reader.get(idx, self.img_size), mask
            )
        else:
            image, masked_image = _decode_normalize_compose(
                img_path, mask, self.img_size
            )
        return {
            "image": image,
            "masked_image": masked_image,
            "mask": mask,
            "image_path": str(img_path),
            "mask_path": str(mask_path),
        }


class DataLoader:
    """Minimal batcher: shuffle, drop_last, stacked numpy dict batches.

    Every array-valued item key is stacked (so e.g. a "label" key from a
    class-conditional dataset reaches `make_train_step`); numeric scalars
    become 1-D arrays; anything else (paths) stays a list."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 subset: Optional[Sequence[int]] = None,
                 process_local: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        # process_local=True (multi-host training; training.loop.fit flips
        # it automatically under jax.process_count() > 1): every process
        # computes the SAME global epoch order (seed+epoch), then yields
        # only its per-batch slice of it — batch_size stays the GLOBAL
        # batch size, each host emits batch_size/process_count rows per
        # step, and parallel.multihost.global_batch reassembles global
        # batches with exactly the single-process composition and order
        # (the loss-parity property, tests/test_multihost_train.py).
        # Implies drop_last across a ragged tail. Single-process: no-op.
        self.process_local = process_local
        self.indices = np.asarray(
            subset if subset is not None else np.arange(len(dataset))
        )

    def __len__(self):
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict]:
        idx = self.indices.copy()
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        step = self.batch_size
        if self.process_local:
            import jax

            if jax.process_count() > 1:
                from ..parallel.multihost import host_local_slice

                idx = host_local_slice(idx, self.batch_size)
                step = self.batch_size // jax.process_count()
        for start in range(0, len(idx), step):
            chunk = idx[start : start + step]
            if (self.drop_last or step != self.batch_size) and \
                    len(chunk) < step:
                break
            items = [self.dataset[int(i)] for i in chunk]
            batch = {}
            for k, v0 in items[0].items():
                if isinstance(v0, np.ndarray):
                    batch[k] = np.stack([it[k] for it in items])
                elif isinstance(v0, (int, float, np.integer, np.floating)
                                ) and not isinstance(v0, bool):
                    batch[k] = np.asarray([it[k] for it in items])
                else:
                    batch[k] = [it[k] for it in items]
            yield batch


def create_inpainting_dataloaders(
    train_dir, val_dir, mask_dir, batch_size=4, img_size=256,
    mask_mode="serial", seed=42,
):
    """Train/val loader pair (`data/dataset.py:298-357`): shuffled train with
    drop_last, sequential val.

    The val loader also drops a ragged final batch when more than one
    device is visible: a mesh-sharded eval step requires the batch dim to
    divide over the data axis, and crashing at the end of epoch 1 on a pod
    is worse than skipping < batch_size validation images."""
    import jax

    train_ds = InpaintingDataset(train_dir, mask_dir, "train", img_size,
                                 mask_mode, seed)
    val_ds = InpaintingDataset(val_dir, mask_dir, "val", img_size,
                               mask_mode, seed + 57)
    val_drop = len(jax.devices()) > 1 and len(val_ds) % batch_size != 0
    return (
        DataLoader(train_ds, batch_size, shuffle=True, drop_last=True, seed=seed),
        DataLoader(val_ds, batch_size, shuffle=False, drop_last=val_drop),
    )


def create_inference_dataloader(
    test_dir, mask_dir, batch_size=4, img_size=256, num_samples=None, seed=42,
    mask_mode="ordered",
):
    """Test loader with ordered mask cycling and optional random subset
    (`data/dataset.py:379-454`)."""
    ds = InpaintingDataset(test_dir, mask_dir, "test", img_size, mask_mode, seed)
    subset = None
    if num_samples is not None and num_samples < len(ds):
        rng = np.random.default_rng(seed)
        subset = rng.choice(len(ds), size=num_samples, replace=False)
    return DataLoader(ds, batch_size, shuffle=False, subset=subset)
