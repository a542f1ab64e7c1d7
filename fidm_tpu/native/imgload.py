"""Numpy-facing API over the native image loader (imgload.cpp).

`decode_resize` / `decode_resize_batch` return uint8 arrays matching the
PIL pipeline the data layer otherwise uses
(`Image.open(p).convert(mode).resize((size, size), Image.BILINEAR)`;
reference pipeline: /root/reference/code/data/dataset.py:38-42). Resize is
bit-identical to Pillow (same fixed-point resampler); JPEG decode rides the
system libjpeg, which can differ from Pillow's bundled decoder by ±1 LSB.

Every entry point returns ``None`` when the native library is unavailable or
the file cannot be decoded — callers fall back to PIL per item.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .build import load_imgload

__all__ = ["decode_resize", "decode_resize_batch"]

_MODES = {"RGB": 3, "L": 1}


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_resize(path, size: int, mode: str = "RGB") -> Optional[np.ndarray]:
    """Decode one JPEG/PNG and resize to (size, size).

    Returns uint8 [size, size, 3] for mode="RGB", [size, size] for mode="L",
    or None when the native path is unavailable / the decode fails.
    """
    lib = load_imgload()
    if lib is None:
        return None
    ch = _MODES[mode]
    out = np.empty((size, size, ch) if ch > 1 else (size, size), np.uint8)
    rc = lib.fidm_load_image(os.fsencode(str(path)), size, ch, _u8p(out))
    return out if rc == 0 else None


def decode_resize_batch(
    paths: Sequence, size: int, mode: str = "RGB", nthreads: int = 0
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Threaded batch decode+resize.

    Returns (out, ok): out uint8 [N, size, size, C] (C dropped for mode="L"),
    ok bool [N] marking per-item success (failed rows are undefined — reload
    those via PIL). None when the native library is unavailable.
    """
    lib = load_imgload()
    if lib is None:
        return None
    n = len(paths)
    ch = _MODES[mode]
    shape = (n, size, size, ch) if ch > 1 else (n, size, size)
    out = np.empty(shape, np.uint8)
    ok = np.zeros((n,), np.uint8)
    if n == 0:
        return out, ok.astype(bool)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(str(p)) for p in paths]
    )
    lib.fidm_load_batch(c_paths, n, size, ch, _u8p(out), _u8p(ok),
                        int(nthreads))
    return out, ok.astype(bool)
