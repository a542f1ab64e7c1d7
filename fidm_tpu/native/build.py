"""Build + ctypes loaders for the native data-path kernels.

Two independently-loaded shared objects (so a missing system library for one
never takes down the other):

- ``libfidm_native.so`` (maskgen.cpp) — procedural masks + fused
  normalize/compose.
- ``libfidm_imgload.so`` (imgload.cpp) — libjpeg/libpng decode + Pillow
  bit-compatible resize + threaded batch loading.

Compiled lazily with g++ on first use; callers fall back to the numpy/PIL
implementations when the toolchain or .so is unavailable. Disable with
FIDM_TPU_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "maskgen.cpp")
_LIB = os.path.join(_HERE, "_artifacts", "libfidm_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build(src: str, lib: str, extra=()) -> bool:
    os.makedirs(os.path.dirname(lib), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", lib,
             src, *extra],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("FIDM_TPU_NATIVE", "1") in ("0", "false"):
        return None
    if not os.path.exists(_LIB) or (
        os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
    ):
        if not _build(_SRC, _LIB):
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for name in ("fidm_brush_mask", "fidm_box_mask"):
        fn = getattr(lib, name)
        fn.argtypes = [f32p, ctypes.c_int, ctypes.c_uint64, ctypes.c_float,
                       ctypes.c_float]
        fn.restype = ctypes.c_float
    lib.fidm_normalize_compose.argtypes = [u8p, f32p, f32p, f32p,
                                           ctypes.c_int, ctypes.c_int]
    lib.fidm_normalize_compose.restype = None
    _lib = lib
    return _lib


_IMG_SRC = os.path.join(_HERE, "imgload.cpp")
_IMG_LIB = os.path.join(_HERE, "_artifacts", "libfidm_imgload.so")

_img_lib: Optional[ctypes.CDLL] = None
_img_tried = False


def load_imgload() -> Optional[ctypes.CDLL]:
    """The image-loading library (libjpeg/libpng decode + Pillow-compatible
    resize), building it on first call; None if unavailable."""
    global _img_lib, _img_tried
    if _img_lib is not None or _img_tried:
        return _img_lib
    _img_tried = True
    if os.environ.get("FIDM_TPU_NATIVE", "1") in ("0", "false"):
        return None
    if not os.path.exists(_IMG_LIB) or (
        os.path.getmtime(_IMG_LIB) < os.path.getmtime(_IMG_SRC)
    ):
        if not _build(_IMG_SRC, _IMG_LIB, extra=("-ljpeg", "-lpng")):
            return None
    try:
        lib = ctypes.CDLL(_IMG_LIB)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.fidm_load_image.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.c_int, u8p]
    lib.fidm_load_image.restype = ctypes.c_int
    lib.fidm_load_batch.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    u8p, u8p, ctypes.c_int]
    lib.fidm_load_batch.restype = ctypes.c_int
    _img_lib = lib
    return _img_lib
