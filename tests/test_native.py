"""Native C++ data-path kernels: build, determinism, parity with numpy."""
import ctypes

import numpy as np
import pytest

from fidm_tpu.native.build import load

lib = load()
pytestmark = pytest.mark.skipif(lib is None, reason="native toolchain absent")

F32P = ctypes.POINTER(ctypes.c_float)


def _mask(fn, size=64, seed=42, cov=(0.05, 0.60)):
    m = np.zeros((size, size), np.float32)
    achieved = fn(m.ctypes.data_as(F32P), size, ctypes.c_uint64(seed),
                  cov[0], cov[1])
    return m, achieved


def test_brush_mask_coverage_and_determinism():
    m1, cov1 = _mask(lib.fidm_brush_mask)
    m2, cov2 = _mask(lib.fidm_brush_mask)
    np.testing.assert_array_equal(m1, m2)
    assert cov1 == cov2
    assert 0.01 <= m1.mean() <= 0.75
    assert set(np.unique(m1)) <= {0.0, 1.0}
    m3, _ = _mask(lib.fidm_brush_mask, seed=43)
    assert not np.array_equal(m1, m3)


def test_box_mask_coverage():
    covs = [_mask(lib.fidm_box_mask, seed=s)[0].mean() for s in range(5)]
    assert all(0.01 <= c <= 0.80 for c in covs)
    assert np.std(covs) > 0.01


def test_normalize_compose_matches_numpy():
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = (rng.uniform(size=(32, 32)) > 0.5).astype(np.float32)
    image = np.empty((32, 32, 3), np.float32)
    masked = np.empty((32, 32, 3), np.float32)
    lib.fidm_normalize_compose(
        u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mask.ctypes.data_as(F32P),
        image.ctypes.data_as(F32P),
        masked.ctypes.data_as(F32P),
        32, 32,
    )
    expected = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(image, expected, atol=1e-6)
    np.testing.assert_allclose(
        masked, expected * (1 - mask[..., None]), atol=1e-6
    )


def test_random_mask_uses_native_path():
    from fidm_tpu.data.masks import random_mask

    rng = np.random.default_rng(0)
    m = random_mask(rng, 64, kind="brush", use_native=True)
    assert m.shape == (64, 64, 1)
    assert 0.0 < m.mean() < 0.8
