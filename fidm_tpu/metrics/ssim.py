"""SSIM in JAX, matching the reference's skimage configuration.

The reference computes SSIM per image with `skimage.metrics
.structural_similarity(win_size=11, channel_axis=2, data_range=1.0)`
(`test_inpainting_better.py:127-149`). This is the Wang et al. SSIM with a
uniform 11x11 window, K1=0.01, K2=0.03, no gaussian weighting — implemented
here as a batched, jittable NHWC function (mean over channels then window
positions, identical to skimage's channel-axis averaging).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["ssim", "psnr", "masked_ssim", "masked_psnr"]


def _uniform_filter(x, win: int):
    """Valid-mode uniform filter over H, W of an NHWC tensor."""
    kernel = jnp.ones((win, win, 1, 1), x.dtype) / (win * win)
    # depthwise: apply per channel
    c = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_map(img1, img2, win_size: int, data_range: float):
    if win_size < 3 or win_size % 2 == 0:
        raise ValueError(
            f"win_size must be odd and >= 3 (got {win_size}): the unbiased "
            "covariance normalization divides by win_size^2 - 1")
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    # skimage uses unbiased (ddof=1) covariance normalization
    NP = win_size * win_size
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(img1, win_size)
    uy = _uniform_filter(img2, win_size)
    uxx = _uniform_filter(img1 * img1, win_size)
    uyy = _uniform_filter(img2 * img2, win_size)
    uxy = _uniform_filter(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    s = (A1 * A2) / (B1 * B2)
    return s


# the default window everywhere (skimage's structural_similarity default);
# consumers needing the centred-window border radius should derive it as
# (DEFAULT_WIN_SIZE - 1) // 2 instead of hard-coding 5
DEFAULT_WIN_SIZE = 11


@partial(jax.jit, static_argnames=("win_size", "data_range"))
def ssim(img1, img2, *, win_size: int = DEFAULT_WIN_SIZE,
         data_range: float = 1.0):
    """Mean SSIM per batch element. img1/img2: [B,H,W,C] in [0, data_range]."""
    # skimage crops (win_size-1)//2 from each side of the *valid* map before
    # averaging; conv VALID already removed the borders, and skimage then
    # additionally crops pad pixels of the full map — the valid map equals
    # the cropped full map, so average directly.
    return _ssim_map(img1, img2, win_size, data_range).mean(axis=(1, 2, 3))


@partial(jax.jit, static_argnames=("win_size", "data_range"))
def masked_ssim(img1, img2, mask, *, win_size: int = DEFAULT_WIN_SIZE,
                data_range: float = 1.0):
    """SSIM averaged over window positions centred in the mask (hole).

    Whole-image SSIM barely moves when ~90% of pixels are copied from GT —
    the hole is the product. mask: [B,H,W,1], 1 = hole. Images with an
    empty mask return 0 (no hole to score). Like skimage's valid-window
    SSIM, hole pixels within (win_size-1)//2 of the image border have no
    centred window and are excluded; a hole lying entirely in that border
    band scores 0."""
    s = _ssim_map(img1, img2, win_size, data_range)
    r = (win_size - 1) // 2
    H, W = mask.shape[1], mask.shape[2]
    w = mask.astype(jnp.float32)[:, r:H - r, r:W - r, :]
    num = (s * w).sum(axis=(1, 2, 3))
    den = w.sum(axis=(1, 2, 3)) * s.shape[-1]
    return num / jnp.maximum(den, 1.0)


@jax.jit
def masked_psnr(img1, img2, mask, data_range: float = 1.0):
    """PSNR over mask (hole) pixels only. mask: [B,H,W,1], 1 = hole."""
    d = (img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2
    m = mask.astype(jnp.float32)
    mse = (d * m).sum(axis=(1, 2, 3)) / jnp.maximum(
        m.sum(axis=(1, 2, 3)) * d.shape[-1], 1.0)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


@jax.jit
def psnr(img1, img2, data_range: float = 1.0):
    """Peak signal-to-noise ratio per batch element, NHWC."""
    mse = jnp.mean((img1.astype(jnp.float32) - img2.astype(jnp.float32)) ** 2,
                   axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
