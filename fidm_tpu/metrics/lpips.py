"""LPIPS (AlexNet backbone) natively in JAX, with torch-weight import.

The reference uses `lpips.LPIPS(net='alex')` batched on GPU
(`test_inpainting_better.py:120-125,239-264`). This is the same computation
as a pure JAX function: AlexNet conv features at the five ReLU taps,
channel-unit-normalization, learned 1x1 linear heads, spatial mean, layer
sum. Weights import from the standard torch checkpoints (torchvision AlexNet
`features.*` + lpips `lin*.model.1.weight`) supplied locally by the user —
this environment has no network egress, so no pretrained default ships.

Without weights, `LPIPS(weights=None)` uses seeded random filters: a
*proxy* perceptual distance for tests/relative comparisons only.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "convert_torch_lpips_weights"]

# AlexNet feature config: (out_ch, kernel, stride, pad), ReLU taps after each
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after taps 0 and 1

# lpips input scaling constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def convert_torch_lpips_weights(alexnet_sd: Dict, lpips_sd: Dict) -> Dict:
    """Torch state dicts -> our weight pytree.

    alexnet_sd: torchvision AlexNet (keys `features.{0,3,6,8,10}.weight/bias`)
    lpips_sd: lpips LPIPS(net='alex') (keys `lin{0..4}.model.1.weight`)
    """
    conv_idx = [0, 3, 6, 8, 10]
    convs = []
    for i in conv_idx:
        w = np.asarray(alexnet_sd[f"features.{i}.weight"])  # OIHW
        b = np.asarray(alexnet_sd[f"features.{i}.bias"])
        convs.append({"kernel": w.transpose(2, 3, 1, 0), "bias": b})
    lins = []
    for i in range(5):
        w = np.asarray(lpips_sd[f"lin{i}.model.1.weight"])  # [1, C, 1, 1]
        lins.append(w[0, :, 0, 0])
    return {"convs": convs, "lins": lins}


class LPIPS:
    def __init__(self, weights: Optional[Dict] = None, seed: int = 0):
        if weights is None:
            rng = np.random.default_rng(seed)
            weights = {"convs": [], "lins": []}
            in_ch = 3
            for out_ch, k, s, p in _ALEX:
                fan = in_ch * k * k
                weights["convs"].append({
                    "kernel": (rng.standard_normal((k, k, in_ch, out_ch))
                               / np.sqrt(fan)).astype(np.float32),
                    "bias": np.zeros(out_ch, np.float32),
                })
                weights["lins"].append(
                    np.full(out_ch, 1.0 / out_ch, np.float32)
                )
                in_ch = out_ch
            self.is_proxy = True
        else:
            self.is_proxy = False
        self.weights = jax.tree_util.tree_map(jnp.asarray, weights)

        @jax.jit
        def distance(x, y):
            fx = self._features(x)
            fy = self._features(y)
            total = 0.0
            for a, b, lin in zip(fx, fy, self.weights["lins"]):
                # lpips `normalize_tensor`: x / (||x||_c + eps), eps OUTSIDE
                # the sqrt (matches the package bit-for-bit; tested against
                # the vendored torch oracle)
                a = a / (jnp.sqrt(jnp.sum(a**2, -1, keepdims=True)) + 1e-10)
                b = b / (jnp.sqrt(jnp.sum(b**2, -1, keepdims=True)) + 1e-10)
                d = (a - b) ** 2
                # learned linear head (1x1 conv, no clamp at inference),
                # then spatial mean
                total = total + (d * lin).sum(-1).mean((1, 2))
            return total

        self._distance = distance

        @jax.jit
        def masked_distance(x, y, mask):
            # hole-region LPIPS (extension beyond the lpips package, which
            # has no mask support): the plain spatial mean becomes a
            # mask-weighted mean per tap, the mask bilinearly resized to
            # each tap's receptive grid. With mask == 1 this reduces
            # exactly to `distance`.
            fx = self._features(x)
            fy = self._features(y)
            m = mask.astype(jnp.float32)
            total = 0.0
            for a, b, lin in zip(fx, fy, self.weights["lins"]):
                a = a / (jnp.sqrt(jnp.sum(a**2, -1, keepdims=True)) + 1e-10)
                b = b / (jnp.sqrt(jnp.sum(b**2, -1, keepdims=True)) + 1e-10)
                d = ((a - b) ** 2 * lin).sum(-1)  # [B, h, w]
                mk = jax.image.resize(
                    m, (m.shape[0],) + a.shape[1:3] + (1,), "linear"
                )[..., 0]
                total = total + (d * mk).sum((1, 2)) / jnp.maximum(
                    mk.sum((1, 2)), 1e-6)
            return total

        self._masked_distance = masked_distance

    def _features(self, x):
        """x: [B,H,W,3] in [-1,1] -> list of 5 NHWC feature maps."""
        h = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        taps = []
        for i, ((out_ch, k, s, p), conv) in enumerate(
            zip(_ALEX, self.weights["convs"])
        ):
            h = jax.lax.conv_general_dilated(
                h, conv["kernel"], (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + conv["bias"]
            h = jax.nn.relu(h)
            taps.append(h)
            if i in _POOL_AFTER:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID",
                )
        return taps

    def __call__(self, img1, img2) -> np.ndarray:
        """Perceptual distance per batch element; inputs [-1,1] NHWC."""
        return np.asarray(self._distance(jnp.asarray(img1, jnp.float32),
                                         jnp.asarray(img2, jnp.float32)))

    def masked(self, img1, img2, mask) -> np.ndarray:
        """Hole-region perceptual distance: the per-tap spatial mean is
        weighted by `mask` ([B,H,W,1], 1 = hole) resized to each tap's
        grid. With blending on, whole-image LPIPS is diluted by the ~90%
        of pixels copied from GT — this scores only the generated region.
        mask == 1 everywhere reproduces `__call__` exactly."""
        return np.asarray(self._masked_distance(
            jnp.asarray(img1, jnp.float32), jnp.asarray(img2, jnp.float32),
            jnp.asarray(mask, jnp.float32)))

    @classmethod
    def from_torch_files(cls, alexnet_path: str, lpips_path: str) -> "LPIPS":
        import torch

        alex = torch.load(alexnet_path, map_location="cpu", weights_only=False)
        lin = torch.load(lpips_path, map_location="cpu", weights_only=False)
        to_np = lambda sd: {k: v.detach().numpy() if hasattr(v, "detach") else v
                            for k, v in sd.items()}
        return cls(convert_torch_lpips_weights(to_np(alex), to_np(lin)))
