"""FID: activation statistics + Frechet distance, with pluggable features.

The reference shells out to `pytorch_fid` over saved PNG directories with
InceptionV3 pool3 features (`test_inpainting_better.py:151-223`). Here the
statistics pipeline is native (batched feature accumulation on device, f64
mean/covariance on host, Frechet distance via scipy sqrtm with the standard
eps-regularized fallback), and the feature extractor is pluggable:

- `InceptionFeatureExtractor` (from `.inception`, re-exported here) — the
  real FID instrument: a native-JAX FID-InceptionV3 (pool3, 2048-d) fed by
  `pt_inception-2015-12-05`-layout torch weights the user supplies locally;
  this environment has no network egress and ships no pretrained weights,
  so there is no silently-wrong default. Oracle-parity-tested in
  `tests/test_fid_inception.py`.
- `RandomConvFeatureExtractor` — a seeded random-projection CNN producing a
  *proxy* FID for pipeline tests and relative comparisons only (documented
  as NOT comparable to published FID numbers).
"""
from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import InceptionFeatureExtractor

__all__ = [
    "compute_statistics",
    "frechet_distance",
    "fid_from_features",
    "InceptionFeatureExtractor",
    "RandomConvFeatureExtractor",
]


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an [N, D] feature matrix in float64."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Frechet distance between two Gaussians (the FID formula).

    ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), with the standard
    eps-on-diagonal retry when the matrix sqrt is numerically singular.
    """
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    mu1, s1 = compute_statistics(real)
    mu2, s2 = compute_statistics(fake)
    return frechet_distance(mu1, s1, mu2, s2)


class RandomConvFeatureExtractor:
    """Seeded random CNN features — a PROXY metric for pipeline testing.

    Distances are meaningful only relative to other runs of this extractor
    with the same seed; they are NOT comparable to InceptionV3 FID.
    """

    def __init__(self, dim: int = 256, seed: int = 0, image_size: int = 256):
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self.w1 = jax.random.normal(k1, (3, 3, 3, 32)) * 0.3
        self.w2 = jax.random.normal(k2, (3, 3, 32, 64)) * 0.15
        self.w3 = jax.random.normal(k3, (3, 3, 64, dim)) * 0.1

        @jax.jit
        def extract(x):
            # x: [B,H,W,3] in [0,1]
            h = x * 2.0 - 1.0
            for w in (self.w1, self.w2, self.w3):
                h = jax.lax.conv_general_dilated(
                    h, w, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = jax.nn.relu(h)
            return h.mean(axis=(1, 2))

        self._extract = extract

    def __call__(self, images01: np.ndarray) -> np.ndarray:
        return np.asarray(self._extract(jnp.asarray(images01, jnp.float32)))


def fid_between_image_sets(
    real_images01: Iterable[np.ndarray],
    fake_images01: Iterable[np.ndarray],
    extractor: Optional[Callable] = None,
    batch_size: int = 32,
) -> float:
    """FID between two iterables of [B,H,W,3] image arrays in [0,1]."""
    extractor = extractor or RandomConvFeatureExtractor()

    def feats(batches):
        out = []
        for b in batches:
            b = np.asarray(b)
            for i in range(0, len(b), batch_size):
                out.append(extractor(b[i : i + batch_size]))
        return np.concatenate(out, axis=0)

    return fid_from_features(feats(real_images01), feats(fake_images01))
