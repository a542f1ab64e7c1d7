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
  `tests/test_metric_oracles.py` (oracle: tests/oracle_fid_inception.py).
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
    "polynomial_mmd2",
    "kid_from_features",
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

    def _sqrtm(a):
        # scipy >= 1.16 deprecates disp= and returns the array alone;
        # older versions return (sqrtm, errest) with disp=False
        res = linalg.sqrtm(a)
        return res[0] if isinstance(res, tuple) else res

    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    mu1, s1 = compute_statistics(real)
    mu2, s2 = compute_statistics(fake)
    return frechet_distance(mu1, s1, mu2, s2)


def polynomial_mmd2(f_real: np.ndarray, f_fake: np.ndarray,
                    degree: int = 3, gamma: Optional[float] = None,
                    coef0: float = 1.0) -> float:
    """Unbiased MMD² with the KID polynomial kernel
    k(x, y) = (gamma x·y + coef0)^degree (Bińkowski et al. 2018,
    arXiv:1801.01401; gamma defaults to 1/dim as in the paper)."""
    X = np.asarray(f_real, np.float64)
    Y = np.asarray(f_fake, np.float64)
    if len(X) < 2 or len(Y) < 2:
        raise ValueError("MMD needs at least 2 samples per set")
    g = gamma if gamma is not None else 1.0 / X.shape[1]
    k_xx = (g * (X @ X.T) + coef0) ** degree
    k_yy = (g * (Y @ Y.T) + coef0) ** degree
    k_xy = (g * (X @ Y.T) + coef0) ** degree
    m, n = len(X), len(Y)
    term_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    term_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    return float(term_xx + term_yy - 2.0 * k_xy.mean())


def kid_from_features(real: np.ndarray, fake: np.ndarray,
                      n_subsets: int = 100, max_subset_size: int = 1000,
                      seed: int = 0) -> Tuple[float, float]:
    """Kernel Inception Distance: (mean, std) of the unbiased polynomial
    MMD² over random subsets — the torch-fidelity / tf-gan protocol.

    KID complements FID (which the reference publishes,
    `test_inpainting_better.py:151-223`): the estimator is unbiased, so it
    stays meaningful at the small sample counts where FID's 2048x2048
    covariance estimate is badly biased. Deterministic for a given seed."""
    real = np.asarray(real)
    fake = np.asarray(fake)
    m = min(len(real), max_subset_size)
    n = min(len(fake), max_subset_size)
    if m == len(real) and n == len(fake):
        # every "subset" would be a permutation of the full sets and the
        # estimator is permutation-invariant: one exact computation; the
        # subset-variance statistic is undefined (0.0) at this sample count
        return polynomial_mmd2(real, fake), 0.0
    rng = np.random.default_rng(seed)
    vals = [
        polynomial_mmd2(real[rng.choice(len(real), m, replace=False)],
                        fake[rng.choice(len(fake), n, replace=False)])
        for _ in range(n_subsets)
    ]
    v = np.asarray(vals, np.float64)
    return float(v.mean()), float(v.std())


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
