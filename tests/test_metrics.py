"""Metrics tests: SSIM vs independent float64 numpy, FID math, LPIPS shape."""
import numpy as np
import pytest

from fidm_tpu.metrics import (
    LPIPS,
    RandomConvFeatureExtractor,
    compute_statistics,
    fid_from_features,
    frechet_distance,
    psnr,
    ssim,
)


def _numpy_ssim(img1, img2, win=11, data_range=1.0):
    """Independent float64 SSIM (uniform window, skimage semantics)."""
    from scipy.ndimage import uniform_filter

    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)
    pad = (win - 1) // 2
    vals = []
    for c in range(img1.shape[-1]):
        x = img1[..., c].astype(np.float64)
        y = img2[..., c].astype(np.float64)
        ux = uniform_filter(x, win)
        uy = uniform_filter(y, win)
        uxx = uniform_filter(x * x, win)
        uyy = uniform_filter(y * y, win)
        uxy = uniform_filter(x * y, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux**2 + uy**2 + C1) * (vx + vy + C2)
        )
        vals.append(s[pad:-pad, pad:-pad].mean())
    return np.mean(vals)


def test_ssim_matches_numpy_reference():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim(a, b))
    for i in range(2):
        expected = _numpy_ssim(a[i], b[i])
        assert ours[i] == pytest.approx(expected, abs=2e-4)


def test_ssim_identical_is_one():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32)
    assert float(np.asarray(ssim(a, a))[0]) == pytest.approx(1.0, abs=1e-5)


def test_ssim_monotone_in_noise():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    vals = []
    for sigma in (0.02, 0.1, 0.3):
        b = np.clip(a + rng.normal(0, sigma, a.shape), 0, 1).astype(np.float32)
        vals.append(float(np.asarray(ssim(a, b))[0]))
    assert vals[0] > vals[1] > vals[2]


def test_psnr_known_value():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = np.full((1, 8, 8, 3), 0.1, np.float32)
    # mse = 0.01 -> psnr = 20
    assert float(np.asarray(psnr(a, b))[0]) == pytest.approx(20.0, abs=1e-3)


def test_frechet_distance_identities():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    mu, sigma = compute_statistics(f)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    # mean shift by d adds d^2 * dim... actually ||diff||^2
    mu2 = mu + 1.0
    d = frechet_distance(mu, sigma, mu2, sigma)
    assert d == pytest.approx(16.0, rel=1e-6)


def test_fid_separates_distributions():
    rng = np.random.default_rng(0)
    real1 = rng.standard_normal((400, 32))
    real2 = rng.standard_normal((400, 32))
    fake = rng.standard_normal((400, 32)) * 2.0 + 1.0
    near = fid_from_features(real1, real2)
    far = fid_from_features(real1, fake)
    assert far > near * 5


def test_random_feature_extractor_deterministic():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    e1 = RandomConvFeatureExtractor(seed=0)(imgs)
    e2 = RandomConvFeatureExtractor(seed=0)(imgs)
    np.testing.assert_array_equal(e1, e2)
    assert e1.shape == (4, 256)


def test_lpips_proxy_properties():
    lp = LPIPS()  # proxy weights
    assert lp.is_proxy
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)
    d_same = lp(a, a)
    d_diff = lp(a, b)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 1e-4).all()


def test_masked_psnr_scores_hole_only():
    from fidm_tpu.metrics import masked_psnr

    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    b = a.copy()
    mask = np.zeros((2, 32, 32, 1), np.float32)
    mask[:, 8:24, 8:24] = 1.0
    # corrupt ONLY the hole: masked_psnr equals plain psnr of the crop
    b[:, 8:24, 8:24] = np.clip(
        b[:, 8:24, 8:24] + rng.normal(0, 0.2, (2, 16, 16, 3)), 0, 1)
    got = np.asarray(masked_psnr(a, b, mask))
    crop = np.asarray(psnr(a[:, 8:24, 8:24], b[:, 8:24, 8:24]))
    np.testing.assert_allclose(got, crop, rtol=1e-5)
    # corrupt ONLY the known region: hole metric stays perfect (capped)
    c = a.copy()
    c[:, :4] = 0.0
    assert (np.asarray(masked_psnr(a, c, mask)) > 100).all()


def test_masked_ssim_ignores_known_region():
    from fidm_tpu.metrics import masked_ssim

    rng = np.random.default_rng(8)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((1, 32, 32, 1), np.float32)
    mask[:, 10:22, 10:22] = 1.0
    # identical images -> 1.0 over the hole
    assert float(np.asarray(masked_ssim(a, a, mask))[0]) == pytest.approx(
        1.0, abs=1e-5)
    # noise in the hole drops it; whole-image ssim moves far less
    b = a.copy()
    b[:, 10:22, 10:22] = np.clip(
        b[:, 10:22, 10:22] + rng.normal(0, 0.3, (1, 12, 12, 3)), 0, 1)
    hole = float(np.asarray(masked_ssim(a, b, mask))[0])
    whole = float(np.asarray(ssim(a, b))[0])
    assert hole < whole < 1.0
    # empty mask -> defined (0), not NaN
    empty = np.zeros_like(mask)
    assert float(np.asarray(masked_ssim(a, b, empty))[0]) == 0.0


def test_ssim_win_size_validation_and_small_window():
    """Regression: win_size=1 previously hit an empty [0:0] mask slice /
    div-by-zero; now degenerate windows are rejected up front and the
    smallest valid window works."""
    from fidm_tpu.metrics import masked_ssim

    rng = np.random.default_rng(9)
    a = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    mask = np.ones((1, 16, 16, 1), np.float32)
    val = float(np.asarray(masked_ssim(a, a, mask, win_size=3))[0])
    assert val == pytest.approx(1.0, abs=1e-5)
    for bad in (1, 2, 4):
        with pytest.raises(ValueError, match="win_size"):
            masked_ssim(a, a, mask, win_size=bad)
        with pytest.raises(ValueError, match="win_size"):
            ssim(a, a, win_size=bad)


def test_polynomial_mmd2_matches_pairwise_loop():
    """The matrix form equals an independent O(n^2) per-pair loop of the
    published unbiased estimator (Binkowski et al. 2018, eq. 3)."""
    from fidm_tpu.metrics import polynomial_mmd2

    rng = np.random.default_rng(0)
    X = rng.standard_normal((6, 5))
    Y = rng.standard_normal((7, 5)) + 0.3
    g, c, d = 1.0 / 5, 1.0, 3

    def k(a, b):
        return (g * float(a @ b) + c) ** d

    m, n = len(X), len(Y)
    xx = sum(k(X[i], X[j]) for i in range(m) for j in range(m) if i != j)
    yy = sum(k(Y[i], Y[j]) for i in range(n) for j in range(n) if i != j)
    xy = sum(k(X[i], Y[j]) for i in range(m) for j in range(n))
    expected = xx / (m * (m - 1)) + yy / (n * (n - 1)) - 2 * xy / (m * n)
    assert polynomial_mmd2(X, Y) == pytest.approx(expected, rel=1e-12)


def test_kid_zero_for_same_distribution_positive_for_shift():
    from fidm_tpu.metrics import kid_from_features

    rng = np.random.default_rng(1)
    real = rng.standard_normal((400, 16))
    same = rng.standard_normal((400, 16))
    near = rng.standard_normal((400, 16)) + 0.2
    far = rng.standard_normal((400, 16)) + 1.0
    kid_same, _ = kid_from_features(real, same, n_subsets=20,
                                    max_subset_size=100)
    kid_near, _ = kid_from_features(real, near, n_subsets=20,
                                    max_subset_size=100)
    kid_far, _ = kid_from_features(real, far, n_subsets=20,
                                   max_subset_size=100)
    assert abs(kid_same) < 0.05
    assert kid_same < kid_near < kid_far
    # deterministic under a fixed seed
    again, _ = kid_from_features(real, near, n_subsets=20,
                                 max_subset_size=100)
    assert again == kid_near


def test_kid_small_sets_computed_exactly_once():
    """When both sets fit in one subset, every 'subset' would be a
    permutation of the full sets (the estimator is permutation-invariant):
    one exact computation, std reported as 0.0 — not 100 identical loops."""
    from fidm_tpu.metrics import kid_from_features, polynomial_mmd2

    rng = np.random.default_rng(2)
    real = rng.standard_normal((40, 8))
    fake = rng.standard_normal((40, 8)) + 0.5
    mean, std = kid_from_features(real, fake)  # default subset size 1000
    assert std == 0.0
    assert mean == pytest.approx(polynomial_mmd2(real, fake), rel=1e-12)


def test_masked_lpips_full_mask_equals_unmasked():
    """mask == 1 everywhere must reproduce the plain LPIPS exactly (the
    weighted mean degenerates to the spatial mean)."""
    lp = LPIPS()  # proxy weights; the masking math is weight-agnostic
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    full = np.ones((2, 64, 64, 1), np.float32)
    np.testing.assert_allclose(lp.masked(a, b, full), lp(a, b),
                               rtol=1e-5, atol=1e-6)


def test_masked_lpips_scores_hole_not_background():
    """With differences confined to the hole and GT copied elsewhere
    (the blended-output case), hole-LPIPS must exceed whole-image LPIPS
    (which dilutes over the untouched 75% of pixels)."""
    lp = LPIPS()
    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    mask = np.zeros((2, 64, 64, 1), np.float32)
    mask[:, 16:48, 16:48] = 1.0
    out = gt * (1 - mask) + np.clip(
        gt + rng.normal(0, 0.8, gt.shape).astype(np.float32), -1, 1) * mask
    hole = lp.masked(gt, out, mask)
    whole = lp(gt, out)
    assert np.all(hole > whole)
    # and an identical pair scores ~0 in the hole too
    np.testing.assert_allclose(lp.masked(gt, gt, mask), 0.0, atol=1e-6)
