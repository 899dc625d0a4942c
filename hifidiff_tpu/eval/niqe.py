"""NIQE (Natural Image Quality Evaluator) — host-side numpy.

The reference gets NIQE from pyiqa (`test_refiner.py:107-109`). This is a
from-scratch implementation of the Mittal et al. algorithm:
  1. MSCN coefficients (local mean/variance normalization, 7x7 Gaussian).
  2. Per 96x96 patch: fit a generalized Gaussian (GGD) to the MSCN field and
     asymmetric GGDs (AGGD) to its 4 pairwise products -> 18 features, at two
     scales -> 36 features.
  3. Quality = Mahalanobis-style distance between the multivariate Gaussian
     of the test patches and a pristine-corpus model (mu, cov).

A pristine model file is required for absolute scores; `fit_niqe_model`
builds one from any pristine image set, so the metric is self-hostable
offline (no pyiqa model download).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma


def _gaussian_kernel2d(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    half = size // 2
    xs = np.arange(-half, half + 1)
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return k / k.sum()


def mscn(img: np.ndarray, kernel: Optional[np.ndarray] = None,
         c: float = 1.0) -> np.ndarray:
    """img: (H, W) float in [0, 255]."""
    if kernel is None:
        kernel = _gaussian_kernel2d()
    mu = convolve(img, kernel, mode="nearest")
    sigma = np.sqrt(np.abs(convolve(img * img, kernel, mode="nearest")
                           - mu * mu))
    return (img - mu) / (sigma + c)


_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = (gamma(1.0 / _GAM) * gamma(3.0 / _GAM)) / (gamma(2.0 / _GAM) ** 2)


def fit_ggd(x: np.ndarray) -> Tuple[float, float]:
    """Generalized Gaussian fit -> (alpha, sigma^2)."""
    sigma_sq = np.mean(x ** 2)
    e_abs = np.mean(np.abs(x))
    rho = sigma_sq / max(e_abs ** 2, 1e-12)
    alpha = _GAM[np.argmin(np.abs(_R_GAM - rho))]
    return float(alpha), float(sigma_sq)


def fit_aggd(x: np.ndarray) -> Tuple[float, float, float, float]:
    """Asymmetric GGD fit -> (alpha, mean, sigma_l^2, sigma_r^2)."""
    left = x[x < 0]
    right = x[x > 0]
    sigma_l = math.sqrt(np.mean(left ** 2)) if left.size else 1e-6
    sigma_r = math.sqrt(np.mean(right ** 2)) if right.size else 1e-6
    gamma_hat = sigma_l / max(sigma_r, 1e-12)
    e_abs = np.mean(np.abs(x))
    rhat = (e_abs ** 2) / max(np.mean(x ** 2), 1e-12)
    rhat_norm = rhat * (gamma_hat ** 3 + 1) * (gamma_hat + 1) / \
        (gamma_hat ** 2 + 1) ** 2
    r_alpha = (gamma(2.0 / _GAM) ** 2) / (gamma(1.0 / _GAM)
                                          * gamma(3.0 / _GAM))
    alpha = _GAM[np.argmin((r_alpha - rhat_norm) ** 2)]
    const = math.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    mean = (sigma_r - sigma_l) * (gamma(2.0 / alpha) / gamma(1.0 / alpha)) \
        * const
    return float(alpha), float(mean), float(sigma_l ** 2), float(sigma_r ** 2)


def _patch_features(patch: np.ndarray) -> np.ndarray:
    feats = []
    alpha, sigma_sq = fit_ggd(patch)
    feats += [alpha, sigma_sq]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for dy, dx in shifts:
        shifted = np.roll(np.roll(patch, dy, axis=0), dx, axis=1)
        feats += list(fit_aggd((patch * shifted).ravel()))
    return np.asarray(feats)


def niqe_features(img: np.ndarray, patch_size: int = 96) -> np.ndarray:
    """img: (H, W) luma in [0, 255] -> (num_patches, 36) features."""
    kernel = _gaussian_kernel2d()
    feats_scales = []
    for scale in range(2):
        coeffs = mscn(img, kernel)
        h, w = coeffs.shape
        ph, pw = h // patch_size, w // patch_size
        feats = []
        for i in range(ph):
            for j in range(pw):
                p = coeffs[i * patch_size:(i + 1) * patch_size,
                           j * patch_size:(j + 1) * patch_size]
                feats.append(_patch_features(p))
        feats_scales.append(np.asarray(feats))
        if scale == 0:
            # downsample by 2 (average pool) for the second scale
            h2, w2 = (h // 2) * 2, (w // 2) * 2
            img = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).mean((1, 3))
            patch_size //= 2
    n = min(len(feats_scales[0]), len(feats_scales[1]))
    if n == 0:
        raise ValueError("image too small for NIQE patches")
    return np.concatenate([feats_scales[0][:n], feats_scales[1][:n]], axis=1)


def rgb_to_luma(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) float [0,1] RGB -> (H, W) luma in [0, 255] (BT.601)."""
    return (img @ np.asarray([0.299, 0.587, 0.114])) * 255.0


def fit_niqe_model(images) -> Tuple[np.ndarray, np.ndarray]:
    """Fit the pristine MVG (mu, cov) from an iterable of (H, W, 3) [0,1]
    RGB images (use any HQ face corpus)."""
    all_feats = [niqe_features(rgb_to_luma(im)) for im in images]
    feats = np.concatenate(all_feats, axis=0)
    mu = np.nanmean(feats, axis=0)
    cov = np.cov(feats[~np.isnan(feats).any(axis=1)].T)
    return mu, cov


def niqe(img: np.ndarray, mu_pris: np.ndarray,
         cov_pris: np.ndarray) -> float:
    """img: (H, W, 3) float [0,1] RGB. Lower = more natural."""
    feats = niqe_features(rgb_to_luma(img))
    mu = np.nanmean(feats, axis=0)
    cov = np.cov(feats.T) if feats.shape[0] > 1 else np.zeros_like(cov_pris)
    pooled = (cov_pris + cov) / 2.0
    pinv = np.linalg.pinv(pooled)
    d = mu_pris - mu
    return float(math.sqrt(max(d @ pinv @ d, 0.0)))
