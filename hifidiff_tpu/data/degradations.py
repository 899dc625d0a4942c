"""Blind degradation pipeline (host-side numpy/cv2).

Reproduces the semantics the reference pulls from basicsr
(`dataset_multipie.py:104-146`): random iso/aniso bivariate Gaussian blur
kernels, random bilinear downsample by U(1,8), additive Gaussian noise with
sigma ~ U(0,5)/255, JPEG round-trip at quality U(80,100), joint color
jitter, and rare to-gray conversion. Everything takes an explicit
`np.random.Generator` so loaders are reproducible and shardable.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def bivariate_gaussian_kernel(kernel_size: int, sigma_x: float,
                              sigma_y: float, theta: float) -> np.ndarray:
    """Rotated anisotropic Gaussian kernel, normalized to sum 1."""
    half = kernel_size // 2
    xs, ys = np.meshgrid(np.arange(-half, half + 1),
                         np.arange(-half, half + 1))
    coords = np.stack([xs, ys], axis=-1).astype(np.float64)  # (k, k, 2)
    c, s = math.cos(theta), math.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    sigma = rot @ np.diag([sigma_x ** 2, sigma_y ** 2]) @ rot.T
    inv = np.linalg.inv(sigma)
    z = np.einsum("hwi,ij,hwj->hw", coords, inv, coords)
    kernel = np.exp(-0.5 * z)
    return (kernel / kernel.sum()).astype(np.float32)


def random_mixed_kernel(rng: np.random.Generator, kernel_size: int,
                        sigma_x_range=(0.1, 1.0), sigma_y_range=(0.1, 1.0),
                        rotation_range=(-math.pi, math.pi),
                        iso_prob: float = 0.5) -> np.ndarray:
    """iso/aniso mixture, matching the reference's `random_mixed_kernels`
    call with ["iso", "aniso"] at [0.5, 0.5] (`dataset_multipie.py:107-115`)."""
    sigma_x = rng.uniform(*sigma_x_range)
    if rng.uniform() < iso_prob:
        return bivariate_gaussian_kernel(kernel_size, sigma_x, sigma_x, 0.0)
    sigma_y = rng.uniform(*sigma_y_range)
    theta = rng.uniform(*rotation_range)
    return bivariate_gaussian_kernel(kernel_size, sigma_x, sigma_y, theta)


def add_gaussian_noise(rng: np.random.Generator, img: np.ndarray,
                       sigma_range=(0.0, 5.0)) -> np.ndarray:
    """img float32 [0,1]; sigma drawn in 8-bit units (basicsr convention)."""
    sigma = rng.uniform(*sigma_range) / 255.0
    noise = rng.standard_normal(img.shape, dtype=np.float32) * sigma
    return np.clip(img + noise, 0.0, 1.0)


def jpeg_roundtrip(rng: np.random.Generator, img: np.ndarray,
                   quality_range=(80, 100)) -> np.ndarray:
    """Encode/decode through JPEG at a random quality; img float32 [0,1]."""
    q = int(rng.uniform(*quality_range))
    ok, enc = cv2.imencode(
        ".jpg", (img * 255.0).clip(0, 255).astype(np.uint8),
        [int(cv2.IMWRITE_JPEG_QUALITY), q])
    assert ok
    return cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255.0


def color_jitter_pair(rng: np.random.Generator, a: np.ndarray, b: np.ndarray,
                      shift: float = 0.05):
    """Joint per-channel shift applied to both images
    (`dataset_multipie.py:26-34`)."""
    jitter = rng.uniform(-shift, shift, 3).astype(np.float32)
    return (np.clip(a + jitter, 0, 1), np.clip(b + jitter, 0, 1))


def to_gray3(img: np.ndarray) -> np.ndarray:
    g = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    return np.tile(g[:, :, None], (1, 1, 3))


def blind_degrade(rng: np.random.Generator, img: np.ndarray,
                  size: int = 128) -> np.ndarray:
    """The full blind branch on a float32 [0,1] image (BGR or RGB —
    channelwise ops only except to-gray): blur -> downsample U(1,8) ->
    noise -> JPEG -> resize back (`dataset_multipie.py:104-146`; color
    jitter/to-gray are applied by the caller because jitter is joint with
    the GT).

    Uses the C++ core (native/src/hifidiff_native.cc) when built — the
    blur+downsample+noise stage is one fused native pass; JPEG stays on
    cv2's codec either way."""
    from hifidiff_tpu.data import native

    ksize = int(rng.integers(4, 6)) * 2 + 1  # 9 or 11
    kernel = random_mixed_kernel(rng, ksize)
    scale = rng.uniform(1.0, 8.0)
    small = int(128 // scale)
    sigma = rng.uniform(0.0, 5.0) / 255.0

    if native.available():
        img = native.degrade_stage1(img, kernel, (small, small), sigma,
                                    int(rng.integers(0, 2 ** 62)))
        img = jpeg_roundtrip(rng, img)
        return native.resize(img, (size, size), cubic=False)

    img = cv2.filter2D(img, -1, kernel)
    img = cv2.resize(img, (small, small), interpolation=cv2.INTER_LINEAR)
    noise = rng.standard_normal(img.shape).astype(np.float32) * sigma
    img = np.clip(img + noise, 0.0, 1.0)
    img = jpeg_roundtrip(rng, img)
    return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)


def quantize_8bit(img: np.ndarray) -> np.ndarray:
    """Snap to the 8-bit grid (`dataset_multipie.py:160-166`)."""
    return np.clip(np.rint(img * 255.0), 0, 255).astype(np.float32) / 255.0
