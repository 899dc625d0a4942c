"""Bicubic resize with torch `F.interpolate(mode="bicubic")` parity, as matmuls.

The reference resizes on-device with torch bicubic (align_corners=False,
a=-0.75, no antialias) in the latent-encode path (`train_refiner.py:72-83`)
and in dataset LR protocols. On TPU the natural formulation is *separable
dense matmuls*: resize(H_in -> H_out) is a precomputed (H_out, H_in) cubic
weight matrix; a 2D resize is two matmuls that ride the MXU and fuse with
neighbouring ops. Sizes here are <= 512 so the dense matrices are tiny.

Index convention: src = (dst + 0.5) * (in/out) - 0.5, taps clamped to the
border (replicate), matching torch's `upsample_bicubic2d`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """(out_size, in_size) row-stochastic cubic interpolation matrix."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(np.asarray(tap) - frac, a)
        np.add.at(mat, (dst.astype(np.int64), idx), w)
    return mat.astype(np.float32)


def resize_bicubic_torch(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bicubic-resize an (..., H, W, C) NHWC tensor to (..., H', W', C).

    Matches torch `F.interpolate(x, size, mode="bicubic",
    align_corners=False)` (no antialias, values NOT clamped — torch bicubic
    can overshoot outside the input range, and downstream code relies on
    clamping explicitly, e.g. `pretrain_denoiser.py:58`).
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    mh = jnp.asarray(_resize_matrix(h, oh))
    mw = jnp.asarray(_resize_matrix(w, ow))
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    x = jnp.einsum("pw,...owc->...opc", mw, x)
    return x
