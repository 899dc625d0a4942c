"""Affine warp (STN): `affine_grid` + bilinear `grid_sample`, NHWC.

Matches torch semantics used by the reference STN (`models/cr/stn.py:49-50`):
`F.affine_grid(theta, size, align_corners=False)` followed by
`F.grid_sample(x, grid, mode='bilinear', padding_mode='zeros',
align_corners=False)`.

TPU formulation: the sample coordinates are an affine function of the output
grid, so we compute them in closed form and do four `take_along_axis` gathers
over the flattened H*W axis with out-of-bounds zero masking. XLA lowers these
to dynamic-gathers that run well at the feature-map sizes involved (<=128^2);
a fused Pallas kernel is a later optimization seam (same call signature).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def affine_grid(theta: jax.Array, size: Tuple[int, int],
                align_corners: bool = False) -> jax.Array:
    """Build a normalized sampling grid from affine matrices.

    Args:
      theta: (N, 2, 3) affine matrices (same convention as torch:
        [x_src, y_src]^T = theta @ [x_dst, y_dst, 1]^T, coords in [-1, 1]).
      size: output (H, W).
    Returns:
      (N, H, W, 2) grid of normalized (x, y) source coordinates.
    """
    h, w = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        # pixel centers: (2i + 1)/W - 1
        xs = (2.0 * jnp.arange(w) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h) + 1.0) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)                      # (H, W)
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)          # (H, W, 3)
    # (N,2,3) x (H,W,3) -> (N,H,W,2)
    return jnp.einsum("nij,hwj->nhwi", theta, base)


def grid_sample(x: jax.Array, grid: jax.Array,
                align_corners: bool = False) -> jax.Array:
    """Bilinear sampling with zero padding outside the input.

    Args:
      x: (N, H, W, C) input feature map.
      grid: (N, Ho, Wo, 2) normalized (x, y) coordinates in [-1, 1].
    Returns:
      (N, Ho, Wo, C) sampled output.
    """
    n, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    fx = ix - ix0
    fy = iy - iy0
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    def corner(iy_c, ix_c):
        valid = ((ix_c >= 0) & (ix_c < w) & (iy_c >= 0) & (iy_c < h))
        idx = jnp.clip(iy_c, 0, h - 1) * w + jnp.clip(ix_c, 0, w - 1)
        flat = x.reshape(n, h * w, c)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return vals * valid[..., None].astype(x.dtype)

    v00 = corner(iy0, ix0)
    v01 = corner(iy0, ix1)
    v10 = corner(iy1, ix0)
    v11 = corner(iy1, ix1)

    fx = fx[..., None].astype(x.dtype)
    fy = fy[..., None].astype(x.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def affine_warp(x: jax.Array, theta: jax.Array,
                align_corners: bool = False) -> jax.Array:
    """Warp an NHWC feature map by per-sample affine matrices (N, 2, 3)."""
    grid = affine_grid(theta, (x.shape[1], x.shape[2]),
                       align_corners=align_corners)
    return grid_sample(x, grid, align_corners=align_corners)
