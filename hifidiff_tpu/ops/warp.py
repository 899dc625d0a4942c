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
    # explicit broadcast arithmetic instead of einsum: an einsum here hits
    # the MXU at default precision, i.e. the COORDINATES get rounded to
    # bf16 (~0.25 px error at 128 wide) — torch computes the grid in f32
    t = theta.astype(jnp.float32)
    sx = (t[:, 0, 0, None, None] * gx + t[:, 0, 1, None, None] * gy
          + t[:, 0, 2, None, None])
    sy = (t[:, 1, 0, None, None] * gx + t[:, 1, 1, None, None] * gy
          + t[:, 1, 2, None, None])
    return jnp.stack([sx, sy], axis=-1)


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


def _warp_gather(x: jax.Array, theta: jax.Array,
                 align_corners: bool = False) -> jax.Array:
    """Reference formulation: affine grid + 4-corner gathers."""
    grid = affine_grid(theta, (x.shape[1], x.shape[2]),
                       align_corners=align_corners)
    return grid_sample(x, grid, align_corners=align_corners)


def _pixel_coef(theta: jax.Array, h: int, w: int) -> jax.Array:
    """(N, 2, 3) normalized-coords theta -> (N, 8) f32 pixel-space affine
    coefficients [ax, bx, cx, ay, by, cy, 0, 0] such that (align_corners=
    False semantics, matching `affine_grid` + `grid_sample` above):
        sx(i, j) = ax*j + bx*i + cx,   sy(i, j) = ay*j + by*i + cy."""
    t = theta.astype(jnp.float32)
    ax = t[:, 0, 0]
    bx = t[:, 0, 1] * (w / h)
    ay = t[:, 1, 0] * (h / w)
    by = t[:, 1, 1]
    # sx(0,0): gx at pixel center (0,0) is t00*(1/W-1) + t01*(1/H-1) + t02,
    # then ix = ((gx+1)*W - 1)/2
    gx00 = (t[:, 0, 0] * (1.0 / w - 1.0) + t[:, 0, 1] * (1.0 / h - 1.0)
            + t[:, 0, 2])
    gy00 = (t[:, 1, 0] * (1.0 / w - 1.0) + t[:, 1, 1] * (1.0 / h - 1.0)
            + t[:, 1, 2])
    cx = ((gx00 + 1.0) * w - 1.0) * 0.5
    cy = ((gy00 + 1.0) * h - 1.0) * 0.5
    zero = jnp.zeros_like(ax)
    return jnp.stack([ax, bx, cx, ay, by, cy, zero, zero], axis=-1)


def _hat(coords: jax.Array, n: int) -> jax.Array:
    """Triangular hat weights: (..., 1) sample coords -> (..., n). The
    bilinear corner weight IS the product of two hats, and out-of-image
    corners get weight 0 == torch padding_mode='zeros'."""
    grid = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - grid))


def _warp_matmul_small(x: jax.Array, theta: jax.Array) -> jax.Array:
    """Full interpolation-matrix warp for small maps (H*W <= ~1024):
    out[b, o, c] = sum_p mask[b, o, p] x[b, p, c] with
    mask = hat_y x hat_x — one batched MXU matmul, no gathers."""
    n, h, w, c = x.shape
    coef = _pixel_coef(theta, h, w)
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]
    sx = coef[:, 0, None, None] * jj + coef[:, 1, None, None] * ii \
        + coef[:, 2, None, None]
    sy = coef[:, 3, None, None] * jj + coef[:, 4, None, None] * ii \
        + coef[:, 5, None, None]
    wy = _hat(sy, h)                                   # (N, H, W, H_in)
    wx = _hat(sx, w)                                   # (N, H, W, W_in)
    mask = (wy[..., :, None] * wx[..., None, :]).reshape(n, h * w, h * w)
    out = jnp.einsum("bop,bpc->boc", mask.astype(x.dtype),
                     x.reshape(n, h * w, c),
                     preferred_element_type=jnp.float32)
    return out.reshape(n, h, w, c).astype(x.dtype)


_FAST_KWIN = 16
_FAST_KWIN_SMALL = 4


def _warp_fast_impl(x: jax.Array, theta: jax.Array) -> jax.Array:
    n, h, w, c = x.shape
    # the dense-mask formulation materializes an (N, HW, HW) interpolation
    # matrix — fine at 8/16 px (<= 4 MB) but ~268 MB at 32x32/batch 128;
    # larger maps go through the row-windowed kernel
    if h * w <= 256:
        return _warp_matmul_small(x, theta)
    from hifidiff_tpu.ops.pallas.warp import warp_rowwin_pallas

    coef = _pixel_coef(theta, h, w)
    # the source-row window covers every nonzero hat weight iff the per-row
    # sy span (+ floor/ceil corner slack) fits in K. Runtime-dispatch on the
    # actual thetas: near-identity warps (|shear_y| <= ~1px across the row —
    # zero-init STN heads and most trained warps) take the K=4 kernel at
    # 1/4 the MXU work; stronger shears the K=16 kernel; pathological
    # thetas the exact gather fallback. All three are exact bilinear.
    span = jnp.max(jnp.abs(coef[:, 3])) * (w - 1) + 3.0
    import os

    adaptive = os.environ.get("HIFIDIFF_WARP_ADAPTIVE", "1")
    if adaptive.strip().lower() not in ("0", "", "false", "off", "no"):
        # span-adaptive dispatch (DEFAULT): near-identity warps
        # (|shear_y| across the row <= ~1 px — zero-init STN heads and most
        # trained warps) take a K=4 kernel at 1/4 the MXU work; stronger
        # shears the K=16 kernel; pathological thetas the exact gather.
        # All three are exact bilinear. Dispatch is a single FLAT
        # lax.switch (a nested lax.cond over pallas calls showed
        # pathological server-side compile times through the axon tunnel —
        # docs/PERF.md rule 5). Measured at batch 128, near-identity
        # thetas (scripts/warp_bench.py, v5e): K4 vs K16 = 6.7 vs 12.6 ms
        # at 128^2x32, 2.7 vs 5.5 at 64^2x64, 1.4 vs 1.9 at 32^2x128 —
        # CR's five rowwin warps drop 27.3 -> 15.0 ms.
        # HIFIDIFF_WARP_ADAPTIVE=0 restores the single-K cond.
        branch = (span > float(_FAST_KWIN_SMALL)).astype(jnp.int32) + \
            (span > float(_FAST_KWIN)).astype(jnp.int32)
        return jax.lax.switch(
            branch,
            [lambda x: warp_rowwin_pallas(x, coef, k_win=_FAST_KWIN_SMALL),
             lambda x: warp_rowwin_pallas(x, coef, k_win=_FAST_KWIN),
             lambda x: _warp_gather(x, theta)],
            x)
    k = int(os.environ.get("HIFIDIFF_WARP_KWIN", _FAST_KWIN))
    return jax.lax.cond(
        span <= float(k),
        lambda x: warp_rowwin_pallas(x, coef, k_win=k),
        lambda x: _warp_gather(x, theta),
        x)


@jax.custom_vjp
def _warp_fast(x, theta):
    return _warp_fast_impl(x, theta)


def _warp_fast_fwd(x, theta):
    return _warp_fast_impl(x, theta), (x, theta)


def _warp_fast_bwd(res, g):
    # gradients via the (identical-math) gather formulation — autodiff'able
    # and only used in training, where the stage-1 CR step is small
    x, theta = res
    _, vjp = jax.vjp(_warp_gather, x, theta)
    dx, dtheta = vjp(g)
    return dx, dtheta


_warp_fast.defvjp(_warp_fast_fwd, _warp_fast_bwd)


def _fast_allowed(x: jax.Array) -> bool:
    import os

    if os.environ.get("HIFIDIFF_DISABLE_FAST_WARP"):
        return False
    if x.ndim != 4 or x.shape[1] != x.shape[2]:
        return False
    h, w = x.shape[1], x.shape[2]
    if h * w > 256 and (w % 8 or h % 8):
        return False  # kernel path needs aligned dynamic row slices
    if os.environ.get("HIFIDIFF_FORCE_FAST_WARP"):
        return True  # tests: exercise matmul/interpret paths on CPU
    # TPU MXU matmuls round f32 operands to bf16 at default precision, so
    # the hat-weight matmul only preserves full accuracy relative to the
    # VPU gather math when activations are bf16 anyway (the production
    # pipeline). f32-on-TPU keeps the exact gather path.
    return (jax.default_backend() in ("tpu", "axon")
            and x.dtype == jnp.bfloat16)


def affine_warp(x: jax.Array, theta: jax.Array,
                align_corners: bool = False,
                method: str = "auto") -> jax.Array:
    """Warp an NHWC feature map by per-sample affine matrices (N, 2, 3).

    method="auto" uses the hat-matmul formulation on TPU (exact same
    bilinear math on the MXU — see ops/pallas/warp.py; measured ~100x
    faster than the XLA gather path at 128^2) and the gather formulation
    elsewhere. method="gather" forces the reference formulation."""
    if method == "gather" or align_corners or not _fast_allowed(x):
        return _warp_gather(x, theta, align_corners=align_corners)
    return _warp_fast(x, theta)
