"""Row-windowed affine-warp Pallas kernel (exact bilinear, zero padding).

Replaces the XLA gather formulation of `grid_sample` for large feature maps
— measured 139.8 ms for ONE 128x128x32 warp at batch 96 on v5e (the
reference's `F.grid_sample`, `models/cr/stn.py:49-50`, hits cuDNN kernels
on GPU; TPU gathers of (C,)-vectors are the single worst op in the
pipeline). Key identity: the bilinear weight of corner (y, x) for sample
point (sy, sx) is the product of two triangular hat functions

    w(y, x) = max(0, 1 - |sy - y|) * max(0, 1 - |sx - x|)

so the warp is dense interpolation matrices applied per output row —
MXU matmuls, no gathers. Out-of-image corners get zero weight, which IS
torch's padding_mode='zeros' (align_corners=False handled by the caller's
pixel-space coefficients).

Per grid step (batch b, tile of Ti output rows), for each output row i:
  * source coords: sx(j) = ax*j + bx*i + cx (pixel space, per-batch
    affine coefficients via scalar prefetch), sy(j) likewise;
  * a K-row source window [start_i, start_i + K) with start_i =
    clamp(floor(min(sy(0), sy(W-1))), 0, H-K) — sy is affine in j so its
    extremes are at the row endpoints (scalar math, no vector reduce);
    the window covers every source row with nonzero hat weight as long as
    the per-row sy span fits in K-2 (the caller checks this and falls
    back to the gather path otherwise);
  * wx (W, W) and wy (W, K) hat matrices built from iota (VPU);
  * acc = sum_k wy[:, k] * (wx @ window_k) — K matmuls of (W, W) @ (W, C)
    with f32 accumulation.

The whole (H*W, C) feature map for batch b sits in VMEM (<= 4 MB at
128^2 x 32 bf16 incl. lane padding) and is re-used across that batch's row
tiles (consecutive grid steps with an unchanged block index skip the
re-fetch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _warp_kernel(coef_ref, x_ref, out_ref, *, h: int, w: int, c: int,
                 k_win: int, tile_rows: int, packed: bool):
    """coef_ref: (B, 8) f32 scalar-prefetch [ax, bx, cx, ay, by, cy, 0, 0]
    (pixel space). x_ref: (1, H*W, C) VMEM source. out_ref: (1, Ti*W, C).

    Two inner strategies per output row:
      packed=False (default): K serialized (W, W) @ (W, C) matmuls with a
        wy-weighted f32 accumulate — the round-2 proven lowering.
      packed=True (HIFIDIFF_WARP_PACKED=1, experimental until validated on
        real Mosaic): the K window rows are lane-PACKED into one (W, K*C)
        operand so the row costs ONE MXU matmul (W, W) @ (W, K*C) instead
        of K thin ones (C=32 fills 1/4 of the 128 lanes; K*C=512 streams 4
        full lane tiles through a single pipelined op); the wy weighting
        becomes a static-lane-slice VPU epilogue. Identical math."""
    b = pl.program_id(0)
    r = pl.program_id(1)
    ax = coef_ref[b, 0]
    bx = coef_ref[b, 1]
    cx = coef_ref[b, 2]
    ay = coef_ref[b, 3]
    by = coef_ref[b, 4]
    cy = coef_ref[b, 5]

    # tpu.iota is integer-only; build i32 and cast
    j = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0) \
        .astype(jnp.float32)                                   # (W, 1)
    x_in = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1) \
        .astype(jnp.float32)                                   # (W, W_in)
    k_in = jax.lax.broadcasted_iota(jnp.int32, (w, k_win), 1) \
        .astype(jnp.float32)                                   # (W, K)

    for u in range(tile_rows):
        i = (r * tile_rows + u).astype(jnp.float32)
        sx = ax * j + (bx * i + cx)                            # (W, 1)
        sy = ay * j + (by * i + cy)                            # (W, 1)

        # sy is affine in j -> min over the row is at an endpoint (scalars)
        sy_0 = by * i + cy
        sy_w = sy_0 + ay * (w - 1)
        start_f = jnp.clip(jnp.floor(jnp.minimum(sy_0, sy_w)), 0.0,
                           float(h - k_win))
        start = start_f.astype(jnp.int32)

        # triangular hats: exact bilinear corner weights + zero padding
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx - x_in))        # (W, W_in)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (start_f + k_in)))

        wx_c = wx.astype(x_ref.dtype)
        row0 = pl.multiple_of(start * w, w)
        acc = jnp.zeros((w, c), jnp.float32)
        if packed:
            win = x_ref[0, pl.ds(row0, k_win * w), :]          # (K*W, C)
            lanes = jnp.concatenate(
                [win[k * w:(k + 1) * w, :] for k in range(k_win)],
                axis=-1)                                       # (W, K*C)
            t = jnp.dot(wx_c, lanes,
                        preferred_element_type=jnp.float32)    # (W, K*C)
            for k in range(k_win):
                acc = acc + wy[:, k:k + 1] * t[:, k * c:(k + 1) * c]
        else:
            for k in range(k_win):
                win_k = x_ref[0, pl.ds(row0 + k * w, w), :]    # (W, C)
                t = jnp.dot(wx_c, win_k,
                            preferred_element_type=jnp.float32)
                acc = acc + wy[:, k:k + 1] * t
        out_ref[0, u * w:(u + 1) * w, :] = acc.astype(out_ref.dtype)


def warp_rowwin_pallas(x: jax.Array, coef: jax.Array, k_win: int = 16,
                       tile_rows: int = 8,
                       packed: bool | None = None) -> jax.Array:
    """x: (B, H, W, C); coef: (B, 8) f32 pixel-space affine coefficients.
    Returns the bilinear warp, same shape/dtype as x. packed=None reads
    HIFIDIFF_WARP_PACKED (see _warp_kernel)."""
    import os

    if packed is None:
        packed = bool(os.environ.get("HIFIDIFF_WARP_PACKED"))
    b, h, w, c = x.shape
    k_win = min(k_win, h)
    tile_rows = min(tile_rows, h)
    while h % tile_rows:
        tile_rows //= 2
    x3 = x.reshape(b, h * w, c)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h // tile_rows),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda bi, r, coef_ref: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows * w, c),
                               lambda bi, r, coef_ref: (bi, r, 0),
                               memory_space=pltpu.VMEM),
    )
    # the (H*W, C) source block lane-pads C to 128 (4 MB at 128^2 x 32
    # bf16) and is double-buffered across the batch grid axis — beyond the
    # default 16 MB scoped-vmem budget; v5e has headroom, raise the cap
    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, c=c, k_win=k_win,
                          tile_rows=tile_rows, packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(coef, x3)
    return out.reshape(b, h, w, c)
