"""Fused LayerNorm2d + FiLM Pallas TPU kernel with custom VJP.

Computes, in one VMEM pass over NHWC rows (SURVEY.md §7 Pallas pass):

    y    = (x - mean_C(x)) * rsqrt(var_C(x) + eps)
    out  = (y * w + b) * (1 + scale_b) + shift_b

where (w, b) are the per-channel LN affine (reference `utils.py:45-54`) and
(scale_b, shift_b) the per-sample FiLM conditioning of ConditionalNAFBlock
(`models/denoiser/conditional_naf.py:108-136`; zeros give the plain
NAFBlock LN). One HBM read of x and one write of `out` replace the LN +
affine + FiLM elementwise chain. The backward rematerializes mean/var/y
from x in VMEM (residual = the input itself, nothing extra saved).

Grid: (B, HW/TILE); x/out blocks are (1, TILE, C) with C on the lane axis
(every flagship layer has C % 128 == 0; other shapes take the jnp path at
the call site). The (B, C) FiLM tables and the per-sample gradient
accumulators use full-array blocks — revisited across the row-tile axis,
which is legal because the TPU grid executes sequentially.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 256


def _interpret() -> bool:
    # compiled Mosaic on TPU; interpreter everywhere else (CPU tests)
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tile(rows: int) -> int:
    tile = min(DEFAULT_TILE, rows)
    while rows % tile:
        tile //= 2
    return max(tile, 1)


def _fwd_kernel(x_ref, w_ref, b_ref, s_ref, t_ref, out_ref, *, eps: float):
    i = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)                    # (TILE, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    w = w_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    s = s_ref[pl.ds(i, 1), :].astype(jnp.float32)       # (1, C)
    t = t_ref[pl.ds(i, 1), :].astype(jnp.float32)
    out_ref[0] = ((y * w + b) * (1.0 + s) + t).astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w_ref, b_ref, s_ref, dx_ref, dw_ref, db_ref,
                ds_ref, dt_ref, *, eps: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rsigma = jax.lax.rsqrt(var + eps)
    y = xc * rsigma

    w = w_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    s = s_ref[pl.ds(i, 1), :].astype(jnp.float32)

    g1 = g * (1.0 + s)
    gw = g1 * w
    mean_g = jnp.mean(gw, axis=-1, keepdims=True)
    mean_gy = jnp.mean(gw * y, axis=-1, keepdims=True)
    dx_ref[0] = (rsigma * (gw - y * mean_gy - mean_g)).astype(dx_ref.dtype)

    @pl.when(j == 0)
    def _init():
        zero = jnp.zeros((1, dw_ref.shape[1]), jnp.float32)
        dw_ref[pl.ds(i, 1), :] = zero
        db_ref[pl.ds(i, 1), :] = zero
        ds_ref[pl.ds(i, 1), :] = zero
        dt_ref[pl.ds(i, 1), :] = zero

    affine = y * w + b
    dw_ref[pl.ds(i, 1), :] += jnp.sum(g1 * y, axis=0, keepdims=True)
    db_ref[pl.ds(i, 1), :] += jnp.sum(g1, axis=0, keepdims=True)
    ds_ref[pl.ds(i, 1), :] += jnp.sum(g * affine, axis=0, keepdims=True)
    dt_ref[pl.ds(i, 1), :] += jnp.sum(g, axis=0, keepdims=True)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row_spec(tile, c):
    return pl.BlockSpec((1, tile, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def ln_film_pallas(x, w, b, scale, shift, eps: float = 1e-6):
    """x: (B, H, W, C); w/b: (C,); scale/shift: (B, C). C % 128 == 0."""
    return _fwd(x, w, b, scale, shift, eps)


def _fwd(x, w, b, scale, shift, eps):
    bsz, h, wd, c = x.shape
    rows = h * wd
    tile = _pick_tile(rows)
    x3 = x.reshape(bsz, rows, c)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(bsz, rows // tile),
        in_specs=[
            _row_spec(tile, c),
            _full_spec((c,)),
            _full_spec((c,)),
            _full_spec((bsz, c)),
            _full_spec((bsz, c)),
        ],
        out_specs=_row_spec(tile, c),
        out_shape=jax.ShapeDtypeStruct((bsz, rows, c), x.dtype),
        interpret=_interpret(),
    )(x3, w, b, scale, shift)
    return out.reshape(x.shape)


def _ln_film_fwd(x, w, b, scale, shift, eps):
    return _fwd(x, w, b, scale, shift, eps), (x, w, b, scale)


def _ln_film_bwd(eps, res, g):
    x, w, b, scale = res
    bsz, h, wd, c = x.shape
    rows = h * wd
    tile = _pick_tile(rows)
    x3 = x.reshape(bsz, rows, c)
    g3 = g.reshape(bsz, rows, c)

    dx, dw_p, db_p, ds_p, dt_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(bsz, rows // tile),
        in_specs=[
            _row_spec(tile, c),
            _row_spec(tile, c),
            _full_spec((c,)),
            _full_spec((c,)),
            _full_spec((bsz, c)),
        ],
        out_specs=[
            _row_spec(tile, c),
            _full_spec((bsz, c)),
            _full_spec((bsz, c)),
            _full_spec((bsz, c)),
            _full_spec((bsz, c)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, rows, c), g.dtype),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, g3, w, b, scale)

    # cotangent dtypes must match the primals' (params may be bf16-cast)
    return (dx.reshape(x.shape), jnp.sum(dw_p, axis=0).astype(w.dtype),
            jnp.sum(db_p, axis=0).astype(b.dtype),
            ds_p.astype(scale.dtype), dt_p.astype(scale.dtype))


ln_film_pallas.defvjp(_ln_film_fwd, _ln_film_bwd)
