"""Blocked matmul with int8-resident weights (w8 / "weight-only" quant).

Why a Pallas kernel: the 50-step DDIM scan re-reads all ~446M FusedDenoiser
params from HBM every step, so at bf16 the scan has a ~0.9 GB/step weight
floor. Storing weights int8 halves that, BUT an XLA-level dequantize
(`w_q.astype(bf16) * scale`) is loop-invariant and gets hoisted out of the
scan — XLA re-materializes the bf16 copy in HBM and the traffic win
evaporates (measured in round 1: the XLA int8 path was 3x SLOWER,
`ops/quant.py`). Inside a Pallas kernel the cast happens on the weight tile
in VMEM after the int8 DMA, so HBM only ever sees int8 bytes.

Numerics: `out = (x @ w_q) * scale` with f32 accumulation and the
per-output-channel scale applied to the accumulator — exactly equivalent to
dequantize-then-matmul in exact arithmetic, and slightly MORE accurate in
floating point (the bf16 rounding of `w_q * scale` is skipped).

Replaces the weight streaming of the reference's cuDNN 1x1 convolutions
(`models/denoiser/conditional_naf.py:40-76` runs them in fp32/tf32); the
reference has no quantized path at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _mm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 -> activation dtype on the VMEM tile; MXU dot with f32 accumulate
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(x_ref.dtype),
                          preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _finish():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def matmul_w8(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
              block_m: int = 256, block_n: int = 2048,
              block_k: int = 2048) -> jax.Array:
    """x: (M, K) float; w_q: (K, N) int8; w_scale: (N,) f32 -> (M, N).

    Requires K % 32 == 0 and N % 128 == 0 (int8 tiling); callers fall back
    to a dequantized XLA matmul otherwise (`ops/quant.py:dense_w8`).
    """
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2 and w_scale.shape == (n,)

    bm = min(block_m, _round_up(m, 128))
    bk = block_k if k % block_k == 0 else k
    bn = block_n if n % block_n == 0 else n
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    nk = k // bk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid=(m_pad // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x, w_q, w_scale.reshape(1, n))
    return out[:m] if m_pad != m else out
