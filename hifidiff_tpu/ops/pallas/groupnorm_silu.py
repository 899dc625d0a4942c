"""Fused GroupNorm(32)+SiLU Pallas kernel for the SD-VAE blocks (OPT-IN).

MEASURED NEGATIVE RESULT (v5e, 2026-08): enabling this for the batch-128
pipeline decode made it SLOWER (118.7 -> 167.4 ms/iter) — XLA already
folds the GN stats reduce into the preceding conv epilogue and the
normalize+SiLU into the next conv as a producer fusion, so activations
were not making the extra HBM round trips this kernel eliminates; it only
breaks those fusions. Kept opt-in (HIFIDIFF_PALLAS_GN=1) for future XLA
versions and as the documented attempt (SURVEY 7.10 kernel pass).

Every VAE ResnetBlock runs GroupNorm(32, eps=1e-6) -> SiLU -> conv twice
(`vae/model.py:28-46`; the reference gets this from diffusers' CUDA path,
`pretrain_denoiser.py:256-259`). Under XLA the GroupNorm is two passes over
the activation in HBM (stats reduce, then normalize+silu); here the whole
(H*W, C) slab for one batch element sits in VMEM, so stats + normalize +
SiLU happen in ONE HBM read + ONE write — the optimum for a bandwidth-bound
op. The VAE decode runs at 128x128x128 activations where this matters most.

Group reduction trick: per-channel sums are lane-resident (1, C); the
cross-channel within-group reduce uses a precomputed (C, G) one-hot group
mask — two tiny matmuls ((1,C)@(C,G) and (1,G)@(G,C)) instead of a lane
shuffle, which the MXU does for free.

Inference-only fusion: the VAE is frozen in every reference training stage
(`train_refiner.py:368-373`), so no custom VJP is needed; training-mode
calls take the plain XLA path (`ops/norm.py:group_norm_silu`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 2048  # rows per in-kernel f32 working set (keeps VMEM bounded)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _gn_kernel(x_ref, w_ref, b_ref, mask_ref, o_ref, *, eps: float,
               hw: int, csize: int, chunk: int):
    """x_ref: (1, HW, C) one batch element fully VMEM-resident (bf16);
    f32 math runs over `chunk`-row slices so temporaries stay small.
    mask_ref: (C, G) one-hot group membership."""
    mask = mask_ref[:].astype(jnp.float32)                 # (C, G)
    c = mask.shape[0]
    # HIGHEST precision: default MXU precision rounds the f32 row-sums
    # to bf16 inside these (tiny) stat matmuls, which shifts the group
    # means by ~1e-3 after 16K-row sums — exact f32 passes cost nothing
    hi = jax.lax.Precision.HIGHEST
    n = float(hw * csize)
    # two-pass variance (E[(x - mu)^2], like nn.GroupNorm/_gn_silu_ref):
    # the one-pass E[x^2] - mu^2 form cancels catastrophically for
    # near-constant groups with large mean and can go NEGATIVE -> NaN
    # through rsqrt
    csum = jnp.zeros((1, c), jnp.float32)
    for s in range(0, hw, chunk):
        xc = x_ref[0, s:s + chunk, :].astype(jnp.float32)  # (chunk, C)
        csum = csum + jnp.sum(xc, axis=0, keepdims=True)
    gmean = jnp.dot(csum, mask, preferred_element_type=jnp.float32,
                    precision=hi) / n                      # (1, G)
    mean_c = jnp.dot(gmean, mask.T, preferred_element_type=jnp.float32,
                     precision=hi)                         # (1, C)
    cvar = jnp.zeros((1, c), jnp.float32)
    for s in range(0, hw, chunk):
        xc = x_ref[0, s:s + chunk, :].astype(jnp.float32)
        d = xc - mean_c
        cvar = cvar + jnp.sum(d * d, axis=0, keepdims=True)
    gvar = jnp.dot(cvar, mask, preferred_element_type=jnp.float32,
                   precision=hi) / n
    rstd = jax.lax.rsqrt(gvar + eps)
    rstd_c = jnp.dot(rstd, mask.T, preferred_element_type=jnp.float32,
                     precision=hi)
    w = w_ref[:].astype(jnp.float32)                       # (1, C)
    b = b_ref[:].astype(jnp.float32)
    scale = rstd_c * w
    shift = b - mean_c * scale
    for s in range(0, hw, chunk):
        xc = x_ref[0, s:s + chunk, :].astype(jnp.float32)
        y = xc * scale + shift
        y = y * jax.nn.sigmoid(y)                          # SiLU
        o_ref[0, s:s + chunk, :] = y.astype(o_ref.dtype)


def group_norm_silu_pallas(x: jax.Array, weight: jax.Array, bias: jax.Array,
                           num_groups: int = 32,
                           eps: float = 1e-6) -> jax.Array:
    """x: (N, H, W, C) -> silu(group_norm(x)) with per-channel affine."""
    n, h, w_, c = x.shape
    assert c % num_groups == 0
    hw = h * w_
    chunk = min(hw, _CHUNK)
    x3 = x.reshape(n, hw, c)
    mask = (jnp.arange(c)[:, None] // (c // num_groups)
            == jnp.arange(num_groups)[None, :]).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, hw=hw,
                          csize=c // num_groups, chunk=chunk),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(x3, weight.reshape(1, c), bias.reshape(1, c), mask)
    return out.reshape(n, h, w_, c)
