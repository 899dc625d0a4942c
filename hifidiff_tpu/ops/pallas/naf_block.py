"""Fused ConditionalNAFBlock kernel for 1x1-spatial feature maps.

The denoiser's 8 middle blocks run at 2048 channels on 1x1 spatial
(`models/denoiser.py`, reference `models/denoiser/model.py:89-91`), where a
"block" degenerates to five (B, C) matmuls chained through cheap pointwise
ops: the 3x3 depthwise conv only sees its center tap, and SCA's global
average pool is the identity. Under XLA each block is ~12 separate
fusions; measured on v5e the scan is bound by this per-op overhead, not by
weight streaming or FLOPs (int8 weights changed scan time by <2% at batch
16 AND 128 — see ops/quant.py). This kernel runs the WHOLE block in one
Pallas call: activations stay in VMEM/registers, weights stream from HBM
in double-buffered K-tiles overlapped with the MXU dots.

Math per block (film = (shift_a, scale_a, shift_f, scale_f), batch-1,
precomputed outside the scan — `pipeline._precompute_invariants`):

    h  = LN(x) * w1a + b1a            # LN affine and FiLM folded into one
    t1 = (h @ W1) * s1 + bias1        # s* = per-cout int8 scales (ones
    t1 = t1 * dw_center + dw_bias     #      for bf16 weights)
    u  = t1[:, :C] * t1[:, C:]        # SimpleGate
    u  = u * ((u @ Wsca) * s_sca + b_sca)   # SCA (pool == identity at 1x1)
    y1 = x + ((u @ W3) * s3 + b3) * beta
    h2 = LN(y1) * w2a + b2a
    t4 = (h2 @ W4) * s4 + b4
    u2 = t4[:, :C] * t4[:, C:]
    out = y1 + ((u2 @ W5) * s5 + b5) * gamma

Not differentiable: dispatch (`ConditionalNAFBlock._fused_1x1_ok`) is
gated to the inference sampler — hoisted batch-1 FiLM slices at 1x1
spatial. Training runs per-sample films through the standard path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TK = 512  # weight K-tile rows streamed per DMA


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _ln(x, wa, ba, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * wa + ba


def _stream_mm(x16, w_ref, i, buf, sem, *, k: int, n: int, tk: int,
               out_dtype):
    """(M, k) @ w_ref[i] ((k, n) in HBM) -> (M, n) f32, double-buffered
    K-tiles overlapped with the dots."""
    nk = k // tk

    def tile_copy(t, slot):
        return pltpu.make_async_copy(
            w_ref.at[i, pl.ds(t * tk, tk), :], buf.at[slot], sem.at[slot])

    tile_copy(0, 0).start()
    acc = jnp.zeros((x16.shape[0], n), jnp.float32)
    for t in range(nk):
        if t + 1 < nk:
            tile_copy(t + 1, (t + 1) % 2).start()
        tile_copy(t, t % 2).wait()
        w_tile = buf[t % 2].astype(out_dtype)
        acc = acc + jnp.dot(x16[:, t * tk:(t + 1) * tk], w_tile,
                            preferred_element_type=jnp.float32)
    return acc


def _cnaf_kernel(vec_c_ref, vec_2c_ref, vec_dw_ref, x_ref,
                 w1_ref, wsca_ref, w3_ref, w4_ref, w5_ref,
                 o_ref, buf2c, buf1c, sem2c, sem1c, *,
                 c: int, eps: float, tk: int, nblk: int, sp: int):
    """Grid (nblk,): block i transforms the running activation held in
    o_ref (same VMEM buffer every step; written out after the last block).
    Rows are (sample, position)-major with `sp` = H*W positions per sample
    (1 for the mid blocks, 4 for the 2x2 enc3/dec0 stages — the depthwise
    3x3 conv becomes an (sp, sp) per-channel position mix, and SCA's
    global pool averages the sp rows of each sample).
    vec_c_ref: (nblk, 12, C) f32; vec_2c_ref: (nblk, 5, 2C) f32
    [s1, b1, s4, b4, dw_bias]; vec_dw_ref: (nblk, sp*sp, 2C) f32
    position-mix taps;
    w*_ref: stacked per-block weights in HBM (ANY), manually streamed."""
    i = pl.program_id(0)
    dt = x_ref.dtype
    m = x_ref.shape[0]

    @pl.when(i == 0)
    def _seed():
        o_ref[:] = x_ref[:]

    (ln1_wa, ln1_ba, ln2_wa, ln2_ba, beta, gamma,
     s_sca, b_sca, s3, b3, s5, b5) = [vec_c_ref[0, r] for r in range(12)]
    s1, b1, s4, b4 = [vec_2c_ref[0, r] for r in range(4)]
    dwb = vec_2c_ref[0, 4]

    x = o_ref[:].astype(jnp.float32)                       # (M, C)
    h = _ln(x, ln1_wa, ln1_ba, eps).astype(dt)
    t1 = _stream_mm(h, w1_ref, i, buf2c, sem2c, k=c, n=2 * c, tk=tk,
                    out_dtype=dt)
    t1 = t1 * s1 + b1
    if sp == 1:
        t1 = t1 * vec_dw_ref[0, 0] + dwb
    else:
        t1g = t1.reshape(m // sp, sp, 2 * c)
        rows = []
        for p_ in range(sp):
            acc2 = vec_dw_ref[0, p_ * sp] * t1g[:, 0, :]
            for q_ in range(1, sp):
                acc2 = acc2 + vec_dw_ref[0, p_ * sp + q_] * t1g[:, q_, :]
            rows.append(acc2)
        t1 = jnp.stack(rows, axis=1).reshape(m, 2 * c) + dwb
    u = t1[:, :c] * t1[:, c:]                              # SimpleGate
    if sp == 1:
        pooled16 = u.astype(dt)
    else:
        pooled16 = jnp.mean(u.reshape(m // sp, sp, c), axis=1).astype(dt)
    w_sca = _stream_mm(pooled16, wsca_ref, i, buf1c, sem1c, k=c, n=c,
                       tk=tk, out_dtype=dt) * s_sca + b_sca
    if sp == 1:
        u = (u * w_sca).astype(dt)
    else:
        u = (u.reshape(m // sp, sp, c) * w_sca[:, None, :]
             ).reshape(m, c).astype(dt)
    t3 = _stream_mm(u, w3_ref, i, buf1c, sem1c, k=c, n=c, tk=tk,
                    out_dtype=dt) * s3 + b3
    y1 = x + t3 * beta
    h2 = _ln(y1, ln2_wa, ln2_ba, eps).astype(dt)
    t4 = _stream_mm(h2, w4_ref, i, buf2c, sem2c, k=c, n=2 * c, tk=tk,
                    out_dtype=dt) * s4 + b4
    u2 = (t4[:, :c] * t4[:, c:]).astype(dt)
    t5 = _stream_mm(u2, w5_ref, i, buf1c, sem1c, k=c, n=c, tk=tk,
                    out_dtype=dt) * s5 + b5
    o_ref[:] = (y1 + t5 * gamma).astype(dt)


def _cnaf_kernel_whole(vec_c_ref, vec_2c_ref, vec_dw_ref, x_ref,
                       w1_ref, wsca_ref, w3_ref, w4_ref, w5_ref,
                       o_ref, bw1, bsca, bw3, bw4, bw5, sems, *,
                       c: int, eps: float, nblk: int, sp: int):
    """Whole-matrix variant: each of the five weight matrices gets its own
    VMEM buffer and its DMA is kicked off while the PREVIOUS matmul
    computes — a 5-deep prefetch chain instead of 2-slot K-tiles. Used
    when the block's packed weights fit the VMEM budget (int8 at C=2048,
    bf16 at C<=1024); measured necessary to reach the HBM rate XLA's
    scan-level prefetching achieves."""
    i = pl.program_id(0)
    dt = x_ref.dtype
    m = x_ref.shape[0]

    def start(ref, buf, s):
        cp = pltpu.make_async_copy(ref.at[i], buf, sems.at[s])
        cp.start()
        return cp

    c1 = start(w1_ref, bw1, 0)
    csca = start(wsca_ref, bsca, 1)

    @pl.when(i == 0)
    def _seed():
        o_ref[:] = x_ref[:]

    (ln1_wa, ln1_ba, ln2_wa, ln2_ba, beta, gamma,
     s_sca, b_sca, s3, b3, s5, b5) = [vec_c_ref[0, r] for r in range(12)]
    s1, b1, s4, b4 = [vec_2c_ref[0, r] for r in range(4)]
    dwb = vec_2c_ref[0, 4]

    x = o_ref[:].astype(jnp.float32)
    h = _ln(x, ln1_wa, ln1_ba, eps).astype(dt)
    c1.wait()
    c3 = start(w3_ref, bw3, 2)
    t1 = jnp.dot(h, bw1[:].astype(dt),
                 preferred_element_type=jnp.float32) * s1 + b1
    if sp == 1:
        t1 = t1 * vec_dw_ref[0, 0] + dwb
    else:
        t1g = t1.reshape(m // sp, sp, 2 * c)
        rows = []
        for p_ in range(sp):
            acc2 = vec_dw_ref[0, p_ * sp] * t1g[:, 0, :]
            for q_ in range(1, sp):
                acc2 = acc2 + vec_dw_ref[0, p_ * sp + q_] * t1g[:, q_, :]
            rows.append(acc2)
        t1 = jnp.stack(rows, axis=1).reshape(m, 2 * c) + dwb
    u = t1[:, :c] * t1[:, c:]
    if sp == 1:
        pooled16 = u.astype(dt)
    else:
        pooled16 = jnp.mean(u.reshape(m // sp, sp, c), axis=1).astype(dt)
    csca.wait()
    c4 = start(w4_ref, bw4, 3)
    w_sca = jnp.dot(pooled16, bsca[:].astype(dt),
                    preferred_element_type=jnp.float32) * s_sca + b_sca
    if sp == 1:
        u = (u * w_sca).astype(dt)
    else:
        u = (u.reshape(m // sp, sp, c) * w_sca[:, None, :]
             ).reshape(m, c).astype(dt)
    c3.wait()
    c5 = start(w5_ref, bw5, 4)
    t3 = jnp.dot(u, bw3[:].astype(dt),
                 preferred_element_type=jnp.float32) * s3 + b3
    y1 = x + t3 * beta
    h2 = _ln(y1, ln2_wa, ln2_ba, eps).astype(dt)
    c4.wait()
    t4 = jnp.dot(h2, bw4[:].astype(dt),
                 preferred_element_type=jnp.float32) * s4 + b4
    u2 = (t4[:, :c] * t4[:, c:]).astype(dt)
    c5.wait()
    t5 = jnp.dot(u2, bw5[:].astype(dt),
                 preferred_element_type=jnp.float32) * s5 + b5
    o_ref[:] = (y1 + t5 * gamma).astype(dt)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def cnaf_small_stack_pallas(x: jax.Array, vec_c: jax.Array,
                            vec_2c: jax.Array, vec_dw: jax.Array,
                            w1, wsca, w3, w4, w5, sp: int,
                            eps: float = 1e-6) -> jax.Array:
    """x: (M, C) with M = B*sp, (sample, position)-major rows;
    vec_c: (nblk, 12, C) f32; vec_2c: (nblk, 5, 2C) f32
    [s1, b1, s4, b4, dw_bias]; vec_dw: (nblk, sp*sp, 2C) f32 position-mix
    taps; w1/w4: (nblk, C, 2C), wsca/w3/w5: (nblk, C, C) — bf16 or int8
    (int8 scales folded into the s* rows). Returns (M, C)."""
    m, c = x.shape
    nblk = vec_c.shape[0]
    tk = min(_TK, c)
    assert c % tk == 0 and 128 % sp == 0
    m_pad = _round_up(m, 128)   # 128 % sp == 0 keeps sample grouping
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    wdt = w1.dtype
    itemsize = jnp.dtype(wdt).itemsize
    weight_bytes = 7 * c * c * itemsize       # 2C+C+C+2C+C columns
    whole = weight_bytes <= 32 * 1024 * 1024  # 5-buffer prefetch chain

    if whole:
        scratch = [
            pltpu.VMEM((c, 2 * c), wdt),
            pltpu.VMEM((c, c), wdt),
            pltpu.VMEM((c, c), wdt),
            pltpu.VMEM((c, 2 * c), wdt),
            pltpu.VMEM((c, c), wdt),
            pltpu.SemaphoreType.DMA((5,)),
        ]
        kern = functools.partial(_cnaf_kernel_whole, c=c, eps=eps,
                                 nblk=nblk, sp=sp)
    else:
        scratch = [
            pltpu.VMEM((2, tk, 2 * c), wdt),
            pltpu.VMEM((2, tk, c), wdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        kern = functools.partial(_cnaf_kernel, c=c, eps=eps, tk=tk,
                                 nblk=nblk, sp=sp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 12, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 5, 2 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, sp * sp, 2 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((m_pad, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # w1
            pl.BlockSpec(memory_space=pl.ANY),   # wsca
            pl.BlockSpec(memory_space=pl.ANY),   # w3
            pl.BlockSpec(memory_space=pl.ANY),   # w4
            pl.BlockSpec(memory_space=pl.ANY),   # w5
        ],
        out_specs=pl.BlockSpec((m_pad, c), lambda i: (0, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(vec_c, vec_2c, vec_dw, x, w1, wsca, w3, w4, w5)
    return out[:m] if m_pad != m else out


def _affine(p, n: int):
    """Conv param dict (declare_only form) -> (W (cin, n), scale (n,),
    bias (n,)) with scale==1 for float kernels."""
    if "kernel_q" in p:
        w = p["kernel_q"]
        scale = p["kernel_scale"].astype(jnp.float32)
    else:
        w = p["kernel"]
        scale = jnp.ones((n,), jnp.float32)
    bias = p.get("bias")
    bias = (jnp.zeros((n,), jnp.float32) if bias is None
            else bias.astype(jnp.float32))
    return w.reshape(w.shape[-2], n), scale, bias


def fused_cnaf_block_small(x: jax.Array, film: jax.Array, *, ln1, ln2,
                           conv1, conv2, sca_conv, conv3, conv4, conv5,
                           beta, gamma, eps: float = 1e-6) -> jax.Array:
    """One fused ConditionalNAFBlock on a (B, H, W, C) map with H=W in
    {1, 2} (the denoiser mid / enc3 / dec0 stages at 16x16 latents).

    film: (1, 4C) [shift_att, scale_att, shift_ffn, scale_ffn] (the
    hoisted batch-1 FiLM table slice for this step). ln1/ln2: (weight,
    bias) tuples; conv*: param dicts from `TorchConv(declare_only=True)`;
    conv2 is the (3, 3, 1, 2C) depthwise kernel, lowered to an (sp, sp)
    per-channel position-mix (zero padding taps drop out; at 2x2 every
    position pair is within the 3x3 support). Not differentiable:
    dispatch (`ConditionalNAFBlock._fused_small_ok`) is gated to the
    inference sampler — training runs per-sample films through the
    standard path.
    """
    b, hh, ww, c = x.shape
    sp = hh * ww
    f = film.astype(jnp.float32)
    shift_a, scale_a, shift_f, scale_f = jnp.split(f[0], 4)

    w1m, s1, b1 = _affine(conv1, 2 * c)
    wsm, ssca, bsca = _affine(sca_conv, c)
    w3m, s3, b3 = _affine(conv3, c)
    w4m, s4, b4 = _affine(conv4, 2 * c)
    w5m, s5, b5 = _affine(conv5, c)
    # the kernel streams all five matrices with one dtype; if the w8 size
    # threshold split the block (some int8, some float), dequantize the
    # int8 minority (trace-time, hoisted out of the scan — small layers)
    mats = [w1m, wsm, w3m, w4m, w5m]
    if any(w.dtype == jnp.int8 for w in mats) and not all(
            w.dtype == jnp.int8 for w in mats):
        scales = [s1, ssca, s3, s4, s5]
        for j, (w, s) in enumerate(zip(mats, scales)):
            if w.dtype == jnp.int8:
                mats[j] = (w.astype(jnp.float32) * s).astype(x.dtype)
                scales[j] = jnp.ones_like(s)
        w1m, wsm, w3m, w4m, w5m = mats
        s1, ssca, s3, s4, s5 = scales
    if "kernel" in conv2:
        dwk = conv2["kernel"].astype(jnp.float32)          # (3, 3, 1, 2C)
    else:  # quantized depthwise (only when the size threshold is forced)
        dwk = (conv2["kernel_q"].astype(jnp.float32)
               * conv2["kernel_scale"])
    dwb = conv2["bias"].astype(jnp.float32)
    # position-mix taps: mix[p, q] = dwk[1 + qy - py, 1 + qx - px]
    taps = []
    for py in range(hh):
        for px in range(ww):
            for qy in range(hh):
                for qx in range(ww):
                    taps.append(dwk[1 + qy - py, 1 + qx - px, 0, :])
    vec_dw = jnp.stack(taps)[None]                          # (1, sp^2, 2C)

    ln1_w = ln1[0].astype(jnp.float32) * (1.0 + scale_a)
    ln1_b = ln1[1].astype(jnp.float32) * (1.0 + scale_a) + shift_a
    ln2_w = ln2[0].astype(jnp.float32) * (1.0 + scale_f)
    ln2_b = ln2[1].astype(jnp.float32) * (1.0 + scale_f) + shift_f

    vec_c = jnp.stack([ln1_w, ln1_b, ln2_w, ln2_b,
                       beta.astype(jnp.float32), gamma.astype(jnp.float32),
                       ssca, bsca, s3, b3, s5, b5])[None]
    vec_2c = jnp.stack([s1, b1, s4, b4, dwb])[None]
    out = cnaf_small_stack_pallas(
        x.reshape(b * sp, c), vec_c, vec_2c, vec_dw,
        w1m[None], wsm[None], w3m[None], w4m[None], w5m[None], sp, eps=eps)
    return out.reshape(b, hh, ww, c)
