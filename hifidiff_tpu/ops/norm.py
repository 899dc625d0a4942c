"""Channel LayerNorm for NHWC feature maps ("LayerNorm2d").

Semantics match the reference's hand-rolled autograd op (reference
`utils.py:13-54`): per-pixel normalization over the channel axis with biased
variance, `y = (x - mu) / sqrt(var + eps) * weight + bias`, eps default 1e-6.

The reference implements the backward by hand; here we register an explicit
`jax.custom_vjp` carrying the same closed-form gradient. This is numerically
identical to autodiff but (a) rematerializes `y` instead of saving the conv
inputs, and (b) gives us a stable seam where the fused Pallas kernel
(LN + FiLM + pointwise) plugs in without touching call sites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ln2d_fwd_math(x, weight, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * weight + bias, y, var


@jax.custom_vjp
def _layer_norm_2d(x, weight, bias, eps):
    out, _, _ = _ln2d_fwd_math(x, weight, bias, eps)
    return out


def _layer_norm_2d_fwd(x, weight, bias, eps):
    out, y, var = _ln2d_fwd_math(x, weight, bias, eps)
    return out, (y, var, weight, eps)


def _layer_norm_2d_bwd(res, g):
    y, var, weight, eps = res
    # d/dx of y=(x-mu)*rsqrt(var+eps):
    #   gx = rsqrt(var+eps) * (gw - y*mean(gw*y) - mean(gw)), gw = g*weight
    gw = g * weight
    mean_g = jnp.mean(gw, axis=-1, keepdims=True)
    mean_gy = jnp.mean(gw * y, axis=-1, keepdims=True)
    gx = jax.lax.rsqrt(var + eps) * (gw - y * mean_gy - mean_g)
    reduce_axes = tuple(range(g.ndim - 1))
    gweight = jnp.sum(g * y, axis=reduce_axes)
    gbias = jnp.sum(g, axis=reduce_axes)
    return gx, gweight, gbias, None


_layer_norm_2d.defvjp(_layer_norm_2d_fwd, _layer_norm_2d_bwd)


def layer_norm_2d(x: jax.Array, weight: jax.Array, bias: jax.Array,
                  eps: float = 1e-6) -> jax.Array:
    """Normalize the last (channel) axis of an NHWC tensor.

    Args:
      x: (..., C) array — typically (N, H, W, C).
      weight/bias: (C,) learnable affine.
      eps: added to the biased variance before rsqrt (reference uses 1e-6).
    """
    return _layer_norm_2d(x, weight, bias, eps)


def _pallas_eligible(x: jax.Array) -> bool:
    import os

    if os.environ.get("HIFIDIFF_DISABLE_PALLAS"):
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False  # CPU uses the jnp path (interpret mode is test-only)
    return (x.ndim == 4 and x.shape[-1] % 128 == 0
            and (x.shape[1] * x.shape[2]) % 8 == 0)


def ln_film(x: jax.Array, weight: jax.Array, bias: jax.Array,
            scale: jax.Array, shift: jax.Array,
            eps: float = 1e-6) -> jax.Array:
    """Fused LayerNorm2d + FiLM: `(LN(x)*w+b) * (1+scale) + shift` with
    per-sample (B, C) scale/shift. Dispatches to the Pallas TPU kernel when
    shapes allow, else the jnp/custom-VJP path."""
    if _pallas_eligible(x):
        from hifidiff_tpu.ops.pallas.ln_film import ln_film_pallas

        # pass x in its native dtype (bf16 stays bf16 through HBM — the
        # kernel upcasts per-tile in VMEM); an f32 cast here would
        # materialize an f32 copy of every activation through HBM and
        # spend the fusion's bandwidth win. The (C,)/(B,C) affine+FiLM
        # tables stay f32: they're tiny, and Mosaic's dynamic row indexing
        # of a bf16 VMEM buffer needs sublane-16 alignment it can't prove.
        return ln_film_pallas(x, weight.astype(jnp.float32),
                              bias.astype(jnp.float32),
                              scale.astype(jnp.float32),
                              shift.astype(jnp.float32), eps)
    out = _layer_norm_2d(x.astype(jnp.float32), weight.astype(jnp.float32),
                         bias.astype(jnp.float32), eps)
    out = (out * (1.0 + scale[:, None, None, :].astype(jnp.float32))
           + shift[:, None, None, :].astype(jnp.float32))
    return out.astype(x.dtype)


def _gn_silu_ref(x, scale, bias, num_groups, eps):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups,
                                       c // num_groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 3), keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return (jax.nn.silu(y)).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _gn_silu_for(num_groups: int, eps: float):
    @jax.custom_vjp
    def f(x, scale, bias):
        # MEASURED (v5e, batch-128 pipeline): the Pallas one-pass GN+SiLU
        # kernel made VAE decode 118.7 -> 167.4 ms/iter — XLA already
        # fuses the stats pass into the preceding conv epilogue and
        # normalize+SiLU into the next conv's producer fusion, so the
        # hand kernel only breaks those fusions. Opt-in for A/B runs.
        import os

        if os.environ.get("HIFIDIFF_PALLAS_GN") and _pallas_eligible(x):
            from hifidiff_tpu.ops.pallas.groupnorm_silu import (
                group_norm_silu_pallas,
            )

            return group_norm_silu_pallas(x, scale, bias, num_groups, eps)
        return _gn_silu_ref(x, scale, bias, num_groups, eps)

    def fwd(x, scale, bias):
        return f(x, scale, bias), (x, scale, bias)

    def bwd(res, g):
        # VAE is frozen in every reference training stage; gradients (if
        # ever taken) go through autodiff of the identical-math XLA path
        x, scale, bias = res
        _, vjp = jax.vjp(
            lambda x_, s_, b_: _gn_silu_ref(x_, s_, b_, num_groups, eps),
            x, scale, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    num_groups: int = 32, eps: float = 1e-6) -> jax.Array:
    """Fused GroupNorm + SiLU (the SD-VAE block prologue). Pallas one-pass
    kernel on TPU, jnp elsewhere; per-channel affine."""
    return _gn_silu_for(num_groups, float(eps))(x, scale, bias)
