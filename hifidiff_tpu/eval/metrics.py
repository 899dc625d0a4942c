"""Evaluation metrics in pure JAX (the reference shells out to pyiqa —
`train_refiner.py:398-401`, `test_refiner.py:107-109`; LPIPS and NIQE live
in their own modules since they need external model statistics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hifidiff_tpu.train.losses import ssim  # noqa: F401  (re-export)


def psnr(pred: jax.Array, target: jax.Array,
         max_val: float = 1.0) -> jax.Array:
    """Mean PSNR over the batch, NHWC in [0, max_val]."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)),
                   axis=(1, 2, 3))
    return jnp.mean(20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse))


def min_max_normalize(x: jax.Array) -> jax.Array:
    """Per-sample min-max to [0,1] — the convention `test_refiner.py:113-119`
    applies to both prediction and GT before computing metrics."""
    lo = jnp.min(x, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(x, axis=(1, 2, 3), keepdims=True)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)


def identity_cosine(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cosine similarity of (B, D) identity embeddings -> (B,)."""
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return jnp.sum(a * b, axis=-1)


def identity_verification_accuracy(anchor: jax.Array, positive: jax.Array,
                                   negative: jax.Array) -> jax.Array:
    """Fraction of samples where cos(anchor, positive) > cos(anchor,
    negative) — `test_idc.py:23-39` semantics."""
    sim_pos = identity_cosine(anchor, positive)
    sim_neg = identity_cosine(anchor, negative)
    return jnp.mean((sim_pos > sim_neg).astype(jnp.float32))
