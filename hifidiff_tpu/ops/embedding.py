"""Sinusoidal timestep embedding.

Matches reference `models/denoiser/model.py:17-29`: frequencies
`exp(-log(10000) * k / (half-1))` for k in [0, half), output
`concat(sin(t*f), cos(t*f))` of width `dim`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sinusoidal_time_embed(t: jax.Array, dim: int) -> jax.Array:
    """t: (B,) float timesteps -> (B, dim) embedding."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
