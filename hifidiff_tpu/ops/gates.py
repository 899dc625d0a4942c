"""SimpleGate: GLU-style gate that halves the channel dimension.

Reference semantics (`utils.py:57-60`): chunk in two along the channel axis
and multiply the halves. In NHWC the channel axis is the last one; the halves
here correspond 1:1 with the torch halves as long as weight import preserves
output-channel order (it does — only the spatial/kernel layout is transposed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def simple_gate(x: jax.Array, axis: int = -1) -> jax.Array:
    a, b = jnp.split(x, 2, axis=axis)
    return a * b
