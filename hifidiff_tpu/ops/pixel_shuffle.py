"""PixelShuffle for NHWC with PyTorch channel-order parity.

torch.nn.PixelShuffle (NCHW) maps input channel `o*r*r + i*r + j` to output
channel `o` at spatial offset (i, j) (reference uses it at
`models/cr/model.py:20`, `models/denoiser/model.py:96`, `models/fpg/model.py:41`).
We reproduce the same (o, i, j) channel-block interpretation in NHWC so that
1x1-conv weights imported from PyTorch produce bit-identical upsampling.

This lowers to reshape + transpose, which XLA fuses into the surrounding
convolution — no custom kernel needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C), torch channel-block order."""
    if r == 1:
        return x
    n, h, w, c_in = x.shape
    c = c_in // (r * r)
    x = x.reshape(n, h, w, c, r, r)          # (..., o, i, j)
    x = x.transpose(0, 1, 4, 2, 5, 3)        # (n, h, i, w, j, o)
    return x.reshape(n, h * r, w * r, c)
