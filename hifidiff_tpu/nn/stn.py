"""Spatial Transformer block (STN), NHWC / flax.

Behavioral spec from the reference (`models/cr/stn.py:9-52`):
  * localization net: Conv(in->8, k0, valid) -> maxpool2 -> relu ->
    Conv(8->10, k1, valid) -> maxpool2 -> relu, where (k0, k1) depend on the
    input resolution: (3,1) if res<=8, (5,3) if <=16, (7,5) if <=32, else
    (9,7); flattened size = 10 * fc_res^2 with
    fc_res = (res - k0 - 2*k1 + 3) // 4.
  * regressor: Linear(fc_size -> int(sqrt(fc_size))) -> relu -> Linear(-> 6)
    whose kernel is zero-initialized and bias initialized to the identity
    affine [1, 0, 0, 0, 1, 0] — so at init the block is an identity warp.
  * warp: affine_grid + bilinear grid_sample, align_corners=False.

The flatten is done in (C, H, W) order to keep a 1:1 weight mapping with the
reference's NCHW `view(-1, fc_size)`.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import TorchConv, TorchDense
from hifidiff_tpu.ops.warp import affine_warp

_IDENTITY_THETA = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def stn_kernel_sizes(in_res: int) -> tuple[int, int]:
    if in_res <= 8:
        return (3, 1)
    if in_res <= 16:
        return (5, 3)
    if in_res <= 32:
        return (7, 5)
    return (9, 7)


def stn_fc_size(in_res: int) -> int:
    k0, k1 = stn_kernel_sizes(in_res)
    fc_res = (in_res - k0 - 2 * k1 + 3) // 4
    return 10 * fc_res * fc_res


class STNBlock(nn.Module):
    channels: int
    in_res: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k0, k1 = stn_kernel_sizes(self.in_res)
        fc_size = stn_fc_size(self.in_res)
        hidden = int(math.sqrt(fc_size))

        s = TorchConv(8, (k0, k0), dtype=self.dtype, name="loc_conv1")(x)
        s = nn.max_pool(s, (2, 2), strides=(2, 2))
        s = nn.relu(s)
        s = TorchConv(10, (k1, k1), dtype=self.dtype, name="loc_conv2")(s)
        s = nn.max_pool(s, (2, 2), strides=(2, 2))
        s = nn.relu(s)

        # flatten channel-major (C, H, W) for torch weight-map parity
        s = jnp.transpose(s, (0, 3, 1, 2)).reshape(s.shape[0], -1)
        s = nn.relu(TorchDense(hidden, dtype=self.dtype, name="fc1")(s))
        theta = TorchDense(
            6,
            dtype=self.dtype,
            name="fc2",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _IDENTITY_THETA, dtype=dtype
            ),
        )(s)
        theta = theta.reshape(-1, 2, 3).astype(jnp.float32)

        return affine_warp(x, theta)
