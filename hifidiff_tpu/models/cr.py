"""Coarse Restoration (CR) network: pixel-space NAFNet-UNet with STN warps.

Behavioral spec from the reference (`models/cr/model.py:33-88`):
  * width 32, img channels 3; intro/outro 3x3 convs.
  * encoder stages (NAFBlocks x n -> STN -> 2x2/s2 down-conv doubling ch):
    (32@128, n=2), (64@64, n=2), (128@32, n=4), (256@16, n=8).
  * middle: (512@8, n=8), STN, no resampling.
  * decoder stages (NAFs x2 -> STN -> 1x1 conv c->2c (no bias) +
    PixelShuffle(2), halving channels): 512@8, 256@16, 128@32, 64@64.
  * skip topology: encoder skips are recorded AFTER the stage (i.e.
    post-downsample, `models/cr/model.py:77-79`); the decoder adds the skip
    BEFORE its blocks (`:82-84`).

TPU note: each stage is `jax.checkpoint`-able; blocks are pure functions so
XLA fuses the LN/gate/SCA pointwise chains into the conv epilogues.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import TorchConv
from hifidiff_tpu.nn.naf import NAFBlock
from hifidiff_tpu.nn.stn import STNBlock
from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle


class NafStnStage(nn.Module):
    """[NAFBlock x n] -> STN -> optional down/up resampling."""

    channels: int
    resolution: int
    num_naf: int
    sampling: Optional[str] = None  # "down" | "up" | None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_naf):
            x = NAFBlock(self.channels, dtype=self.dtype, name=f"naf{i}")(x)
        x = STNBlock(self.channels, self.resolution, dtype=self.dtype,
                     name="stn")(x)
        if self.sampling == "down":
            x = TorchConv(self.channels * 2, (2, 2), strides=(2, 2),
                          dtype=self.dtype, name="down")(x)
        elif self.sampling == "up":
            x = TorchConv(self.channels * 2, (1, 1), use_bias=False,
                          dtype=self.dtype, name="up")(x)
            x = pixel_shuffle(x, 2)
        return x


class CoarseRestoration(nn.Module):
    width: int = 32
    img_channels: int = 3
    resolution: int = 128
    enc_nums: Sequence[int] = (2, 2, 4, 8)
    mid_num: int = 8
    dec_nums: Sequence[int] = (2, 2, 2, 2)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: (B, 128, 128, 3) in [0,1] -> coarse restored face, same shape."""
        w, res = self.width, self.resolution
        x = TorchConv(w, (3, 3), padding=1, dtype=self.dtype, name="intro")(x)

        skips = []
        ch = w
        for i, n in enumerate(self.enc_nums):
            x = NafStnStage(ch, res, n, sampling="down", dtype=self.dtype,
                            name=f"enc{i}")(x)
            ch, res = ch * 2, res // 2
            skips.append(x)  # post-downsample skip (reference convention)

        x = NafStnStage(ch, res, self.mid_num, dtype=self.dtype, name="mid")(x)

        for i, n in enumerate(self.dec_nums):
            x = x + skips[-1 - i]  # skip added BEFORE the decoder stage
            x = NafStnStage(ch, res, n, sampling="up", dtype=self.dtype,
                            name=f"dec{i}")(x)
            ch, res = ch // 2, res * 2

        return TorchConv(self.img_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="outro")(x)
