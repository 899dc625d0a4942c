"""Facial Prior Guidance (FPG): guidance-feature pyramid over the CR latent.

Behavioral spec from the reference (`models/fpg/model.py:7-64`): width 128,
4-channel latent input. Intro 3x3 conv; encoder stages [2,2,4,8] plain
NAFBlocks with 2x2/s2 down-convs (skips recorded BEFORE downsampling,
`:51-54`). Priors: convs[0] = 1x1 conv (no bias, PixelShuffle(1) identity)
at the bottleneck -> priors[0]; then four (1x1 conv c->2c no bias +
PixelShuffle(2)) ups, each ADDED to the reversed encoder skip -> priors[1..4].

For a 16x16 latent the pyramid is (B,1,1,2048), (B,2,2,1024), (B,4,4,512),
(B,8,8,256), (B,16,16,128) — matched one-to-one to the FusedDenoiser's
decoder stages.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import TorchConv
from hifidiff_tpu.nn.naf import NAFBlock
from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle


class FacialPriorGuidance(nn.Module):
    width: int = 128
    in_channels: int = 4
    enc_nums: Sequence[int] = (2, 2, 4, 8)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        """x: (B, h, w, 4) CR latent -> list of 5 guidance maps."""
        x = TorchConv(self.width, (3, 3), padding=1, dtype=self.dtype,
                      name="intro")(x)
        skips = []
        ch = self.width
        for i, n in enumerate(self.enc_nums):
            for b in range(n):
                x = NAFBlock(ch, dtype=self.dtype, name=f"enc{i}_blk{b}")(x)
            skips.append(x)
            x = TorchConv(ch * 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                          name=f"down{i}")(x)
            ch *= 2

        x = TorchConv(ch, (1, 1), use_bias=False, dtype=self.dtype,
                      name="prior_conv0")(x)
        priors = [x]

        for i in range(len(self.enc_nums)):
            x = TorchConv(ch * 2, (1, 1), use_bias=False, dtype=self.dtype,
                          name=f"up{i}")(x)
            x = pixel_shuffle(x, 2)
            ch //= 2
            x = x + skips[-1 - i]
            priors.append(x)

        return priors
