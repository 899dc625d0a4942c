"""Tiny distilled Coarse Restoration net (beyond-reference fast prep).

With the VAE seams distilled (`vae/tiny.py`), prep is the turbo
pipeline's largest remaining stage (51 ms of the ~102 ms steps10+both
wall at batch 128, docs/PERF.md) and the exact CR network is ~42 ms of
it: the reference CR architecture (`models/cr/model.py:33-88`, ours
`models/cr.py`) spends its FLOPs at width 32 against a 128-lane MXU and
carries 17 STN warps. This module is the fewer-FLOPs/better-layout
option, mirroring the tiny-autoencoder recipe: a small constant-width
residual conv net distilled FROM the frozen trained CR
(`train/distill.py:make_tiny_cr_train_step`, `cli/train_tiny_cr.py`),
swapped in at the CR seam of the split sampler
(`pipeline.build_refiner_sampler_split(tiny_cr=...)`,
`bench.py --tiny-cr`, `test_refiner --tiny-cr-ckpt`). Like
`--steps`/`--tiny-ae` it is a sanctioned approximation with a measured
end-to-end quality bound (TINY_CR_QUALITY.json).

Interface matches `CoarseRestoration` exactly: images (B, H, W, 3) in
[0, 1] -> restored face, same shape (unclipped — the pipeline clips
before the VAE encode and feeds the raw output to IDC, exactly as with
the exact CR).

TPU notes: one stride-2 3x3 conv drops to H/2 where the 3x3 convs at
width 64-128 ride the MXU im2col path (K = 9*C >= 576); the upsample is
1x1-conv + PixelShuffle (one matmul + free reshape); a global residual
carries the input so the net only learns the restoration delta (the
teacher's output stays close to its input). ReLU epilogues fuse into
the convs under XLA.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle
from hifidiff_tpu.vae.tiny import TinyResBlock


class TinyCR(nn.Module):
    """(B, H, W, 3) in [0, 1] -> restored face (B, H, W, 3), unclipped.

    H must be divisible by `down_factor`. ~0.3M params / ~2.5 GFLOP per
    128^2 image at the defaults vs the exact CR's ~15 GFLOP spread over
    MXU-hostile width-32 stages.
    """

    width: int = 64
    blocks: int = 4
    down_factor: int = 2
    up_width: int = 16          # post-PixelShuffle channels at full res
    out_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        f = self.down_factor
        h = nn.Conv(self.width, (3, 3), strides=(f, f),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="down")(x)
        h = nn.relu(h)
        for j in range(self.blocks):
            h = TinyResBlock(self.width, dtype=self.dtype,
                             name=f"res{j}")(h)
        h = nn.Conv(f * f * self.up_width, (1, 1), use_bias=False,
                    dtype=self.dtype, name="up_proj")(h)
        h = pixel_shuffle(h, f)
        delta = nn.Conv(self.out_channels, (3, 3),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name="conv_out")(h)
        return x + delta
