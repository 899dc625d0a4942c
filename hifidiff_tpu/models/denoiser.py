"""Latent-space NAFNet-UNet epsilon-predictors.

Behavioral spec from the reference:
  * `Denoiser` (`models/denoiser/model.py:32-134`): width 128, 4-channel
    SD-VAE latents. time_mlp: SinusoidalPosEmb(128) -> Linear(128, 1024) ->
    SimpleGate -> Linear(512, 512). Encoder stages [2,2,4,8]
    ConditionalNAFBlocks at 128/256/512/1024 ch with 2x2/s2 down-convs
    (skips recorded BEFORE downsampling, `:117-120`); middle: 8 blocks at
    2048 ch (1x1 spatial for 16x16 latents); decoder stages [2,2,2,2] after
    1x1-conv + PixelShuffle(2) ups, skip added AFTER the up (`:124-127`);
    3x3 intro/ending convs; output cropped to the input H,W.
  * `FusedDenoiser` (`:137-266`): same backbone + identity/prior
    conditioning: a projection of the (B, 2048) IDC embedding is added at
    the bottleneck (`:245-246`; the reference's 1x1 `idc_conv` on a
    (B,2048,1,1) tensor == a Dense on the flat embedding), then
    HybridCrossAttention fuses FPG priors at the bottleneck and after each
    decoder stage (`:247-259`).

The forward is shape-static and jit-pure; the DDIM loop wraps it in
`lax.scan` (see hifidiff_tpu/diffusion). Timesteps are a (B,) float array —
scalar/singleton broadcast convenience lives at the API boundary, not inside
the traced function.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.hca import HybridCrossAttention
from hifidiff_tpu.nn.layers import TorchConv, TorchDense
from hifidiff_tpu.nn.naf import ConditionalNAFBlock
from hifidiff_tpu.ops.embedding import sinusoidal_time_embed
from hifidiff_tpu.ops.gates import simple_gate
from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle


class TimeMLP(nn.Module):
    """SinusoidalPosEmb(width) -> Linear(width, 8*width) -> SimpleGate ->
    Linear(4*width, 4*width). For width=128: 128 -> 1024 -> 512 -> 512."""

    width: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t):
        time_dim = self.width * 4
        emb = sinusoidal_time_embed(t, self.width)
        emb = emb.astype(self.dtype or emb.dtype)
        emb = TorchDense(time_dim * 2, dtype=self.dtype, name="fc1")(emb)
        emb = simple_gate(emb)
        return TorchDense(time_dim, dtype=self.dtype, name="fc2")(emb)


class _UNetCore(nn.Module):
    """Shared encoder/middle/decoder machinery for both denoisers."""

    width: int
    enc_nums: Sequence[int]
    mid_num: int
    dec_nums: Sequence[int]
    dtype: Optional[jnp.dtype]

    @property
    def _w8a8(self):
        return getattr(self, "w8a8", False)

    @property
    def _blk(self):
        """ConditionalNAFBlock, optionally wrapped in jax.checkpoint —
        trades recompute for activation HBM in large-batch training
        (`remat=True`); param tree is unchanged."""
        if getattr(self, "remat", False):
            return nn.remat(ConditionalNAFBlock)
        return ConditionalNAFBlock

    def encode(self, x, t):
        time_dim = self.width * 4
        skips = []
        ch = self.width
        for i, n in enumerate(self.enc_nums):
            for b in range(n):
                x = self._blk(ch, time_dim, w8a8=self._w8a8,
                              dtype=self.dtype,
                              name=f"enc{i}_blk{b}")(x, t)
            skips.append(x)  # pre-downsample skip (reference convention)
            x = TorchConv(ch * 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                          name=f"down{i}")(x)
            ch *= 2
        return x, skips, ch

    def middle(self, x, t, ch):
        time_dim = self.width * 4
        for b in range(self.mid_num):
            x = self._blk(ch, time_dim, w8a8=self._w8a8, dtype=self.dtype,
                          name=f"mid_blk{b}")(x, t)
        return x

    def up(self, x, ch, i):
        x = TorchConv(ch * 2, (1, 1), use_bias=False, w8a8=self._w8a8,
                      dtype=self.dtype, name=f"up{i}")(x)
        return pixel_shuffle(x, 2)

    def decode_stage(self, x, t, skip, ch, i):
        time_dim = self.width * 4
        x = self.up(x, ch, i)
        ch //= 2
        x = x + skip
        for b in range(self.dec_nums[i]):
            x = self._blk(ch, time_dim, w8a8=self._w8a8, dtype=self.dtype,
                          name=f"dec{i}_blk{b}")(x, t)
        return x, ch


class Denoiser(_UNetCore):
    """Unconditional latent epsilon-predictor (stage-3 pretraining)."""

    width: int = 128
    in_channels: int = 4
    enc_nums: Sequence[int] = (2, 2, 4, 8)
    mid_num: int = 8
    dec_nums: Sequence[int] = (2, 2, 2, 2)
    remat: bool = False
    w8a8: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, latents, timesteps):
        """latents: (B, h, w, 4); timesteps: (B,) float -> (B, h, w, 4)."""
        h, w = latents.shape[1], latents.shape[2]
        t = TimeMLP(self.width, dtype=self.dtype, name="time_mlp")(timesteps)
        x = TorchConv(self.width, (3, 3), padding=1, dtype=self.dtype,
                      name="intro")(latents)
        x, skips, ch = self.encode(x, t)
        x = self.middle(x, t, ch)
        for i in range(len(self.dec_nums)):
            x, ch = self.decode_stage(x, t, skips[-1 - i], ch, i)
        x = TorchConv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                      name="ending")(x)
        return x[:, :h, :w, :]


class FusedDenoiser(_UNetCore):
    """Conditional epsilon-predictor with IDC + FPG guidance (stage-4)."""

    width: int = 128
    in_channels: int = 4
    latent_size: int = 16
    enc_nums: Sequence[int] = (2, 2, 4, 8)
    mid_num: int = 8
    dec_nums: Sequence[int] = (2, 2, 2, 2)
    remat: bool = False
    w8a8: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, latents, timesteps, facial_priors, identity_embedding,
                 train: bool = False, mode: str = "full", cache=None):
        """
        Args:
          latents: (B, h, w, 4) noisy latents.
          timesteps: (B,) float timesteps.
          facial_priors: list of 5 NHWC maps from FacialPriorGuidance —
            (B,1,1,2048), (B,2,2,1024), (B,4,4,512), (B,8,8,256),
            (B,16,16,128) for a 16x16 latent.
          identity_embedding: (B, 2048) from the IDC encoder.
          mode: "full" (default), or the encoder-propagation split used by
            the cached sampler (arXiv:2312.09608 / 2312.03209 style):
            "encode" returns the conditioned bottleneck + skips,
            "decode" consumes such a `cache` with a FRESH time embedding
            and runs only the decoder half.
          cache: {"x": bottleneck, "skips": tuple} for mode="decode".
        """
        h, w = latents.shape[1], latents.shape[2]
        b = latents.shape[0]
        t = TimeMLP(self.width, dtype=self.dtype, name="time_mlp")(timesteps)

        if mode in ("full", "encode"):
            x = TorchConv(self.width, (3, 3), padding=1, dtype=self.dtype,
                          name="intro")(latents)
            x, skips, ch = self.encode(x, t)
            x = self.middle(x, t, ch)

            # identity injection at the bottleneck: Dense(2048 -> ch*bh*bw),
            # reshaped channel-major like the reference's NCHW view
            # (:245-246).
            bh, bw = x.shape[1], x.shape[2]
            idc = TorchDense(ch * bh * bw, w8a8=self.w8a8, dtype=self.dtype,
                             name="idc_proj")(identity_embedding)
            idc = idc.reshape(b, ch, bh, bw).transpose(0, 2, 3, 1)
            x = x + idc

            x = HybridCrossAttention(ch, w8a8=self.w8a8, dtype=self.dtype,
                                     name="hca0")(facial_priors[0], x,
                                                  train=train)
            if mode == "encode":
                return {"x": x, "skips": tuple(skips)}
        else:
            assert cache is not None, "mode='decode' requires a cache"
            x = cache["x"]
            skips = list(cache["skips"])
            ch = self.width * 2 ** len(self.enc_nums)

        for i in range(len(self.dec_nums)):
            x, ch = self.decode_stage(x, t, skips[-1 - i], ch, i)
            x = HybridCrossAttention(ch, w8a8=self.w8a8, dtype=self.dtype,
                                     name=f"hca{i + 1}")(
                facial_priors[i + 1], x, train=train)

        x = TorchConv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                      name="ending")(x)
        return x[:, :h, :w, :]
