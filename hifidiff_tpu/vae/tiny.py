"""Tiny distilled autoencoder (beyond-reference, TAESD-style).

The measured wall-clock of the exact inference path at batch 128 is
prep 104 / scan 190 / decode 135 ms (docs/PERF.md), with the SD-VAE
decode and encode both running AT the measured single-shape compute
envelope (~145 TF/s) — they cannot get faster without doing fewer FLOPs.
This module is the fewer-FLOPs option: a small conv autoencoder
distilled FROM the frozen SD VAE (the approach popularized by TAESD —
"Tiny AutoEncoder for Stable Diffusion" — applied here to the face
pipeline), cutting decode from ~152 GF/image to ~7 GF/image (~22x).

The reference has no equivalent: its only autoencoder is the frozen
diffusers `AutoencoderKL` used in every stage (`pretrain_denoiser.py:
256-259`, `train_refiner.py:368-375`). Like `--steps`/`--cache-interval`
this is a sanctioned approximation with a measured quality bound
(TAE_QUALITY.json, produced by `scripts/tae_quality.py` on the trained
convergence stack; cli/train_tae.py trains one).

Conventions match `vae.model.AutoencoderKL` exactly so the pipeline can
swap them in-place:
  * `TinyDecoder(z)` takes UNSCALED latents (divide the diffusion-space
    latent by SD_VAE_SCALING first) and returns images in [-1, 1];
  * `TinyEncoder(x)` takes images in [-1, 1] and returns the UNSCALED
    latent posterior mean (deterministic — the tiny path has no
    stochastic posterior; it is distilled against `encode(sample=False)`).

TPU notes: NHWC 3x3 convs at width 64-128 ride the MXU's im2col path
(K = 9*C >= 576); upsampling is 1x1-conv + PixelShuffle (one matmul +
free reshape) rather than nearest-repeat + conv, keeping every FLOP a
matmul. ReLU epilogues fuse into the convs under XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifidiff_tpu.ops.pixel_shuffle import pixel_shuffle


class TinyResBlock(nn.Module):
    """conv3x3 -> relu -> conv3x3 + skip -> relu, constant width."""

    ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        return nn.relu(x + h)


class TinyDecoder(nn.Module):
    """Unscaled latents (B, h, w, 4) -> images (B, h*2^(S-1), ..., 3) in
    [-1, 1], where S = len(widths). widths[0] applies at latent
    resolution; the default (128, 64, 64, 64) puts the wide stage where
    pixels are few and the narrow ones where they are many."""

    widths: Sequence[int] = (128, 64, 64, 64)
    blocks_per_stage: int = 2
    out_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        x = nn.Conv(self.widths[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        x = nn.relu(x)
        for i, w in enumerate(self.widths):
            for j in range(self.blocks_per_stage):
                x = TinyResBlock(w, dtype=self.dtype,
                                 name=f"up{i}_res{j}")(x)
            if i < len(self.widths) - 1:
                # 1x1 conv to 4x next width + PixelShuffle: the MXU-native
                # upsample (same pattern as the denoiser's up path)
                x = nn.Conv(4 * self.widths[i + 1], (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"up{i}_proj")(x)
                x = pixel_shuffle(x, 2)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class TinyEncoder(nn.Module):
    """Images (B, H, W, 3) in [-1, 1] -> UNSCALED latent mean
    (B, H/2^(S-1), ..., latent_channels). widths[0] applies at image
    resolution (narrow where pixels are many), mirroring TinyDecoder."""

    widths: Sequence[int] = (64, 64, 64, 128)
    blocks_per_stage: int = 2
    latent_channels: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.widths[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        x = nn.relu(x)
        for i, w in enumerate(self.widths):
            for j in range(self.blocks_per_stage):
                x = TinyResBlock(w, dtype=self.dtype,
                                 name=f"down{i}_res{j}")(x)
            if i < len(self.widths) - 1:
                x = nn.Conv(self.widths[i + 1], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"down{i}_downconv")(x)
        return nn.Conv(self.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(x)


def tiny_widths_for(scale_factor: int, wide: int = 128,
                    narrow: int = 64) -> tuple:
    """Stage widths for a given spatial scale factor (2^(S-1) = factor).
    factor 8 (the reference VAE) -> 4 stages; the convergence demo's
    factor-2 VAE -> 2 stages."""
    stages = max(1, scale_factor.bit_length())  # factor 8 -> 4, 2 -> 2
    return (wide,) + (narrow,) * (stages - 1)


def tiny_autoencoder_pair(scale_factor: int = 8,
                          dtype: Optional[jnp.dtype] = None):
    """(TinyEncoder, TinyDecoder) sized for `scale_factor` (image/latent)."""
    dec_w = tiny_widths_for(scale_factor)
    enc_w = tuple(reversed(dec_w))
    return (TinyEncoder(widths=enc_w, dtype=dtype),
            TinyDecoder(widths=dec_w, dtype=dtype))
