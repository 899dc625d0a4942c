"""Stable Diffusion 2.1 VAE (AutoencoderKL) in flax / NHWC.

The reference loads this frozen from the HF hub
(`pretrain_denoiser.py:256-259`, scaling factor 0.18215 at `:293`;
`train_refiner.py:368-375`) and uses encode/decode around every diffusion
stage. This is a from-scratch JAX implementation of the same architecture
(SD 2.1-base `vae` config): 128/256/512/512 channels, 2 ResNet layers per
block, GroupNorm(32, eps=1e-6) + SiLU, a single-head self-attention mid
block, asymmetric-padded stride-2 downsampling, nearest+conv upsampling,
4-channel diagonal-Gaussian latent with quant/post-quant 1x1 convs.

TPU notes: NHWC keeps GroupNorm+SiLU fusable into conv epilogues by XLA; the
single 16x16 (tokens=256) attention is one small MXU matmul pair. Weight
import from diffusers safetensors lives in `vae/import_torch.py`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SD_VAE_SCALING = 0.18215


class GroupNormSiLU(nn.Module):
    """GroupNorm(32, eps=1e-6) + SiLU via the fused Pallas kernel on TPU
    (`ops/pallas/groupnorm_silu.py`). Param names/shapes match
    `nn.GroupNorm` ("scale"/"bias") so checkpoints and the diffusers
    importer are unaffected."""

    num_groups: int = 32
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        from hifidiff_tpu.ops.norm import group_norm_silu

        return group_norm_silu(x, scale, bias, self.num_groups,
                               self.epsilon)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNormSiLU(name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = GroupNormSiLU(name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        tokens = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(tokens)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(tokens)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(tokens)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class MidBlock(nn.Module):
    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, dtype=self.dtype, name="res0")(x)
        x = AttnBlock(self.channels, dtype=self.dtype, name="attn")(x)
        return ResnetBlock(self.channels, dtype=self.dtype, name="res1")(x)


class Encoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"down{i}_res{j}")(x)
            if i < len(self.block_out) - 1:
                # asymmetric (0,1,0,1) pad + stride-2 valid conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down{i}_downconv")(x)
        x = MidBlock(self.block_out[-1], dtype=self.dtype, name="mid")(x)
        x = GroupNormSiLU(name="norm_out")(x)
        return nn.Conv(2 * self.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv_out")(x)


class Decoder(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        x = nn.Conv(self.block_out[-1], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(self.block_out[-1], dtype=self.dtype, name="mid")(x)
        rev = list(reversed(self.block_out))  # (512, 512, 256, 128)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block + 1):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"up{i}_res{j}")(x)
            if i < len(rev) - 1:
                # nearest 2x + 3x3 conv
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"up{i}_upconv")(x)
        x = GroupNormSiLU(name="norm_out")(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    block_out: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.encoder = Encoder(self.block_out, self.layers_per_block,
                               self.latent_channels, dtype=self.dtype)
        self.decoder = Decoder(self.block_out, self.layers_per_block,
                               dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype,
                                       name="post_quant_conv")

    def moments(self, images) -> Tuple[jax.Array, jax.Array]:
        """images in [-1, 1] NHWC -> (mean, logvar) of the latent posterior."""
        m = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(m, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images, key: Optional[jax.Array] = None,
               sample: bool = True) -> jax.Array:
        """Sample (or take the mean of) the latent posterior. Unscaled —
        multiply by SD_VAE_SCALING at the call site, matching the reference's
        `encode_latents` (`pretrain_denoiser.py:68-73`)."""
        mean, logvar = self.moments(images)
        if not sample:
            return mean
        if key is None:
            raise ValueError("sampling encode requires a PRNG key")
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def decode(self, latents) -> jax.Array:
        """Unscaled latents -> images in [-1, 1] (divide by SD_VAE_SCALING
        before calling, matching `decode_latents`,
        `pretrain_denoiser.py:62-65`)."""
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, images, key: Optional[jax.Array] = None,
                 sample: bool = False):
        z = self.encode(images, key=key, sample=sample)
        return self.decode(z)
