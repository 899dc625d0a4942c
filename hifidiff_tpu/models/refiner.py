"""FacialRefiner — composition root of the full HifiDiff pipeline.

Behavioral spec from the reference (`models/refiner.py:10-38`): owns the IDC
encoder, the FusedDenoiser, and the FPG; forward = FPG(cr_latent) -> priors,
IDC(cr_face) -> identity embedding, then FusedDenoiser(latents, t, priors,
id_emb).

Checkpoint composition (loading IDC / denoiser+FPG weights from earlier
stages, `refiner.py:18-25`) is functional here: see
`hifidiff_tpu.train.checkpoint.compose_refiner_params`. The reference's
partial freeze of the denoiser intro+encoders (`refiner.py:27-30`) maps to an
`optax.masked` trainability mask built by
`hifidiff_tpu.train.optim.refiner_freeze_mask`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.models.denoiser import FusedDenoiser
from hifidiff_tpu.models.fpg import FacialPriorGuidance
from hifidiff_tpu.models.idc import IDCEncoder


class FacialRefiner(nn.Module):
    latent_size: int = 16
    width: int = 128
    enc_nums: Sequence[int] = (2, 2, 4, 8)
    mid_num: int = 8
    dec_nums: Sequence[int] = (2, 2, 2, 2)
    idc_stage_sizes: Sequence[int] = (3, 4, 6, 3)
    remat: bool = False
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.idc = IDCEncoder(stage_sizes=self.idc_stage_sizes,
                              dtype=self.dtype)
        self.fpg = FacialPriorGuidance(width=self.width,
                                       enc_nums=self.enc_nums,
                                       dtype=self.dtype)
        self.denoiser = FusedDenoiser(
            width=self.width, latent_size=self.latent_size,
            enc_nums=self.enc_nums, mid_num=self.mid_num,
            dec_nums=self.dec_nums, remat=self.remat, dtype=self.dtype,
        )

    def __call__(self, latents, timesteps, cr_face, cr_latent,
                 train: bool = False):
        """
        Args:
          latents: (B, h, w, 4) noisy latents.
          timesteps: (B,) float timesteps.
          cr_face: (B, 128, 128, 3) CR output in [0,1] (identity source).
          cr_latent: (B, h, w, 4) VAE latent of the CR face (prior source).
        Returns:
          (B, h, w, 4) predicted epsilon.
        """
        priors = self.fpg(cr_latent)
        # IDC runs in eval mode (frozen, reference `refiner.py:20`):
        # BatchNorm uses running stats regardless of `train`.
        id_emb = self.idc(cr_face, train=False)
        return self.denoiser(latents, timesteps, priors, id_emb, train=train)
