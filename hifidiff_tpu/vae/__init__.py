from hifidiff_tpu.vae.model import AutoencoderKL, SD_VAE_SCALING
from hifidiff_tpu.vae.import_torch import vae_params_from_torch
from hifidiff_tpu.vae.tiny import (
    TinyDecoder,
    TinyEncoder,
    tiny_autoencoder_pair,
)

__all__ = ["AutoencoderKL", "SD_VAE_SCALING", "vae_params_from_torch",
           "TinyDecoder", "TinyEncoder", "tiny_autoencoder_pair"]
