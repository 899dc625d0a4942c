from hifidiff_tpu.vae.model import AutoencoderKL, SD_VAE_SCALING
from hifidiff_tpu.vae.import_torch import vae_params_from_torch

__all__ = ["AutoencoderKL", "SD_VAE_SCALING", "vae_params_from_torch"]
