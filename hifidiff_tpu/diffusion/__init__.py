from hifidiff_tpu.diffusion.schedule import DiffusionSchedule
from hifidiff_tpu.diffusion.sampling import (
    ddim_timesteps,
    sample_ddim,
    sample_ddim_cached,
    sample_ddpm,
    sample_dpmpp_2m,
)

__all__ = [
    "DiffusionSchedule",
    "ddim_timesteps",
    "sample_ddim",
    "sample_ddim_cached",
    "sample_ddpm",
    "sample_dpmpp_2m",
]
