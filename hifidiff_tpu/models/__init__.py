from hifidiff_tpu.models.cr import CoarseRestoration
from hifidiff_tpu.models.denoiser import Denoiser, FusedDenoiser
from hifidiff_tpu.models.fpg import FacialPriorGuidance
from hifidiff_tpu.models.idc import IDCEncoder
from hifidiff_tpu.models.refiner import FacialRefiner

__all__ = [
    "CoarseRestoration",
    "Denoiser",
    "FusedDenoiser",
    "FacialPriorGuidance",
    "IDCEncoder",
    "FacialRefiner",
]
