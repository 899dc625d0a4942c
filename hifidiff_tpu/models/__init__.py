from hifidiff_tpu.models.cr import CoarseRestoration
from hifidiff_tpu.models.denoiser import Denoiser, FusedDenoiser
from hifidiff_tpu.models.fpg import FacialPriorGuidance
from hifidiff_tpu.models.idc import IDCEncoder
from hifidiff_tpu.models.refiner import FacialRefiner
from hifidiff_tpu.models.tiny_cr import TinyCR

__all__ = [
    "CoarseRestoration",
    "TinyCR",
    "Denoiser",
    "FusedDenoiser",
    "FacialPriorGuidance",
    "IDCEncoder",
    "FacialRefiner",
]
