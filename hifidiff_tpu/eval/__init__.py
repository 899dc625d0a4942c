from hifidiff_tpu.eval.metrics import (
    identity_cosine,
    identity_verification_accuracy,
    min_max_normalize,
    psnr,
    ssim,
)

__all__ = [
    "psnr",
    "ssim",
    "identity_cosine",
    "identity_verification_accuracy",
    "min_max_normalize",
]
