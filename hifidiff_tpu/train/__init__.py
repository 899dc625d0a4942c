from hifidiff_tpu.train.losses import (
    cr_loss,
    key_region_loss,
    mse_loss,
    triplet_margin_loss,
)
from hifidiff_tpu.train.optim import (
    adamw_cosine,
    adam,
    cosine_with_warmup,
    refiner_freeze_mask,
)

__all__ = [
    "cr_loss",
    "key_region_loss",
    "mse_loss",
    "triplet_margin_loss",
    "adamw_cosine",
    "adam",
    "cosine_with_warmup",
    "refiner_freeze_mask",
]
