from hifidiff_tpu.train.losses import (
    cr_loss,
    key_region_loss,
    mse_loss,
    triplet_margin_loss,
)
from hifidiff_tpu.train.distill import (
    distill_eps_target,
    make_distill_train_step,
    student_step_tables,
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
    "distill_eps_target",
    "make_distill_train_step",
    "student_step_tables",
]
