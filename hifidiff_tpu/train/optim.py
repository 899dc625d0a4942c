"""Optimizers, LR schedules, and trainability masks (optax).

Reference semantics reproduced:
  * Adam(lr=5e-4) for CR and IDC (`train_cr.py:179`, `pretrain_idc.py:80-83`).
  * AdamW(lr=1e-4) + cosine schedule with 500 linear-warmup steps for the
    denoiser/refiner stages (`pretrain_denoiser.py:274-280`,
    `train_refiner.py` equivalent), matching HF
    `get_cosine_schedule_with_warmup`: linear 0->1 over `warmup`, then
    0.5*(1+cos(pi * progress)) down to 0.
  * Gradient accumulation via `optax.MultiSteps`
    (`accelerator.accumulate`, `pretrain_denoiser.py:169`).
  * The refiner's partial freeze — denoiser intro + encoder stages stay
    fixed after loading stage-3 weights (`models/refiner.py:27-30`) — is an
    `optax.masked` zero-update mask, plus the always-frozen IDC.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import optax


def cosine_with_warmup(base_lr: float, warmup_steps: int,
                       total_steps: int) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def adam(lr: float = 5e-4) -> optax.GradientTransformation:
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def adamw_cosine(base_lr: float = 1e-4, warmup_steps: int = 500,
                 total_steps: int = 100_000, weight_decay: float = 0.01,
                 accumulate_steps: int = 1) -> optax.GradientTransformation:
    tx = optax.adamw(cosine_with_warmup(base_lr, warmup_steps, total_steps),
                     b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def path_freeze_mask(params: Mapping[str, Any], frozen_regexes) -> Any:
    """True = trainable, False = frozen; matched on '/'-joined param paths."""
    pats = [re.compile(p) for p in frozen_regexes]

    def trainable(path) -> bool:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return not any(p.search(name) for p in pats)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: trainable(path), params)


def refiner_freeze_mask(params: Mapping[str, Any]) -> Any:
    """Reference freeze set (`models/refiner.py:18-30`): the whole IDC (kept
    in eval mode) and the denoiser's intro conv + encoder stages (+ their
    downsamplers, which torch's `name.startswith("encoders")` does NOT
    include — downs stay trainable there, so we keep them trainable too)."""
    return path_freeze_mask(params, [
        r"^idc/",
        r"^denoiser/intro",
        r"^denoiser/enc\d+_blk\d+",
    ])


def masked(tx: optax.GradientTransformation,
           trainable_mask: Any) -> optax.GradientTransformation:
    return optax.chain(
        optax.masked(tx, trainable_mask),
        optax.masked(optax.set_to_zero(),
                     jax.tree_util.tree_map(lambda t: not t, trainable_mask)),
    )
