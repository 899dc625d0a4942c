"""Diffusion noise schedules as pure precomputed-constant tables.

Reproduces the semantics of the schedulers the reference constructs
(`pretrain_denoiser.py:261-272`): 1000 train timesteps, `scaled_linear`
betas (linspace between sqrt(beta_start) and sqrt(beta_end), squared;
beta_start=1e-4, beta_end=0.02 defaults), epsilon prediction, and the
`add_noise` forward process
    x_t = sqrt(alpha_bar_t) * x_0 + sqrt(1 - alpha_bar_t) * eps.

Everything is a static jnp array; per-step constants are gathered by traced
index inside `lax.scan`, so the entire reverse loop compiles to one XLA
program (no host dispatch per step — the reference's 50-iteration Python
loop is the #1 hot loop, SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    betas: jax.Array            # (T,)
    alphas_cumprod: jax.Array   # (T,)
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True),
                                                 default=1000)

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_schedule: Literal["linear", "scaled_linear"] = "scaled_linear",
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
    ) -> "DiffusionSchedule":
        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                                dtype=np.float64)
        else:
            raise ValueError(f"unknown beta schedule: {beta_schedule}")
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            betas=jnp.asarray(betas, dtype=jnp.float32),
            alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def add_noise(self, x0: jax.Array, noise: jax.Array,
                  t: jax.Array) -> jax.Array:
        """Forward process. t: (B,) integer timesteps; x0/noise NHWC."""
        acp = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * x0 + sqrt_om * noise

    def velocity(self, x0: jax.Array, noise: jax.Array,
                 t: jax.Array) -> jax.Array:
        """v-prediction target (diffusers `get_velocity` semantics)."""
        acp = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_om = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * noise - sqrt_om * x0
