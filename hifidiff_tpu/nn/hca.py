"""Hybrid Cross Attention (HCA), NHWC / flax.

Behavioral spec from the reference (`models/fpg/hca.py:5-48`): fuse guidance
features `f_g` into denoiser features `f_d` via
  * channel branch: (global avg-pool + global max-pool of f_g, summed) ->
    Linear -> ReLU -> Linear -> sigmoid -> per-channel weight w_c;
  * spatial branch: 1x1 conv (C -> C/2) -> BatchNorm -> ReLU -> 1x1 conv
    (C/2 -> 1) -> BatchNorm -> sigmoid -> one-channel map w_s;
  * f_o = f_d + w_c * f_d + w_s * f_d, then 3x3 conv + BatchNorm + ReLU.

BatchNorm semantics: torch defaults (eps=1e-5, running-stat momentum 0.1 ->
flax momentum 0.9). Under the DP mesh, batch stats are computed inside `jit`
over the globally sharded batch axis, so GSPMD inserts the cross-replica
reduction automatically — the functional equivalent of SyncBatchNorm without
any explicit communication code.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import TorchConv, TorchDense


class HybridCrossAttention(nn.Module):
    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, f_g, f_d=None, train: bool = False, gates=None):
        """Gate hoisting (inference): both the channel weight `w_c` and the
        spatial map `w_s` depend only on the guidance features `f_g`, which
        are scan constants in the DDIM loop (computed once from the CR
        latent). Call with `f_d=None` to get `(w_c, w_s)` — the sampler
        computes them OUTSIDE the `lax.scan` — and pass them back via
        `gates=` to skip both branches per step. Identical math."""
        dim = self.dim
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )

        if gates is None:
            # channel branch
            pooled = (jnp.mean(f_g, axis=(1, 2)) + jnp.max(f_g, axis=(1, 2)))
            w_c = TorchDense(dim, dtype=self.dtype,
                             name="ch_fc1")(pooled)
            w_c = nn.relu(w_c)
            w_c = TorchDense(dim, dtype=self.dtype,
                             name="ch_fc2")(w_c)
            w_c = nn.sigmoid(w_c)[:, None, None, :]

            # spatial branch
            w_s = TorchConv(dim // 2, (1, 1), dtype=self.dtype, name="sp_conv1")(f_g)
            w_s = nn.relu(norm("sp_bn1")(w_s))
            w_s = TorchConv(1, (1, 1), dtype=self.dtype,
                            name="sp_conv2")(w_s)
            w_s = nn.sigmoid(norm("sp_bn2")(w_s))
        else:
            w_c, w_s = gates
        if f_d is None:
            return (w_c, w_s)

        f_o = f_d + w_c * f_d + w_s * f_d
        f_o = TorchConv(dim, (3, 3), padding=1, dtype=self.dtype, name="fused_conv")(f_o)
        return nn.relu(norm("fused_bn")(f_o))
