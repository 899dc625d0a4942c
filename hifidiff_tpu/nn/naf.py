"""NAFNet restoration blocks, NHWC / flax.

Behavioral spec from the reference:
  * NAFBlock — `models/cr/naf.py:23-126` (identical copy at
    `models/fpg/naf.py`): LN -> 1x1 (c->2c) -> 3x3 depthwise -> SimpleGate
    -> simplified channel attention -> 1x1 (c) -> residual scaled by `beta`;
    then LN -> 1x1 (c->2c) -> SimpleGate -> 1x1 (c) -> residual scaled by
    `gamma`. beta/gamma are per-channel, zero-initialized.
  * ConditionalNAFBlock — `models/denoiser/conditional_naf.py:13-136`: the
    same block with AdaLN/FiLM time conditioning: a per-block MLP
    (SimpleGate -> Linear(time_dim//2, 4c)) yields
    (shift_att, scale_att, shift_ffn, scale_ffn), applied as
    `x * (scale + 1) + shift` right after each LN.

TPU notes: everything between the two convolutions is pointwise/VPU work that
XLA fuses into the conv epilogues; SCA's global mean is a tiny reduction. The
dominant FLOPs (1x1 convs) are MXU matmuls over the channel axis, which NHWC
keeps as the fast (lane) dimension.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import LayerNorm2d, TorchConv, TorchDense
from hifidiff_tpu.ops.gates import simple_gate


class SimplifiedChannelAttention(nn.Module):
    """Global average pool -> 1x1 conv -> multiplicative per-channel gate."""

    channels: int
    declare_only: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.declare_only:
            return TorchConv(self.channels, (1, 1), declare_only=True, name="conv")(x)
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = TorchConv(self.channels, (1, 1), dtype=self.dtype, name="conv")(pooled)
        return x * w


class NAFBlock(nn.Module):
    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        c = self.c
        dw = c * self.dw_expand
        ffn = c * self.ffn_expand

        inp = x
        x = LayerNorm2d(c, name="norm1")(x)
        x = TorchConv(dw, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = TorchConv(dw, (3, 3), padding=1, feature_group_count=dw,
                      dtype=self.dtype, name="conv2")(x)
        x = simple_gate(x)
        x = SimplifiedChannelAttention(dw // 2, dtype=self.dtype, name="sca")(x)
        x = TorchConv(c, (1, 1), dtype=self.dtype, name="conv3")(x)

        beta = self.param("beta", nn.initializers.zeros, (c,))
        y = inp + x * beta.astype(x.dtype)

        x = LayerNorm2d(c, name="norm2")(y)
        x = TorchConv(ffn, (1, 1), dtype=self.dtype, name="conv4")(x)
        x = simple_gate(x)
        x = TorchConv(c, (1, 1), dtype=self.dtype, name="conv5")(x)

        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return y + x * gamma.astype(x.dtype)


class ConditionalNAFBlock(nn.Module):
    c: int
    time_dim: int = 512
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t=None, film=None):
        """x: (N, H, W, c); t: (N, time_dim) time embedding.

        FiLM hoisting (inference): the (shift/scale) table depends only on
        `t`, and every DDIM step's `t` is static — so the sampler precomputes
        `film` for all steps OUTSIDE the `lax.scan` and passes it in here,
        removing the time_proj weights (~64M params across the UNet) from
        the per-step HBM weight streaming. Call with `x=None` to get just
        the film vector (touches only the time_proj params); call with
        `film=` to skip the projection. `film` may have batch 1 (shared
        across the sample batch) — it is broadcast.
        """
        c = self.c
        dw = c * self.dw_expand
        ffn = c * self.ffn_expand

        if film is None:
            film = TorchDense(4 * c, dtype=self.dtype,
                              name="time_proj")(simple_gate(t))
        if x is None:
            return film
        if self._fused_small_ok(x, film):
            return self._fused_small(x, film)
        if film.shape[0] != x.shape[0]:
            film = jnp.broadcast_to(film, (x.shape[0], film.shape[-1]))
        shift_att, scale_att, shift_ffn, scale_ffn = jnp.split(film, 4,
                                                               axis=-1)

        inp = x
        x = LayerNorm2d(c, name="norm1")(x, scale=scale_att, shift=shift_att)
        x = TorchConv(dw, (1, 1), dtype=self.dtype,
                      name="conv1")(x)
        x = TorchConv(dw, (3, 3), padding=1, feature_group_count=dw,
                      dtype=self.dtype, name="conv2")(x)
        x = simple_gate(x)
        x = SimplifiedChannelAttention(dw // 2, dtype=self.dtype, name="sca")(x)
        x = TorchConv(c, (1, 1), dtype=self.dtype,
                      name="conv3")(x)

        beta = self.param("beta", nn.initializers.zeros, (c,))
        y = inp + x * beta.astype(x.dtype)

        x = LayerNorm2d(c, name="norm2")(y, scale=scale_ffn, shift=shift_ffn)
        x = TorchConv(ffn, (1, 1), dtype=self.dtype,
                      name="conv4")(x)
        x = simple_gate(x)
        x = TorchConv(c, (1, 1), dtype=self.dtype,
                      name="conv5")(x)

        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return y + x * gamma.astype(x.dtype)

    def _fused_small_ok(self, x, film) -> bool:
        """OPT-IN fused Pallas block for 1x1/2x2 spatial with a hoisted
        batch-1 FiLM slice (HIFIDIFF_FUSE_NAF=1 on TPU, or
        HIFIDIFF_FORCE_FUSED_NAF=1 for interpret-mode tests).

        MEASURED (v5e, batch 128): ISOLATED the fused mid stack beats XLA
        (2.08-2.38 ms vs 2.3-4.7 ms for 8 blocks) — but IN the 50-step
        scan the XLA-only step is faster (186.6 vs 198.8 ms, w8 248 ms):
        a pallas_call is a scheduling barrier, while XLA overlaps future
        ops' weight DMA with current compute across the whole step, which
        per-kernel double-buffering cannot match. Default off; rationale
        and kernel design in ops/pallas/naf_block.py. Gradients don't
        flow here (training uses per-sample films)."""
        import os

        if (x.shape[1] != x.shape[2] or x.shape[1] not in (1, 2)
                or film.shape[0] != 1):
            return False
        if self.dw_expand != 2 or self.ffn_expand != 2:
            return False
        if self.c % 128 or self.c < 128:
            return False
        if os.environ.get("HIFIDIFF_FORCE_FUSED_NAF"):
            return True  # tests: interpret path on CPU
        return (bool(os.environ.get("HIFIDIFF_FUSE_NAF"))
                and jax.default_backend() in ("tpu", "axon")
                and x.dtype == jnp.bfloat16)

    def _fused_small(self, x, film):
        from hifidiff_tpu.ops.pallas.naf_block import fused_cnaf_block_small

        c = self.c
        dw = c * self.dw_expand
        dummy_dw = jnp.zeros((1, 1, 1, dw), x.dtype)
        ln1 = LayerNorm2d(c, declare_only=True, name="norm1")(x)
        conv1 = TorchConv(dw, (1, 1), declare_only=True,
                          name="conv1")(x)
        conv2 = TorchConv(dw, (3, 3), padding=1, feature_group_count=dw,
                          declare_only=True,
                          name="conv2")(dummy_dw)
        sca = SimplifiedChannelAttention(dw // 2, declare_only=True, name="sca")(x)
        conv3 = TorchConv(c, (1, 1), declare_only=True,
                          name="conv3")(x)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        ln2 = LayerNorm2d(c, declare_only=True, name="norm2")(x)
        conv4 = TorchConv(c * self.ffn_expand, (1, 1), declare_only=True, name="conv4")(x)
        conv5 = TorchConv(c, (1, 1), declare_only=True,
                          name="conv5")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return fused_cnaf_block_small(
            x, film, ln1=ln1, ln2=ln2, conv1=conv1, conv2=conv2,
            sca_conv=sca, conv3=conv3, conv4=conv4, conv5=conv5,
            beta=beta, gamma=gamma)
