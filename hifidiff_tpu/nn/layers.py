"""Shared flax layers and torch-compatible initializers.

The reference relies on PyTorch's default `kaiming_uniform_(a=sqrt(5))`
conv/linear init (bound = 1/sqrt(fan_in) for both kernel and bias). We
reproduce that distribution so trainings started from scratch behave like the
reference's, while keeping everything a flax/NHWC pytree.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifidiff_tpu.ops.norm import layer_norm_2d, ln_film

# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_conv_kernel_init = jax.nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)
torch_linear_kernel_init = torch_conv_kernel_init


def torch_fan_in_bias_init(fan_in: int):
    """Torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC's last axis (reference `utils.py:45-54`).

    Normalization math is always float32 for stability under bf16 compute;
    the output is cast back to the input dtype. With `scale`/`shift` given
    ((B, C) FiLM conditioning), dispatches to the fused Pallas LN+FiLM
    kernel on TPU.
    """

    channels: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if scale is not None:
            return ln_film(x, weight, bias, scale, shift, self.eps)
        out = layer_norm_2d(
            x.astype(jnp.float32), weight.astype(jnp.float32),
            bias.astype(jnp.float32), self.eps,
        )
        return out.astype(x.dtype)


class TorchConv(nn.Module):
    """nn.Conv with PyTorch-default initialization.

    kernel: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise; fan_in =
    (cin/groups) * kh * kw. Layout is NHWC/HWIO (TPU-native).
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | int | tuple = 0
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        cin = x.shape[-1]
        fan_in = (cin // self.feature_group_count) * int(
            math.prod(self.kernel_size)
        )
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pad,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_fan_in_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
        )(x)


class TorchDense(nn.Module):
    """nn.Dense with PyTorch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: object = torch_linear_kernel_init
    bias_init: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bias_init = self.bias_init or torch_fan_in_bias_init(fan_in)
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="dense",
        )(x)
