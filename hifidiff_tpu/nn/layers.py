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
    declare_only: bool = False

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        weight = self.param("weight", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if self.declare_only:
            return weight, bias
        if scale is not None:
            return ln_film(x, weight, bias, scale, shift, self.eps)
        out = layer_norm_2d(
            x.astype(jnp.float32), weight.astype(jnp.float32),
            bias.astype(jnp.float32), self.eps,
        )
        return out.astype(x.dtype)


def _quantized_subtree(module: nn.Module, sub_name: str) -> bool:
    """The single int8 seam: a layer runs the w8 path iff the params tree
    it was APPLIED with already holds int8 weights (`kernel_q`) under its
    scope — i.e. `ops.quant.quantize_variables` was run on the trained
    float tree. No module flags: the checkpoint is the switch. During
    `init` nothing is declared yet, so fresh models always init float."""
    params = module.variables.get("params", {})
    sub = params.get(sub_name)
    return sub is not None and "kernel_q" in sub


class TorchConv(nn.Module):
    """nn.Conv with PyTorch-default initialization.

    kernel: U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise; fan_in =
    (cin/groups) * kh * kw. Layout is NHWC/HWIO (TPU-native).

    If the supplied params hold an int8 kernel (`kernel_q` — produced by
    `ops.quant.quantize_variables`), the layer runs the int8-weight path:
    1x1 convs through the Pallas matmul (weights stay int8 in HBM — see
    ops/quant.py), others dequantize into the XLA conv. Inference only.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | int | tuple = 0
    feature_group_count: int = 1
    use_bias: bool = True
    declare_only: bool = False  # return the param dict (same tree paths)
    # instead of computing — lets fused Pallas paths consume raw kernels
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
        from hifidiff_tpu.ops import quant

        kshape = (*self.kernel_size, cin // self.feature_group_count,
                  self.features)
        w8 = _quantized_subtree(self, "conv")
        if self.declare_only:
            if w8:
                return _W8Params(kshape, fan_in, self.use_bias,
                                 name="conv")()
            return _FloatConvParams(kshape, fan_in, self.use_bias,
                                    name="conv")()
        if w8:
            sub = _W8Params(kshape, fan_in, self.use_bias, name="conv")()
            y = quant.conv_w8(x, sub["kernel_q"], sub["kernel_scale"],
                              self.strides, pad, self.feature_group_count)
            if self.use_bias:
                y = y + sub["bias"]
            return y.astype(x.dtype)
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


class _FloatConvParams(nn.Module):
    """Declare nn.Conv-identical params ("kernel"/"bias", same inits and
    tree paths) without building the conv — used by `declare_only`."""

    kshape: tuple
    fan_in: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        out = {"kernel": self.param("kernel", torch_conv_kernel_init,
                                    self.kshape)}
        if self.use_bias:
            out["bias"] = self.param(
                "bias", torch_fan_in_bias_init(self.fan_in),
                (self.kshape[-1],))
        return out


class _W8Params(nn.Module):
    kshape: tuple
    fan_in: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        out = {
            "kernel_q": self.param(
                "kernel_q",
                lambda key, shape: jnp.zeros(shape, jnp.int8), self.kshape),
            "kernel_scale": self.param(
                "kernel_scale", nn.initializers.ones, (self.kshape[-1],)),
        }
        if self.use_bias:
            out["bias"] = self.param(
                "bias", torch_fan_in_bias_init(self.fan_in),
                (self.kshape[-1],))
        return out


class TorchDense(nn.Module):
    """nn.Dense with PyTorch-default initialization (int8-weight path
    when the params tree holds `kernel_q` — see TorchConv)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None
    kernel_init: object = torch_linear_kernel_init
    bias_init: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bias_init = self.bias_init or torch_fan_in_bias_init(fan_in)
        from hifidiff_tpu.ops import quant

        if _quantized_subtree(self, "dense"):
            sub = _W8Params((fan_in, self.features), fan_in,
                            self.use_bias, name="dense")()
            y = quant.dense_w8(x, sub["kernel_q"], sub["kernel_scale"])
            if self.use_bias:
                y = y + sub["bias"]
            return y.astype(x.dtype)
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=self.dtype,
            name="dense",
        )(x)
