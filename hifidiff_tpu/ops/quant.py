"""Weight+activation int8 (w8a8) quantization for inference.

Motivation (measured, see README/bench): the 50-step DDIM scan is
weight-streaming bound — ~350M denoiser params re-read from HBM every step.
Storing weights int8 halves that traffic and the int8 MXU path doubles
matmul rate; activations are quantized dynamically per-tensor so the
dequantize stays fused (a weight-only dequant would be hoisted out of the
scan by XLA and re-materialized in bf16, winning nothing).

Scheme: symmetric per-output-channel weight scales, symmetric per-tensor
dynamic activation scale (abs-max/127), int8 x int8 -> int32 accumulation,
float rescale. Opt-in (`FusedDenoiser(w8a8=True)`) — quantization error
compounds over the 50-step loop, so parity-critical evals keep bf16.

MEASURED CAVEAT (v5e, 2026-08): with the current XLA/Mosaic lowering this
path benches 3x SLOWER end-to-end than bf16 (52.9 vs 160+ faces/s) — the
int8 convolutions do not hit an efficient MXU path and the per-layer
dynamic activation quantization adds VPU work. Kept as an experimental
subsystem (`bench.py --quant int8`); revisit with native-int8 Pallas
matmul kernels or newer XLA.

`quantize_variables` converts a trained f32/bf16 tree into the quantized
module's tree (structure-driven: the target structure comes from the
quantized model itself, so module/converter mismatches are impossible).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight_per_cout(kernel: jax.Array):
    """kernel (..., cout) -> (int8 kernel, (cout,) f32 scales)."""
    reduce_axes = tuple(range(kernel.ndim - 1))
    amax = jnp.max(jnp.abs(kernel.astype(jnp.float32)), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kernel.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _quantize_act(x: jax.Array):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def dense_w8a8(x: jax.Array, kernel_q: jax.Array,
               kernel_scale: jax.Array) -> jax.Array:
    """x: (..., cin) float; kernel_q: (cin, cout) int8 -> (..., cout) f32."""
    x_q, x_scale = _quantize_act(x)
    y = jax.lax.dot_general(
        x_q, kernel_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * kernel_scale)


def conv_w8a8(x: jax.Array, kernel_q: jax.Array, kernel_scale: jax.Array,
              strides, padding, feature_group_count: int = 1) -> jax.Array:
    """NHWC int8 convolution with float rescale. kernel_q: HWIO int8."""
    x_q, x_scale = _quantize_act(x)
    y = jax.lax.conv_general_dilated(
        x_q, kernel_q, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * kernel_scale)


def quantize_variables(float_params: Dict, quant_shapes: Any) -> Dict:
    """Fill a quantized model's param structure from a float tree.

    Args:
      float_params: the trained f32/bf16 "params" tree (non-quant module).
      quant_shapes: `jax.eval_shape(quant_model.init, ...)["params"]` — the
        target structure with `kernel_q`/`kernel_scale` leaves.
    Returns:
      params tree matching the quantized module.
    """

    def walk(f_node, q_node):
        if not isinstance(q_node, dict):
            return f_node
        out = {}
        for k, q_child in q_node.items():
            if k == "kernel_q":
                kq, ks = quantize_weight_per_cout(jnp.asarray(
                    f_node["kernel"]))
                out["kernel_q"] = kq
                out["kernel_scale"] = ks
            elif k == "kernel_scale":
                continue  # produced with kernel_q
            else:
                out[k] = walk(f_node[k], q_child)
        return out

    return walk(float_params, quant_shapes)
