"""LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

The reference computes LPIPS through pyiqa (`test_refiner.py:107-109`).
pyiqa's `lpips` metric defaults to the **AlexNet** backbone (the original
lpips repo's default, `net='alex'`), so `net="alex"` here is the variant
whose numbers are comparable to the reference's reported metric;
`net="vgg16"` (lpips `net='vgg'`) is also provided. Both follow the
standard formulation: backbone conv features at the canonical taps,
unit-normalized over channels, squared differences reduced by learned 1x1
linear heads, spatially averaged and summed over taps.

Pretrained weights cannot be fetched in this environment (zero egress);
`load_lpips_params` / `load_lpips_alex_params` import them from local
torchvision backbone state_dicts + lpips linear-head checkpoints when
provided. `lpips_available()` gates eval paths cleanly when no weights
exist. Parity of the formula itself is tested against a torch oracle on
synthetic weights (tests/test_eval.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, [convs per stage]); taps after each stage
VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# lpips convention: input scaled to [-1,1] then shifted/scaled by these
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 trunk emitting the 5 LPIPS feature taps."""

    @nn.compact
    def __call__(self, x) -> Sequence[jax.Array]:
        taps = []
        for si, (ch, n_convs) in enumerate(VGG16_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if si < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


# torchvision AlexNet `features` plan (lpips default backbone): taps after
# each of the 5 ReLUs; maxpool k3/s2 between stages 1-2, 2-3
ALEXNET_PLAN = (
    # (out_ch, kernel, stride, pad, maxpool_before)
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet trunk emitting the 5 LPIPS taps (relu1..relu5)."""

    @nn.compact
    def __call__(self, x) -> Sequence[jax.Array]:
        taps = []
        for i, (ch, k, s, p, pool_before) in enumerate(ALEXNET_PLAN):
            if pool_before:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


def _unit_normalize(feat: jax.Array) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / jnp.maximum(norm, 1e-10)


def lpips_distance(vgg_params: Dict, lin_weights: Sequence[jax.Array],
                   x: jax.Array, y: jax.Array,
                   net: str = "vgg16") -> jax.Array:
    """x, y: NHWC in [0, 1]. Returns per-sample LPIPS (B,).

    net: "alex" (pyiqa/lpips default — comparable to the reference's
    reported LPIPS) or "vgg16".
    """
    net = AlexNetFeatures() if net == "alex" else VGG16Features()

    def prep(img):
        img = img * 2.0 - 1.0
        shift = jnp.asarray(LPIPS_SHIFT)
        scale = jnp.asarray(LPIPS_SCALE)
        return (img - shift) / scale

    fx = net.apply({"params": vgg_params}, prep(x))
    fy = net.apply({"params": vgg_params}, prep(y))
    total = 0.0
    for tap_x, tap_y, w in zip(fx, fy, lin_weights):
        d = jnp.square(_unit_normalize(tap_x) - _unit_normalize(tap_y))
        # learned head: nonneg 1x1 conv (C,) weights, no bias
        d = jnp.sum(d * jnp.asarray(w).reshape(1, 1, 1, -1), axis=-1)
        total = total + jnp.mean(d, axis=(1, 2))
    return total


def load_lpips_params(vgg16_state_dict: Dict[str, np.ndarray],
                      lpips_state_dict: Dict[str, np.ndarray]):
    """Import torchvision VGG16 `features.*` weights + lpips `lin*.model.1`
    heads into (vgg_params, lin_weights)."""
    params: Dict = {}
    torch_idx = 0
    for si, (_, n_convs) in enumerate(VGG16_STAGES):
        for ci in range(n_convs):
            w = np.asarray(vgg16_state_dict[f"features.{torch_idx}.weight"])
            b = np.asarray(vgg16_state_dict[f"features.{torch_idx}.bias"])
            params[f"conv{si}_{ci}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
            torch_idx += 2  # conv + relu
        torch_idx += 1  # maxpool
    lins = []
    for i in range(5):
        w = np.asarray(lpips_state_dict[f"lin{i}.model.1.weight"])
        lins.append(w.reshape(-1))
    return params, lins


def load_lpips_alex_params(alexnet_state_dict: Dict[str, np.ndarray],
                           lpips_state_dict: Dict[str, np.ndarray]):
    """Import torchvision AlexNet `features.*` weights + lpips alex
    `lin*.model.1` heads into (alex_params, lin_weights). torchvision
    indices: conv layers at features.{0,3,6,8,10}."""
    conv_idx = (0, 3, 6, 8, 10)
    params: Dict = {}
    for i, ti in enumerate(conv_idx):
        w = np.asarray(alexnet_state_dict[f"features.{ti}.weight"])
        b = np.asarray(alexnet_state_dict[f"features.{ti}.bias"])
        params[f"conv{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                              "bias": b}
    lins = []
    for i in range(5):
        w = np.asarray(lpips_state_dict[f"lin{i}.model.1.weight"])
        lins.append(w.reshape(-1))
    return params, lins


_CACHE: Optional[tuple] = None


def lpips_available(vgg_path: Optional[str] = None,
                    lpips_path: Optional[str] = None) -> bool:
    import os

    return bool(vgg_path and lpips_path and os.path.exists(vgg_path)
                and os.path.exists(lpips_path))
