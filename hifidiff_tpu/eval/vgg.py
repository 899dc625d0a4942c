"""VGG19 feature trunk for the perceptual (CRLoss) term.

The reference's optional CRLoss uses torchvision `vgg19.features[:22]` —
conv layers through relu4_2 — with ImageNet normalization (`loss.py:22-23,
49-58`). This provides the same trunk in flax/NHWC plus a torchvision
state_dict importer. Note the reference computes BOTH feature maps under
`no_grad` so the term carries no gradient; `composite_cr_loss` reproduces
that with stop_gradient.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# VGG19 stages up to features[:22]: relu4_2 (conv counts per stage)
VGG19_PLAN = ((64, 2), (128, 2), (256, 4), (512, 2))
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features22(nn.Module):
    """Conv trunk equivalent to torchvision `vgg19.features[:22]`."""

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0, 1] -> relu4_2 features."""
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        for si, (ch, n_convs) in enumerate(VGG19_PLAN):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            if si < len(VGG19_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def vgg19_params_from_torch(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg19 state_dict (`features.N.weight/bias`) -> flax."""
    params: Dict = {}
    idx = 0
    for si, (_, n_convs) in enumerate(VGG19_PLAN):
        for ci in range(n_convs):
            w = np.asarray(sd[f"features.{idx}.weight"])
            params[f"conv{si}_{ci}"] = {
                "kernel": np.transpose(w, (2, 3, 1, 0)),
                "bias": np.asarray(sd[f"features.{idx}.bias"]),
            }
            idx += 2  # conv + relu
        idx += 1  # pool
    return params


def make_vgg_features_fn(params: Dict):
    """Returns `fn(images01) -> features` for `composite_cr_loss`."""
    net = VGG19Features22()

    def fn(x):
        return net.apply({"params": params}, x)

    return fn
