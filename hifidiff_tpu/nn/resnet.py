"""IDC identity encoder: from-scratch ResNet-50 trunk, NHWC / flax.

Behavioral spec from the reference (`models/idc/model.py:102-166`): standard
bottleneck ResNet-50 (7x7/s2 stem conv without bias + BN + ReLU + 3x3/s2
maxpool; bottleneck stages [3,4,6,3] at planes 64/128/256/512; 1x1/3x3/1x1
convs WITH bias, torch default) with the classifier head removed; global
average pool yields the identity embedding. The reference's dead/buggy basic
`Block` class (`models/idc/model.py:58-99`) is intentionally not reproduced.

Output: (B, 2048) embedding (the reference shapes it (B, 2048, 1, 1); our
downstream consumers — triplet loss, FusedDenoiser's identity projection —
take the flat vector).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from hifidiff_tpu.nn.layers import TorchConv


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    project_identity: bool = False
    expansion: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = TorchConv(self.planes, (1, 1), dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = TorchConv(self.planes, (3, 3), strides=(self.stride,) * 2,
                        padding=1, dtype=self.dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = TorchConv(self.planes * self.expansion, (1, 1),
                        dtype=self.dtype, name="conv3")(out)
        out = norm("bn3")(out)

        if self.project_identity:
            identity = TorchConv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride,) * 2, dtype=self.dtype, name="proj_conv",
            )(identity)
            identity = norm("proj_bn")(identity)

        return nn.relu(out + identity)


class ResNet50(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) in [0,1] -> (B, 2048) identity embedding."""
        x = TorchConv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                      dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_ch = 64
        for stage, (blocks, planes) in enumerate(
            zip(self.stage_sizes, (64, 128, 256, 512))
        ):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                project = b == 0 and (stride != 1 or in_ch != planes * 4)
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    project_identity=project,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train=train)
                in_ch = planes * 4

        return jnp.mean(x, axis=(1, 2))
