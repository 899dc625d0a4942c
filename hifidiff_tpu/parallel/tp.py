"""Optional tensor parallelism: channel-sharded parameters over a "model"
mesh axis.

The reference has no TP (largest layer is a 2048-channel 1x1 conv —
SURVEY.md §2.5), so this is a beyond-parity scaling hook: on a
Mesh(("data", "model")), wide kernels are sharded along their
output-channel dimension and GSPMD partitions the matmuls, inserting the
(all-gather) collectives where a consumer needs the full activation. For
width-scaled configs (e.g. width 512 -> 8192-channel bottleneck) this
splits both the weight memory and the MXU work across the model axis.

Usage:
    mesh = make_mesh(8, axes=("data", "model"), shape=(4, 2))
    params = shard_params_tp(params, mesh, min_features=2048)
    # batch sharded over "data" as usual; jit as usual.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_spec_for(x, model_size: int, min_features: int) -> P:
    """PartitionSpec sharding the trailing (output-feature) dim when it is
    wide enough and divisible; everything else replicated."""
    shape = np.shape(x)
    if len(shape) == 0:
        return P()
    cout = shape[-1]
    if cout < min_features or cout % model_size != 0:
        return P()
    return P(*([None] * (len(shape) - 1) + ["model"]))


def shard_params_tp(params: Any, mesh: Mesh,
                    min_features: int = 2048) -> Any:
    """device_put every param with an output-channel "model" sharding where
    eligible (conv HWIO kernels, dense (cin, cout) kernels, (cout,) biases
    and scales), replicated otherwise."""
    if "model" not in mesh.axis_names:
        raise ValueError("mesh has no 'model' axis")
    model_size = mesh.shape["model"]

    def put(x):
        spec = tp_spec_for(x, model_size, min_features)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, params)
