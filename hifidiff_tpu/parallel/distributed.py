"""Multi-process (multi-host) runtime support.

The reference's only multi-device machinery is HF Accelerate, which (a)
initializes the process group, (b) shards the DataLoader across processes,
and (c) gates logging/checkpoints on `accelerator.is_main_process`
(`/root/reference/pretrain_denoiser.py:230,282-287,112-120`). The
TPU-native equivalents live here:

  (a) `maybe_initialize()` — `jax.distributed.initialize` when the run is
      multi-process (explicit args or the standard JAX env vars /
      TPU-pod metadata), a no-op for single-process runs;
  (b) `Loader(shard_index=process_index(), num_shards=process_count())` —
      see data/core.py;
  (c) `is_main_process()` + the `main_only` flag on MetricsLogger.

After initialization, GSPMD handles the rest: the train step is jitted
over a global `Mesh` of ALL devices (every process sees the global mesh),
each process feeds its local shard via
`jax.make_array_from_process_local_data`, and XLA emits the gradient
psums over ICI/DCN — no NCCL-style comm code.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-process runs.

    Explicit args win; otherwise the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, as used
    by `jax.distributed.initialize`'s auto-detection) trigger
    initialization. Single-process runs (no args, no env) are a no-op —
    calling this unconditionally at CLI start is safe.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    env_addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and env_addr is None:
        return  # single-process
    kwargs = {}
    if coordinator_address or env_addr:
        kwargs["coordinator_address"] = coordinator_address or env_addr
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """The reference gates wandb/ckpt/image dumps on
    `accelerator.is_main_process` (`pretrain_denoiser.py:112-120,207-210`);
    this is the jax equivalent."""
    return jax.process_index() == 0


def local_batch_to_global(mesh: jax.sharding.Mesh, batch,
                          axis: str = "data"):
    """Assemble a global batch-sharded array from each process's local
    shard (the Accelerate-prepared-DataLoader equivalent).

    Each process passes its LOCAL numpy batch (global_batch /
    process_count rows, from its Loader shard); returns a global
    jax.Array sharded over `axis`. Single-process: equivalent to
    device_put with batch sharding.
    """
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)
