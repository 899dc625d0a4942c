"""Device-mesh parallelism: declared shardings, XLA-inserted collectives.

The reference's only distributed machinery is HF Accelerate DDP (NCCL
all-reduce in `accelerator.backward`, `pretrain_denoiser.py:230,282-287`).
The TPU-native equivalent is GSPMD: build a `jax.sharding.Mesh`, shard the
batch axis with a NamedSharding, replicate parameters, and `jit` the train
step — XLA emits the gradient `psum` over ICI within a slice (DCN across
slices) with zero communication code (SURVEY.md §2.5).

Axes:
  * "data"  — batch sharding (the workload's scaling axis; no token/sequence
    axis exists in this model family, SURVEY.md §5 long-context row).
  * "model" — optional tensor-axis for the 2048-channel bottleneck convs;
    parity does not require it (largest matmul is 2048x4096) but the mesh
    API carries it so wide configs can shard channels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    With the default single axis, shape is (n_devices,). Pass
    axes=("data", "model") and an explicit shape for hybrid DP x TP.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axes)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading-axis ("data") sharding for an ndim-dimensional batch."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_shard(x) -> np.ndarray:
    """Host-local view of a (possibly multi-process global) jax.Array —
    for image dumps / logging on process 0. Single-process: the full
    array. Multi-process: the rows this process owns, concatenated."""
    x = jax.numpy.asarray(x) if not isinstance(x, jax.Array) else x
    if jax.process_count() == 1 or x.is_fully_addressable:
        return np.asarray(x)
    shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start
                    if s.index and s.index[0].start else 0)
    seen, parts = set(), []
    for s in shards:
        k = tuple((sl.start, sl.stop) for sl in s.index if sl.start
                  is not None) or ("rep",)
        if k in seen:
            continue
        seen.add(k)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def replicate_global(tree, mesh: Mesh):
    """Replicate a host-local pytree (params/opt-state) onto every device
    of a possibly multi-process mesh. All processes must hold identical
    values (same-seed init or a restored checkpoint — both deterministic
    here). Single-process reduces to a plain replicated device_put."""
    if jax.process_count() == 1:
        return jax.device_put(tree, replicated(mesh))
    s = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            s, np.asarray(x)), tree)


def device_prefetch(iterator, mesh: Mesh, depth: int = 2):
    """Wrap a host batch iterator so the next `depth` batches are already
    device_put (sharded over "data") while the current one trains — hides
    H2D transfer behind compute (the reference relies on torch DataLoader
    `pin_memory` for the same purpose)."""
    import collections
    import itertools

    queue = collections.deque()
    it = iter(iterator)
    for batch in itertools.islice(it, depth):
        queue.append(shard_batch(batch, mesh))
    while queue:
        out = queue.popleft()
        nxt = next(it, None)
        if nxt is not None:
            queue.append(shard_batch(nxt, mesh))
        yield out


def wrap_pad_leading(xa: np.ndarray, multiple: int) -> np.ndarray:
    """Pad axis 0 up to a multiple of `multiple` by REPEATING the array
    (DistributedSampler wrap semantics). Repetition must wrap: a plain
    `xa[:pad]` clips when pad > n (e.g. a final local batch of 1 padding
    to a 4-device multiple), silently under-padding — the inferred global
    shape then fails against the mesh (r3 regression, caught by
    `mp_dryrun`'s ragged val batch)."""
    if xa.ndim < 1 or xa.shape[0] % multiple == 0:
        return xa
    pad = -xa.shape[0] % multiple
    idx = np.arange(xa.shape[0] + pad) % xa.shape[0]
    return xa[idx]


def shard_batch(tree, mesh: Mesh):
    """Device-put every leaf with its leading axis split over "data".

    Single-process: a leaf whose leading dim is not divisible by the
    data-axis size (e.g. a ragged final eval batch) is replicated instead —
    correctness first; pad to a multiple of the mesh for full throughput.

    Multi-process (jax.process_count() > 1): each process passes its LOCAL
    shard (from a `Loader(shard_index=..., num_shards=...)`) and the global
    batch-sharded array is assembled via
    `jax.make_array_from_process_local_data`. The Loader's shard logic
    guarantees every process sees the same batch sizes; a final ragged
    batch (drop_last=False) is wrap-padded up to the local device multiple
    — identically on every process — so collective programs never see a
    shape mismatch (the padded rows repeat real samples, DistributedSampler
    semantics)."""
    n_data = mesh.shape["data"]
    multiprocess = jax.process_count() > 1
    local_extent = max(1, n_data // jax.process_count())

    def put(x):
        if multiprocess:
            xa = wrap_pad_leading(np.asarray(x), local_extent)
            sharding = NamedSharding(
                mesh, P("data", *([None] * (xa.ndim - 1))))
            return jax.make_array_from_process_local_data(sharding, xa)
        if np.ndim(x) >= 1 and np.shape(x)[0] % n_data == 0:
            return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(put, tree)
