"""Tunnel-safe in-program timing harness (docs/PERF.md rules 1-3).

Through the axon tunnel, host-loop timings measure the tunnel (~6-11 ms
dispatch tax per call), identical pending computations are memoized
server-side, and `block_until_ready` is not a barrier. The only reliable
recipe, shared by bench.py's stage timer and the scripts/ microbenches:

  1. iterate IN-PROGRAM via `lax.scan`, one jit call per measurement;
  2. vary every data input per iteration (else XLA hoists the
     loop-invariant computation out of the scan);
  3. fold EVERY output leaf into the scalar carry (reducing one leaf
     lets XLA DCE the compute behind the others — this silently dropped
     the whole CR+VAE+FPG+IDC chain from an early prep measurement);
  4. force completion with a tiny d2h read of the result.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def scan_time_fn(fn: Callable, args: tuple, iters: int) -> Tuple[float, float]:
    """Time `fn(*args, i)` (i = traced int32 iteration index) as an
    in-program scan. `fn` must consume `i` to vary its data inputs.

    Returns (ms_per_iter, compile_plus_first_run_seconds).
    """

    @jax.jit
    def loop(*a):
        def body(carry, i):
            out = fn(*a, i)
            for leaf in jax.tree_util.tree_leaves(out):
                carry = carry + jnp.max(jnp.abs(leaf)).astype(jnp.float32)
            return carry, None

        acc, _ = lax.scan(body, jnp.float32(0.0),
                          jnp.arange(iters, dtype=jnp.int32))
        return acc

    t0 = time.time()
    np.asarray(loop(*args))          # compile + first run, d2h sync
    compile_s = time.time() - t0
    t0 = time.time()
    np.asarray(loop(*args))
    return (time.time() - t0) / iters * 1e3, compile_s
