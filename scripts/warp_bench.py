"""Microbenchmark: affine-warp variants at the CR production shapes.

Times each warp strategy with the tunnel-safe methodology from
docs/PERF.md: one jitted program per variant that runs N iterations in a
`lax.scan` (inputs perturbed per iteration so the server cannot memoize),
reduced to a scalar (so XLA cannot DCE the warp), ONE d2h sync at the end.

Shapes are the five CR feature maps that take the Pallas row-window path
at batch 128 (`models/cr.py`): 128^2x32, 64^2x64 (x2), 32^2x128 (x2).

Usage: python scripts/warp_bench.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def time_variant(name, fn, x, theta, iters):
    """fn(x, theta) -> warped; shared in-program harness (utils/timing)."""
    from hifidiff_tpu.utils.timing import scan_time_fn

    ms, compile_s = scan_time_fn(
        lambda x0, th, i: fn(x0 + (1e-3 * i).astype(x0.dtype), th),
        (x, theta), iters)
    print(f"  {name:24s} {ms:8.2f} ms/warp  "
          f"(compile+1st {compile_s:.1f}s)", file=sys.stderr, flush=True)
    return ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--shear", type=float, default=0.0,
                   help="ay shear; 0 = identity-like (K=4-eligible)")
    args = p.parse_args()

    from hifidiff_tpu.ops.pallas.warp import warp_rowwin_pallas
    from hifidiff_tpu.ops.warp import _pixel_coef, _warp_gather

    key = jax.random.PRNGKey(0)
    results = {}
    for (res, c) in ((128, 32), (64, 64), (32, 128)):
        b = args.batch
        x = jax.random.normal(key, (b, res, res, c), jnp.bfloat16)
        theta = jnp.tile(jnp.asarray(
            [[1.0, 0.01, 0.02], [args.shear, 1.0, -0.01]],
            jnp.float32)[None], (b, 1, 1))
        print(f"shape ({b}, {res}, {res}, {c}):", file=sys.stderr, flush=True)

        def kern(k, packed):
            def f(x, th):
                coef = _pixel_coef(th, x.shape[1], x.shape[2])
                return warp_rowwin_pallas(x, coef, k_win=k, packed=packed)
            return f

        variants = {
            "k16": kern(16, False),
            "k16_packed": kern(16, True),
            "k4": kern(4, False),
            "k4_packed": kern(4, True),
            "gather": functools.partial(_warp_gather),
        }
        shape_res = {}
        for name, fn in variants.items():
            try:
                shape_res[name] = round(
                    time_variant(name, fn, x, theta, args.iters), 3)
            except Exception as e:  # noqa: BLE001
                print(f"  {name}: FAILED {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                shape_res[name] = None
        results[f"{res}x{res}x{c}"] = shape_res

    print(json.dumps({"batch": args.batch, "shear": args.shear,
                      "ms_per_warp": results}))


if __name__ == "__main__":
    main()
