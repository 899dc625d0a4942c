"""Microbenchmark: decompose the prep stage (CR + VAE-enc + FPG + IDC).

The bench.py stage loop measures prep at ~220 ms/iter (batch 128) while
docs/PERF.md's per-component in-scan numbers sum to ~116 ms. This script
times each component AND the full prep composition with the same tunnel-
safe methodology (in-program `lax.scan`, perturbed inputs, one d2h sync)
to locate the missing time.

Usage: python scripts/prep_bench.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
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


def time_fn(name, fn, args_tuple, iters):
    """fn(*args, i) -> pytree; shared in-program harness (utils/timing)."""
    from hifidiff_tpu.utils.timing import scan_time_fn

    ms, compile_s = scan_time_fn(fn, args_tuple, iters)
    print(f"  {name:20s} {ms:8.2f} ms/iter  "
          f"(compile+1st {compile_s:.1f}s)", file=sys.stderr, flush=True)
    return round(ms, 2)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
    from hifidiff_tpu.vae import AutoencoderKL

    dtype = jnp.bfloat16
    cr = CoarseRestoration(dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    refiner = FacialRefiner(dtype=dtype)
    key = jax.random.PRNGKey(0)

    cr_params = jax.jit(cr.init)(key, jnp.zeros((1, 128, 128, 3)))["params"]
    vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 128, 128, 3)))["params"]
    rv = jax.jit(
        lambda k: refiner.init(k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                               jnp.zeros((1, 128, 128, 3)),
                               jnp.zeros((1, 16, 16, 4)), train=False)
    )(key)
    cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
    cr_params, vae_params, rv = cast(cr_params), cast(vae_params), cast(rv)
    rvars = {"params": rv["params"], "batch_stats": rv.get("batch_stats", {})}

    b = args.batch
    img = jax.random.uniform(key, (b, 128, 128, 3), jnp.float32)
    lat = jax.random.normal(key, (b, 16, 16, 4), jnp.float32)

    results = {}
    results["cr"] = time_fn(
        "cr", lambda p_, x, i: cr.apply({"params": p_}, x + 1e-4 * i),
        (cr_params, img), args.iters)
    results["vae_encode"] = time_fn(
        "vae_encode",
        lambda p_, x, i: vae.apply({"params": p_}, x + 1e-4 * i,
                                   sample=False, method=vae.encode),
        (vae_params, img * 2.0 - 1.0), args.iters)
    results["fpg"] = time_fn(
        "fpg",
        lambda v, z, i: refiner.apply(v, z + 1e-4 * i,
                                      method=lambda m, zz: m.fpg(zz)),
        (rvars, lat), args.iters)
    results["idc"] = time_fn(
        "idc",
        lambda v, x, i: refiner.apply(
            v, x + 1e-4 * i, method=lambda m, f: m.idc(f, train=False)),
        (rvars, img), args.iters)

    def full_prep(cp, vp, v, x, i):
        cr_face = cr.apply({"params": cp}, x + 1e-4 * i)
        cr_in = jnp.clip(cr_face, 0.0, 1.0) * 2.0 - 1.0
        z = vae.apply({"params": vp}, cr_in, sample=False, method=vae.encode)
        priors = refiner.apply(v, z * 0.18215,
                               method=lambda m, zz: m.fpg(zz))
        id_emb = refiner.apply(v, cr_face,
                               method=lambda m, f: m.idc(f, train=False))
        # return EVERY prior: returning only priors[0] lets XLA DCE the
        # pyramid heads feeding priors[1:] and understates the composed
        # cost (caught in the r3 code review)
        return (tuple(priors), id_emb)

    results["full_prep"] = time_fn(
        "full_prep", full_prep, (cr_params, vae_params, rvars, img),
        args.iters)

    print(json.dumps({"batch": b, "ms_per_iter": results}))


if __name__ == "__main__":
    main()
