"""Benchmark: end-to-end HifiDiff inference throughput on one TPU chip.

Workload (BASELINE.md): 50-step DDIM, 16x16x4 latents -> 128x128 faces,
full pipeline per face = CR (NAFNet-UNet + 9 STNs, pixel space) ->
VAE-encode -> FPG priors + IDC ResNet-50 embedding (once) -> 50x
FusedDenoiser -> VAE-decode. Default execution: three chained jitted
stages (prep / DDIM lax.scan / decode — see
`pipeline.build_refiner_sampler_split` for the stage-count study), bf16
compute AND bf16 param storage, uint8 images at the boundary.

Prints one JSON line:
  {"metric": "faces_per_sec_per_chip_128px_ddim50", "value": N,
   "unit": "faces/sec", "vs_baseline": N}

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is an analytic estimate of the PyTorch reference on one A100:
pipeline FLOPs (from XLA cost analysis) / 15 TFLOP/s effective — i.e. A100
TF32 peak 156 TFLOP/s at ~10% MFU, generous for a torch pipeline of small
convs with 50 host-dispatched UNet+scheduler steps and per-step Python
overhead (`test_refiner.py:87-91`). Revisit when a measured torch number
exists.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

# persistent compile cache: the full-pipeline XLA program is large (~9 min
# cold compile through the TPU tunnel); warm runs load from here instead
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_EFFECTIVE_FLOPS = 15e12  # see module docstring
# measured via XLA cost analysis of the fused program (batch 64, 50 steps)
FALLBACK_PIPELINE_TFLOPS_PER_FACE = 0.232


def main() -> None:
    p = argparse.ArgumentParser()
    # batch sweep on v5e (bf16 params, uint8 I/O, split stages, adaptive
    # warp, quiet host, MEDIAN-window methodology, r3):
    # 128 -> 295.1, 192 -> 260.1 (1.5x non-power-of-2 tiling penalty),
    # 256 -> 291.4. 128 is the sweet spot.
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--windows", type=int, default=3,
                   help="measurement windows; the MEDIAN is reported, with "
                        "the per-window list and spread in the JSON "
                        "(tunnel throughput drifts ~20%% between windows)")
    p.add_argument("--warm-windows", type=int, default=1,
                   help="full-size windows run and DISCARDED before the "
                        "measured ones (reported separately as "
                        "warm_windows in the JSON). The first post-compile "
                        "window consistently reads low — residual "
                        "server-side compile work drains into its "
                        "dispatches (r4: 258.4 vs 296.6/297.4) — so "
                        "including it makes spread_pct measure warm-up "
                        "rather than tunnel drift (VERDICT r4 #7)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--cast-params", type=int, default=1,
                   help="store params in bf16 (halves per-step HBM param "
                        "traffic across the 50-step scan)")
    p.add_argument("--unroll", type=int, default=1,
                   help="lax.scan unroll factor for the DDIM loop")
    p.add_argument("--mode", choices=["split", "fused"], default="split",
                   help="chained jitted stages (faster) vs one program")
    p.add_argument("--quant", choices=["none", "int8"], default="none",
                   help="int8-resident denoiser weights (one-seam converter, "
                        "ops/quant.py; measured-negative in-context: "
                        "230 vs 295 f/s — the scan is compute-bound)")
    p.add_argument("--cache-interval", type=int, default=1,
                   help=">1 enables encoder-propagation caching: full UNet "
                        "every k-th step, decoder-only between (approximate "
                        "sampling)")
    p.add_argument("--sampler", choices=["ddim", "dpmpp"], default="ddim",
                   help="dpmpp = DPM-Solver++ (2M): 2nd-order multistep "
                        "(solver-accuracy verified, tests/test_dpmpp.py). "
                        "On the n=192 trained stack "
                        "(scripts/cache_quality.py) dpmpp@10 costs 1.03 "
                        "dB gt-PSNR vs exact DDIM-50 — DDIM@20 quality at "
                        "DDIM@10 speed — and composes with --tiny-ae; "
                        "measure quality on YOUR stack before picking a "
                        "fast mode")
    p.add_argument("--workload", choices=["infer", "train", "host"],
                   default="infer",
                   help="train = stage-3 denoiser pretraining step "
                        "(VAE-encode + UNet fwd/bwd + AdamW), images/sec; "
                        "host = input-pipeline throughput (Loader + native "
                        "degradations, no device), images/sec")
    p.add_argument("--host-mode", choices=["hq", "blind"], default="blind",
                   help="host workload: hq = decode+resize only (stage-3 "
                        "datasets); blind = full MultiPIE blind-degradation "
                        "branch (stage-1/4 training)")
    p.add_argument("--threads", type=int, default=4,
                   help="host workload: Loader worker threads")
    p.add_argument("--remat", type=int, default=0,
                   help="train workload: jax.checkpoint the UNet blocks")
    p.add_argument("--cache-latents", type=int, default=0,
                   help="train workload: sample latents from pre-encoded "
                        "VAE posterior moments instead of encoding images "
                        "every step (exact for the augmentation-free "
                        "stage-3 datasets; cli/pretrain_denoiser.py "
                        "--cache-latents)")
    p.add_argument("--profile", type=str, default="",
                   help="directory for a jax.profiler trace of the timed "
                        "iterations")
    p.add_argument("--no-hoist", action="store_true",
                   help="disable scan-invariant hoisting (A/B diagnostics)")
    p.add_argument("--stage-times", type=int, nargs="?", const=1, default=0,
                   help="split mode: measure per-stage (prep/scan/decode) "
                        "times; included in the JSON line (bare "
                        "--stage-times accepted as 1). OFF by default: it "
                        "compiles three extra scan-of-stage programs before "
                        "the headline windows, which pushed the default run "
                        "past the round-3 driver timeout (VERDICT r3 #1)")
    p.add_argument("--host-init", type=int, default=0,
                   help="EXPERIMENTAL: synthesize params host-side from "
                        "eval_shape'd trees + one device_put instead of "
                        "running the init programs on-device. Measured "
                        "NEGATIVE r4: eval_shape tracing (~60 s) + transfer "
                        "(~15-28 s) costs more than the cache-warm on-device "
                        "inits (~34-58 s), and a first value-naive cut also "
                        "halved pipeline throughput by knocking the STN warp "
                        "off its fast path (see synth_params). Kept for "
                        "A/B diagnostics")
    p.add_argument("--roofline", action="store_true",
                   help="measure the chip's compute/bandwidth envelope "
                        "(bf16 matmul TFLOP/s at several shapes, HBM GB/s), "
                        "write ROOFLINE.json, print it, and exit")
    p.add_argument("--latency", action="store_true",
                   help="serving-latency mode: per-call end-to-end "
                        "latency (p50/p95) at --batch with a sync after "
                        "EVERY call, instead of pipelined throughput. Use "
                        "small --batch (1/8/16) for interactive-serving "
                        "numbers")
    p.add_argument("--tiny-ae", choices=["none", "decode", "both"],
                   default="none",
                   help="swap the SD-VAE decode (and with 'both' the "
                        "encode) for the distilled tiny autoencoder "
                        "(vae/tiny.py, ~22x fewer decode FLOPs; quality "
                        "bounds on the trained stack in TAE_QUALITY.json). "
                        "Random tiny weights here — bench measures speed")
    p.add_argument("--tiny-cr", action="store_true",
                   help="swap the exact Coarse Restoration net for the "
                        "distilled TinyCR student (models/tiny_cr.py, "
                        "~50x fewer CR FLOPs; quality bounds on the "
                        "trained stack in TINY_CR_QUALITY.json). Random "
                        "tiny weights here — bench measures speed")
    p.add_argument("--tiny-dn", type=int, default=0, metavar="WIDTH",
                   help="run the denoiser scan on a width-WIDTH distilled "
                        "FacialRefiner student instead of the full width-128 "
                        "teacher (cli/train_tiny_dn.py; eps-matching keeps "
                        "every sampler/step-count unchanged; quality bounds "
                        "on the trained stack in TINY_DN_QUALITY.json). "
                        "Random student weights here — bench measures speed")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    if args.roofline:
        bench_roofline(args)
        return

    from hifidiff_tpu.diffusion import DiffusionSchedule
    from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
    from hifidiff_tpu.pipeline import (
        RefinerPipelineConfig,
        build_refiner_sampler,
        build_refiner_sampler_split,
    )
    from hifidiff_tpu.vae import AutoencoderKL

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr, flush=True)

    if args.workload == "host":
        # pure-host benchmark: never touch jax.devices() — the backend may
        # be a (possibly unreachable) TPU tunnel and this path needs none
        bench_host(args, log)
        return

    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)

    if args.workload == "train":
        bench_train(args, dtype, key, log)
        return

    cr = CoarseRestoration(dtype=dtype)
    vae = AutoencoderKL(dtype=dtype)
    refiner = (FacialRefiner(width=args.tiny_dn, dtype=dtype)
               if args.tiny_dn else FacialRefiner(dtype=dtype))
    if args.tiny_dn:
        log(f"tiny-dn: width-{args.tiny_dn} distilled denoiser student")
    schedule = DiffusionSchedule.create()

    # ---- overlapped cold-start (plain split path only) -----------------
    # the three STAGE compiles need only input avals, never init values, so
    # they can run server-side concurrently with the three INIT compiles:
    # cold-start drops from init(~130 s) + stages(~185 s) serial to
    # roughly max() of the two. The side thread traces with
    # ShapeDtypeStructs (no device work) and warm_compile pins the AOT
    # executables; on any failure it logs and leaves the lazy-compile
    # path intact.
    plain_split = (args.mode == "split" and args.quant == "none"
                   and args.tiny_ae == "none" and not args.tiny_cr
                   and not args.host_init)
    pipe_cfg = RefinerPipelineConfig(num_inference_steps=args.steps,
                                     unroll=args.unroll, io_uint8=True,
                                     cache_interval=args.cache_interval,
                                     hoist_invariants=not args.no_hoist,
                                     sampler=args.sampler)
    lr_images = (jax.random.uniform(key, (args.batch, 128, 128, 3)) * 255
                 ).astype(jnp.uint8)
    run = None
    warm_thread = None
    if plain_split:
        run = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                          pipe_cfg)

        def _aval_warm():
            try:
                cast = args.dtype == "bf16" and args.cast_params

                def cast_tree(t):
                    return jax.tree_util.tree_map(
                        lambda s: jax.ShapeDtypeStruct(
                            s.shape,
                            jnp.bfloat16 if (cast and s.dtype == jnp.float32)
                            else s.dtype), t)

                cr_a = cast_tree(jax.eval_shape(
                    cr.init, key,
                    jax.ShapeDtypeStruct((1, 128, 128, 3),
                                         jnp.float32)))["params"]
                vae_a = cast_tree(jax.eval_shape(
                    vae.init, key,
                    jax.ShapeDtypeStruct((1, 128, 128, 3),
                                         jnp.float32)))["params"]
                rv_a = cast_tree(jax.eval_shape(
                    lambda k: refiner.init(
                        k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                        jnp.zeros((1, 128, 128, 3)),
                        jnp.zeros((1, 16, 16, 4)), train=False), key))
                var_avals = {
                    "refiner": {"params": rv_a["params"],
                                "batch_stats": rv_a.get("batch_stats", {})},
                    "cr": cr_a, "vae": vae_a,
                }
                run.warm_compile(
                    var_avals,
                    jax.ShapeDtypeStruct(lr_images.shape, lr_images.dtype),
                    key)
            except Exception as e:  # noqa: BLE001
                log("overlapped warm_compile failed (lazy path will "
                    "compile instead):", e)

        import threading

        warm_thread = threading.Thread(target=_aval_warm, daemon=True)
        warm_thread.start()
    # --------------------------------------------------------------------

    t0 = time.time()
    if args.host_init:
        # synthesize params on the host from eval_shape'd trees instead of
        # compiling + executing the three init programs on the device: the
        # bench measures speed on random weights either way, and the init
        # compiles cost ~58 s per run even cache-warm through the TPU
        # tunnel (r4 measurement; the CPU backend is no better — XLA:CPU
        # compile of these graphs runs minutes). Kernel leaves get small
        # normal values, 1-D leaves zeros — TPU runtime is data-
        # independent, only shapes/dtypes matter here.
        cr_params = synth_params(jax.eval_shape(
            cr.init, key, jnp.zeros((1, 128, 128, 3))))["params"]
        vae_params = synth_params(jax.eval_shape(
            vae.init, key, jnp.zeros((1, 128, 128, 3))))["params"]
        rv = synth_params(jax.eval_shape(
            lambda k: refiner.init(k, jnp.zeros((1, 16, 16, 4)),
                                   jnp.zeros((1,)),
                                   jnp.zeros((1, 128, 128, 3)),
                                   jnp.zeros((1, 16, 16, 4)), train=False),
            key))
    else:
        # the three init programs are independent: compile them
        # concurrently (the tunnel parallelizes server-side, measured r4
        # ~2.5x on 3 programs — shaves cold-start toward the driver's
        # bench timeout)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(3) as ex:
            f_cr = ex.submit(lambda: jax.jit(cr.init)(
                key, jnp.zeros((1, 128, 128, 3)))["params"])
            f_vae = ex.submit(lambda: jax.jit(vae.init)(
                key, jnp.zeros((1, 128, 128, 3)))["params"])
            f_rv = ex.submit(jax.jit(
                lambda k: refiner.init(k, jnp.zeros((1, 16, 16, 4)),
                                       jnp.zeros((1,)),
                                       jnp.zeros((1, 128, 128, 3)),
                                       jnp.zeros((1, 16, 16, 4)),
                                       train=False)), key)
            cr_params, vae_params, rv = (f_cr.result(), f_vae.result(),
                                         f_rv.result())
        jax.block_until_ready((cr_params, vae_params, rv))
    log(f"init done in {time.time() - t0:.1f}s"
        + (" (host synth)" if args.host_init else ""))

    refiner_params = rv["params"]
    if args.quant == "int8":
        from hifidiff_tpu.ops.quant import quantize_variables

        # quantize only the scan-streamed denoiser weights; IDC/FPG run
        # once per batch and stay float (the tree is the switch — the
        # layers self-detect kernel_q, see ops/quant.py)
        refiner_params = dict(rv["params"])
        refiner_params["denoiser"] = quantize_variables(
            rv["params"]["denoiser"])
        log("denoiser quantized to w8 int8")

    variables = {
        "refiner": {"params": refiner_params,
                    "batch_stats": rv.get("batch_stats", {})},
        "cr": cr_params,
        "vae": vae_params,
    }
    tiny_enc = tiny_dec = None
    if args.tiny_ae != "none":
        from hifidiff_tpu.vae import tiny_autoencoder_pair

        te, td = tiny_autoencoder_pair(8, dtype=dtype)
        tiny_dec = td

        def tiny_init(mod, shape):
            if args.host_init:
                return synth_params(jax.eval_shape(
                    mod.init, key, jnp.zeros(shape)))["params"]
            return jax.jit(mod.init)(key, jnp.zeros(shape))["params"]

        variables["tiny_dec"] = tiny_init(td, (1, 16, 16, 4))
        if args.tiny_ae == "both":
            tiny_enc = te
            variables["tiny_enc"] = tiny_init(te, (1, 128, 128, 3))
        log(f"tiny-ae mode: {args.tiny_ae}")
    tiny_cr = None
    if args.tiny_cr:
        from hifidiff_tpu.models import TinyCR

        tiny_cr = TinyCR(dtype=dtype)
        if args.host_init:
            variables["tiny_cr"] = synth_params(jax.eval_shape(
                tiny_cr.init, key, jnp.zeros((1, 128, 128, 3))))["params"]
        else:
            variables["tiny_cr"] = jax.jit(tiny_cr.init)(
                key, jnp.zeros((1, 128, 128, 3)))["params"]
        log("tiny-cr: distilled CR student at the CR seam")
    if args.dtype == "bf16" and args.cast_params:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, variables)
        log("params cast to bf16")
    if args.host_init:
        # one bulk host->device transfer of the (bf16-cast) params
        t0 = time.time()
        variables = jax.device_put(variables, jax.devices()[0])
        jax.block_until_ready(variables)
        log(f"params device_put in {time.time() - t0:.1f}s")

    # (pipe_cfg / lr_images / the plain-split `run` were built up front so
    # the stage compiles could overlap init — see the overlapped-cold-start
    # block above; uint8 at the image boundary is the production serving
    # interface and avoids shipping f32 pixels over the host link)
    flops_per_call = None
    if args.mode == "fused":
        if args.tiny_ae != "none" or args.tiny_cr:
            raise SystemExit("--tiny-ae/--tiny-cr require --mode split")
        fn = jax.jit(build_refiner_sampler(refiner, cr, vae, schedule,
                                           pipe_cfg))
        t0 = time.time()
        compiled = fn.lower(variables, lr_images, key).compile()
        log(f"compile done in {time.time() - t0:.1f}s")
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops_per_call = float(ca.get("flops", 0.0)) or None
        except Exception as e:  # noqa: BLE001
            log("cost_analysis unavailable:", e)
        run = compiled
    elif run is None:
        run = build_refiner_sampler_split(refiner, cr, vae, schedule,
                                          pipe_cfg, tiny_enc=tiny_enc,
                                          tiny_dec=tiny_dec, tiny_cr=tiny_cr)

    import numpy as _np

    def sync(x):
        """Force completion via a tiny d2h read. On the axon tunnel,
        block_until_ready can return before execution finishes and the
        server memoizes identical pending computations — a d2h of the
        final output is the only airtight barrier (and inputs must differ
        per iteration, which the fold_in'd keys ensure)."""
        leaf = jax.tree_util.tree_leaves(x)[0]
        _np.asarray(leaf.ravel()[0:1])

    t0 = time.time()
    if warm_thread is not None:
        # stage compiles have been running since before init; wait for them
        warm_thread.join()
        log(f"overlapped stage compile joined {time.time() - t0:.1f}s "
            "after init")
    elif hasattr(run, "warm_compile"):
        # compile the three stage programs concurrently (see
        # pipeline.warm_compile); subsequent run() calls use the AOT
        # executables
        run.warm_compile(variables, lr_images, key)
        log(f"parallel stage compile done in {time.time() - t0:.1f}s")
    out = run(variables, lr_images, key)
    sync(out)
    log(f"warmup (incl. compile) done in {time.time() - t0:.1f}s")

    stage_ms = {}
    if args.stage_times and hasattr(run, "stages"):
        rvars = {"params": variables["refiner"]["params"],
                 "batch_stats": variables["refiner"]["batch_stats"]}
        enc_p = (variables["tiny_enc"] if tiny_enc is not None
                 else variables["vae"])
        dec_p = (variables["tiny_dec"] if tiny_dec is not None
                 else variables["vae"])
        cr_p = (variables["tiny_cr"] if tiny_cr is not None
                else variables["cr"])
        latents, priors, id_emb = run.stages["prep"](
            cr_p, enc_p, rvars, lr_images, key)
        final = run.stages["scan"](rvars, latents, priors, id_emb)
        sync(final)

        # per-stage timing via the shared in-program harness: a host loop
        # of per-stage dispatches pays ~11 ms of tunnel dispatch tax per
        # call (measured r3, scripts/prep_bench.py — it inflated prep
        # from its true ~109 ms to the 220-306 ms reported in
        # BENCH_r01/r02). Methodology rules live in utils/timing.py.
        from hifidiff_tpu.utils.timing import scan_time_fn

        def time_stage(name, fn, stage_args):
            ms, _ = scan_time_fn(fn, stage_args, args.iters)
            stage_ms[name] = round(ms, 1)
            print(f"[stage] {name}: {ms:.1f} ms/iter "
                  f"({args.batch / ms * 1e3:.1f} faces/s)", file=sys.stderr,
                  flush=True)

        # EVERY data input must vary per iteration, not just the PRNG key:
        # anything loop-invariant (e.g. the whole CR+VAE-encode if only the
        # key varies) gets hoisted out of the timing scan by XLA and the
        # stage reads absurdly fast. Weights stay constant (as in
        # production), so once-per-call weight-only precomputes (the
        # hoisted FiLM tables, ~0.3 ms) are excluded — negligible.
        time_stage(
            "prep",
            lambda cv, vv, rv_, x, k, i: run.stages["prep"](
                cv, vv, rv_, x + (i % 2).astype(x.dtype),
                jax.random.fold_in(k, i)),
            (cr_p, enc_p, rvars, lr_images, key))
        time_stage(
            "scan",
            lambda rv_, z, pr, ie, i: run.stages["scan"](
                rv_, z + 1e-3 * i.astype(z.dtype),
                jax.tree_util.tree_map(
                    lambda p: p + 1e-3 * i.astype(p.dtype), pr),
                ie + 1e-3 * i.astype(ie.dtype)),
            (rvars, latents, priors, id_emb))
        time_stage(
            "decode",
            lambda vv, z, i: run.stages["decode"](
                vv, z + 1e-3 * i.astype(z.dtype)),
            (dec_p, final))

    from hifidiff_tpu.utils.logging import profile_trace

    if args.latency:
        # serving mode: sequential calls, sync after each — measures the
        # real request-to-response latency a serving frontend would see
        # (throughput mode pipelines dispatches and hides it)
        lats = []
        for i in range(max(args.iters, 20)):
            t0 = time.time()
            out = run(variables, lr_images, jax.random.fold_in(key, i))
            sync(out)
            lats.append(time.time() - t0)
        lats_ms = sorted(x * 1e3 for x in lats[3:])   # drop warm tail
        p50 = lats_ms[len(lats_ms) // 2]
        p95 = lats_ms[int(len(lats_ms) * 0.95)]
        print(json.dumps({
            "metric": (f"latency_ms_batch{args.batch}_128px_"
                       f"{args.sampler}{args.steps}"),
            "value": round(p50, 1), "unit": "ms",
            "vs_baseline": 0.0,   # latency has no A100 baseline analogue
            "p95": round(p95, 1),
            "per_face_ms": round(p50 / args.batch, 2),
        }))
        return

    if args.stage_times:
        # Re-warm right before the windows, ONLY when stage timing actually
        # ran: it just compiled its scan programs server-side, and residual
        # server work drains into the first subsequent dispatches
        # (measured: a windows=1 run straight after cold stage timing read
        # 82 f/s with healthy 101.7/186.0/134.3 ms stage times; a clean
        # rerun read 273). Two untimed end-to-end iterations + sync absorb
        # that. Without stage timing the post-warmup state is already
        # clean, and unconditional re-warms cost end-of-round driver
        # budget (VERDICT r3 #1). Warm-up keys come from a disjoint fold
        # domain far above any practical measured index (fold_in rejects
        # negatives — uint32 coercion) so they can never collide with the
        # window keys fold_in(key, w*iters+i) (ADVICE r3).
        for i in range(2):
            out = run(variables, lr_images,
                      jax.random.fold_in(key, 2_000_000_000 + i))
        sync(out)

    # discarded warm windows (VERDICT r4 #7): absorb residual server-side
    # compile drain so the measured windows' spread reflects tunnel drift,
    # not warm-up. Keys come from a disjoint fold domain high above any
    # practical measured index w*iters+i (fold_in rejects negatives:
    # uint32 coercion) so they never collide at any --windows/--iters.
    warm_fps = []
    for w in range(args.warm_windows):
        t0 = time.time()
        for i in range(args.iters):
            out = run(variables, lr_images,
                      jax.random.fold_in(
                          key, 1_000_000_000 + w * args.iters + i))
        sync(out)
        fps = args.batch * args.iters / (time.time() - t0)
        warm_fps.append(fps)
        log(f"warm window {w}: {fps:.2f} faces/s (discarded)")

    # multiple measurement windows. The MEDIAN window is the number of
    # record (VERDICT r2 item 9: best-of-N over a ~20%-drifting tunnel
    # systematically flatters); per-window throughputs + spread are also
    # emitted so drift is visible in the artifact.
    window_fps = []
    with profile_trace(args.profile or None):
        for w in range(args.windows):
            t0 = time.time()
            for i in range(args.iters):
                out = run(variables, lr_images,
                          jax.random.fold_in(key, w * args.iters + i))
            sync(out)
            dt = time.time() - t0
            fps = args.batch * args.iters / dt
            window_fps.append(fps)
            log(f"window {w}: {args.iters} iters x batch {args.batch} in "
                f"{dt:.3f}s -> {fps:.2f} faces/s")
    faces_per_sec = float(_np.median(window_fps))
    spread_pct = (100.0 * (max(window_fps) - min(window_fps))
                  / faces_per_sec) if len(window_fps) > 1 else 0.0
    log(f"median window -> {faces_per_sec:.2f} faces/s "
        f"(spread {spread_pct:.1f}%)")

    if flops_per_call:
        flops_per_face = flops_per_call / args.batch
    else:
        flops_per_face = FALLBACK_PIPELINE_TFLOPS_PER_FACE * 1e12
    baseline_faces_per_sec = A100_EFFECTIVE_FLOPS / flops_per_face
    log(f"flops/face={flops_per_face:.3e}, baseline_est="
        f"{baseline_faces_per_sec:.2f} faces/s (A100 torch, analytic)")

    sampler_tag = ("ddim" if args.sampler == "ddim" else "dpmpp")
    if args.tiny_ae != "none":
        sampler_tag += f"_tae{args.tiny_ae}_"
    if args.tiny_cr:
        sampler_tag += "_tinycr_"
    if args.tiny_dn:
        sampler_tag += f"_tinydn{args.tiny_dn}_"
    result = {
        "metric": f"faces_per_sec_per_chip_128px_{sampler_tag}{args.steps}",
        "value": round(faces_per_sec, 3),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / baseline_faces_per_sec, 3),
        # the denominator is the ANALYTIC A100-torch estimate (module
        # docstring) — no measured torch/GPU number exists in this env
        "baseline": "analytic_a100_torch_estimate",
        "windows": [round(f, 1) for f in window_fps],
        "spread_pct": round(spread_pct, 1),
    }
    if warm_fps:
        # discarded pre-measurement windows (see --warm-windows): kept in
        # the artifact so the warm-up cost stays visible without
        # polluting the spread statistic
        result["warm_windows"] = [round(f, 1) for f in warm_fps]
    if stage_ms:
        result["stage_ms"] = stage_ms
    # MFU is only honest when flops_per_face reflects the FLOPs actually
    # executed: either measured via cost_analysis (fused mode) or the
    # exact-path fallback constant on the exact configuration. Approximate
    # modes (reduced steps / cache-interval / tiny-AE / int8) execute far
    # fewer FLOPs than the fallback, which would overstate MFU (>1).
    exact_config = (args.steps == 50 and args.cache_interval == 1
                    and args.tiny_ae == "none" and not args.tiny_cr
                    and not args.tiny_dn
                    and args.quant == "none" and args.sampler == "ddim")
    roof = load_roofline()
    if roof and (flops_per_call or exact_config):
        # MFU against the measured big-matmul bf16 peak (ROOFLINE.json,
        # reproduce with `python bench.py --roofline`)
        peak = roof.get("matmul_tflops", {}).get("peak")
        if peak:
            result["mfu"] = round(
                flops_per_face * faces_per_sec / (peak * 1e12), 4)
            result["roofline_peak_tflops"] = peak
    print(json.dumps(result), flush=True)


def synth_params(shapes):
    """Materialize an eval_shape'd variable tree on the host: kernels
    (ndim>=2) get small fan-in-scaled normal values, norm scales and BN
    vars get ones, biases/means zeros — i.e. value ranges close to a real
    flax init. Value sanity matters even for a speed bench: an all-zero
    first cut (LN scale 0, BN var 0) measured ~155 f/s where real-init
    params measured ~294 — degenerate activations are not free on the
    chip. Bench-only helper; see --host-init."""
    import numpy as np

    rng = np.random.default_rng(0)

    def make(path, s):
        names = [str(p.key) for p in path if hasattr(p, "key")]
        name = names[-1] if names else ""
        # STN theta heads (fc2 -> 6 affine params) are identity-init in the
        # real model (nn/stn.py). Random theta here is not just unfaithful,
        # it is SLOW: garbage affine spans push the span-adaptive warp off
        # its K=4 fast path onto the gather path — measured 152 vs 292 f/s
        # end-to-end (r4 bisection, CR subtree).
        if "fc2" in names and s.shape[-1] == 6:
            if name == "bias":
                return np.array([1, 0, 0, 0, 1, 0], dtype=s.dtype)
            return np.zeros(s.shape, s.dtype)
        if len(s.shape) >= 2:
            fan_in = int(np.prod(s.shape[:-1])) or 1
            a = rng.normal(0.0, fan_in ** -0.5, s.shape)
            return np.asarray(a, dtype=s.dtype)
        if name in ("scale", "var"):
            return np.ones(s.shape, s.dtype)
        return np.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map_with_path(make, shapes)


def load_roofline() -> dict:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ROOFLINE.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def bench_roofline(args) -> None:
    """Measure the chip's envelope (VERDICT r2 item 3): bf16 matmul TFLOP/s
    at MXU-friendly AND workload-like shapes, plus effective HBM GB/s, via
    the same sync discipline as the pipeline bench (d2h read, varied inputs
    to defeat the tunnel's memoization). Writes ROOFLINE.json so every
    subsequent bench run can report MFU against a committed measured peak.
    """
    import numpy as _np

    key = jax.random.PRNGKey(0)
    iters = max(args.iters, 10)
    out = {"device": str(jax.devices()[0]),
           "matmul_tflops": {}, "hbm_gbps": {}}

    def sync(x):
        _np.asarray(x.ravel()[0:1])

    # matmul shapes: (name, M, K, N). Square 8192 = MXU speed-of-light;
    # the small-K rows mirror the pipeline's worst layouts (CR width-32
    # 1x1 convs at 128^2 are M=B*HW, K=32, N=64 matmuls). The timing loop
    # is a lax.scan INSIDE one jit call: per-dispatch tunnel overhead is
    # ~6 ms (measured: square4096 reads 19.7 TF/s dispatched one-by-one vs
    # >100 in-scan), so host-loop timings measure the tunnel, not the chip.
    shapes = [("square8192", 8192, 8192, 8192),
              ("square4096", 4096, 4096, 4096),
              ("denoiser2048", 16384, 2048, 4096),
              ("cr_k32", 2 ** 21, 32, 64),
              ("cr_k128", 2 ** 19, 128, 256)]
    for si, (name, m, k, n) in enumerate(shapes):
        ka, kb = jax.random.split(jax.random.fold_in(key, si))
        a = jax.random.normal(ka, (m, k), jnp.bfloat16)
        b = jax.random.normal(kb, (k, n), jnp.bfloat16)

        @jax.jit
        def mm(a, b, seed):
            # carry-dependent perturbation defeats memoization AND chains
            # the iterations; the max-reduction carry depends NONLINEARLY
            # on every output element, so XLA can neither DCE the matmul
            # nor factor the reduction (a plain o[0,0] carry measured an
            # impossible 508 TF/s — DCE'd to a dot product). Reduction
            # cost m*n is negligible vs 2*m*k*n. The perturbation is a
            # SCALAR scale of `a` (input-fuses into the dot's operand
            # read) — NOT an `a.at[...].add` update, which materialized a
            # full (m,k) copy per iteration and understated the
            # bandwidth-bound small-K shapes ~2x.
            def body(c, i):
                o = (a * (jnp.bfloat16(1.0) + c
                          + i.astype(jnp.bfloat16) * 1e-3)) @ b
                return jnp.max(jnp.abs(o)) * jnp.bfloat16(1e-6), ()
            c, _ = lax.scan(body, seed, jnp.arange(iters))
            return c

        sync(mm(a, b, jnp.bfloat16(0.0)).reshape(1))  # compile + warm
        t0 = time.time()
        o = mm(a, b, jnp.bfloat16(1.0))
        sync(o.reshape(1))
        dt = (time.time() - t0) / iters
        tflops = 2.0 * m * k * n / dt / 1e12
        out["matmul_tflops"][name] = round(tflops, 2)
        print(f"[roofline] {name} ({m}x{k}x{n}): {tflops:.1f} TFLOP/s",
              file=sys.stderr, flush=True)
    out["matmul_tflops"]["peak"] = max(
        v for kk, v in out["matmul_tflops"].items())

    # HBM bandwidth: elementwise scale over a large bf16 array reads+writes
    # 2*bytes; also a reduction (read-dominated)
    nelem = 512 * 1024 * 1024  # 1 GiB bf16
    x = jax.random.normal(key, (nelem,), jnp.bfloat16)

    @jax.jit
    def scale(x, seed):
        # in-scan (one dispatch): the ARRAY is the scan carry, so each
        # step must read the full carry and write the full next carry —
        # true R+W traffic. (The previous version scaled a closed-over x
        # and reduced it to a max-carry; XLA input-fused the multiply into
        # the reduction and never wrote y, so "copy2x" was really a
        # read-only kernel reported at 2x its true bandwidth.)
        def body(y, i):
            m = (jnp.bfloat16(1.0) + seed * jnp.bfloat16(1e-6)
                 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-9))
            return y * m, ()
        y, _ = lax.scan(body, x, jnp.arange(iters))
        return y

    sync(scale(x, jnp.bfloat16(0.0)))
    t0 = time.time()
    o = scale(x, jnp.bfloat16(1.0))
    sync(o)
    dt = (time.time() - t0) / iters
    out["hbm_gbps"]["copy2x"] = round(2.0 * nelem * 2 / dt / 1e9, 1)

    @jax.jit
    def reduce(x, seed):
        # abs() blocks the sum(x + c) = sum(x) + n*c hoist
        def body(c, i):
            s = jnp.sum(jnp.abs(x + c + i.astype(jnp.bfloat16) * 1e-4)
                        .astype(jnp.float32))
            return (s * 1e-9).astype(jnp.bfloat16), ()
        c, _ = lax.scan(body, seed, jnp.arange(iters))
        return c

    sync(reduce(x, jnp.bfloat16(0.0)).reshape(1))
    t0 = time.time()
    o = reduce(x, jnp.bfloat16(1.0))
    sync(o.reshape(1))
    dt = (time.time() - t0) / iters
    out["hbm_gbps"]["reduce_read"] = round(nelem * 2 / dt / 1e9, 1)
    print(f"[roofline] hbm: {out['hbm_gbps']}", file=sys.stderr, flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ROOFLINE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": "roofline_bf16_matmul_peak_tflops",
                      "value": out["matmul_tflops"]["peak"],
                      "unit": "TFLOP/s", "vs_baseline": 0.0,
                      **{k: v for k, v in out.items() if k != "device"}}))


def bench_train(args, dtype, key, log) -> None:
    """Stage-3 denoiser pretraining step (BASELINE config 5): frozen-VAE
    encode + DDPM noising + UNet fwd/bwd + AdamW update, bf16 compute /
    f32 params, on-device batch."""
    from hifidiff_tpu.diffusion import DiffusionSchedule
    from hifidiff_tpu.models import Denoiser
    from hifidiff_tpu.train.optim import adamw_cosine
    from hifidiff_tpu.train.steps import TrainState, make_denoiser_train_step
    from hifidiff_tpu.vae import AutoencoderKL

    denoiser = Denoiser(dtype=dtype, remat=bool(args.remat))
    vae = AutoencoderKL(dtype=dtype)
    schedule = DiffusionSchedule.create()

    t0 = time.time()
    dn_params = jax.jit(lambda k: denoiser.init(
        k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,))))(key)["params"]
    vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 128, 128, 3)))["params"]
    jax.block_until_ready((dn_params, vae_params))
    log(f"init done in {time.time() - t0:.1f}s")

    state = TrainState.create(
        dn_params, adamw_cosine(total_steps=1000, warmup_steps=0))
    images = jax.random.uniform(key, (args.batch, 128, 128, 3))

    if args.cache_latents:
        from hifidiff_tpu.train.steps import make_denoiser_train_step_cached

        moments = jax.jit(lambda vp, imgs: vae.apply(
            {"params": vp}, jnp.clip(imgs, 0.0, 1.0) * 2.0 - 1.0,
            method=vae.moments))(vae_params, images)
        jax.block_until_ready(moments)
        batch = {"mean": moments[0], "logvar": moments[1]}
        cached = jax.jit(make_denoiser_train_step_cached(denoiser, schedule),
                         donate_argnums=0)
        step = lambda st, vp, b, k: cached(st, b, k)  # noqa: E731
        metric = "train_images_per_sec_denoiser_pretrain_128px_cached"
    else:
        batch = images
        step = jax.jit(make_denoiser_train_step(denoiser, vae, schedule),
                       donate_argnums=0)
        metric = "train_images_per_sec_denoiser_pretrain_128px"

    import numpy as _np

    t0 = time.time()
    state, m = step(state, vae_params, batch, key)
    _np.asarray(m["loss"])  # d2h sync (see `sync` in main)
    log(f"warmup (incl. compile) done in {time.time() - t0:.1f}s")

    t0 = time.time()
    for i in range(args.iters):
        state, m = step(state, vae_params, batch,
                        jax.random.fold_in(key, i))
    _np.asarray(m["loss"])  # d2h sync
    dt = time.time() - t0
    imgs_per_sec = args.batch * args.iters / dt
    log(f"{args.iters} iters x batch {args.batch} in {dt:.3f}s, "
        f"loss={float(m['loss']):.4f}")
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": 0.0,
    }))


def bench_host(args, log) -> None:
    """Host input-pipeline throughput (VERDICT r1 item 9): can the Loader +
    C++ data core feed the train step? Synthetic in-memory source images
    (so no disk/codec variance from a missing dataset), then the REAL
    per-sample work: the full blind-degradation branch (blur -> U(1,8)
    downsample -> noise -> JPEG -> resize, `data/degradations.py`) + 8-bit
    quantize for --host-mode blind, or bicubic resize only for hq
    (stage-3's MultiPIEHQ/CelebAHQ path). Prints sustained images/sec —
    compare against the device step rate (bench --workload train)."""
    import numpy as np

    from hifidiff_tpu.data import Loader, native
    from hifidiff_tpu.data.core import Dataset
    from hifidiff_tpu.data.degradations import blind_degrade, quantize_8bit

    log(f"native C++ core available: {native.available()}")

    class SyntheticHost(Dataset):
        def __init__(self, n, size=128, mode="blind"):
            self.n, self.size, self.mode = n, size, mode
            # one shared source image per 16 indices (cheap to generate,
            # defeats any caching because rng/degradation params differ)
            rng = np.random.default_rng(0)
            self.src = rng.uniform(0, 1, (16, 192, 192, 3)).astype(
                np.float32)

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            rng = np.random.default_rng((1, i))
            img = self.src[i % 16]
            if self.mode == "blind":
                lr = blind_degrade(rng, img, self.size)
                lr = quantize_8bit(
                    native.resize(lr, (self.size, self.size))
                    if native.available() else lr)
                gt = native.resize(img, (self.size, self.size)) \
                    if native.available() else img[:self.size, :self.size]
            else:
                small = native.resize(img, (32, 32)) if native.available() \
                    else img[:32, :32]
                lr = native.resize(small, (self.size, self.size)) \
                    if native.available() else img[:self.size, :self.size]
                gt = lr
            return {"lr": lr, "gt": gt}

    n = args.iters * args.batch
    ds = SyntheticHost(n, mode=args.host_mode)
    loader = Loader(ds, args.batch, shuffle=False,
                    num_threads=args.threads)
    # warm one batch (thread spin-up)
    next(iter(Loader(ds, args.batch, shuffle=False,
                     num_threads=args.threads)))
    t0 = time.time()
    count = 0
    for batch in loader:
        count += batch["lr"].shape[0]
    dt = time.time() - t0
    print(json.dumps({
        "metric": f"host_pipeline_images_per_sec_{args.host_mode}",
        "value": round(count / dt, 3),
        "unit": "images/sec",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
