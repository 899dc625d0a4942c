"""Serving-under-load benchmark (VERDICT r3 #9): drive the real HTTP
server (`cli/serve.py`) with concurrent clients and commit the measured
latency/throughput/fill table as SERVE_BENCH.json.

bench.py --latency measures the bare sampler call; this script measures
what a CLIENT sees through the full stack — HTTP parse, queueing, the
dynamic batcher's bucket selection (--buckets 1,4 + the batch-16 knee),
padding, and the device launch — at several concurrency levels:

  * c=1  : single sequential client (the batch-1 bucket path)
  * c=4  : small-burst load (typically packs into the 4-bucket)
  * c=16 : exactly the compiled serving batch
  * c=32 : 2x oversubscription (queueing + back-to-back launches)

Usage (random weights — serving performance, not output quality):
  python scripts/serve_bench.py                       # exact DDIM-50
  python scripts/serve_bench.py --steps 10            # turbo profile
  python scripts/serve_bench.py --requests 24 --out SERVE_BENCH.json
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def client_worker(host, port, size, n_requests, latencies, errors, seed):
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, (size, size, 3), np.uint8).tobytes()
    conn = http.client.HTTPConnection(host, port, timeout=120)
    for _ in range(n_requests):
        t0 = time.time()
        try:
            conn.request("POST", "/infer", body,
                         {"Content-Type": "application/octet-stream"})
            resp = conn.getresponse()
            payload = resp.read()
            if resp.status != 200 or len(payload) != len(body):
                errors.append(f"status={resp.status} len={len(payload)}")
                continue
        except Exception as e:  # noqa: BLE001
            errors.append(str(e))
            conn = http.client.HTTPConnection(host, port, timeout=120)
            continue
        latencies.append(time.time() - t0)


def healthz(host, port):
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/healthz")
    return json.loads(conn.getresponse().read())


def run_phase(host, port, size, concurrency, n_requests):
    latencies: list = []
    errors: list = []
    before = healthz(host, port)
    threads = [threading.Thread(
        target=client_worker,
        args=(host, port, size, n_requests, latencies, errors, 1000 + i))
        for i in range(concurrency)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    if errors:
        print(f"[serve_bench] c={concurrency} error detail: "
              f"{errors[:4]}", flush=True)
    after = healthz(host, port)
    lat_ms = sorted(x * 1e3 for x in latencies)
    launches = after["batches"] - before["batches"]
    served = after["served"] - before["served"]
    return {
        "concurrency": concurrency,
        "requests": len(lat_ms),
        "errors": len(errors),
        "p50_ms": round(lat_ms[len(lat_ms) // 2], 1) if lat_ms else None,
        "p95_ms": (round(lat_ms[min(len(lat_ms) - 1,
                                    int(len(lat_ms) * 0.95))], 1)
                   if lat_ms else None),
        "throughput_faces_per_sec": round(len(lat_ms) / wall, 1),
        "launches": launches,
        "mean_fill": round(served / launches, 2) if launches else None,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", default="ddim")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--buckets", default="1,4")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--requests", type=int, default=16,
                   help="requests per client per phase")
    p.add_argument("--concurrencies", default="1,4,16,32")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from hifidiff_tpu.cli import serve

    cfg = serve.Config(port=0, batch=args.batch, buckets=args.buckets,
                       num_inference_steps=args.steps, sampler=args.sampler,
                       size=args.size)
    print("[serve_bench] building + warming server (compiles one program "
          "set per bucket)...", flush=True)
    t0 = time.time()
    httpd, batcher = serve.create_server(cfg)
    host, port = httpd.server_address
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    warm_s = time.time() - t0
    print(f"[serve_bench] up on :{port} in {warm_s:.0f}s", flush=True)

    phases = []
    try:
        for c in (int(x) for x in args.concurrencies.split(",")):
            # a throwaway request re-warms any cold bucket path
            run_phase(host, port, args.size, 1, 1)
            ph = run_phase(host, port, args.size, c, args.requests)
            phases.append(ph)
            print(f"[serve_bench] c={c}: p50 {ph['p50_ms']} ms, "
                  f"p95 {ph['p95_ms']} ms, "
                  f"{ph['throughput_faces_per_sec']} faces/s, "
                  f"fill {ph['mean_fill']}, errors {ph['errors']}",
                  flush=True)
    finally:
        httpd.shutdown()
        batcher.stop()

    result = {
        "description": (
            "Measured through the real HTTP server (cli/serve.py) with "
            "concurrent clients on one TPU chip via the axon tunnel: "
            "request-to-response latency incl. HTTP + dynamic batching + "
            "bucket padding + device launch. Random weights (serving "
            "performance, not output quality)."),
        "config": {"steps": args.steps, "sampler": args.sampler,
                   "batch": args.batch, "buckets": args.buckets,
                   "size": args.size, "requests_per_client": args.requests,
                   "warmup_s": round(warm_s, 1)},
        "phases": phases,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[serve_bench] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
