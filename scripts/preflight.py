"""Pre-snapshot checklist (VERDICT r3 #7): run this before every
end-of-round commit. It replicates the three artifacts the driver records
so a regression is caught IN the round instead of in the verdict:

  1. the bench — invoked EXACTLY as the driver does (BENCH_r*.json `cmd`),
     under the driver's 600 s timeout, and the emitted JSON line must
     parse and carry a value >= --bench-floor (default 250 faces/s: below
     the r2 number of record means the measurement path regressed even
     if it technically emitted),
  2. the smoke test tier,
  3. `__graft_entry__.dryrun_multichip(8)` on the virtual CPU mesh
     (MULTICHIP_r*.json) in a fresh process (backend choice must happen
     before any jax init),
  4. `__graft_entry__.entry()` single-chip abstract compile check
     (eval_shape only — no TPU needed).

Usage:
  python scripts/preflight.py            # all checks
  python scripts/preflight.py --skip-bench   # when the TPU is busy
Exits non-zero if any check fails. Round 3's empty BENCH_r03.json
(rc=124) is exactly the failure class this exists to catch.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_check(name: str, argv, timeout: float):
    t0 = time.time()
    try:
        proc = subprocess.run(argv, cwd=REPO, capture_output=True,
                              text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"[preflight] {name}: TIMEOUT after {timeout:.0f}s -> FAIL",
              flush=True)
        return None
    print(f"[preflight] {name}: rc={proc.returncode} "
          f"in {time.time() - t0:.0f}s", flush=True)
    return proc


def check_bench(floor: float) -> bool:
    # the driver's exact invocation and timeout
    proc = run_check(
        "bench (driver cmd, 600s budget)",
        ["sh", "-c", "if [ -f bench.py ]; then python bench.py; "
                     "else exit 0; fi"],
        timeout=600)
    if proc is None or proc.returncode != 0:
        if proc is not None:
            print(proc.stderr[-2000:], file=sys.stderr)
        return False
    parsed = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                pass
    if not parsed:
        print("[preflight] bench: no parseable JSON line -> FAIL")
        return False
    print(f"[preflight] bench: {parsed['metric']} = {parsed['value']} "
          f"{parsed['unit']}")
    if parsed["value"] < floor:
        print(f"[preflight] bench: value {parsed['value']} < floor {floor} "
              "-> FAIL (throughput regressed vs the number of record)")
        return False
    return True


def check_smoke() -> bool:
    proc = run_check(
        "pytest smoke tier",
        [sys.executable, "-m", "pytest", "tests/", "-m", "smoke", "-q",
         "--no-header", "-x"],
        timeout=600)
    if proc is None or proc.returncode != 0:
        if proc is not None:
            print(proc.stdout[-2000:], file=sys.stderr)
        return False
    return True


def check_multichip() -> bool:
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('dryrun ok')")
    proc = run_check("dryrun_multichip(8) on virtual CPU mesh",
                     [sys.executable, "-c", code], timeout=900)
    if proc is None or proc.returncode != 0 or "dryrun ok" not in proc.stdout:
        if proc is not None:
            print(proc.stdout[-1500:], proc.stderr[-1500:], file=sys.stderr)
        return False
    return True


def check_entry() -> bool:
    # abstract compile check on CPU: entry()'s fn must trace and lower
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.eval_shape(fn, *args)\n"
        "print('entry ok', jax.tree_util.tree_map(lambda s: s.shape, out))\n"
    )
    proc = run_check("entry() abstract compile check (CPU)",
                     [sys.executable, "-c", code], timeout=600)
    if proc is None or proc.returncode != 0 or "entry ok" not in proc.stdout:
        if proc is not None:
            print(proc.stdout[-1500:], proc.stderr[-1500:], file=sys.stderr)
        return False
    return True


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--skip-bench", action="store_true")
    p.add_argument("--skip-smoke", action="store_true")
    p.add_argument("--bench-floor", type=float, default=280.0,
                   help="minimum acceptable faces/s (r4 number of record "
                        "296.6 minus tunnel-drift margin — a regression "
                        "to r2 levels must FAIL the gate, VERDICT r4 #9)")
    args = p.parse_args()

    checks = []
    if not args.skip_bench:
        checks.append(("bench", check_bench(args.bench_floor)))
    if not args.skip_smoke:
        checks.append(("smoke", check_smoke()))
    checks.append(("entry", check_entry()))
    checks.append(("multichip", check_multichip()))

    failed = [n for n, ok in checks if not ok]
    if failed:
        print(f"[preflight] FAIL: {failed}")
        raise SystemExit(1)
    print(f"[preflight] all {len(checks)} checks passed")


if __name__ == "__main__":
    main()
