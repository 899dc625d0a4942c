"""Progressive-distillation quality on the TRAINED convergence stack.

Runs `cli/distill.py` (arXiv:2202.00512-style progressive distillation,
`train/distill.py`) against the convergence-demo checkpoints
(`runs/convergence/ckpt/*`, produced by
`python -m hifidiff_tpu.cli.convergence_demo`) and records, per round,
the distilled few-step student next to the naive baseline (teacher
weights simply run at the student's step count — the ONLY fast-sampling
option the reference has, DDIM step reduction `test_refiner.py:85-91`):

  * vs-exact PSNR: sampler output vs the exact DDIM-50 teacher output
    (trajectory drift — directly comparable to CACHE_QUALITY.json),
  * gt-PSNR: pyiqa-convention PSNR vs ground truth (same column as the
    README quality table).

Writes one JSON object to DISTILL_QUALITY.json at the repo root.

    python scripts/distill_quality.py                   # trained stack, TPU
    python scripts/distill_quality.py --platform cpu    # no-TPU fallback

The stage takes a few minutes on one v5e chip (two rounds x 2000 tiny
train steps); the artifact is the measured evidence cited by
train/distill.py's module doc (distilled vs naive same-step teacher on
the trained demo stack).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from hifidiff_tpu.cli.common import parse_config  # noqa: E402


@dataclasses.dataclass
class Config:
    # convergence-demo architecture (cli/convergence_demo.py) + checkpoints
    ckpt_root: str = "runs/convergence/ckpt"
    name: str = "convdemo"
    size: int = 32
    procedural: int = 64
    proc_id_spread: float = 1.0   # match the stack's training family
    proc_light_jitter: float = 0.0  # (hard tier: 0.6 / 0.25)
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    batch_size: int = 16
    eval_batch: int = 16
    seed: int = 0
    teacher_steps: int = 50
    student_steps: str = "10,5"   # chained rounds (50->10 k=5, 10->5 k=2)
    steps_per_round: int = 2000
    stratified: bool = False   # per-batch even step coverage (variance fix)
    lr: float = 1e-5
    out: str = os.path.join(REPO, "DISTILL_QUALITY.json")
    platform: str = ""            # "" = default backend (TPU); "cpu" works


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Distillation quality (trained stack)")
    if cfg.platform:
        # must land before the first backend touch (the harness pins
        # JAX_PLATFORMS; only jax.config.update can override it)
        jax.config.update("jax_platforms", cfg.platform)

    from hifidiff_tpu.cli import distill

    ck = lambda s: os.path.join(cfg.ckpt_root, s, cfg.name)  # noqa: E731
    results = distill.main([
        "--proc-id-spread", str(cfg.proc_id_spread),
        "--proc-light-jitter", str(cfg.proc_light_jitter),
        "--procedural", str(cfg.procedural), "--size", str(cfg.size),
        "--batch-size", str(cfg.batch_size),
        "--eval-batch", str(cfg.eval_batch), "--seed", str(cfg.seed),
        # the convergence-demo tiny-but-real architecture
        "--width", "32", "--enc-depths", "1,1", "--mid-depth", "1",
        "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
        "--cr-width", "32", "--cr-enc-depths", "1,1", "--cr-mid-depth", "1",
        "--vae-blocks", "32,32", "--vae-layers", "1",
        "--refiner-ckpt", ck("refiner"), "--cr-ckpt", ck("cr"),
        "--vae-ckpt", ck("vae"),
        "--teacher-steps", str(cfg.teacher_steps),
        "--student-steps", cfg.student_steps,
        "--steps-per-round", str(cfg.steps_per_round),
        "--stratified", str(int(cfg.stratified)),
        "--lr", str(cfg.lr),
        "--ckpt-dir", os.path.join("runs", "distill_quality"),
        "--name", cfg.name,
    ])
    results["trained"] = bool(cfg.ckpt_root)
    results["size"] = cfg.size
    results["steps_per_round"] = cfg.steps_per_round
    results["stratified"] = cfg.stratified
    results["lr"] = cfg.lr
    with open(cfg.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
