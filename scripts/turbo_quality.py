"""Composed-turbo quality: distilled few-step student + tiny autoencoder.

Evaluates the fastest sanctioned composition of the beyond-reference
accelerations on the TRAINED convergence stack — the progressively
distilled few-step refiner (`scripts/distill_quality.py` students) with
the on-policy-distilled tiny autoencoder (`scripts/tae_quality.py`)
swapped in for the SD-VAE seams — next to the exact DDIM-50 teacher and
the naive same-step teacher, via the real eval CLI (pyiqa-convention
PSNR/SSIM, `cli/test_refiner.py`). Writes TURBO_QUALITY.json.

    python scripts/turbo_quality.py               # TPU
    python scripts/turbo_quality.py --platform cpu

Requires the prior artifacts' checkpoints in runs/: convergence
(`cli/convergence_demo.py`), distilled students
(`scripts/distill_quality.py`), tiny AE (`scripts/tae_quality.py`).
Reference anchor: the reference's only fast-sampling knob is DDIM step
reduction (`test_refiner.py:85-91`); everything composed here is
beyond-reference machinery with measured bounds.
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
    ckpt_root: str = "runs/convergence/ckpt"
    name: str = "convdemo"
    size: int = 32
    procedural: int = 64
    proc_id_spread: float = 1.0   # match the stack's training family
    proc_light_jitter: float = 0.0  # (hard tier: 0.6 / 0.25)
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    batch_size: int = 8
    seed: int = 0
    # (student_steps, ckpt subdir) pairs produced by distill_quality.py
    students: str = "10:round0_s10,5:round1_s5"
    student_root: str = "runs/distill_quality/convdemo"
    tae_ckpt: str = "runs/tae_quality/ckpt/convdemo"
    out: str = os.path.join(REPO, "TURBO_QUALITY.json")
    platform: str = ""


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Composed-turbo quality")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)

    from hifidiff_tpu.cli import test_refiner

    ck = lambda s: os.path.join(cfg.ckpt_root, s, cfg.name)  # noqa: E731
    base = ["--proc-id-spread", str(cfg.proc_id_spread),
            "--proc-light-jitter", str(cfg.proc_light_jitter),
            "--procedural", str(cfg.procedural), "--size", str(cfg.size),
            "--batch-size", str(cfg.batch_size), "--seed", str(cfg.seed),
            "--vae-blocks", "32,32", "--vae-layers", "1",
            "--width", "32", "--enc-depths", "1,1", "--mid-depth", "1",
            "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
            "--cr-width", "32", "--cr-enc-depths", "1,1",
            "--cr-mid-depth", "1", "--cr-ckpt", ck("cr"),
            "--vae-ckpt", ck("vae"), "--grid-every", "0",
            "--out-dir", "runs/turbo_quality/eval"]
    tae = ["--tae-ckpt", cfg.tae_ckpt, "--tae-mode", "both"]
    teacher = ["--refiner-ckpt", ck("refiner")]

    results = {"size": cfg.size, "modes": {}}
    results["modes"]["exact50"] = test_refiner.main(
        base + teacher + ["--num-inference-steps", "50"])
    for pair in cfg.students.split(","):
        steps, sub = pair.split(":")
        student = ["--refiner-ckpt",
                   os.path.join(cfg.student_root, sub)]
        srow = {
            "naive_teacher": test_refiner.main(
                base + teacher + ["--num-inference-steps", steps]),
            "distilled": test_refiner.main(
                base + student + ["--num-inference-steps", steps]),
            "distilled_tae": test_refiner.main(
                base + student + tae + ["--num-inference-steps", steps]),
        }
        results["modes"][f"steps{steps}"] = srow
        print(f"[turbo_quality] steps={steps}: "
              f"naive {srow['naive_teacher']['psnr']:.2f} dB | "
              f"distilled {srow['distilled']['psnr']:.2f} | "
              f"distilled+tae {srow['distilled_tae']['psnr']:.2f} "
              f"(exact50 {results['modes']['exact50']['psnr']:.2f})",
              flush=True)

    with open(cfg.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
