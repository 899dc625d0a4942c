"""Tiny-denoiser quality on the TRAINED convergence stack.

Trains the width-distilled FacialRefiner student
(`cli/train_tiny_dn.py`, `train/distill.py:make_tiny_dn_train_step`)
against the convergence demo's trained stage-4 refiner, then measures
END-TO-END sampler quality (pyiqa-convention PSNR/SSIM vs ground truth,
`cli/test_refiner.py`) with the student swapped in at the ordinary
`--width`/`--refiner-ckpt` seam — at the exact DDIM-50 configuration,
and composed with the tiny AE + tiny CR + few-step samplers (the turbo
serving configs, TURBO_BENCH.json). Writes TINY_DN_QUALITY.json at the
repo root — the quality bound behind `bench.py --tiny-dn`.

    python scripts/tiny_dn_quality.py \
        --ckpt-root runs/convergence_l/ckpt --name convdemo-l \
        --procedural 192 --tae-ckpt runs/tae_quality_l/ckpt/convdemo-l \
        --tiny-cr-ckpt runs/tiny_cr_quality/ckpt/convdemo-l
    python scripts/tiny_dn_quality.py --platform cpu   # no-TPU fallback

Requires `runs/convergence*/ckpt/*` (python -m
hifidiff_tpu.cli.convergence_demo); the composed rows additionally need
the tiny AE from `scripts/tae_quality.py` and the tiny CR from
`scripts/tiny_cr_quality.py`. Reference anchor: the reference's
denoiser always runs at full width (`models/denoiser.py`,
`test_refiner.py:85-91`) — this is a beyond-reference sanctioned
approximation like --steps/--tiny-ae/--tiny-cr.
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
    vae_blocks: str = "32,32"  # demo VAE widths; len L => factor 2^(L-1)
    epochs: int = 160
    lr: float = 3e-4
    rollout_steps: int = 10
    fwd_weight: float = 0.5
    # student arch for the size-32 stack: teacher is width 32 / enc 1,1 /
    # mid 1 — the student halves the width (4x fewer conv FLOPs), the
    # same ratio as the 128px serving student (width 64 vs 128,
    # bench.py --tiny-dn 64)
    tiny_width: int = 16
    tae_ckpt: str = "runs/tae_quality/ckpt/convdemo"     # "" = skip composed
    tiny_cr_ckpt: str = ""                               # "" = skip that row
    tiny_cr_width: int = 32
    tiny_cr_blocks: int = 2
    tiny_dn_ckpt_dir: str = "runs/tiny_dn_quality/ckpt"
    out: str = os.path.join(REPO, "TINY_DN_QUALITY.json")
    train: bool = True          # False = reuse an existing tiny-DN ckpt
    platform: str = ""


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Tiny-DN quality (trained stack)")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)

    from hifidiff_tpu.cli import test_refiner, train_tiny_dn

    ck = lambda s: os.path.join(cfg.ckpt_root, s, cfg.name)  # noqa: E731
    tiny_ckpt = os.path.join(cfg.tiny_dn_ckpt_dir, cfg.name)
    data = ["--proc-id-spread", str(cfg.proc_id_spread),
            "--proc-light-jitter", str(cfg.proc_light_jitter),
            "--procedural", str(cfg.procedural), "--size", str(cfg.size),
            "--batch-size", str(cfg.batch_size), "--seed", str(cfg.seed)]
    teacher = ["--width", "32", "--enc-depths", "1,1", "--mid-depth", "1",
               "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
               "--cr-width", "32", "--cr-enc-depths", "1,1",
               "--cr-mid-depth", "1", "--vae-blocks", cfg.vae_blocks,
               "--vae-layers", "1"]

    if cfg.train:
        # fresh run: orbax refuses to overwrite an existing step number,
        # so a rerun landing on the same final step would silently keep
        # the OLD weights
        import shutil
        shutil.rmtree(tiny_ckpt, ignore_errors=True)
        train_tiny_dn.main(data + teacher + [
            "--tiny-width", str(cfg.tiny_width),
            "--rollout-steps", str(cfg.rollout_steps),
            "--fwd-weight", str(cfg.fwd_weight),
            "--num-epochs", str(cfg.epochs), "--lr", str(cfg.lr),
            "--refiner-ckpt", ck("refiner"), "--cr-ckpt", ck("cr"),
            "--vae-ckpt", ck("vae"), "--name", cfg.name,
            "--ckpt-dir", cfg.tiny_dn_ckpt_dir,
            "--log-dir", "runs/tiny_dn_quality/logs",
            "--save-model-epoch", "40"])

    eval_base = data + teacher + [
        "--cr-ckpt", ck("cr"), "--vae-ckpt", ck("vae"),
        "--grid-every", "0", "--out-dir", "runs/tiny_dn_quality/eval"]
    exact_r = ["--refiner-ckpt", ck("refiner")]
    tiny_r = ["--refiner-ckpt", tiny_ckpt,
              "--width", str(cfg.tiny_width)]  # overrides teacher's width
    tae = (["--tae-ckpt", cfg.tae_ckpt, "--tae-mode", "both"]
           if cfg.tae_ckpt else None)
    tcr = (["--tiny-cr-ckpt", cfg.tiny_cr_ckpt,
            "--tiny-cr-width", str(cfg.tiny_cr_width),
            "--tiny-cr-blocks", str(cfg.tiny_cr_blocks)]
           if cfg.tiny_cr_ckpt else None)

    def run(flags):
        # --width appears twice when tiny_r is used; argparse keeps the
        # LAST occurrence, so append student flags after the teacher's
        return test_refiner.main(eval_base + flags)

    results = {"trained": True, "size": cfg.size, "epochs": cfg.epochs,
               "tiny_width": cfg.tiny_width,
               "rollout_steps": cfg.rollout_steps, "modes": {}}
    # isolation: the student alone at the exact DDIM-50 configuration
    row = {"exact": run(exact_r + ["--num-inference-steps", "50"]),
           "tiny_dn": run(tiny_r + ["--num-inference-steps", "50"])}
    results["modes"]["50"] = row
    print(f"[tiny_dn_quality] ddim@50: exact {row['exact']['psnr']:.2f} dB"
          f" | tiny-dn {row['tiny_dn']['psnr']:.2f}", flush=True)

    # composition: the turbo serving configs (TURBO_BENCH.json rows)
    if tae:
        for sampler, steps in (("dpmpp", 10), ("ddim", 10)):
            flags = ["--sampler", sampler,
                     "--num-inference-steps", str(steps)]
            row = {"tae_both": run(exact_r + tae + flags),
                   "tae_tiny_dn": run(tiny_r + tae + flags)}
            if tcr:
                row["tae_tiny_cr_tiny_dn"] = run(tiny_r + tae + tcr + flags)
            results["modes"][f"{sampler}{steps}"] = row
            msg = (f"[tiny_dn_quality] {sampler}@{steps}: "
                   f"tae {row['tae_both']['psnr']:.2f} dB | "
                   f"tae+tiny-dn {row['tae_tiny_dn']['psnr']:.2f}")
            if tcr:
                msg += (" | +tiny-cr "
                        f"{row['tae_tiny_cr_tiny_dn']['psnr']:.2f}")
            print(msg, flush=True)

    with open(cfg.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
