"""Tiny-CR quality on the TRAINED convergence stack.

Trains the TinyCR student (`models/tiny_cr.py`) against the convergence
demo's trained Coarse Restoration net (`cli/train_tiny_cr.py` on the
same procedural data), then measures the END-TO-END sampler quality
(pyiqa-convention PSNR/SSIM vs ground truth, `cli/test_refiner.py`)
with the tiny CR swapped in — alone against exact DDIM-50, and composed
with the tiny autoencoder + few-step samplers (the turbo serving
configs, TURBO_BENCH.json). Writes TINY_CR_QUALITY.json at the repo
root — the quality bound behind `bench.py --tiny-cr` and
`serve --tiny-cr-ckpt`.

    python scripts/tiny_cr_quality.py \
        --ckpt-root runs/convergence_l/ckpt --name convdemo-l \
        --procedural 192 --tae-ckpt runs/tae_quality_l/ckpt/convdemo-l
    python scripts/tiny_cr_quality.py --platform cpu   # no-TPU fallback

Requires `runs/convergence*/ckpt/*` (python -m
hifidiff_tpu.cli.convergence_demo) and, for the composed rows, the tiny
AE from `scripts/tae_quality.py`. Reference anchor: the reference's CR
is always the full network (`models/cr/model.py:33-88`,
`test_refiner.py:77-83`) — this is a beyond-reference sanctioned
approximation like --steps/--tiny-ae.
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
    epochs: int = 240
    lr: float = 3e-4
    # student arch for the size-32 stack (the 128px serving student uses
    # the models/tiny_cr.py defaults — bench.py --tiny-cr measures it)
    tiny_width: int = 32
    tiny_blocks: int = 2
    tae_ckpt: str = "runs/tae_quality/ckpt/convdemo"   # "" = skip composed
    tiny_cr_ckpt_dir: str = "runs/tiny_cr_quality/ckpt"
    out: str = os.path.join(REPO, "TINY_CR_QUALITY.json")
    train: bool = True         # False = reuse an existing tiny-CR ckpt
    platform: str = ""


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Tiny-CR quality (trained stack)")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)

    from hifidiff_tpu.cli import test_refiner, train_tiny_cr

    ck = lambda s: os.path.join(cfg.ckpt_root, s, cfg.name)  # noqa: E731
    tiny_ckpt = os.path.join(cfg.tiny_cr_ckpt_dir, cfg.name)
    common = ["--proc-id-spread", str(cfg.proc_id_spread),
              "--proc-light-jitter", str(cfg.proc_light_jitter),
              "--procedural", str(cfg.procedural), "--size", str(cfg.size),
              "--batch-size", str(cfg.batch_size), "--seed", str(cfg.seed),
              "--cr-width", "32", "--cr-enc-depths", "1,1",
              "--cr-mid-depth", "1"]
    student = ["--tiny-width", str(cfg.tiny_width),
               "--tiny-blocks", str(cfg.tiny_blocks)]

    if cfg.train:
        # fresh run: orbax refuses to overwrite an existing step number,
        # so a rerun that lands on the same final step would silently
        # keep the OLD weights
        import shutil
        shutil.rmtree(tiny_ckpt, ignore_errors=True)
        train_tiny_cr.main(common + student + [
            "--num-epochs", str(cfg.epochs), "--lr", str(cfg.lr),
            "--cr-ckpt", ck("cr"), "--name", cfg.name,
            "--ckpt-dir", cfg.tiny_cr_ckpt_dir,
            "--out-dir", "runs/tiny_cr_quality/img",
            "--log-dir", "runs/tiny_cr_quality/logs",
            "--save-model-epoch", "80"])

    eval_base = common + [
        "--vae-blocks", cfg.vae_blocks, "--vae-layers", "1",
        "--width", "32", "--enc-depths", "1,1", "--mid-depth", "1",
        "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
        "--refiner-ckpt", ck("refiner"), "--cr-ckpt", ck("cr"),
        "--vae-ckpt", ck("vae"), "--grid-every", "0",
        "--out-dir", "runs/tiny_cr_quality/eval"]
    tiny = ["--tiny-cr-ckpt", tiny_ckpt,
            "--tiny-cr-width", str(cfg.tiny_width),
            "--tiny-cr-blocks", str(cfg.tiny_blocks)]
    tae = (["--tae-ckpt", cfg.tae_ckpt, "--tae-mode", "both"]
           if cfg.tae_ckpt else None)

    results = {"trained": True, "size": cfg.size, "epochs": cfg.epochs,
               "tiny_width": cfg.tiny_width, "tiny_blocks": cfg.tiny_blocks,
               "modes": {}}
    # isolation: the CR swap alone against the exact DDIM-50 teacher
    row = {"exact": test_refiner.main(
               eval_base + ["--num-inference-steps", "50"]),
           "tiny_cr": test_refiner.main(
               eval_base + tiny + ["--num-inference-steps", "50"])}
    results["modes"]["50"] = row
    print(f"[tiny_cr_quality] ddim@50: exact {row['exact']['psnr']:.2f} dB"
          f" | tiny-cr {row['tiny_cr']['psnr']:.2f}", flush=True)

    # composition: the turbo serving configs (TURBO_BENCH.json rows)
    if tae:
        for sampler, steps in (("dpmpp", 10), ("ddim", 10)):
            flags = ["--sampler", sampler, "--num-inference-steps",
                     str(steps)]
            row = {"tae_both": test_refiner.main(eval_base + tae + flags),
                   "tae_tiny_cr": test_refiner.main(
                       eval_base + tae + tiny + flags)}
            results["modes"][f"{sampler}{steps}"] = row
            print(f"[tiny_cr_quality] {sampler}@{steps}: "
                  f"tae {row['tae_both']['psnr']:.2f} dB | "
                  f"tae+tiny-cr {row['tae_tiny_cr']['psnr']:.2f}",
                  flush=True)

    with open(cfg.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
