"""Tiny-autoencoder quality on the TRAINED convergence stack.

Trains the TAESD-style tiny autoencoder (`vae/tiny.py`) against the
convergence demo's trained VAE (`cli/train_tae.py` on the same
procedural data), then measures the END-TO-END sampler quality
(pyiqa-convention PSNR/SSIM vs ground truth, `cli/test_refiner.py`)
with the tiny decoder / tiny encoder+decoder swapped in, next to the
exact SD-VAE path. Writes TAE_QUALITY.json at the repo root — the
quality bound behind `bench.py --tiny-ae` and `serve --tae-ckpt`.

    python scripts/tae_quality.py                 # trained stack (TPU)
    python scripts/tae_quality.py --platform cpu  # no-TPU fallback

Requires `runs/convergence/ckpt/*` (python -m
hifidiff_tpu.cli.convergence_demo). Reference anchor: the reference has
one autoencoder — the frozen diffusers AutoencoderKL
(`pretrain_denoiser.py:256-259`) — and no fast variant; this is a
beyond-reference sanctioned approximation like --steps/--cache-interval.
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
    tae_epochs: int = 120
    tae_lr: float = 3e-4
    steps: str = "50,10,5"     # sampler step counts to evaluate
    dpmpp_steps: str = "10,5"  # DPM-Solver++ step counts (exact AE +
    # tae_both per count) — on the trained stack dpmpp@10 + TAE recovers
    # most of the step-reduction cost (r3: -0.75 dB vs exact DDIM-50
    # where ddim@10 + TAE costs -1.96 on the same eval draw)
    tae_ckpt_dir: str = "runs/tae_quality/ckpt"
    out: str = os.path.join(REPO, "TAE_QUALITY.json")
    train: bool = True         # False = reuse an existing tae ckpt
    vae_blocks: str = "32,32"  # demo VAE widths; len L => factor 2^(L-1)
    # ("32,32,32,32" for the 128px reference-geometry tier)
    on_policy: bool = True     # harvest sampler latents (train split) and
    # add the on-policy decoder term (train_tae --extra-latents): without
    # it the tiny decoder only sees GT posteriors and loses >3 dB on the
    # sampler's out-of-manifold latents (r3 diagnosis, train/distill.py)
    platform: str = ""


def dump_sampler_latents(eval_flags, steps_list, out_npz: str) -> None:
    """Run the exact sampler over the procedural TRAIN split at every
    step count the artifact will evaluate, and save the final (UNSCALED)
    latents — the on-policy training set for the tiny decoder. Each step
    count visits a distinct final-latent distribution on this stack
    (latents harvested at 50 steps alone left the 10/5-step modes
    ~1.8 dB under exact; harvesting all three closed it). Eval uses the
    val split, so no leakage."""
    import jax.numpy as jnp
    import numpy as np

    from hifidiff_tpu.cli import test_refiner as tr
    from hifidiff_tpu.cli.common import (load_refiner_stack, parse_config,
                                         smoke_datasets)
    from hifidiff_tpu.data import Loader
    from hifidiff_tpu.pipeline import (RefinerPipelineConfig,
                                       build_refiner_sampler_split)
    from hifidiff_tpu.vae.model import SD_VAE_SCALING

    ecfg = parse_config(tr.Config, eval_flags, "latent dump")
    key = jax.random.PRNGKey(ecfg.seed)
    cr, vae, refiner, schedule, sample_vars, latent = \
        load_refiner_stack(ecfg, key)
    train_ds = smoke_datasets(ecfg, ("lr", "gt"))[0]
    rvars = {"params": sample_vars["refiner"]["params"],
             "batch_stats": sample_vars["refiner"].get("batch_stats", {})}
    zs = []
    for steps in steps_list:
        sampler = build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            RefinerPipelineConfig(
                num_inference_steps=steps,
                latent_size=latent, clip_sample=True,
                clip_sample_range=ecfg.clip_sample_range))
        for i, batch in enumerate(Loader(train_ds, ecfg.batch_size,
                                         shuffle=False)):
            lats, priors, id_emb = sampler.stages["prep"](
                sample_vars["cr"], sample_vars["vae"], rvars,
                jnp.asarray(batch["lr"]), jax.random.fold_in(key, i))
            final = sampler.stages["scan"](rvars, lats, priors, id_emb)
            zs.append(np.asarray(final, np.float32) / SD_VAE_SCALING)
    z = np.concatenate(zs, axis=0)
    os.makedirs(os.path.dirname(out_npz), exist_ok=True)
    np.savez(out_npz, z=z)
    print(f"[tae_quality] on-policy latents {z.shape} "
          f"(steps {steps_list}, std {z.std():.2f}) -> {out_npz}",
          flush=True)


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Tiny-AE quality (trained stack)")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)

    from hifidiff_tpu.cli import test_refiner, train_tae
    from hifidiff_tpu.cli.common import parse_ints

    ck = lambda s: os.path.join(cfg.ckpt_root, s, cfg.name)  # noqa: E731
    tae_ckpt = os.path.join(cfg.tae_ckpt_dir, cfg.name)
    common = ["--proc-id-spread", str(cfg.proc_id_spread),
              "--proc-light-jitter", str(cfg.proc_light_jitter),
              "--procedural", str(cfg.procedural), "--size", str(cfg.size),
              "--batch-size", str(cfg.batch_size), "--seed", str(cfg.seed),
              "--vae-blocks", cfg.vae_blocks, "--vae-layers", "1"]

    eval_flags = common + [
        "--width", "32", "--enc-depths", "1,1", "--mid-depth", "1",
        "--dec-depths", "1,1", "--idc-stages", "1,1,1,1",
        "--cr-width", "32", "--cr-enc-depths", "1,1", "--cr-mid-depth", "1",
        "--refiner-ckpt", ck("refiner"), "--cr-ckpt", ck("cr"),
        "--vae-ckpt", ck("vae"), "--grid-every", "0",
        "--out-dir", "runs/tae_quality/eval"]

    if cfg.train:
        # fresh run: orbax refuses to overwrite an existing step number,
        # so a rerun that lands on the same final step would silently
        # keep the OLD weights (cost one confusing bit-identical rerun)
        import shutil
        shutil.rmtree(tae_ckpt, ignore_errors=True)
        train_flags = common + [
            "--num-epochs", str(cfg.tae_epochs), "--lr", str(cfg.tae_lr),
            "--vae-ckpt", ck("vae"), "--name", cfg.name,
            "--ckpt-dir", cfg.tae_ckpt_dir,
            "--out-dir", "runs/tae_quality/img",
            "--log-dir", "runs/tae_quality/logs",
            "--save-model-epoch", "40"]
        if cfg.on_policy:
            npz = os.path.join("runs", "tae_quality", "sampler_latents.npz")
            dump_sampler_latents(eval_flags, list(parse_ints(cfg.steps)),
                                 npz)
            train_flags += ["--extra-latents", npz]
        train_tae.main(train_flags)

    results = {"trained": True, "size": cfg.size,
               "on_policy": cfg.on_policy, "tae_epochs": cfg.tae_epochs,
               "modes": {}}
    for steps in parse_ints(cfg.steps):
        row = {}
        row["exact"] = test_refiner.main(
            eval_flags + ["--num-inference-steps", str(steps)])
        row["tae_decode"] = test_refiner.main(
            eval_flags + ["--num-inference-steps", str(steps),
                          "--tae-ckpt", tae_ckpt, "--tae-mode", "decode"])
        row["tae_both"] = test_refiner.main(
            eval_flags + ["--num-inference-steps", str(steps),
                          "--tae-ckpt", tae_ckpt, "--tae-mode", "both"])
        results["modes"][str(steps)] = row
        print(f"[tae_quality] steps={steps}: "
              f"exact {row['exact']['psnr']:.2f} dB | "
              f"tiny-dec {row['tae_decode']['psnr']:.2f} | "
              f"tiny-both {row['tae_both']['psnr']:.2f}", flush=True)

    results["dpmpp"] = {}
    for steps in parse_ints(cfg.dpmpp_steps):
        flags = ["--sampler", "dpmpp", "--num-inference-steps", str(steps)]
        row = {"exact": test_refiner.main(eval_flags + flags),
               "tae_both": test_refiner.main(
                   eval_flags + flags
                   + ["--tae-ckpt", tae_ckpt, "--tae-mode", "both"])}
        results["dpmpp"][str(steps)] = row
        print(f"[tae_quality] dpmpp@{steps}: "
              f"exact {row['exact']['psnr']:.2f} dB | "
              f"tiny-both {row['tae_both']['psnr']:.2f}", flush=True)

    with open(cfg.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
