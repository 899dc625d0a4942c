"""Full-pipeline eval CLI (reference `test_refiner.py`).

DDIM-50 sampling with the reference's eval scheduler config (clip_sample
with range 3.0, `test_refiner.py:166-171`), per-sample min-max
normalization of prediction AND ground truth before metrics (`:113-119`),
PSNR/SSIM always (+ LPIPS/NIQE when model files are provided), image grids
every `grid_every` batches. Note: the reference's `:89` drops `.sample` on
the model output — a latent-space bug we do not reproduce.

    python -m hifidiff_tpu.cli.test_refiner --refiner-ckpt ... --cr-ckpt ... \
        --vae-ckpt ... --dataroot /data/kface
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import KFaceDataset, Loader
from hifidiff_tpu.eval.metrics import reference_eval_metrics
from hifidiff_tpu.pipeline import (
    RefinerPipelineConfig,
    build_refiner_sampler_split,
)
from hifidiff_tpu.utils.logging import save_image_grid, side_by_side


@dataclasses.dataclass
class Config:
    dataroot: str = ""
    refiner_ckpt: str = ""
    cr_ckpt: str = ""
    vae_ckpt: str = ""
    batch_size: int = 4
    size: int = 128
    num_inference_steps: int = 50
    sampler: str = "ddim"      # or "dpmpp" (DPM-Solver++ 2M; see README
    # for measured quality-vs-steps on the trained demo stack)
    clip_sample_range: float = 3.0
    # model-size knobs (defaults = reference architecture)
    width: int = 128
    enc_depths: str = "2,2,4,8"
    mid_depth: int = 8
    dec_depths: str = "2,2,2,2"
    idc_stages: str = "3,4,6,3"
    cr_width: int = 32
    cr_enc_depths: str = "2,2,4,8"
    cr_mid_depth: int = 8
    vae_blocks: str = "128,256,512,512"
    vae_layers: int = 2
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    grid_every: int = 10
    out_dir: str = "output/test_refiner"
    niqe_model: str = ""        # .npz with mu/cov from eval.niqe.fit_niqe_model
    vgg16_ckpt: str = ""        # torchvision vgg16 state_dict (for LPIPS)
    lpips_ckpt: str = ""        # lpips linear-head state_dict (for LPIPS)
    tae_ckpt: str = ""          # orbax dir from cli/train_tae.py: swap the
    # SD-VAE seams for the distilled tiny autoencoder (vae/tiny.py)
    tae_mode: str = "both"      # "decode" = tiny decoder only; "both" also
    # replaces the CR-latent encode (deterministic posterior mean)
    tiny_cr_ckpt: str = ""      # orbax dir from cli/train_tiny_cr.py: swap
    # the exact CR for the distilled TinyCR student (models/tiny_cr.py)
    tiny_cr_width: int = 64     # student arch (must match the ckpt)
    tiny_cr_blocks: int = 4
    tiny_cr_down: int = 2


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Full-pipeline eval")
    key = jax.random.PRNGKey(cfg.seed)
    from hifidiff_tpu.cli.common import load_refiner_stack

    cr, vae, refiner, schedule, sample_vars, latent = \
        load_refiner_stack(cfg, key)

    tiny_enc = tiny_dec = None
    if cfg.tae_ckpt:
        from hifidiff_tpu.train.checkpoint import restore_state
        from hifidiff_tpu.vae import tiny_autoencoder_pair

        te, td = tiny_autoencoder_pair(cfg.size // latent)
        tae_params = restore_state(cfg.tae_ckpt)["state"]["params"]
        tiny_dec = td
        sample_vars["tiny_dec"] = tae_params["dec"]
        if cfg.tae_mode == "both":
            tiny_enc = te
            sample_vars["tiny_enc"] = tae_params["enc"]
        print(f"tiny autoencoder ({cfg.tae_mode}) from {cfg.tae_ckpt}")

    tiny_cr = None
    if cfg.tiny_cr_ckpt:
        from hifidiff_tpu.models import TinyCR
        from hifidiff_tpu.train.checkpoint import restore_state

        tiny_cr = TinyCR(width=cfg.tiny_cr_width, blocks=cfg.tiny_cr_blocks,
                         down_factor=cfg.tiny_cr_down)
        sample_vars["tiny_cr"] = \
            restore_state(cfg.tiny_cr_ckpt)["state"]["params"]
        print(f"tiny CR from {cfg.tiny_cr_ckpt}")

    sampler = build_refiner_sampler_split(
        refiner, cr, vae, schedule,
        RefinerPipelineConfig(
            num_inference_steps=cfg.num_inference_steps,
            latent_size=latent, sampler=cfg.sampler,
            clip_sample=True, clip_sample_range=cfg.clip_sample_range),
        tiny_enc=tiny_enc, tiny_dec=tiny_dec, tiny_cr=tiny_cr)

    from hifidiff_tpu.cli.common import smoke_datasets

    smoke = smoke_datasets(cfg, ("lr", "gt", "patches"))
    if smoke is not None:
        ds = smoke[1]  # the held-out split, matching train-CLI val data
    else:
        ds = KFaceDataset(cfg.dataroot, split="val", size=cfg.size)
    loader = Loader(ds, cfg.batch_size, shuffle=False)

    niqe_fn = None
    if cfg.niqe_model and os.path.exists(cfg.niqe_model):
        from hifidiff_tpu.eval.niqe import niqe

        m = np.load(cfg.niqe_model)
        niqe_fn = lambda im: niqe(im, m["mu"], m["cov"])  # noqa: E731

    lpips_fn = None
    if cfg.vgg16_ckpt and cfg.lpips_ckpt:
        from hifidiff_tpu.eval.lpips import load_lpips_params, lpips_distance
        from hifidiff_tpu.utils.torch_import import load_torch_file

        vgg_p, lins = load_lpips_params(load_torch_file(cfg.vgg16_ckpt),
                                        load_torch_file(cfg.lpips_ckpt))
        lpips_fn = jax.jit(lambda a, b: lpips_distance(vgg_p, lins, a, b))

    # shard eval batches over all local devices (VERDICT r2 item 6): an
    # 8-chip run evaluates 8x faster; params replicated, batch on "data"
    from hifidiff_tpu.parallel import make_mesh, replicated, shard_batch

    mesh = make_mesh()
    sample_vars = jax.device_put(sample_vars, replicated(mesh))

    psnrs, ssims, niqes, lpipss = [], [], [], []
    for i, batch in enumerate(loader):
        batch = shard_batch(batch, mesh)
        pred = sampler(sample_vars, batch["lr"],
                       jax.random.fold_in(key, i))
        # reference conventions, end to end (`test_refiner.py:107-131`),
        # via the shared jitted helper (one dispatch per batch)
        m, pred_n, gt_n = reference_eval_metrics(pred, batch["gt"])
        psnrs.append(float(m["psnr"]))
        ssims.append(float(m["ssim"]))
        if lpips_fn is not None:
            lpipss.append(float(jnp.mean(lpips_fn(pred_n, gt_n))))
        if niqe_fn is not None:
            niqes.extend(niqe_fn(np.asarray(p)) for p in pred_n)
        if cfg.grid_every and i % cfg.grid_every == 0:
            save_image_grid(
                side_by_side(np.asarray(batch["lr"]), np.asarray(pred),
                             np.asarray(batch["gt"])),
                os.path.join(cfg.out_dir, f"batch_{i}.png"))
        print(f"({i + 1}/{len(loader)}) psnr={psnrs[-1]:.3f} "
              f"ssim={ssims[-1]:.4f}", flush=True)

    print(f"PSNR: {np.mean(psnrs):.4f}")
    print(f"SSIM: {np.mean(ssims):.4f}")
    if lpipss:
        print(f"LPIPS: {np.mean(lpipss):.4f}")
    if niqes:
        print(f"NIQE: {np.mean(niqes):.4f}")
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
    if lpipss:
        out["lpips"] = float(np.mean(lpipss))
    if niqes:
        out["niqe"] = float(np.mean(niqes))
    return out


if __name__ == "__main__":
    main()
