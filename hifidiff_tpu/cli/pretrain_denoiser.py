"""Stage-3 unconditional latent-DDPM pretraining CLI
(reference `pretrain_denoiser.py`).

Defaults mirror the reference (`pretrain_denoiser.py:20-46,261-280`):
batch 512, AdamW 1e-4 + cosine schedule with 500 warmup steps, DDPM 1000
scaled_linear epsilon-prediction, frozen SD-2.1 VAE (pass --vae-ckpt with a
diffusers safetensors file), per-epoch DDIM-50 sample grid, seed 0.
Data-parallel over all devices; gradient accumulation via --accum-steps.

    python -m hifidiff_tpu.cli.pretrain_denoiser --multipie-root ... \
        --celeba-root ... --vae-ckpt vae/diffusion_pytorch_model.safetensors
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import (
    CelebAHQDataset,
    ConcatDataset,
    Loader,
    MultiPIEHQDataset,
)
from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.models import Denoiser
from hifidiff_tpu.parallel import (
    is_main_process,
    make_mesh,
    maybe_initialize,
    process_count,
    process_index,
    replicate_global,
)
from hifidiff_tpu.pipeline import build_unconditional_sampler
from hifidiff_tpu.train.checkpoint import CheckpointManager
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState, make_denoiser_train_step
from hifidiff_tpu.utils.logging import MetricsLogger, StepTimer, save_image_grid
from hifidiff_tpu.vae import AutoencoderKL


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    multipie_root: str = ""
    celeba_root: str = ""
    vae_ckpt: str = ""
    num_epochs: int = 100
    batch_size: int = 512
    lr: float = 1e-4
    warmup_steps: int = 500
    accum_steps: int = 1
    size: int = 128
    sample_size: int = 8
    # model-size knobs (defaults = reference architecture)
    width: int = 128
    enc_depths: str = "2,2,4,8"
    mid_depth: int = 8
    dec_depths: str = "2,2,2,2"
    vae_blocks: str = "128,256,512,512"
    vae_layers: int = 2
    remat: bool = False   # jax.checkpoint the UNet blocks (saves HBM)
    cache_latents: bool = False  # pre-encode the dataset's VAE posterior
    # moments ONCE (the VAE is frozen and the HQ datasets are
    # augmentation-free, so per-step sampling from cached moments matches
    # per-step encoding exactly — same PRNG draw, bit-identical latent —
    # `train/steps.py:make_denoiser_train_step_cached`) and drop the
    # frozen encoder from every train step
    ema_decay: float = 0.0  # >0 keeps an EMA of the params (e.g. 0.9999)
    # for sampling/eval — standard diffusion practice the reference omits
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_model_epoch: int = 10
    save_image_epoch: int = 1
    out_dir: str = "output/denoiser"
    ckpt_dir: str = "checkpoints/denoiser"
    use_wandb: bool = False
    resume: bool = False


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Stage-3 denoiser pretraining")
    maybe_initialize()  # multi-process: jax.distributed (Accelerate equiv)
    key = jax.random.PRNGKey(cfg.seed)

    from hifidiff_tpu.cli.common import smoke_datasets

    smoke = smoke_datasets(cfg, ("image",))
    if smoke is not None:
        train_ds = smoke[0]
    else:
        parts = []
        if cfg.multipie_root:
            parts.append(MultiPIEHQDataset(cfg.multipie_root, size=cfg.size))
        if cfg.celeba_root:
            parts.append(CelebAHQDataset(cfg.celeba_root, size=cfg.size))
        assert parts, "need --multipie-root and/or --celeba-root"
        train_ds = ConcatDataset(parts)
    # per-process shard of the global shuffle; batch_size is per-process
    train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                          seed=cfg.seed, shard_index=process_index(),
                          num_shards=process_count())

    from hifidiff_tpu.cli.common import parse_ints

    vae_blocks = parse_ints(cfg.vae_blocks)
    latent = cfg.size // (2 ** (len(vae_blocks) - 1))
    denoiser = Denoiser(width=cfg.width, enc_nums=parse_ints(cfg.enc_depths),
                        mid_num=cfg.mid_depth,
                        dec_nums=parse_ints(cfg.dec_depths),
                        remat=cfg.remat)
    vae = AutoencoderKL(block_out=vae_blocks, layers_per_block=cfg.vae_layers)
    schedule = DiffusionSchedule.create()

    dn_params = jax.jit(lambda k: denoiser.init(
        k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,))))(key)["params"]
    from hifidiff_tpu.cli.common import load_vae_params

    vae_params = load_vae_params(vae, cfg.vae_ckpt, key, cfg.size)

    if cfg.cache_latents:
        # One pass of the frozen encoder over the local dataset; training
        # then samples latents from the cached (mean, logvar) — exact
        # (see make_denoiser_train_step_cached). Every process caches the
        # full dataset: the global shuffle reshuffles per epoch, so shard
        # membership is not stable across epochs.
        from hifidiff_tpu.data import ArrayDataset

        moments_fn = jax.jit(lambda vp, imgs: vae.apply(
            {"params": vp},
            jnp.clip(imgs, 0.0, 1.0) * 2.0 - 1.0, method=vae.moments))
        enc_loader = Loader(train_ds, cfg.batch_size, shuffle=False,
                            num_threads=2)
        means, logvars = [], []
        for b in enc_loader:
            m, lv = jax.device_get(moments_fn(vae_params, b["image"]))
            means.append(np.asarray(m))
            logvars.append(np.asarray(lv))
        train_ds = ArrayDataset({"mean": np.concatenate(means),
                                 "logvar": np.concatenate(logvars)})
        train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                              seed=cfg.seed, shard_index=process_index(),
                              num_shards=process_count())
        print(f"cached VAE moments for {len(train_ds)} images")

    total_steps = len(train_loader) * cfg.num_epochs
    tx = adamw_cosine(cfg.lr, cfg.warmup_steps, total_steps,
                      accumulate_steps=cfg.accum_steps)
    state = TrainState.create(dn_params, tx,
                              ema_decay=cfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    vae_params = replicate_global(vae_params, mesh)
    if cfg.cache_latents:
        from hifidiff_tpu.train.steps import make_denoiser_train_step_cached

        cached_step = jax.jit(
            make_denoiser_train_step_cached(denoiser, schedule),
            donate_argnums=0)
        train_step = lambda st, vp, batch, k: cached_step(st, batch, k)  # noqa: E731
    else:
        train_step = jax.jit(
            make_denoiser_train_step(denoiser, vae, schedule),
            donate_argnums=0)
    sampler = jax.jit(build_unconditional_sampler(
        denoiser, vae, schedule, latent_size=latent,
        batch=cfg.sample_size))

    logger = MetricsLogger(cfg.log_dir, "hifi_denoiser", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    from hifidiff_tpu.parallel import device_prefetch

    for epoch in range(start_epoch, cfg.num_epochs):
        losses = []
        batch_iter = (iter(train_loader) if cfg.cache_latents
                      else (b["image"] for b in train_loader))
        for batch in device_prefetch(batch_iter, mesh):
            state, metrics = train_step(state, vae_params, batch,
                                        jax.random.fold_in(key, step))
            timer.tick()
            losses.append(float(metrics["loss"]))
            logger.log({"train_loss": metrics["loss"],
                        "avg_train_loss": float(np.mean(losses)),
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        if epoch % cfg.save_model_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():  # state is replicated; process-0 writes
                ckpt.save(step, jax.device_get(state), wait=True)
        if epoch % cfg.save_image_epoch == 0 or epoch == cfg.num_epochs - 1:
            grid = sampler(state.eval_params, vae_params,
                           jax.random.fold_in(key, 10_000 + epoch))
            if is_main_process():
                save_image_grid(np.asarray(grid),
                                os.path.join(cfg.out_dir, cfg.name,
                                             f"{epoch}.png"))
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
