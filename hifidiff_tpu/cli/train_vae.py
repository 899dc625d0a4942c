"""Stage-0 VAE training CLI (beyond-reference utility).

The PyTorch reference freezes an externally pretrained SD-2.1 VAE
(`pretrain_denoiser.py:256-259`, `train_refiner.py:330-333`) and never
provides a way to fit one. This CLI closes that gap so the full pipeline
is trainable self-contained — on custom domains, or in the end-to-end
convergence demo (`cli/convergence_demo.py`) where no SD weights exist.
Recon (MSE) + beta*KL objective, AdamW + cosine, data-parallel over all
devices; checkpoints are orbax dirs consumed directly by every stage's
`--vae-ckpt` (cli/common.py:load_vae_params).

    python -m hifidiff_tpu.cli.train_vae --multipie-root ... --celeba-root ...
    python -m hifidiff_tpu.cli.train_vae --procedural 64 --size 32 \
        --vae-blocks 32,32 --vae-layers 1    # tiny demo fit
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
from hifidiff_tpu.parallel import (
    is_main_process,
    local_shard,
    make_mesh,
    maybe_initialize,
    process_count,
    process_index,
    replicate_global,
    shard_batch,
)
from hifidiff_tpu.train.checkpoint import CheckpointManager
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState, make_vae_train_step
from hifidiff_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    save_image_grid,
    side_by_side,
)
from hifidiff_tpu.vae import AutoencoderKL


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    multipie_root: str = ""
    celeba_root: str = ""
    num_epochs: int = 100
    batch_size: int = 64
    lr: float = 1e-4
    warmup_steps: int = 500
    accum_steps: int = 1
    beta_kl: float = 1e-6   # SD-style tiny KL weight
    size: int = 128
    vae_blocks: str = "128,256,512,512"
    vae_layers: int = 2
    ema_decay: float = 0.0
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_model_epoch: int = 10
    save_image_epoch: int = 1
    out_dir: str = "output/vae"
    ckpt_dir: str = "checkpoints/vae"
    use_wandb: bool = False
    resume: bool = False


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Stage-0 VAE training")
    maybe_initialize()
    key = jax.random.PRNGKey(cfg.seed)

    from hifidiff_tpu.cli.common import parse_ints, smoke_datasets

    smoke = smoke_datasets(cfg, ("image",))
    if smoke is not None:
        train_ds, val_ds = smoke
    else:
        parts = []
        if cfg.multipie_root:
            parts.append(MultiPIEHQDataset(cfg.multipie_root, size=cfg.size))
        if cfg.celeba_root:
            parts.append(CelebAHQDataset(cfg.celeba_root, size=cfg.size))
        assert parts, "need --multipie-root and/or --celeba-root"
        train_ds = val_ds = ConcatDataset(parts)
    train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                          seed=cfg.seed, shard_index=process_index(),
                          num_shards=process_count())
    val_loader = Loader(val_ds, cfg.batch_size, shuffle=False,
                        shard_index=process_index(),
                        num_shards=process_count())

    vae = AutoencoderKL(block_out=parse_ints(cfg.vae_blocks),
                        layers_per_block=cfg.vae_layers)
    params = jax.jit(vae.init)(key,
                               jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]

    total_steps = len(train_loader) * cfg.num_epochs
    tx = adamw_cosine(cfg.lr, cfg.warmup_steps, total_steps,
                      accumulate_steps=cfg.accum_steps)
    state = TrainState.create(params, tx, ema_decay=cfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    train_step = jax.jit(make_vae_train_step(vae, beta_kl=cfg.beta_kl),
                         donate_argnums=0)

    @jax.jit
    def recon_step(params, images):
        """Deterministic (posterior-mean) reconstruction + PSNR in the
        [0,1] image domain."""
        x = jnp.clip(images, 0.0, 1.0) * 2.0 - 1.0
        z = vae.apply({"params": params}, x, method=vae.encode, sample=False)
        rec = vae.apply({"params": params}, z, method=vae.decode)
        rec01 = jnp.clip(rec * 0.5 + 0.5, 0.0, 1.0)
        mse = jnp.mean(jnp.square(rec01 - jnp.clip(images, 0.0, 1.0)))
        return rec01, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    logger = MetricsLogger(cfg.log_dir, "hifi_vae", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in train_loader:
            images = shard_batch(batch, mesh)["image"]
            state, metrics = train_step(state, {"image": images},
                                        jax.random.fold_in(key, step))
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "rec_loss": metrics["rec"], "kl": metrics["kl"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        # val: posterior-mean recon PSNR over the sharded val set
        psnrs = []
        for i, batch in enumerate(val_loader):
            images = shard_batch(batch, mesh)["image"]
            rec, p = recon_step(state.eval_params, images)
            psnrs.append(float(p))
            if (i == 0 and is_main_process()
                    and epoch % cfg.save_image_epoch == 0):
                save_image_grid(
                    side_by_side(local_shard(images), local_shard(rec)),
                    os.path.join(cfg.out_dir, cfg.name, f"val_e{epoch}.png"))
        logger.log({"val_psnr": float(np.mean(psnrs))}, step)

        if epoch % cfg.save_model_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
