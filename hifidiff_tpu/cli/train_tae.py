"""Tiny-autoencoder distillation CLI (beyond-reference fast decode/encode).

Distills the frozen SD VAE (the reference's only autoencoder,
`pretrain_denoiser.py:256-259`, `train_refiner.py:368-375`) into the
~1M-param tiny encoder/decoder pair (`vae/tiny.py`, TAESD-style): the
tiny decoder replaces the pipeline's single most expensive stage
(VAE decode = 135 ms of the 429 ms exact wall at batch 128, already AT
the measured compute envelope — docs/PERF.md) with a ~22x-fewer-FLOPs
network. Quality bounds on the trained convergence stack are committed
as TAE_QUALITY.json (`scripts/tae_quality.py`).

    python -m hifidiff_tpu.cli.train_tae --vae-ckpt checkpoints/vae/... \
        --multipie-root ... --celeba-root ...
    python -m hifidiff_tpu.cli.train_tae --procedural 64 --size 32 \
        --vae-blocks 32,32 --vae-layers 1 --vae-ckpt runs/convergence/ckpt/vae/convdemo

Checkpoints are orbax dirs with params {"enc": ..., "dec": ...},
consumed by `test_refiner --tae-ckpt` and `serve --tae-ckpt`
(`bench.py --tiny-ae decode|both` measures the speed side with random
tiny weights — same shapes, same program).
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
from hifidiff_tpu.train.distill import make_tae_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    save_image_grid,
    side_by_side,
)
from hifidiff_tpu.vae import AutoencoderKL, tiny_autoencoder_pair


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    multipie_root: str = ""
    celeba_root: str = ""
    num_epochs: int = 100
    batch_size: int = 64
    lr: float = 3e-4
    warmup_steps: int = 200
    gt_weight: float = 0.3   # weight of the direct-recon term vs teacher
    extra_latents: str = ""  # .npz with "z" (N,h,w,4) UNSCALED latents
    # harvested from the diffusion sampler (scripts/tae_quality.py dumps
    # them): adds an on-policy decoder term so the tiny decoder covers
    # the latents the sampler actually produces, not just GT posteriors
    size: int = 128
    # frozen teacher (architecture + orbax/torch checkpoint)
    vae_blocks: str = "128,256,512,512"
    vae_layers: int = 2
    vae_ckpt: str = ""
    ema_decay: float = 0.0
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_model_epoch: int = 10
    save_image_epoch: int = 10
    out_dir: str = "output/tae"
    ckpt_dir: str = "checkpoints/tae"
    use_wandb: bool = False
    resume: bool = False
    platform: str = ""   # e.g. "cpu": force the backend before any device
    # touch (tiny-stack runs are CPU-scale; the harness pins JAX_PLATFORMS
    # so only jax.config.update can override it)


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Tiny-autoencoder distillation")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    maybe_initialize()
    key = jax.random.PRNGKey(cfg.seed)

    from hifidiff_tpu.cli.common import (
        load_vae_params,
        parse_ints,
        smoke_datasets,
    )

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

    vae_blocks = parse_ints(cfg.vae_blocks)
    scale = 2 ** (len(vae_blocks) - 1)
    vae = AutoencoderKL(block_out=vae_blocks, layers_per_block=cfg.vae_layers)
    vae_params = load_vae_params(vae, cfg.vae_ckpt, key, cfg.size)
    tiny_enc, tiny_dec = tiny_autoencoder_pair(scale)
    latent = cfg.size // scale
    params = {
        "enc": jax.jit(tiny_enc.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"],
        "dec": jax.jit(tiny_dec.init)(
            key, jnp.zeros((1, latent, latent, 4)))["params"],
    }

    total_steps = len(train_loader) * cfg.num_epochs
    tx = adamw_cosine(cfg.lr, cfg.warmup_steps, total_steps)
    state = TrainState.create(params, tx, ema_decay=cfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    vae_params = replicate_global(vae_params, mesh)
    train_step = jax.jit(
        make_tae_train_step(vae, tiny_enc, tiny_dec,
                            gt_weight=cfg.gt_weight), donate_argnums=0)

    extra_z = None
    if cfg.extra_latents:
        extra_z = np.load(cfg.extra_latents)["z"].astype(np.float32)
        rng = np.random.default_rng(cfg.seed + process_index())
        print(f"on-policy latents: {extra_z.shape} from {cfg.extra_latents}")

    @jax.jit
    def recon_step(params, images):
        """Tiny end-to-end recon (enc -> dec) + PSNR vs the input and
        PSNR of the tiny decoder vs the teacher decoder on the same
        (posterior-mean) latent."""
        x01 = jnp.clip(images, 0.0, 1.0)
        x = x01 * 2.0 - 1.0
        z = tiny_enc.apply({"params": params["enc"]}, x)
        rec = tiny_dec.apply({"params": params["dec"]}, z)
        rec01 = jnp.clip(rec * 0.5 + 0.5, 0.0, 1.0)
        mse = jnp.mean(jnp.square(rec01 - x01))
        z_teacher = vae.apply({"params": vae_params}, x, sample=False,
                              method=vae.encode)
        t_img = vae.apply({"params": vae_params}, z_teacher,
                          method=vae.decode)
        s_img = tiny_dec.apply({"params": params["dec"]}, z_teacher)
        dec_mse = jnp.mean(jnp.square(jnp.clip(s_img * 0.5 + 0.5, 0, 1)
                                      - jnp.clip(t_img * 0.5 + 0.5, 0, 1)))
        to_db = lambda m: -10.0 * jnp.log10(jnp.maximum(m, 1e-12))  # noqa: E731
        return rec01, to_db(mse), to_db(dec_mse)

    logger = MetricsLogger(cfg.log_dir, "hifi_tae", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in train_loader:
            if extra_z is not None:
                # per-process draw; shard_batch assembles the global batch
                batch = dict(batch, extra_z=extra_z[
                    rng.integers(0, len(extra_z),
                                 size=batch["image"].shape[0])])
            sharded = shard_batch(batch, mesh)
            state, metrics = train_step(state, vae_params, sharded,
                                        jax.random.fold_in(key, step))
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "dec_loss": metrics["dec_loss"],
                        "enc_loss": metrics["enc_loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        psnrs, dec_psnrs = [], []
        for i, batch in enumerate(val_loader):
            images = shard_batch(batch, mesh)["image"]
            rec, p, dp = recon_step(state.eval_params, images)
            psnrs.append(float(p))
            dec_psnrs.append(float(dp))
            if (i == 0 and is_main_process()
                    and epoch % cfg.save_image_epoch == 0):
                save_image_grid(
                    side_by_side(local_shard(images), local_shard(rec)),
                    os.path.join(cfg.out_dir, cfg.name, f"val_e{epoch}.png"))
        logger.log({"val_psnr": float(np.mean(psnrs)),
                    "val_dec_vs_teacher_psnr": float(np.mean(dec_psnrs))},
                   step)

        if epoch % cfg.save_model_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
