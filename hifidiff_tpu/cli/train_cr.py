"""Stage-1 CR training CLI (reference `train_cr.py`).

Defaults mirror the reference flags (`train_cr.py:15-48`): 24 epochs,
Adam lr 5e-4, batch 8, cr_loss = MSE + key-region MSE, `[lr|pred|gt]` image
dumps every `dump_every` batches, checkpoint every 5 epochs. Runs data-
parallel over all visible devices.

    python -m hifidiff_tpu.cli.train_cr --dataroot /data/multipie --synthetic 0
    python -m hifidiff_tpu.cli.train_cr --synthetic 64   # smoke on random data
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEDataset
from hifidiff_tpu.models import CoarseRestoration
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
from hifidiff_tpu.train.optim import adam
from hifidiff_tpu.train.steps import (
    TrainState,
    make_cr_eval_step,
    make_cr_train_step,
)
from hifidiff_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    save_image_grid,
    side_by_side,
)


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    dataroot: str = ""
    model_type: str = "uni"
    num_epochs: int = 24
    batch_size: int = 8
    lr: float = 5e-4
    size: int = 128
    width: int = 32
    enc_depths: str = "2,2,4,8"
    mid_depth: int = 8
    # loss: "cr" = MSE + key-region (reference default, `train_cr.py:178`);
    # "composite" = the reference's optional CRLoss (`loss.py:8-67`):
    # smooth-L1 + key-region smooth-L1 + SSIM + (optional) VGG terms
    loss: str = "cr"
    lambda_pix: float = 1.0
    lambda_ssim: float = 0.0
    lambda_vgg: float = 0.0
    vgg19_ckpt: str = ""   # torchvision vgg19 state_dict for the VGG term
    seed: int = 0
    synthetic: int = 0          # >0: use N synthetic samples (smoke mode)
    procedural: int = 0         # >0: N learnable procedural faces (demo)
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_epoch: int = 5
    dump_every: int = 100
    out_dir: str = "output/cr"
    ckpt_dir: str = "checkpoints/cr"
    use_wandb: bool = False
    resume: bool = False


def build_datasets(cfg: Config):
    from hifidiff_tpu.cli.common import smoke_datasets

    smoke = smoke_datasets(cfg, ("lr", "gt", "patches"))
    if smoke is not None:
        return smoke
    train = MultiPIEDataset(cfg.dataroot, split="train",
                            model_type=cfg.model_type, size=cfg.size,
                            use_blind=True, use_patch=True, seed=cfg.seed)
    val = MultiPIEDataset(cfg.dataroot, split="test",
                          model_type=cfg.model_type, size=cfg.size,
                          use_blind=False, use_patch=True, seed=cfg.seed)
    return train, val


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Stage-1 CR training")
    maybe_initialize()  # multi-process jax.distributed (Accelerate equivalent)
    key = jax.random.PRNGKey(cfg.seed)
    train_ds, val_ds = build_datasets(cfg)
    train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                          seed=cfg.seed, shard_index=process_index(),
                          num_shards=process_count())
    # val is sharded too: in a multi-process run each process evaluates a
    # disjoint slice (otherwise every process would feed its FULL val batch
    # into shard_batch as a "local shard", duplicating work P times);
    # process-0 logs its shard's mean — an unbiased estimate of the
    # global metric
    val_loader = Loader(val_ds, cfg.batch_size, shuffle=False,
                        shard_index=process_index(),
                        num_shards=process_count())

    from hifidiff_tpu.cli.common import parse_ints

    enc_nums = parse_ints(cfg.enc_depths)
    model = CoarseRestoration(width=cfg.width, resolution=cfg.size,
                              enc_nums=enc_nums, mid_num=cfg.mid_depth,
                              dec_nums=(2,) * len(enc_nums))
    params = jax.jit(model.init)(
        key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]
    state = TrainState.create(params, adam(cfg.lr))

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        restored = ckpt.restore(template=state)
        state = restored["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    loss_fn = None
    if cfg.loss == "composite":
        import functools

        from hifidiff_tpu.train.losses import composite_cr_loss

        vgg_fn = None
        if cfg.lambda_vgg > 0 and cfg.vgg19_ckpt:
            from hifidiff_tpu.eval.vgg import (
                make_vgg_features_fn,
                vgg19_params_from_torch,
            )
            from hifidiff_tpu.utils.torch_import import load_torch_file

            vgg_fn = make_vgg_features_fn(
                vgg19_params_from_torch(load_torch_file(cfg.vgg19_ckpt)))
        loss_fn = functools.partial(
            composite_cr_loss, lambda_pix=cfg.lambda_pix,
            lambda_ssim=cfg.lambda_ssim, lambda_vgg=cfg.lambda_vgg,
            vgg_features_fn=vgg_fn)

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    train_step = jax.jit(make_cr_train_step(model, loss_fn),
                         donate_argnums=0)
    eval_step = jax.jit(make_cr_eval_step(model))

    logger = MetricsLogger(cfg.log_dir, "hifi_cr", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        for i, batch in enumerate(train_loader):
            batch = shard_batch(batch, mesh)
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(key, step))
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            if cfg.dump_every and i % cfg.dump_every == 0:
                # eval_step runs on EVERY process: `batch` is a global
                # sharded array, so the jitted program must be entered by
                # all processes (process 0 alone would deadlock the rest
                # at the collective). Only the file write is gated.
                pred, _ = eval_step(state.params, batch)
                if is_main_process():
                    save_image_grid(
                        side_by_side(local_shard(batch["lr"]),
                                     local_shard(pred),
                                     local_shard(batch["gt"])),
                        os.path.join(cfg.out_dir, cfg.name,
                                     f"train_e{epoch}_b{i}.png"))
            step += 1

        val_losses = []
        for i, batch in enumerate(val_loader):
            batch = shard_batch(batch, mesh)
            pred, m = eval_step(state.params, batch)
            val_losses.append(float(m["loss"]))
            if cfg.dump_every and i % cfg.dump_every == 0 \
                    and is_main_process():
                save_image_grid(
                    side_by_side(local_shard(batch["lr"]), local_shard(pred),
                                 local_shard(batch["gt"])),
                    os.path.join(cfg.out_dir, cfg.name,
                                 f"val_e{epoch}_b{i}.png"))
        logger.log({"val_loss": float(np.mean(val_losses))}, step)

        if epoch % cfg.save_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
