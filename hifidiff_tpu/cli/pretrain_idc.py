"""Stage-2 IDC pretraining CLI (reference `pretrain_idc.py`).

Defaults mirror the reference constants (`pretrain_idc.py:80-83`): Adam
lr 5e-4, batch 24, 24 epochs; anchor = IDC(CR(lr)) with a frozen stage-1 CR,
positive = IDC(frontal GT), negative = IDC(other person); triplet margin
loss. The reference logs last-batch val loss (`:74`) — we log the mean.

    python -m hifidiff_tpu.cli.pretrain_idc --cr-ckpt checkpoints/cr/... \
        --dataroot /data/multipie
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEIDCDataset
from hifidiff_tpu.models import CoarseRestoration, IDCEncoder
from hifidiff_tpu.parallel import (
    is_main_process,
    make_mesh,
    maybe_initialize,
    process_count,
    process_index,
    replicate_global,
    shard_batch,
)
from hifidiff_tpu.train.checkpoint import CheckpointManager, restore_state
from hifidiff_tpu.train.losses import triplet_margin_loss
from hifidiff_tpu.train.optim import adam
from hifidiff_tpu.train.steps import TrainState, make_idc_train_step
from hifidiff_tpu.utils.logging import MetricsLogger, StepTimer


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    dataroot: str = ""
    cr_ckpt: str = ""
    num_epochs: int = 24
    batch_size: int = 24
    lr: float = 5e-4
    size: int = 128
    cr_width: int = 32
    cr_enc_depths: str = "2,2,4,8"
    cr_mid_depth: int = 8
    idc_stages: str = "3,4,6,3"
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_epoch: int = 5
    ckpt_dir: str = "checkpoints/idc"
    use_wandb: bool = False
    resume: bool = False


def load_cr_params(cfg: Config, model: CoarseRestoration, key):
    if cfg.cr_ckpt:
        from hifidiff_tpu.utils import torch_import as ti

        if cfg.cr_ckpt.endswith((".pt", ".pth", ".safetensors")):
            return ti.cr_params(ti.load_torch_file(cfg.cr_ckpt))
        restored = restore_state(cfg.cr_ckpt)
        return restored["state"]["params"]
    print("[warn] no --cr-ckpt: using a randomly initialized CR")
    return jax.jit(model.init)(
        key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Stage-2 IDC pretraining")
    maybe_initialize()  # multi-process jax.distributed (Accelerate equivalent)
    key = jax.random.PRNGKey(cfg.seed)

    from hifidiff_tpu.cli.common import smoke_datasets

    # "pos" = different-photo positive (procedural family; real datasets'
    # gt already IS a separate photograph of the identity)
    smoke = smoke_datasets(cfg, ("lr", "pos", "other"))
    if smoke is not None:
        train_ds, val_ds = smoke
    else:
        train_ds = MultiPIEIDCDataset(cfg.dataroot, split="train",
                                      size=cfg.size, seed=cfg.seed)
        val_ds = MultiPIEIDCDataset(cfg.dataroot, split="test",
                                    size=cfg.size, seed=cfg.seed)
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

    cr_enc = parse_ints(cfg.cr_enc_depths)
    cr = CoarseRestoration(width=cfg.cr_width, resolution=cfg.size,
                           enc_nums=cr_enc, mid_num=cfg.cr_mid_depth,
                           dec_nums=(2,) * len(cr_enc))
    cr_params = load_cr_params(cfg, cr, key)

    idc = IDCEncoder(stage_sizes=parse_ints(cfg.idc_stages))
    variables = jax.jit(lambda k: idc.init(
        k, jnp.zeros((1, cfg.size, cfg.size, 3)), train=True))(key)
    state = TrainState.create(variables["params"], adam(cfg.lr),
                              batch_stats=variables["batch_stats"])

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    cr_params = replicate_global(cr_params, mesh)
    train_step = jax.jit(make_idc_train_step(idc, cr, cr_params),
                         donate_argnums=0)

    def eval_fn(params, batch_stats, batch):
        v = {"params": params, "batch_stats": batch_stats}
        cr_face = cr.apply({"params": cr_params}, batch["lr"])
        a = idc.apply(v, cr_face, train=False)
        p = idc.apply(v, batch["pos"] if "pos" in batch else batch["gt"],
                      train=False)
        n = idc.apply(v, batch["other"], train=False)
        return triplet_margin_loss(a, p, n)

    eval_step = jax.jit(eval_fn)

    logger = MetricsLogger(cfg.log_dir, "hifi_idc", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    for epoch in range(cfg.num_epochs):
        for batch in train_loader:
            batch = shard_batch(batch, mesh)
            state, metrics = train_step(state, batch,
                                        jax.random.fold_in(key, step))
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1
        val_losses = [float(eval_step(state.params, state.batch_stats,
                                      shard_batch(b, mesh)))
                      for b in val_loader]
        logger.log({"val_loss": float(np.mean(val_losses))}, step)
        if epoch % cfg.save_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
