"""Tiny-CR distillation CLI (beyond-reference fast prep).

Distills the trained Coarse Restoration net (stage 1, reference
`train_cr.py` / `models/cr/model.py:33-88`) into the ~0.3M-param TinyCR
student (`models/tiny_cr.py`): with the VAE seams already distilled
(`cli/train_tae.py`), the exact CR is the turbo pipeline's largest
remaining stage (~42 ms of the ~102 ms steps10+both wall at batch 128,
docs/PERF.md). Quality bounds on the trained convergence stack are
committed as TINY_CR_QUALITY.json (`scripts/tiny_cr_quality.py`).

    python -m hifidiff_tpu.cli.train_tiny_cr --cr-ckpt checkpoints/cr/... \
        --dataroot /data/multipie
    python -m hifidiff_tpu.cli.train_tiny_cr --procedural 64 --size 32 \
        --cr-width 32 --cr-enc-depths 1,1 --cr-mid-depth 1 \
        --cr-ckpt runs/convergence/ckpt/cr/convdemo

Checkpoints are orbax dirs with TinyCR params, consumed by
`test_refiner --tiny-cr-ckpt` and `serve --tiny-cr-ckpt`
(`bench.py --tiny-cr` measures the speed side with random tiny
weights — same shapes, same program).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEDataset
from hifidiff_tpu.models import CoarseRestoration, TinyCR
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
from hifidiff_tpu.train.distill import make_tiny_cr_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
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
    num_epochs: int = 100
    batch_size: int = 64
    lr: float = 3e-4
    warmup_steps: int = 200
    gt_weight: float = 0.3   # weight of the direct-GT term vs teacher
    size: int = 128
    # frozen teacher (architecture + orbax/torch checkpoint)
    cr_width: int = 32
    cr_enc_depths: str = "2,2,4,8"
    cr_mid_depth: int = 8
    cr_ckpt: str = ""
    # student architecture (models/tiny_cr.py)
    tiny_width: int = 64
    tiny_blocks: int = 4
    tiny_down: int = 2
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
    out_dir: str = "output/tiny_cr"
    ckpt_dir: str = "checkpoints/tiny_cr"
    use_wandb: bool = False
    resume: bool = False
    platform: str = ""   # e.g. "cpu": force the backend before any device
    # touch (tiny-stack runs are CPU-scale; the harness pins JAX_PLATFORMS
    # so only jax.config.update can override it)


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Tiny-CR distillation")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    maybe_initialize()
    key = jax.random.PRNGKey(cfg.seed)

    from hifidiff_tpu.cli.common import parse_ints, smoke_datasets

    smoke = smoke_datasets(cfg, ("lr", "gt"))
    if smoke is not None:
        train_ds, val_ds = smoke
    else:
        assert cfg.dataroot, "need --dataroot (or --synthetic/--procedural)"
        train_ds = MultiPIEDataset(cfg.dataroot, split="train",
                                   model_type=cfg.model_type, size=cfg.size,
                                   use_blind=True, seed=cfg.seed)
        val_ds = MultiPIEDataset(cfg.dataroot, split="test",
                                 model_type=cfg.model_type, size=cfg.size,
                                 use_blind=False, seed=cfg.seed)
    train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                          seed=cfg.seed, shard_index=process_index(),
                          num_shards=process_count())
    val_loader = Loader(val_ds, cfg.batch_size, shuffle=False,
                        shard_index=process_index(),
                        num_shards=process_count())

    cr_enc = parse_ints(cfg.cr_enc_depths)
    cr_model = CoarseRestoration(width=cfg.cr_width, resolution=cfg.size,
                                 enc_nums=cr_enc, mid_num=cfg.cr_mid_depth,
                                 dec_nums=(2,) * len(cr_enc))
    if cfg.cr_ckpt:
        if cfg.cr_ckpt.endswith((".pt", ".pth", ".safetensors")):
            from hifidiff_tpu.utils import torch_import as ti

            cr_params = ti.cr_params(ti.load_torch_file(cfg.cr_ckpt))
        else:
            from hifidiff_tpu.train.checkpoint import restore_state

            cr_params = restore_state(cfg.cr_ckpt)["state"]["params"]
        print(f"loaded CR teacher from {cfg.cr_ckpt}")
    else:
        print("[warn] no --cr-ckpt: frozen CR teacher is randomly "
              "initialized")
        cr_params = jax.jit(cr_model.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]

    tiny = TinyCR(width=cfg.tiny_width, blocks=cfg.tiny_blocks,
                  down_factor=cfg.tiny_down)
    params = jax.jit(tiny.init)(
        key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]

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
    cr_params = replicate_global(cr_params, mesh)
    train_step = jax.jit(
        make_tiny_cr_train_step(cr_model, tiny, gt_weight=cfg.gt_weight),
        donate_argnums=0)

    @jax.jit
    def eval_step(params, batch):
        """Student output + PSNR vs the frozen teacher (the distillation
        target) and vs GT, both after the pipeline's [0,1] clip."""
        out = jnp.clip(tiny.apply({"params": params}, batch["lr"]), 0, 1)
        teacher = jnp.clip(
            cr_model.apply({"params": cr_params}, batch["lr"]), 0, 1)
        to_db = lambda m: -10.0 * jnp.log10(jnp.maximum(m, 1e-12))  # noqa: E731,E501
        return (out,
                to_db(jnp.mean(jnp.square(out - teacher))),
                to_db(jnp.mean(jnp.square(out - batch["gt"]))))

    logger = MetricsLogger(cfg.log_dir, "hifi_tiny_cr", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in train_loader:
            sharded = shard_batch(batch, mesh)
            state, metrics = train_step(state, cr_params, sharded)
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "teacher_loss": metrics["teacher_loss"],
                        "gt_loss": metrics["gt_loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        t_psnrs, g_psnrs = [], []
        for i, batch in enumerate(val_loader):
            sharded = shard_batch(batch, mesh)
            out, tp, gp = eval_step(state.eval_params, sharded)
            t_psnrs.append(float(tp))
            g_psnrs.append(float(gp))
            if (i == 0 and is_main_process()
                    and epoch % cfg.save_image_epoch == 0):
                save_image_grid(
                    side_by_side(local_shard(sharded["lr"]),
                                 local_shard(out),
                                 local_shard(sharded["gt"])),
                    os.path.join(cfg.out_dir, cfg.name, f"val_e{epoch}.png"))
        logger.log({"val_vs_teacher_psnr": float(np.mean(t_psnrs)),
                    "val_vs_gt_psnr": float(np.mean(g_psnrs))}, step)

        if epoch % cfg.save_model_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
