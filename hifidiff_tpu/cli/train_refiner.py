"""Stage-4 full-pipeline refiner training CLI (reference `train_refiner.py`).

Composition per `models/refiner.py:10-30` + `train_refiner.py:302-431`:
FacialRefiner(IDC + FusedDenoiser + FPG) with IDC weights from stage 2,
denoiser+FPG from stage 3 (strict=False overlay), denoiser intro+encoders
frozen; frozen CR (stage 1) and frozen VAE feed the conditioning. Val runs
the single-program DDIM-50 sampler and PSNR/SSIM (LPIPS/NIQE when their
model files are supplied).

    python -m hifidiff_tpu.cli.train_refiner --dataroot ... --vae-ckpt ... \
        --cr-ckpt ... --idc-ckpt ... --denoiser-ckpt ...
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEDataset
from hifidiff_tpu.diffusion import DiffusionSchedule
from hifidiff_tpu.eval.metrics import reference_eval_metrics
from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
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
from hifidiff_tpu.pipeline import (
    RefinerPipelineConfig,
    build_refiner_sampler_split,
)
from hifidiff_tpu.train.checkpoint import (
    restore_state,
    CheckpointManager,
    compose_refiner_params,
)
from hifidiff_tpu.train.optim import adamw_cosine, masked, refiner_freeze_mask
from hifidiff_tpu.train.steps import TrainState, make_refiner_train_step
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
    dataroot: str = ""
    vae_ckpt: str = ""
    cr_ckpt: str = ""
    idc_ckpt: str = ""
    denoiser_ckpt: str = ""
    model_type: str = "uni"
    num_epochs: int = 100
    batch_size: int = 32
    lr: float = 1e-4
    warmup_steps: int = 500
    accum_steps: int = 1
    size: int = 128
    num_inference_steps: int = 50
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
    remat: bool = False   # jax.checkpoint the UNet blocks (saves HBM)
    ema_decay: float = 0.0  # >0: EMA of trainable params for val sampling
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_epoch: int = 5
    out_dir: str = "output/refiner"
    ckpt_dir: str = "checkpoints/refiner"
    use_wandb: bool = False
    resume: bool = False
    stop_after_epoch: int = -1  # >=0: checkpoint + stop after this epoch
    # (clean mid-run interruption; resume with the SAME --num-epochs)


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Stage-4 refiner training")
    maybe_initialize()  # multi-process jax.distributed (Accelerate equivalent)
    key = jax.random.PRNGKey(cfg.seed)
    from hifidiff_tpu.cli.common import parse_ints

    vae_blocks = parse_ints(cfg.vae_blocks)
    latent = cfg.size // (2 ** (len(vae_blocks) - 1))

    from hifidiff_tpu.cli.common import smoke_datasets

    smoke = smoke_datasets(cfg, ("lr", "gt"))
    if smoke is not None:
        train_ds, val_ds = smoke
    else:
        train_ds = MultiPIEDataset(cfg.dataroot, split="train",
                                   model_type=cfg.model_type, size=cfg.size,
                                   use_blind=True, seed=cfg.seed)
        val_ds = MultiPIEDataset(cfg.dataroot, split="test",
                                 model_type=cfg.model_type, size=cfg.size,
                                 use_blind=False, seed=cfg.seed)
    train_loader = Loader(train_ds, cfg.batch_size, shuffle=True,
                          seed=cfg.seed, shard_index=process_index(),
                          num_shards=process_count())
    # val is sharded too: each process loads a disjoint slice and the
    # slices are assembled into one global batch-sharded array per step
    # (shard_batch below), so metrics are computed over the full val batch
    # on every process
    val_loader = Loader(val_ds, cfg.batch_size, shuffle=False,
                        shard_index=process_index(),
                        num_shards=process_count())

    cr = CoarseRestoration(width=cfg.cr_width, resolution=cfg.size,
                           enc_nums=parse_ints(cfg.cr_enc_depths),
                           mid_num=cfg.cr_mid_depth,
                           dec_nums=(2,) * len(parse_ints(cfg.cr_enc_depths)))
    vae = AutoencoderKL(block_out=vae_blocks, layers_per_block=cfg.vae_layers)
    refiner = FacialRefiner(latent_size=latent, width=cfg.width,
                            enc_nums=parse_ints(cfg.enc_depths),
                            mid_num=cfg.mid_depth,
                            dec_nums=parse_ints(cfg.dec_depths),
                            idc_stage_sizes=parse_ints(cfg.idc_stages),
                            remat=cfg.remat)
    schedule = DiffusionSchedule.create()

    # frozen stage-1 CR + frozen VAE
    from hifidiff_tpu.utils import torch_import as ti

    if cfg.cr_ckpt:
        cr_params = ti.cr_params(ti.load_torch_file(cfg.cr_ckpt)) \
            if cfg.cr_ckpt.endswith((".pt", ".pth", ".safetensors")) \
            else restore_state(cfg.cr_ckpt)["state"]["params"]
    else:
        print("[warn] no --cr-ckpt: random CR")
        cr_params = jax.jit(cr.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]
    from hifidiff_tpu.cli.common import load_vae_params

    vae_params = load_vae_params(vae, cfg.vae_ckpt, key, cfg.size)

    init_vars = jax.jit(lambda k: refiner.init(
        k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
        jnp.zeros((1, cfg.size, cfg.size, 3)),
        jnp.zeros((1, latent, latent, 4)), train=True))(key)
    variables = compose_refiner_params(
        jax.device_get(init_vars),
        idc_ckpt=cfg.idc_ckpt or None,
        denoiser_ckpt=cfg.denoiser_ckpt or None)

    mask = refiner_freeze_mask(variables["params"])
    total_steps = len(train_loader) * cfg.num_epochs
    tx = masked(adamw_cosine(cfg.lr, cfg.warmup_steps, total_steps,
                             accumulate_steps=cfg.accum_steps), mask)
    state = TrainState.create(variables["params"], tx,
                              batch_stats=variables.get("batch_stats", {}),
                              ema_decay=cfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    frozen = replicate_global({"cr": cr_params,
                           "vae": vae_params}, mesh)
    train_step = jax.jit(make_refiner_train_step(refiner, cr, vae, schedule),
                         donate_argnums=0)
    sampler = build_refiner_sampler_split(
        refiner, cr, vae, schedule,
        RefinerPipelineConfig(num_inference_steps=cfg.num_inference_steps,
                              latent_size=latent))

    # reference eval conventions (shared jitted helper) so val numbers are
    # comparable to the reported test metrics
    val_metrics = lambda pred, gt: reference_eval_metrics(pred, gt)[0]  # noqa: E731

    logger = MetricsLogger(cfg.log_dir, "hifi_refiner", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    from hifidiff_tpu.parallel import device_prefetch

    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in device_prefetch(
                ({"lr": b["lr"], "gt": b["gt"]} for b in train_loader),
                mesh):
            state, metrics = train_step(state, frozen, batch,
                                        jax.random.fold_in(key, step))
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        # validation: full DDIM sampling + metrics (train_refiner.py:212-299).
        # The val batch is sharded over the SAME mesh as training, so an
        # 8-chip run validates 8x faster and a multi-process run is a valid
        # program (global params + global batch; every process enters the
        # jitted sampler — mixing replicated global params with per-process
        # host-local inputs is not a valid multi-controller program).
        psnrs, ssims = [], []
        for i, batch in enumerate(val_loader):
            batch = shard_batch(batch, mesh)
            sample_vars = {
                "refiner": {"params": state.eval_params,
                            "batch_stats": state.batch_stats},
                "cr": frozen["cr"], "vae": frozen["vae"],
            }
            pred = sampler(sample_vars, batch["lr"],
                           jax.random.fold_in(key, 50_000 + i))
            m = val_metrics(pred, batch["gt"])
            psnrs.append(float(m["psnr"]))
            ssims.append(float(m["ssim"]))
            if i == 0 and is_main_process():
                save_image_grid(
                    side_by_side(local_shard(batch["lr"]), local_shard(pred),
                                 local_shard(batch["gt"])),
                    os.path.join(cfg.out_dir, cfg.name, f"val_e{epoch}.png"))
        logger.log({"val_psnr": float(np.mean(psnrs)),
                    "val_ssim": float(np.mean(ssims))}, step)

        last = (epoch == cfg.num_epochs - 1
                or epoch == cfg.stop_after_epoch)
        if epoch % cfg.save_epoch == 0 or last:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
        if epoch == cfg.stop_after_epoch:
            # clean mid-run interruption (after checkpointing): lets a
            # kill-and-resume be exercised/bounded with the SAME
            # --num-epochs both times, i.e. the same cosine LR schedule a
            # single uninterrupted run would see (total_steps is derived
            # from num_epochs at line ~170)
            print(f"stopping after epoch {epoch} (--stop-after-epoch)")
            break
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
