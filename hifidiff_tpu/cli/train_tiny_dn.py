"""Tiny-denoiser width distillation CLI (EXPERIMENTAL — not a
sanctioned operating point).

Measured verdict (VERDICT r4 #4, TINY_DN_QUALITY.json on the
discriminating 32px stack): at 10 steps the tiny-DN swap costs ~2 dB on
top of the TAE (dpmpp10 17.26 vs tae_both 19.37; ddim10 15.78 vs 18.02)
while buying ~nothing — the 10-step scan wall-clock is dominated by
fixed per-step overheads, not denoiser width, and TURBO_BENCH's composed
rows get their speed from tiny-CR/TAE. Until a distillation recipe
recovers the gap, do NOT include tiny-DN in a recommended mode; the seam
machinery below is kept because it is validated and the right substrate
for future recipes (e.g. trajectory-distilled students).

Distills the trained full-width FacialRefiner (stage 4, reference
`train_refiner.py:128-299` / `models/refiner.py:10-38`) into a NARROWER
FacialRefiner student that matches the teacher's epsilon predictions
pointwise (`train/distill.py:make_tiny_dn_train_step`): with the prep
and decode seams already distilled (`--tiny-cr`, `--tiny-ae`), the
denoiser scan is the composed-turbo pipeline's largest remaining stage
(~39 ms of the ~67 ms dpmpp10+both+tinycr wall at batch 128,
docs/PERF.md). Because the student keeps the teacher's stepping
semantics it drops into every existing sampler unchanged — ddim/dpmpp,
any step count, `--cache-interval` — via the ordinary `--width` /
`--refiner-ckpt` flags of `test_refiner` and `serve`.

    python -m hifidiff_tpu.cli.train_tiny_dn \
        --refiner-ckpt checkpoints/refiner/... --cr-ckpt ... --vae-ckpt ... \
        --tiny-width 64 --dataroot /data/multipie
    python -m hifidiff_tpu.cli.train_tiny_dn --procedural 64 --size 32 \
        --width 32 --enc-depths 1,1 --mid-depth 1 --dec-depths 1,1 \
        --idc-stages 1,1,1,1 --cr-width 32 --cr-enc-depths 1,1 \
        --cr-mid-depth 1 --vae-blocks 32,32 --vae-layers 1 \
        --refiner-ckpt runs/convergence/ckpt/refiner/convdemo ... \
        --tiny-width 16

Checkpoints are orbax dirs holding full student refiner variables,
consumed by `test_refiner --refiner-ckpt <student> --width <tiny>` (and
`serve`). Quality bounds on the trained convergence stack are committed
as TINY_DN_QUALITY.json (`scripts/tiny_dn_quality.py`);
`bench.py --tiny-dn WIDTH` measures the speed side with random student
weights (same shapes, same program).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEDataset
from hifidiff_tpu.parallel import (
    is_main_process,
    make_mesh,
    maybe_initialize,
    process_count,
    process_index,
    replicate_global,
    shard_batch,
)
from hifidiff_tpu.train.checkpoint import CheckpointManager
from hifidiff_tpu.train.distill import make_tiny_dn_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.utils.logging import MetricsLogger, StepTimer


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    dataroot: str = ""
    model_type: str = "uni"
    num_epochs: int = 100
    batch_size: int = 16
    lr: float = 3e-4
    warmup_steps: int = 200
    rollout_steps: int = 10   # teacher DDIM rollout length (on-policy grid)
    fwd_weight: float = 0.5   # forward-diffused dense-t term weight
    size: int = 128
    # frozen TEACHER stack (same knobs as test_refiner / serve)
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
    refiner_ckpt: str = ""
    cr_ckpt: str = ""
    vae_ckpt: str = ""
    # STUDENT architecture (a narrower FacialRefiner; IDC arch is shared
    # with the teacher so its weights can be seeded from it)
    tiny_width: int = 64
    tiny_enc_depths: str = ""   # "" = teacher's enc_depths
    tiny_mid_depth: int = 0     # 0  = teacher's mid_depth
    tiny_dec_depths: str = ""   # "" = teacher's dec_depths
    ema_decay: float = 0.0
    seed: int = 0
    synthetic: int = 0
    procedural: int = 0
    proc_id_spread: float = 1.0   # <1: hard-identity family (data/procedural.py)
    proc_light_jitter: float = 0.0  # >0: per-sample input lighting nuisance
    proc_detail: float = 0.0    # >0: per-identity facial-mark detail
    proc_clutter: int = 0       # >0: per-sample background shapes
    save_model_epoch: int = 10
    out_dir: str = "output/tiny_dn"
    ckpt_dir: str = "checkpoints/tiny_dn"
    use_wandb: bool = False
    resume: bool = False
    platform: str = ""   # e.g. "cpu": force the backend before any device
    # touch (tiny-stack runs are CPU-scale; the harness pins JAX_PLATFORMS
    # so only jax.config.update can override it)


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "Tiny-denoiser width distillation")
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    maybe_initialize()
    key = jax.random.PRNGKey(cfg.seed)

    import jax.numpy as jnp

    from hifidiff_tpu.cli.common import (
        load_refiner_stack,
        parse_ints,
        smoke_datasets,
    )
    from hifidiff_tpu.models import FacialRefiner

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

    cr, vae, teacher_refiner, schedule, sample_vars, latent = \
        load_refiner_stack(cfg, key)
    teacher_vars = sample_vars["refiner"]

    student = FacialRefiner(
        latent_size=latent, width=cfg.tiny_width,
        enc_nums=parse_ints(cfg.tiny_enc_depths or cfg.enc_depths),
        mid_num=cfg.tiny_mid_depth or cfg.mid_depth,
        dec_nums=parse_ints(cfg.tiny_dec_depths or cfg.dec_depths),
        idc_stage_sizes=parse_ints(cfg.idc_stages))
    sv = jax.jit(lambda k: student.init(
        k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
        jnp.zeros((1, cfg.size, cfg.size, 3)),
        jnp.zeros((1, latent, latent, 4)), train=True))(key)
    # seed the student's IDC (identical arch) from the trained teacher —
    # the identity encoder is width-independent and needs no re-learning
    s_params = dict(sv["params"])
    s_stats = dict(sv.get("batch_stats", {}))
    s_params["idc"] = jax.device_get(teacher_vars["params"]["idc"])
    if "idc" in teacher_vars.get("batch_stats", {}):
        s_stats["idc"] = jax.device_get(teacher_vars["batch_stats"]["idc"])

    total_steps = len(train_loader) * cfg.num_epochs
    tx = adamw_cosine(cfg.lr, cfg.warmup_steps, total_steps)
    state = TrainState.create(s_params, tx, batch_stats=s_stats,
                              ema_decay=cfg.ema_decay)

    ckpt = CheckpointManager(os.path.join(cfg.ckpt_dir, cfg.name))
    start_epoch = 0
    if cfg.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(template=state)["state"]
        start_epoch = int(state.step) // max(1, len(train_loader))
        print(f"resumed at step {int(state.step)} (epoch {start_epoch})")

    mesh = make_mesh()
    state = replicate_global(state, mesh)
    teacher_vars = replicate_global(teacher_vars, mesh)
    frozen = replicate_global(
        {"cr": sample_vars["cr"], "vae": sample_vars["vae"]}, mesh)
    train_step = jax.jit(
        make_tiny_dn_train_step(teacher_refiner, student, cr, vae, schedule,
                                rollout_steps=cfg.rollout_steps,
                                fwd_weight=cfg.fwd_weight),
        donate_argnums=0)
    # val = the distillation objective itself on held-out identities
    # (end-to-end sampler PSNR is measured by scripts/tiny_dn_quality.py)
    eval_step = jax.jit(
        make_tiny_dn_train_step(teacher_refiner, student, cr, vae, schedule,
                                rollout_steps=cfg.rollout_steps,
                                fwd_weight=cfg.fwd_weight))

    logger = MetricsLogger(cfg.log_dir, "hifi_tiny_dn", cfg.name,
                           use_wandb=cfg.use_wandb)
    timer = StepTimer()
    step = int(state.step)
    val_key = jax.random.PRNGKey(cfg.seed + 1)
    for epoch in range(start_epoch, cfg.num_epochs):
        for batch in train_loader:
            sharded = shard_batch(batch, mesh)
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, teacher_vars, frozen,
                                        sharded, sub)
            timer.tick()
            logger.log({"train_loss": metrics["loss"],
                        "onpolicy_loss": metrics["onpolicy_loss"],
                        "fwd_loss": metrics["fwd_loss"],
                        "step_time": timer.mean, "epoch": epoch}, step)
            step += 1

        losses = []
        for batch in val_loader:
            sharded = shard_batch(batch, mesh)
            # fixed key: the val metric is comparable across epochs
            _, metrics = eval_step(state, teacher_vars, frozen,
                                   sharded, val_key)
            losses.append(float(metrics["onpolicy_loss"]))
        logger.log({"val_onpolicy_loss": float(np.mean(losses))}, step)

        if epoch % cfg.save_model_epoch == 0 or epoch == cfg.num_epochs - 1:
            if is_main_process():
                ckpt.save(step, jax.device_get(state), wait=True)
    ckpt.close()
    logger.close()


if __name__ == "__main__":
    main()
