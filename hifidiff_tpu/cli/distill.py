"""Progressive-distillation CLI (beyond-reference fast sampling).

Distills a trained stage-4 refiner's DDIM sampler into a few-step student
(`train/distill.py`, arXiv:2202.00512 style). `--student-steps` is a
comma list of rounds: each round's teacher is the previous round's
student (the first teacher is `--teacher-steps`, default the reference's
50), and the sub-step count per round is the teacher/student ratio —
"25" runs one 2-sub-step halving round; "10" distills 50->10 directly
with 5 sub-steps; "25,5" chains 50->25->5.

After each round the student is checkpointed and evaluated against the
EXACT teacher sampler on a held-out batch, next to the naive baseline
(teacher weights at the student's step count — the only fast-sampling
option the reference has):

    python -m hifidiff_tpu.cli.distill --refiner-ckpt runs/.../refiner \
        --cr-ckpt ... --vae-ckpt ... --student-steps 10 --procedural 64
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import Loader, MultiPIEDataset
from hifidiff_tpu.eval.metrics import min_max_normalize, psnr, psnr_pyiqa
from hifidiff_tpu.parallel import (
    is_main_process,
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
from hifidiff_tpu.train.checkpoint import CheckpointManager
from hifidiff_tpu.train.distill import make_distill_train_step
from hifidiff_tpu.train.optim import adamw_cosine
from hifidiff_tpu.train.steps import TrainState
from hifidiff_tpu.utils.logging import MetricsLogger


@dataclasses.dataclass
class Config:
    name: str = "temp"
    log_dir: str = "logs"
    dataroot: str = ""
    model_type: str = "uni"
    # distillation schedule
    teacher_steps: int = 50
    student_steps: str = "10"    # comma list of rounds (see module doc)
    steps_per_round: int = 2000
    stratified: bool = False    # per-batch even step coverage (variance
    # reduction for the truncated-SNR objective; see train/distill.py)
    batch_size: int = 16
    lr: float = 1e-5             # small: the student starts AT the teacher
    warmup_steps: int = 100
    clip_sample_range: float = 3.0  # teacher trajectory = test_refiner's
    # checkpoints (orbax dir / torch file; empty = random init + warning)
    refiner_ckpt: str = ""
    cr_ckpt: str = ""
    vae_ckpt: str = ""
    # model-size knobs (defaults = reference architecture)
    size: int = 128
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
    eval_batch: int = 16
    ckpt_dir: str = "checkpoints/distill"
    use_wandb: bool = False


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "Progressive sampler distillation")
    maybe_initialize()
    key = jax.random.PRNGKey(cfg.seed)
    from hifidiff_tpu.cli.common import (
        load_refiner_stack,
        parse_ints,
        smoke_datasets,
    )

    cr, vae, refiner, schedule, sample_vars, latent = \
        load_refiner_stack(cfg, key)
    teacher = sample_vars["refiner"]
    frozen = {"cr": sample_vars["cr"], "vae": sample_vars["vae"]}

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
    loader = Loader(train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                    shard_index=process_index(), num_shards=process_count())
    val_loader = Loader(val_ds, min(cfg.eval_batch, len(val_ds)),
                        shuffle=False, shard_index=process_index(),
                        num_shards=process_count())

    mesh = make_mesh()
    teacher = replicate_global(teacher, mesh)
    frozen = replicate_global(frozen, mesh)
    val_batch = shard_batch(next(iter(val_loader)), mesh)
    eval_key = jax.random.fold_in(key, 10_000)

    def sampler_at(steps):
        return build_refiner_sampler_split(
            refiner, cr, vae, schedule,
            RefinerPipelineConfig(num_inference_steps=steps,
                                  latent_size=latent, clip_sample=True,
                                  clip_sample_range=cfg.clip_sample_range))

    def sample_psnrs(variables, steps, reference_pred):
        """(vs exact-teacher PSNR, vs GT PSNR) for `variables` at `steps`.

        gt-PSNR uses the reference eval convention (batch min-max
        normalize then pyiqa psnr, `test_refiner.py:113-120`) so the
        numbers sit in the same column as CACHE_QUALITY.json / the
        README quality table; drift vs the exact teacher is a plain
        output-space PSNR (data range 1)."""
        pred = sampler_at(steps)(
            {"refiner": variables, "cr": frozen["cr"],
             "vae": frozen["vae"]}, val_batch["lr"], eval_key)
        vs_ref = (float(psnr(pred, reference_pred))
                  if reference_pred is not None else float("nan"))
        pred_n = min_max_normalize(pred, per_sample=False)
        gt_n = min_max_normalize(val_batch["gt"], per_sample=False)
        return pred, vs_ref, float(jnp.mean(psnr_pyiqa(pred_n, gt_n)))

    # the distillation target: the exact teacher at its full step count
    exact_pred, _, exact_gt = sample_psnrs(teacher, cfg.teacher_steps, None)
    print(f"[distill] exact teacher @{cfg.teacher_steps} steps: "
          f"gt-PSNR {exact_gt:.2f} dB", flush=True)

    logger = MetricsLogger(cfg.log_dir, "hifi_distill", cfg.name,
                           use_wandb=cfg.use_wandb)
    results = {"teacher_steps": cfg.teacher_steps, "exact_gt_psnr": exact_gt,
               "rounds": []}
    orig_teacher = teacher
    teacher_steps = cfg.teacher_steps
    gstep = 0
    for rnd, student_steps in enumerate(parse_ints(cfg.student_steps)):
        if teacher_steps % student_steps:
            raise ValueError(f"teacher steps {teacher_steps} not divisible "
                             f"by student steps {student_steps}")
        substeps = teacher_steps // student_steps

        # the naive baseline this round must beat: current teacher weights
        # simply run at the student's (fewer) steps — plus the
        # reference-comparable one: the ORIGINAL (undistilled) weights at
        # those steps, i.e. plain DDIM step reduction
        # (`test_refiner.py:85-91`, the reference's only fast option)
        _, naive_vs_exact, naive_gt = sample_psnrs(teacher, student_steps,
                                                   exact_pred)
        _, orig_vs_exact, orig_gt = sample_psnrs(orig_teacher, student_steps,
                                                 exact_pred)

        tx = adamw_cosine(cfg.lr, cfg.warmup_steps, cfg.steps_per_round)
        # deep-copy params AND batch_stats: `state` is donated to the jitted
        # step while `teacher` rides along as a live argument — shared
        # buffers would be use-after-donate
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, teacher["params"]), tx,
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, teacher.get("batch_stats", {})))
        state = replicate_global(state, mesh)
        step_fn = jax.jit(
            make_distill_train_step(refiner, cr, vae, schedule,
                                    stratified=cfg.stratified,
                                    num_student_steps=student_steps,
                                    substeps=substeps, clip_sample=True,
                                    clip_sample_range=cfg.clip_sample_range),
            donate_argnums=0)

        it = iter(loader)
        for i in range(cfg.steps_per_round):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(loader)
                batch = next(it)
            batch = shard_batch({"lr": batch["lr"], "gt": batch["gt"]}, mesh)
            state, m = step_fn(state, teacher, frozen, batch,
                               jax.random.fold_in(key, gstep))
            if i % 50 == 0:
                logger.log({"round": rnd, "distill_loss": m["loss"]}, gstep)
            gstep += 1

        student = {"params": state.params, "batch_stats": state.batch_stats}
        _, dist_vs_exact, dist_gt = sample_psnrs(student, student_steps,
                                                 exact_pred)
        row = {"round": rnd, "teacher_steps": teacher_steps,
               "student_steps": student_steps, "substeps": substeps,
               "final_loss": float(m["loss"]),
               "naive_vs_exact_psnr": naive_vs_exact,
               "naive_gt_psnr": naive_gt,
               "orig_naive_vs_exact_psnr": orig_vs_exact,
               "orig_naive_gt_psnr": orig_gt,
               "distilled_vs_exact_psnr": dist_vs_exact,
               "distilled_gt_psnr": dist_gt}
        results["rounds"].append(row)
        print(f"[distill] round {rnd}: {teacher_steps}->{student_steps} "
              f"steps (k={substeps}) | naive {student_steps}-step: "
              f"{naive_vs_exact:.2f} dB vs exact ({naive_gt:.2f} gt; "
              f"orig weights {orig_gt:.2f} gt) | "
              f"distilled: {dist_vs_exact:.2f} dB vs exact "
              f"({dist_gt:.2f} gt)", flush=True)
        if is_main_process():
            ckpt = CheckpointManager(os.path.join(
                cfg.ckpt_dir, cfg.name, f"round{rnd}_s{student_steps}"))
            ckpt.save(gstep, jax.device_get(
                {"params": student["params"],
                 "batch_stats": student["batch_stats"]}), wait=True)

        teacher, teacher_steps = student, student_steps

    return results


if __name__ == "__main__":
    main()
