"""Multi-PROCESS data-parallel dryrun on CPU devices.

The multi-chip dryrun (`__graft_entry__.dryrun_multichip`) validates GSPMD
sharding with one process owning all devices. Real pod training is
multi-process — one process per host, none owning all chips (the job HF
Accelerate does for the reference, `pretrain_denoiser.py:230,282-287`).
This module proves that path end-to-end without hardware: the parent
spawns N processes, each pinned to its own set of virtual CPU devices via
`xla_force_host_platform_device_count`; the children rendezvous through
`jax.distributed.initialize`, build the GLOBAL mesh, read disjoint
`Loader` shards, assemble the global batch with
`jax.make_array_from_process_local_data` (`parallel.mesh.shard_batch`),
and run one jitted denoiser train step — gradients psum across processes.
Each child prints its loss; the parent asserts every process computed the
same (replicated) loss and exit code 0.

Run directly:  python -m hifidiff_tpu.parallel.mp_dryrun
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def child_main(process_id: int, num_processes: int,
               devices_per_process: int, port: int) -> None:
    # platform setup MUST precede any jax backend initialization
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from hifidiff_tpu.parallel import maybe_initialize

    maybe_initialize(coordinator_address=f"localhost:{port}",
                     num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes
    assert jax.local_device_count() == devices_per_process
    assert jax.device_count() == num_processes * devices_per_process

    import jax.numpy as jnp
    import numpy as np

    from hifidiff_tpu.cli.common import SyntheticFaceDataset
    from hifidiff_tpu.data import Loader
    from hifidiff_tpu.diffusion import DiffusionSchedule
    from hifidiff_tpu.models import Denoiser
    from hifidiff_tpu.parallel import (
        is_main_process,
        make_mesh,
        process_index,
        replicate_global,
        shard_batch,
    )
    from hifidiff_tpu.train.optim import adamw_cosine
    from hifidiff_tpu.train.steps import TrainState, make_denoiser_train_step
    from hifidiff_tpu.utils.logging import MetricsLogger
    from hifidiff_tpu.vae import AutoencoderKL

    res, latent = 32, 8
    denoiser = Denoiser(width=16, enc_nums=(1, 1), mid_num=1,
                        dec_nums=(1, 1))
    vae = AutoencoderKL(block_out=(32, 32, 32), layers_per_block=1)
    schedule = DiffusionSchedule.create()

    key = jax.random.PRNGKey(0)  # same seed everywhere -> identical init
    dn_params = denoiser.init(key, jnp.zeros((1, latent, latent, 4)),
                              jnp.zeros((1,)))["params"]
    vae_params = vae.init(key, jnp.zeros((1, res, res, 3)))["params"]
    state = TrainState.create(dn_params, adamw_cosine(total_steps=4))

    # per-process Loader shard of the same seeded global shuffle. 14
    # samples over 2 shards -> 7 per shard -> batches [4, 3]: the final
    # RAGGED batch exercises shard_batch's wrap-padding to the local
    # device multiple (drop_last=False path)
    ds = SyntheticFaceDataset(14, res, keys=("image",))
    local_batch = devices_per_process
    loader = Loader(ds, local_batch, shuffle=True, seed=0,
                    shard_index=process_index(), num_shards=num_processes)

    mesh = make_mesh()  # global mesh over ALL processes' devices
    state = replicate_global(state, mesh)
    vae_params = replicate_global(vae_params, mesh)
    step_fn = jax.jit(make_denoiser_train_step(denoiser, vae, schedule),
                      donate_argnums=0)

    logger = MetricsLogger("/tmp/hifidiff_mp_dryrun_logs", "mp_dryrun",
                           f"p{process_id}")  # main_only: p1 becomes no-op
    losses = []
    for i, batch in enumerate(loader):
        global_batch = shard_batch(batch, mesh)
        state, metrics = step_fn(state, vae_params, global_batch["image"],
                                 jax.random.fold_in(key, i))
        losses.append(float(metrics["loss"]))
        logger.log({"loss": metrics["loss"]}, i)
        if i == 1:
            break
    logger.close()
    assert logger.enabled == is_main_process()
    assert all(np.isfinite(losses)), losses
    # the loss is a global mean -> replicated: all processes print the same
    print(f"MP_DRYRUN_LOSS p{process_id} "
          + " ".join(f"{v:.6f}" for v in losses), flush=True)

    # VAL path (ADVICE r2 medium: the train step alone left multi-process
    # validation untested): the exact pattern `train_refiner`/`test_refiner`
    # use — sharded val Loader, global batch via shard_batch, replicated
    # params implied, one jitted metric program entered by EVERY process
    # over the global arrays. 10 samples over 2 shards -> 5 each ->
    # batches [4, 1]: ragged again on the val side.
    from hifidiff_tpu.eval.metrics import reference_eval_metrics

    val_ds = SyntheticFaceDataset(10, res, keys=("lr", "gt"))
    val_loader = Loader(val_ds, local_batch, shuffle=False,
                        shard_index=process_index(),
                        num_shards=num_processes)
    val_psnrs = []
    for batch in val_loader:
        gb = shard_batch(batch, mesh)
        m, _, _ = reference_eval_metrics(gb["lr"], gb["gt"])
        val_psnrs.append(float(m["psnr"]))
    assert all(np.isfinite(val_psnrs)), val_psnrs
    print(f"MP_DRYRUN_VAL p{process_id} "
          + " ".join(f"{v:.6f}" for v in val_psnrs), flush=True)


def run(num_processes: int = 2, devices_per_process: int = 4,
        port: int = 29517, timeout: int = 600) -> None:
    """Spawn the children, collect losses, assert cross-process agreement."""
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # child sets its own
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "hifidiff_tpu.parallel.mp_dryrun",
             "--child", "--process-id", str(pid),
             "--num-processes", str(num_processes),
             "--devices-per-process", str(devices_per_process),
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
        if p.returncode != 0:
            raise RuntimeError(
                f"mp_dryrun child failed (rc={p.returncode}):\n{out}")
    for tag, what in (("MP_DRYRUN_LOSS", "loss"), ("MP_DRYRUN_VAL", "val")):
        per_proc = {}
        for out in outs:
            for line in out.splitlines():
                if line.startswith(tag):
                    parts = line.split()
                    per_proc[parts[1]] = tuple(float(v) for v in parts[2:])
        assert len(per_proc) == num_processes, \
            f"missing {what} lines: {outs}"
        vals = list(per_proc.values())
        assert all(v == vals[0] for v in vals), (
            f"cross-process {what} mismatch: {per_proc}")
    print(f"mp_dryrun OK: {num_processes} processes x "
          f"{devices_per_process} devices, train losses AND val metrics "
          f"identical: {vals[0]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--port", type=int, default=29517)
    args = ap.parse_args()
    if args.child:
        child_main(args.process_id, args.num_processes,
                   args.devices_per_process, args.port)
    else:
        run(args.num_processes, args.devices_per_process, args.port)


if __name__ == "__main__":
    main()
