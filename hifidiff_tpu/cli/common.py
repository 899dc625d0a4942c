"""Shared CLI machinery: typed dataclass configs -> argparse flags,
synthetic datasets for smoke runs, device/mesh setup.

Replaces the reference's per-script argparse blocks and hardcoded paths
(`train_cr.py:15-48`, `pretrain_idc.py:80-83`, SURVEY.md §5 config row)
with one dataclass-driven CLI; every stage accepts `--synthetic N` to run
on generated data (smoke tests / CI without the private datasets)."""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Type, TypeVar

import numpy as np

from hifidiff_tpu.data.core import Dataset, Sample

T = TypeVar("T")


def add_dataclass_args(parser: argparse.ArgumentParser, cls: Type[T]) -> None:
    for f in dataclasses.fields(cls):
        name = "--" + f.name.replace("_", "-")
        if f.type in ("bool", bool):
            parser.add_argument(name, type=lambda s: s.lower() in
                                ("1", "true", "yes"),
                                default=f.default, metavar="BOOL")
        else:
            ftype = {int: int, float: float, str: str}.get(f.type, str) \
                if not isinstance(f.type, str) else \
                {"int": int, "float": float, "str": str,
                 "Optional[str]": str, "Optional[int]": int}.get(f.type, str)
            parser.add_argument(name, type=ftype, default=f.default)


def parse_config(cls: Type[T], argv=None,
                 description: str = "") -> T:
    parser = argparse.ArgumentParser(description=description)
    add_dataclass_args(parser, cls)
    args = parser.parse_args(argv)
    kwargs = {f.name: getattr(args, f.name)
              for f in dataclasses.fields(cls)}
    return cls(**kwargs)


def parse_ints(s: str) -> tuple:
    """'2,2,4,8' -> (2, 2, 4, 8) for depth/width-list flags."""
    return tuple(int(x) for x in str(s).split(",") if x.strip())


def load_vae_params(vae, vae_ckpt: str, key, size: int):
    """Resolve frozen-VAE params for stages 3-5: a torch SD-2.1 checkpoint
    (`pretrain_denoiser.py:256-259`), an orbax dir from our own
    `train_vae` stage-0 fit, or (with a warning) a fresh random init."""
    import os

    import jax
    import jax.numpy as jnp

    if vae_ckpt and os.path.isdir(vae_ckpt):
        from hifidiff_tpu.train.checkpoint import restore_state

        params = restore_state(vae_ckpt)["state"]["params"]
        print(f"loaded VAE weights from orbax dir {vae_ckpt}")
        return params
    if vae_ckpt:
        from hifidiff_tpu.utils.torch_import import load_torch_file
        from hifidiff_tpu.vae import vae_params_from_torch

        params = vae_params_from_torch(load_torch_file(vae_ckpt))
        print(f"loaded VAE weights from {vae_ckpt}")
        return params
    print("[warn] no --vae-ckpt: frozen VAE is randomly initialized")
    return jax.jit(vae.init)(key,
                             jnp.zeros((1, size, size, 3)))["params"]


def smoke_datasets(cfg, keys, val_keys=None):
    """Train/val datasets for the two no-real-data modes every stage CLI
    supports: `--synthetic N` (random tensors — shape smoke only) and
    `--procedural N` (deterministic learnable face family,
    `data/procedural.py` — real training signal for the end-to-end
    convergence demo). Val split semantics depend on the task: for
    pose-dependent keys ("lr" present — restoration/frontalization) val
    is the SAME identities at never-trained poses (`start=10_000`,
    matching the task: identity-preserving restoration); for
    pose-independent keys (pure "image" recon/generation, e.g. the VAE
    stage) the frontal render depends only on identity, so a start offset
    alone would reproduce the train images bit-exactly — val instead uses
    UNSEEN identities (different seed), making val PSNR a real
    generalization measure. Returns None when neither flag is set."""
    if getattr(cfg, "procedural", 0):
        from hifidiff_tpu.data.procedural import ProceduralFaceDataset

        n_val = max(4, cfg.procedural // 4)
        pose_dependent = "lr" in set(val_keys or keys)
        # image-only stages: identity diversity scales with the set size
        # (8 fixed identities caps unseen-identity generalization of the
        # VAE/denoiser); triplet/restoration stages keep the default-8
        # identity space (each id seen 8x per 64 samples — a denser space
        # whose triplets are NOT trivially margin-satisfied at init)
        # hard-identity knobs (VERDICT r3 #4) + detail-family knobs
        # (VERDICT r4 #1/#2); absent fields = legacy family
        hard_kw = dict(
            id_spread=getattr(cfg, "proc_id_spread", 1.0),
            light_jitter=getattr(cfg, "proc_light_jitter", 0.0),
            detail=getattr(cfg, "proc_detail", 0.0),
            clutter=getattr(cfg, "proc_clutter", 0))
        if pose_dependent:
            # legacy family: 8 fixed identities. Hard family (id_spread<1):
            # metric learning over 8 tightly-packed identities overfits CR
            # artifacts (n=64 probe: trained acc <= random acc, val triplet
            # loss rising) — scale the identity count with the set size so
            # each id still gets ~16 poses and the embedding must rank a
            # real identity manifold
            hard = hard_kw["id_spread"] < 1.0 or hard_kw["detail"] > 0.0
            num_ids = max(8, cfg.procedural // 16) if hard else 8
        else:
            num_ids = max(8, cfg.procedural // 4)
        val_kw = (dict(seed=cfg.seed, start=10_000) if pose_dependent
                  else dict(seed=cfg.seed + 7919))
        # cache=True: deterministic renders, re-used across epochs (the
        # detail-family renders are host-CPU-bound otherwise)
        return (ProceduralFaceDataset(cfg.procedural, cfg.size, keys=keys,
                                      num_ids=num_ids, seed=cfg.seed,
                                      cache=True, **hard_kw),
                ProceduralFaceDataset(n_val, cfg.size, num_ids=num_ids,
                                      keys=val_keys or keys, cache=True,
                                      **val_kw, **hard_kw))
    if cfg.synthetic:
        mk = lambda n, k: SyntheticFaceDataset(  # noqa: E731
            n, cfg.size, keys=k, seed=cfg.seed)
        return (mk(cfg.synthetic, keys),
                mk(max(4, cfg.synthetic // 4), val_keys or keys))
    return None


class SyntheticFaceDataset(Dataset):
    """Random face-shaped samples for smoke runs. Keys configurable to
    mimic each real dataset's sample dict."""

    def __init__(self, n: int = 64, size: int = 128, keys=("lr", "gt"),
                 num_patches: int = 4, seed: int = 0):
        self.n = n
        self.size = size
        self.keys = keys
        self.num_patches = num_patches
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Sample:
        rng = np.random.default_rng((self.seed, index))
        out: Sample = {}
        for k in self.keys:
            if k == "patches":
                patches = np.zeros(
                    (self.num_patches, self.size, self.size, 3), np.float32)
                for p in range(self.num_patches):
                    t0, l0 = rng.integers(0, self.size - 16, 2)
                    patches[p, t0:t0 + 16, l0:l0 + 16] = rng.uniform(
                        0, 1, (16, 16, 3))
                out[k] = patches
            else:
                out[k] = rng.uniform(0, 1,
                                     (self.size, self.size, 3)).astype(
                    np.float32)
        return out


def build_refiner_models(cfg):
    """Construct the CR / VAE / FacialRefiner model DEFINITIONS from cfg's
    model-size knobs — cheap, no device touch. Split out of
    load_refiner_stack so a server can build its sampler and start
    compiling stage programs from abstract avals CONCURRENTLY with the
    weight init/load below (the bench's overlapped-cold-start trick)."""
    from hifidiff_tpu.diffusion import DiffusionSchedule
    from hifidiff_tpu.models import CoarseRestoration, FacialRefiner
    from hifidiff_tpu.vae import AutoencoderKL

    vae_blocks = parse_ints(cfg.vae_blocks)
    latent = cfg.size // (2 ** (len(vae_blocks) - 1))
    cr_enc = parse_ints(cfg.cr_enc_depths)
    cr = CoarseRestoration(width=cfg.cr_width, resolution=cfg.size,
                           enc_nums=cr_enc, mid_num=cfg.cr_mid_depth,
                           dec_nums=(2,) * len(cr_enc))
    vae = AutoencoderKL(block_out=vae_blocks, layers_per_block=cfg.vae_layers)
    refiner = FacialRefiner(latent_size=latent, width=cfg.width,
                            enc_nums=parse_ints(cfg.enc_depths),
                            mid_num=cfg.mid_depth,
                            dec_nums=parse_ints(cfg.dec_depths),
                            idc_stage_sizes=parse_ints(cfg.idc_stages))
    return cr, vae, refiner, DiffusionSchedule.create(), latent


def refiner_stack_avals(cfg, cr, vae, refiner, latent, key,
                        cast_bf16=False):
    """ShapeDtypeStruct pytree matching load_refiner_stack's sample_vars
    (optionally with f32 leaves cast to bf16) — host-side tracing only,
    for aval-based AOT warm-up concurrent with the real init."""
    import jax
    import jax.numpy as jnp

    def cast_tree(t):
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape,
                jnp.bfloat16 if (cast_bf16 and s.dtype == jnp.float32)
                else s.dtype), t)

    rv = cast_tree(jax.eval_shape(
        lambda k: refiner.init(
            k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
            jnp.zeros((1, cfg.size, cfg.size, 3)),
            jnp.zeros((1, latent, latent, 4)), train=False), key))
    cr_a = cast_tree(jax.eval_shape(
        cr.init, key,
        jax.ShapeDtypeStruct((1, cfg.size, cfg.size, 3),
                             jnp.float32)))["params"]
    vae_a = cast_tree(jax.eval_shape(
        vae.init, key,
        jax.ShapeDtypeStruct((1, cfg.size, cfg.size, 3),
                             jnp.float32)))["params"]
    return {"refiner": {"params": rv["params"],
                        "batch_stats": rv.get("batch_stats", {})},
            "cr": cr_a, "vae": vae_a}


def load_refiner_stack(cfg, key, models=None):
    """Build the CR / VAE / FacialRefiner stack from cfg's model-size knobs
    and load weights from its ckpt fields (orbax dir, torch .pt /
    .safetensors via the importers, or random init with a warning).

    cfg needs: size, width, enc_depths, mid_depth, dec_depths, idc_stages,
    cr_width, cr_enc_depths, cr_mid_depth, vae_blocks, vae_layers,
    refiner_ckpt, cr_ckpt, vae_ckpt. Shared by `test_refiner` and `serve`.
    Returns (cr, vae, refiner, schedule, sample_vars, latent).
    """
    import jax
    import jax.numpy as jnp

    from hifidiff_tpu.train.checkpoint import (
        compose_refiner_params,
        restore_state,
    )
    from hifidiff_tpu.utils import torch_import as ti

    cr, vae, refiner, schedule, latent = (models if models is not None
                                          else build_refiner_models(cfg))

    init_vars = jax.jit(lambda k: refiner.init(
        k, jnp.zeros((1, latent, latent, 4)), jnp.zeros((1,)),
        jnp.zeros((1, cfg.size, cfg.size, 3)),
        jnp.zeros((1, latent, latent, 4)), train=False))(key)
    if cfg.refiner_ckpt:
        if cfg.refiner_ckpt.endswith(".safetensors"):
            variables = compose_refiner_params(
                jax.device_get(init_vars), denoiser_ckpt=cfg.refiner_ckpt,
                enc_nums=parse_ints(cfg.enc_depths), mid_num=cfg.mid_depth,
                dec_nums=parse_ints(cfg.dec_depths))
        else:
            st = restore_state(cfg.refiner_ckpt)["state"]
            variables = {"params": st["params"],
                         "batch_stats": st["batch_stats"]}
    else:
        print("[warn] random refiner weights")
        variables = {"params": init_vars["params"],
                     "batch_stats": init_vars.get("batch_stats", {})}

    if cfg.cr_ckpt:
        cr_params = ti.cr_params(ti.load_torch_file(cfg.cr_ckpt)) \
            if cfg.cr_ckpt.endswith((".pt", ".pth", ".safetensors")) \
            else restore_state(cfg.cr_ckpt)["state"]["params"]
    else:
        print("[warn] random CR weights")
        cr_params = jax.jit(cr.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]
    vae_params = load_vae_params(vae, cfg.vae_ckpt, key, cfg.size)

    sample_vars = {"refiner": variables, "cr": cr_params, "vae": vae_params}
    return cr, vae, refiner, schedule, sample_vars, latent
