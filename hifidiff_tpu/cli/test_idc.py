"""IDC identity-verification eval CLI (reference `test_idc.py`).

Per batch: sim_hf = cos(IDC(CR(lr)), IDC(gt)), sim_ck = cos(IDC(CR(lr)),
IDC(other)); the reference counts a BATCH correct iff mean(sim_hf) >
mean(sim_ck) (`test_idc.py:23-39`) — reported here as `batch_accuracy`,
alongside the per-sample accuracy (`sample_accuracy`).

    python -m hifidiff_tpu.cli.test_idc --cr-ckpt ... --idc-ckpt ... \
        --dataroot /data/kface
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.data import KFaceIDCDataset, Loader
from hifidiff_tpu.eval.metrics import identity_cosine
from hifidiff_tpu.models import CoarseRestoration, IDCEncoder
from hifidiff_tpu.train.checkpoint import restore_state


@dataclasses.dataclass
class Config:
    dataroot: str = ""
    cr_ckpt: str = ""
    idc_ckpt: str = ""
    batch_size: int = 8
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


def main(argv=None) -> dict:
    cfg = parse_config(Config, argv, "IDC identity verification eval")
    key = jax.random.PRNGKey(cfg.seed)
    from hifidiff_tpu.cli.common import parse_ints
    from hifidiff_tpu.utils import torch_import as ti

    cr_enc = parse_ints(cfg.cr_enc_depths)
    cr = CoarseRestoration(width=cfg.cr_width, resolution=cfg.size,
                           enc_nums=cr_enc, mid_num=cfg.cr_mid_depth,
                           dec_nums=(2,) * len(cr_enc))
    if cfg.cr_ckpt:
        cr_params = ti.cr_params(ti.load_torch_file(cfg.cr_ckpt)) \
            if cfg.cr_ckpt.endswith((".pt", ".pth", ".safetensors")) \
            else restore_state(cfg.cr_ckpt)["state"]["params"]
    else:
        print("[warn] random CR weights")
        cr_params = jax.jit(cr.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]

    idc = IDCEncoder(stage_sizes=parse_ints(cfg.idc_stages))
    if cfg.idc_ckpt:
        if cfg.idc_ckpt.endswith((".pt", ".pth", ".safetensors")):
            p, s = ti.resnet50_params(ti.load_torch_file(cfg.idc_ckpt))
        else:
            st = restore_state(cfg.idc_ckpt)["state"]
            p, s = st["params"], st["batch_stats"]
    else:
        print("[warn] random IDC weights")
        v = jax.jit(lambda k: idc.init(
            k, jnp.zeros((1, cfg.size, cfg.size, 3)), train=False))(key)
        p, s = v["params"], v["batch_stats"]

    from hifidiff_tpu.cli.common import smoke_datasets

    # "pos" = different-photo positive (procedural family; real datasets'
    # gt already IS a separate photograph of the identity)
    smoke = smoke_datasets(cfg, ("lr", "pos", "other"))
    if smoke is not None:
        ds = smoke[1]   # held-out split (never-trained poses)
    else:
        ds = KFaceIDCDataset(cfg.dataroot, split="test", size=cfg.size)
    loader = Loader(ds, cfg.batch_size, shuffle=False)

    @jax.jit
    def embeddings(batch):
        face = cr.apply({"params": cr_params}, batch["lr"])
        v = {"params": p, "batch_stats": s}
        pos = batch["pos"] if "pos" in batch else batch["gt"]
        return (idc.apply(v, face, train=False),
                idc.apply(v, pos, train=False),
                idc.apply(v, batch["other"], train=False))

    batch_correct, sample_correct, n_samples = 0, 0, 0
    n_batches = 0
    for batch in loader:
        a, pos, neg = embeddings({k: jnp.asarray(v)
                                  for k, v in batch.items()})
        sim_hf = np.asarray(identity_cosine(a, pos))
        sim_ck = np.asarray(identity_cosine(a, neg))
        batch_correct += int(sim_hf.mean() > sim_ck.mean())
        sample_correct += int((sim_hf > sim_ck).sum())
        n_samples += len(sim_hf)
        n_batches += 1
        print(f"({n_batches}/{len(loader)}) CR-HF vs. CR-CK: "
              f"{sim_hf.mean():.4f} {sim_ck.mean():.4f} "
              f"{'OK' if sim_hf.mean() > sim_ck.mean() else 'X'}")

    out = {"batch_accuracy": batch_correct / max(1, n_batches),
           "sample_accuracy": sample_correct / max(1, n_samples)}
    print(f"test accuracy (batch-mean, reference convention): "
          f"{out['batch_accuracy']:.4f}")
    print(f"test accuracy (per-sample): {out['sample_accuracy']:.4f}")
    return out


if __name__ == "__main__":
    main()
