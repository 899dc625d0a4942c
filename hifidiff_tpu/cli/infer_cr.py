"""CR single-image / batch inference CLI (reference `infer_cr.py`).

Single-image path (`infer_cr.py:52-56`): open image, PIL-bicubic 32x32 down
then 128x128 up, run CR, save. Batch mode runs a whole dataset and dumps
`[lr|pred|gt]` grids with cr_loss (the reference's commented-out
`infer_loop`, `:15-33`).

    python -m hifidiff_tpu.cli.infer_cr --ckpt cr.pt --image face.jpg \
        --output out.png
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hifidiff_tpu.cli.common import parse_config
from hifidiff_tpu.models import CoarseRestoration
from hifidiff_tpu.train.checkpoint import restore_state
from hifidiff_tpu.utils.logging import save_image_grid


@dataclasses.dataclass
class Config:
    ckpt: str = ""
    image: str = ""             # single-image mode
    dataroot: str = ""          # batch mode over K-Face val split
    split: str = "val"
    batch_size: int = 8
    output: str = "cr_output.png"
    out_dir: str = "output/infer_cr"
    size: int = 128
    width: int = 32
    enc_depths: str = "2,2,4,8"
    mid_depth: int = 8
    seed: int = 0


def load_cr(cfg: Config, key):
    from hifidiff_tpu.cli.common import parse_ints

    enc_nums = parse_ints(cfg.enc_depths)
    model = CoarseRestoration(width=cfg.width, resolution=cfg.size,
                              enc_nums=enc_nums, mid_num=cfg.mid_depth,
                              dec_nums=(2,) * len(enc_nums))
    if cfg.ckpt.endswith((".pt", ".pth", ".safetensors")):
        from hifidiff_tpu.utils import torch_import as ti

        params = ti.cr_params(ti.load_torch_file(cfg.ckpt))
    elif cfg.ckpt:
        params = restore_state(cfg.ckpt)["state"]["params"]
    else:
        print("[warn] no --ckpt: random CR weights")
        params = jax.jit(model.init)(
            key, jnp.zeros((1, cfg.size, cfg.size, 3)))["params"]
    return model, params


def infer_batch(cfg: Config, model, params) -> None:
    """Dataset sweep with cr_loss + [lr|pred|gt] dumps (the reference's
    `infer_loop`, `infer_cr.py:15-33`)."""
    import os

    from hifidiff_tpu.data import KFaceDataset, Loader
    from hifidiff_tpu.train.losses import cr_loss
    from hifidiff_tpu.utils.logging import side_by_side

    ds = KFaceDataset(cfg.dataroot, split=cfg.split, size=cfg.size)
    loader = Loader(ds, cfg.batch_size, shuffle=False)
    apply = jax.jit(model.apply)
    losses = []
    for i, batch in enumerate(loader):
        pred = apply({"params": params}, jnp.asarray(batch["lr"]))
        losses.append(float(cr_loss(pred, jnp.asarray(batch["gt"]),
                                    jnp.asarray(batch["patches"]))))
        save_image_grid(
            side_by_side(batch["lr"], np.asarray(jnp.clip(pred, 0, 1)),
                         batch["gt"]),
            os.path.join(cfg.out_dir, f"batch_{i}.png"))
        print(f"({i + 1}/{len(loader)}) cr_loss={losses[-1]:.5f}",
              flush=True)
    print(f"mean cr_loss: {np.mean(losses):.5f}")


def main(argv=None) -> None:
    cfg = parse_config(Config, argv, "CR inference")
    key = jax.random.PRNGKey(cfg.seed)
    model, params = load_cr(cfg, key)

    if cfg.dataroot and not cfg.image:
        infer_batch(cfg, model, params)
        return

    assert cfg.image, "--image or --dataroot is required"
    bic = Image.Resampling.BICUBIC
    img = Image.open(cfg.image).convert("RGB")
    img = img.resize((32, 32), bic).resize((cfg.size, cfg.size), bic)
    x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]

    pred = jax.jit(model.apply)({"params": params}, x)
    save_image_grid(np.asarray(jnp.clip(pred, 0, 1)), cfg.output, nrow=1)
    print(f"saved {cfg.output}")


if __name__ == "__main__":
    main()
