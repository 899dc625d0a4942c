"""Checkpoint/resume: one orbax format + torch-checkpoint composition.

Replaces the reference's three coexisting formats (torch dicts,
`accelerator.save_state` dirs, safetensors — SURVEY.md §5) with a single
orbax `CheckpointManager` layout: step-stamped directories holding
{params, batch_stats, opt_state, step, PRNG key}, restored atomically
(the reference's fragile epoch-from-dirname parsing,
`pretrain_denoiser.py:296-302`, becomes `latest_step()`).

`compose_refiner_params` mirrors the reference's composition-time wiring
(`models/refiner.py:18-25`): IDC weights from a stage-2 torch `.pt`,
denoiser+FPG both populated `strict=False`-style from one stage-3
checkpoint (keys that exist are loaded, the rest keep their fresh init).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper around orbax for train-state checkpointing.

    `create=False` opens the directory read-only: no mkdir side effects
    on a mistyped restore path (use `restore_state` for restores)."""

    def __init__(self, directory: str, max_to_keep: int = 5,
                 create: bool = True):
        self.directory = os.path.abspath(directory)
        if create:
            os.makedirs(self.directory, exist_ok=True)
        elif not os.path.isdir(self.directory):
            raise FileNotFoundError(
                f"checkpoint directory does not exist: {self.directory}")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=create),
        )

    def save(self, step: int, state: Any, extra: Optional[Dict] = None,
             wait: bool = False) -> None:
        last = self._mgr.latest_step()
        if last is not None and step <= last:
            # orbax keeps the EXISTING step directory and skips the save —
            # silently stale weights on a fresh rerun into an old ckpt dir
            # (cost one bit-identical-eval mystery in r3). Be loud.
            import warnings

            warnings.warn(
                f"checkpoint step {step} <= existing latest step {last} in "
                f"{self.directory}; orbax keeps the existing checkpoint. "
                f"Delete the directory for a fresh run, or --resume.",
                stacklevel=2)
        payload = {"state": state}
        if extra:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                template: Optional[Any] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore({"state": template}))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_state(directory: str, step: Optional[int] = None) -> Dict:
    """Restore `{"state": ..., ...}` from an orbax directory, read-only.

    A clear error for the two easy mistakes — a path that doesn't exist,
    or one that exists but holds no step-stamped checkpoint (e.g. pointing
    one level up at `.../ckpt` instead of `.../ckpt/cr/<name>`) — instead
    of the opaque `None["state"]` TypeError, and without mkdir-ing the
    bogus path as a side effect."""
    out = CheckpointManager(directory, create=False).restore(step)
    if out is None:
        raise FileNotFoundError(
            f"no orbax checkpoint found under {os.path.abspath(directory)}"
            " (expected step-stamped subdirectories; check the path)")
    return out


def _merge_strict_false(init_tree: Dict, loaded: Dict) -> Dict:
    """Overlay `loaded` onto `init_tree`, keeping init values for missing
    keys and ignoring loaded keys that don't exist in the template — torch
    `load_state_dict(strict=False)` semantics."""
    out = {}
    for k, v in init_tree.items():
        if k in loaded:
            if isinstance(v, dict):
                out[k] = _merge_strict_false(v, loaded[k])
            else:
                lv = np.asarray(loaded[k])
                if lv.shape != np.shape(v):
                    out[k] = v  # shape mismatch -> keep init (strict=False)
                else:
                    out[k] = lv
        else:
            out[k] = v
    return out


def compose_refiner_params(
    refiner_init_vars: Dict,
    idc_ckpt: Optional[str] = None,
    denoiser_ckpt: Optional[str] = None,
    enc_nums=(2, 2, 4, 8), mid_num=8, dec_nums=(2, 2, 2, 2),
) -> Dict:
    """Build FacialRefiner variables from stage checkpoints.

    Args:
      refiner_init_vars: fresh `refiner.init(...)` variables (template).
      idc_ckpt: torch `.pt` with {"model_state_dict"} from IDC pretraining.
      denoiser_ckpt: safetensors/`.pt` from denoiser pretraining; its keys
        feed BOTH the denoiser and (strict=False) the FPG, like
        `models/refiner.py:22-25`.

    Either path may also be an **orbax checkpoint directory** written by
    our own stage CLIs (`pretrain_idc`, `pretrain_denoiser`) — the native
    stage-2/3 -> stage-4 hand-off needs no torch round trip: the flax
    param trees overlay directly (Denoiser and FusedDenoiser share
    backbone module names; FPG picks up its name/shape overlap
    strict=False, mirroring `models/refiner.py:22-25`).
    """
    from hifidiff_tpu.utils import torch_import as ti

    params = dict(refiner_init_vars["params"])
    stats = dict(refiner_init_vars.get("batch_stats", {}))

    if idc_ckpt and os.path.isdir(idc_ckpt):
        st = restore_state(idc_ckpt)["state"]
        params["idc"] = _merge_strict_false(params["idc"], st["params"])
        if "idc" in stats and st.get("batch_stats"):
            stats["idc"] = _merge_strict_false(stats["idc"],
                                               st["batch_stats"])
    elif idc_ckpt:
        sd = ti.load_torch_file(idc_ckpt)
        p, s = ti.resnet50_params(sd)
        params["idc"] = _merge_strict_false(params["idc"], p)
        if "idc" in stats:
            stats["idc"] = _merge_strict_false(stats["idc"], s)

    if denoiser_ckpt and os.path.isdir(denoiser_ckpt):
        dn = restore_state(denoiser_ckpt)["state"]["params"]
        params["denoiser"] = _merge_strict_false(params["denoiser"], dn)
        params["fpg"] = _merge_strict_false(params["fpg"], dn)
    elif denoiser_ckpt:
        sd = ti.load_torch_file(denoiser_ckpt)
        if any(k.startswith(("denoiser.", "fpg.", "idc.")) for k in sd):
            # a saved FacialRefiner (prefix-namespaced, as consumed by
            # `test_refiner.py:162-164`): route each submodule's keys
            subs = ti.split_by_prefix(sd)
            dn_p, dn_s = ti.fused_denoiser_params(subs["denoiser"],
                                                  enc_nums, mid_num,
                                                  dec_nums)
            fpg_p = ti.fpg_params(subs["fpg"], enc_nums)
            if subs["idc"] and not idc_ckpt:
                p, s = ti.resnet50_params(subs["idc"])
                params["idc"] = _merge_strict_false(params["idc"], p)
                if "idc" in stats:
                    stats["idc"] = _merge_strict_false(stats["idc"], s)
        else:
            # stage-3 denoiser checkpoint: its keys feed BOTH the denoiser
            # and (by name/shape overlap) the FPG, strict=False — the
            # reference's exact composition (`models/refiner.py:22-25`)
            dn_p, dn_s = ti.fused_denoiser_params(sd, enc_nums, mid_num,
                                                  dec_nums)
            fpg_p = ti.fpg_params(sd, enc_nums)
        params["denoiser"] = _merge_strict_false(params["denoiser"], dn_p)
        if "denoiser" in stats and dn_s:
            stats["denoiser"] = _merge_strict_false(stats["denoiser"], dn_s)
        params["fpg"] = _merge_strict_false(params["fpg"], fpg_p)

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out
