"""PyTorch-checkpoint importer: reference state_dicts -> hifidiff_tpu pytrees.

Converts checkpoints produced by the reference training scripts (torch `.pt`
dicts, `accelerator.save_state` dirs, safetensors — SURVEY.md §5) into our
flax variable trees, applying the layout transposes at the boundary:
  * conv kernels  OIHW -> HWIO
  * linear kernels (out, in) -> (in, out)
  * per-channel (1, C, 1, 1) scales -> (C,)
  * BatchNorm weight/bias -> params.scale/bias; running stats -> batch_stats

Name maps mirror the reference module trees:
  CR        `models/cr/model.py:33-88`     (intro/encoders/middle/decoders/outro)
  Denoiser  `models/denoiser/model.py:32-134`
  FusedDen. `models/denoiser/model.py:137-266` (+hcas, idc_conv)
  FPG       `models/fpg/model.py:7-64`
  IDC       `models/idc/model.py:102-166`

Inputs are dicts of numpy arrays (call `.numpy()` on torch tensors or use
`safetensors.numpy.load_file`); no torch dependency here.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


Array = np.ndarray
StateDict = Mapping[str, Array]


def _k(prefix: str, name: str) -> str:
    return name if not prefix else f"{prefix}.{name}"


def _try(dst: Dict, key: str, fn, *args) -> None:
    """strict=False import helper: assign dst[key] = fn(*args), skipping
    silently when the checkpoint lacks the needed tensors (torch
    `load_state_dict(strict=False)` semantics — the reference leans on this
    to feed BOTH the denoiser and the FPG from one stage-3 checkpoint,
    `models/refiner.py:22-25`)."""
    try:
        dst[key] = fn(*args)
    except KeyError:
        pass


def split_by_prefix(sd: StateDict, prefixes=("idc", "denoiser", "fpg")):
    """Split a composite state dict (e.g. a saved FacialRefiner,
    `test_refiner.py:162-164`) into per-submodule dicts keyed by prefix."""
    out = {p: {} for p in prefixes}
    for k, v in sd.items():
        head, _, rest = k.partition(".")
        if head in out and rest:
            out[head][rest] = v
    return out


def _conv(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.transpose(np.asarray(sd[_k(prefix, "weight")]),
                                  (2, 3, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd[_k(prefix, "bias")])
    return {"conv": out}


def _dense(sd: StateDict, prefix: str, bias: bool = True) -> Dict:
    out = {"kernel": np.asarray(sd[_k(prefix, "weight")]).T}
    if bias:
        out["bias"] = np.asarray(sd[_k(prefix, "bias")])
    return {"dense": out}


def _ln2d(sd: StateDict, prefix: str) -> Dict:
    return {
        "weight": np.asarray(sd[_k(prefix, "weight")]),
        "bias": np.asarray(sd[_k(prefix, "bias")]),
    }


def _bn(sd: StateDict, prefix: str) -> Tuple[Dict, Dict]:
    params = {
        "scale": np.asarray(sd[_k(prefix, "weight")]),
        "bias": np.asarray(sd[_k(prefix, "bias")]),
    }
    stats = {
        "mean": np.asarray(sd[_k(prefix, "running_mean")]),
        "var": np.asarray(sd[_k(prefix, "running_var")]),
    }
    return params, stats


def _chan(sd: StateDict, key: str) -> Array:
    return np.asarray(sd[key]).reshape(-1)


def naf_block_params(sd: StateDict, p: str) -> Dict:
    """One NAFBlock (`models/cr/naf.py:23-126`). p = torch prefix."""
    return {
        "norm1": _ln2d(sd, _k(p, "norm1")),
        "norm2": _ln2d(sd, _k(p, "norm2")),
        "conv1": _conv(sd, _k(p, "conv1")),
        "conv2": _conv(sd, _k(p, "conv2")),
        "conv3": _conv(sd, _k(p, "conv3")),
        "conv4": _conv(sd, _k(p, "conv4")),
        "conv5": _conv(sd, _k(p, "conv5")),
        "sca": {"conv": _conv(sd, _k(p, "sca.1"))},
        "beta": _chan(sd, _k(p, "beta")),
        "gamma": _chan(sd, _k(p, "gamma")),
    }


def conditional_naf_block_params(sd: StateDict, p: str) -> Dict:
    """ConditionalNAFBlock (`models/denoiser/conditional_naf.py:13-136`)."""
    out = naf_block_params(sd, p)
    out["time_proj"] = _dense(sd, _k(p, "mlp.1"))
    return out


def stn_block_params(sd: StateDict, p: str) -> Dict:
    """STNBlock (`models/cr/stn.py:9-52`)."""
    return {
        "loc_conv1": _conv(sd, _k(p, "localization.0")),
        "loc_conv2": _conv(sd, _k(p, "localization.3")),
        "fc1": _dense(sd, _k(p, "fc_loc.0")),
        "fc2": _dense(sd, _k(p, "fc_loc.2")),
    }


def hca_params(sd: StateDict, p: str) -> Tuple[Dict, Dict]:
    """HybridCrossAttention (`models/fpg/hca.py:5-31`) -> (params, stats)."""
    bn1_p, bn1_s = _bn(sd, _k(p, "spatial_mlp.1"))
    bn2_p, bn2_s = _bn(sd, _k(p, "spatial_mlp.4"))
    bnf_p, bnf_s = _bn(sd, _k(p, "fused_mlp.1"))
    params = {
        "ch_fc1": _dense(sd, _k(p, "channel_mlp.0")),
        "ch_fc2": _dense(sd, _k(p, "channel_mlp.2")),
        "sp_conv1": _conv(sd, _k(p, "spatial_mlp.0")),
        "sp_conv2": _conv(sd, _k(p, "spatial_mlp.3")),
        "fused_conv": _conv(sd, _k(p, "fused_mlp.0")),
        "sp_bn1": bn1_p,
        "sp_bn2": bn2_p,
        "fused_bn": bnf_p,
    }
    stats = {"sp_bn1": bn1_s, "sp_bn2": bn2_s, "fused_bn": bnf_s}
    return params, stats


def _naf_stn_stage(sd: StateDict, p: str, num_naf: int,
                   sampling: str | None) -> Dict:
    out = {f"naf{j}": naf_block_params(sd, _k(p, f"nfbs.{j}"))
           for j in range(num_naf)}
    out["stn"] = stn_block_params(sd, _k(p, "stn"))
    if sampling == "down":
        out["down"] = _conv(sd, _k(p, "sampling"))
    elif sampling == "up":
        out["up"] = _conv(sd, _k(p, "sampling.0"), bias=False)
    return out


def cr_params(sd: StateDict, enc_nums=(2, 2, 4, 8), mid_num=8,
              dec_nums=(2, 2, 2, 2)) -> Dict:
    """CoarseRestoration (`models/cr/model.py:33-88`)."""
    params = {
        "intro": _conv(sd, "intro"),
        "outro": _conv(sd, "outro"),
        "mid": _naf_stn_stage(sd, "middle_blocks", mid_num, None),
    }
    for i, n in enumerate(enc_nums):
        params[f"enc{i}"] = _naf_stn_stage(sd, f"encoders.{i}", n, "down")
    for i, n in enumerate(dec_nums):
        params[f"dec{i}"] = _naf_stn_stage(sd, f"decoders.{i}", n, "up")
    return params


def _time_mlp(sd: StateDict, p: str = "time_mlp") -> Dict:
    return {"fc1": _dense(sd, f"{p}.1"), "fc2": _dense(sd, f"{p}.3")}


def denoiser_params(sd: StateDict, enc_nums=(2, 2, 4, 8), mid_num=8,
                    dec_nums=(2, 2, 2, 2)) -> Dict:
    """Denoiser (`models/denoiser/model.py:32-134`). Tolerates missing keys
    (strict=False) so partial checkpoints overlay cleanly."""
    params: Dict = {}
    _try(params, "time_mlp", _time_mlp, sd)
    _try(params, "intro", _conv, sd, "intro")
    _try(params, "ending", _conv, sd, "ending")
    for i, n in enumerate(enc_nums):
        for b in range(n):
            _try(params, f"enc{i}_blk{b}", conditional_naf_block_params,
                 sd, f"encoders.{i}.{b}")
        _try(params, f"down{i}", _conv, sd, f"downs.{i}")
    for b in range(mid_num):
        _try(params, f"mid_blk{b}", conditional_naf_block_params,
             sd, f"middle_blks.{b}")
    for i, n in enumerate(dec_nums):
        _try(params, f"up{i}", _conv, sd, f"ups.{i}.0", False)
        for b in range(n):
            _try(params, f"dec{i}_blk{b}", conditional_naf_block_params,
                 sd, f"decoders.{i}.{b}")
    return params


def fused_denoiser_params(sd: StateDict, enc_nums=(2, 2, 4, 8), mid_num=8,
                          dec_nums=(2, 2, 2, 2)) -> Tuple[Dict, Dict]:
    """FusedDenoiser (`models/denoiser/model.py:137-266`) -> (params, stats).

    The reference's 1x1 `idc_conv` over a (B, 2048, 1, 1) tensor maps to our
    Dense `idc_proj`: kernel = conv weight squeezed + transposed.
    """
    params = denoiser_params(sd, enc_nums, mid_num, dec_nums)
    if "idc_conv.weight" in sd:
        w = np.asarray(sd["idc_conv.weight"])  # (out, 2048, 1, 1)
        params["idc_proj"] = {"dense": {
            "kernel": w[:, :, 0, 0].T,
            "bias": np.asarray(sd["idc_conv.bias"]),
        }}
    stats: Dict = {}
    for i in range(len(dec_nums) + 1):
        try:
            p, s = hca_params(sd, f"hcas.{i}")
        except KeyError:
            continue
        params[f"hca{i}"] = p
        stats[f"hca{i}"] = s
    return params, stats


def fpg_params(sd: StateDict, enc_nums=(2, 2, 4, 8)) -> Dict:
    """FacialPriorGuidance (`models/fpg/model.py:7-64`). Missing keys skip
    (strict=False): when fed a stage-3 Denoiser checkpoint the reference
    populates FPG's intro/encoder-conv/down weights from the *denoiser's*
    same-named, same-shaped tensors and leaves the prior convs at init
    (`models/refiner.py:25`) — reproduced here exactly."""
    params: Dict = {}
    _try(params, "intro", _conv, sd, "intro")
    _try(params, "prior_conv0", _conv, sd, "convs.0.0", False)
    for i, n in enumerate(enc_nums):
        for b in range(n):
            _try(params, f"enc{i}_blk{b}", naf_block_params, sd,
                 f"encoders.{i}.{b}")
        _try(params, f"down{i}", _conv, sd, f"downs.{i}")
        _try(params, f"up{i}", _conv, sd, f"convs.{i + 1}.0", False)
    return params


def resnet50_params(sd: StateDict,
                    stage_sizes=(3, 4, 6, 3)) -> Tuple[Dict, Dict]:
    """IDC ResNet-50 (`models/idc/model.py:102-166`) -> (params, stats)."""
    stem_bn_p, stem_bn_s = _bn(sd, "batch_norm1")
    params = {"stem_conv": _conv(sd, "conv1", bias=False),
              "stem_bn": stem_bn_p}
    stats = {"stem_bn": stem_bn_s}
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            tp = f"layer{stage + 1}.{b}"
            name = f"layer{stage + 1}_block{b}"
            blk_p: Dict = {}
            blk_s: Dict = {}
            for ci in (1, 2, 3):
                blk_p[f"conv{ci}"] = _conv(sd, f"{tp}.conv{ci}")
                bn_p, bn_s = _bn(sd, f"{tp}.batch_norm{ci}")
                blk_p[f"bn{ci}"] = bn_p
                blk_s[f"bn{ci}"] = bn_s
            if f"{tp}.i_downsample.0.weight" in sd:
                blk_p["proj_conv"] = _conv(sd, f"{tp}.i_downsample.0")
                bn_p, bn_s = _bn(sd, f"{tp}.i_downsample.1")
                blk_p["proj_bn"] = bn_p
                blk_s["proj_bn"] = bn_s
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def load_torch_file(path: str) -> Dict[str, Array]:
    """Load a torch `.pt`/`.pth` checkpoint or `.safetensors` file into a
    flat numpy state dict. Handles the reference's `{..., "model_state_dict"}`
    wrapper (`train_cr.py:193-201`, `pretrain_idc.py:138-146`)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}
