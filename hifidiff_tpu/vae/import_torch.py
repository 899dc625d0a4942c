"""diffusers AutoencoderKL checkpoint -> hifidiff_tpu VAE param tree.

Maps the HF `vae/diffusion_pytorch_model.safetensors` naming (the checkpoint
the reference pulls via `AutoencoderKL.from_pretrained(...,
subfolder="vae")`, `pretrain_denoiser.py:256-259`) onto our flax tree,
transposing conv kernels OIHW->HWIO and attention projections (out,in) ->
(in,out). Handles both diffusers attention layouts: `to_q` as Linear
((C, C) 2-D) or the older 1x1-conv layout ((C, C, 1, 1)).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray


def _conv(sd: Mapping[str, Array], p: str) -> Dict:
    return {
        "kernel": np.transpose(np.asarray(sd[f"{p}.weight"]), (2, 3, 1, 0)),
        "bias": np.asarray(sd[f"{p}.bias"]),
    }


def _gn(sd: Mapping[str, Array], p: str) -> Dict:
    return {"scale": np.asarray(sd[f"{p}.weight"]),
            "bias": np.asarray(sd[f"{p}.bias"])}


def _attn_proj(sd: Mapping[str, Array], p: str) -> Dict:
    w = np.asarray(sd[f"{p}.weight"])
    if w.ndim == 4:  # legacy 1x1-conv layout
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": np.asarray(sd[f"{p}.bias"])}


def _resnet(sd: Mapping[str, Array], p: str) -> Dict:
    out = {
        "norm1": _gn(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.conv_shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{p}.conv_shortcut")
    return out


def _mid(sd: Mapping[str, Array], p: str) -> Dict:
    a = f"{p}.attentions.0"
    if f"{a}.to_q.weight" in sd:
        q, k, v, o = "to_q", "to_k", "to_v", "to_out.0"
        gn = "group_norm"
    else:  # very old ldm naming
        q, k, v, o = "q", "k", "v", "proj_out"
        gn = "norm"
    return {
        "res0": _resnet(sd, f"{p}.resnets.0"),
        "res1": _resnet(sd, f"{p}.resnets.1"),
        "attn": {
            "norm": _gn(sd, f"{a}.{gn}"),
            "to_q": _attn_proj(sd, f"{a}.{q}"),
            "to_k": _attn_proj(sd, f"{a}.{k}"),
            "to_v": _attn_proj(sd, f"{a}.{v}"),
            "to_out": _attn_proj(sd, f"{a}.{o}"),
        },
    }


def vae_params_from_torch(sd: Mapping[str, Array], num_blocks: int = 4,
                          layers_per_block: int = 2) -> Dict:
    """Full AutoencoderKL param tree from a diffusers state dict."""
    enc: Dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid": _mid(sd, "encoder.mid_block"),
        "norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block):
            enc[f"down{i}_res{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < num_blocks - 1:
            enc[f"down{i}_downconv"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: Dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid": _mid(sd, "decoder.mid_block"),
        "norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up{i}_res{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < num_blocks - 1:
            dec[f"up{i}_upconv"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
