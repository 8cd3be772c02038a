"""Flax variables -> PyTorch state_dict exporter (the reverse parity loop).

Inverse of :mod:`torch_import`: converts this framework's param/batch_stats
pytrees into a flat name -> numpy dict whose keys and layouts match the
reference module trees (train_unet_segmentation.py:221-250 UNet /
train_cswinunet_segmentation.py:489-688 CSWinTransformer), so a reference
user can take weights trained here and ``model.load_state_dict({k:
torch.from_numpy(v) for k, v in exported.items()}, strict=True)`` on the
original scripts.  Layout conversions (all exact inverses of the importer,
verified by round-trip and torch-forward parity tests):

* HWIO conv kernel (kh, kw, I, O)      -> Conv2d (O, I, kh, kw)
* HWIO depthwise   (kh, kw, 1, C)      -> Conv2d (C, 1, kh, kw)
* conv-transpose   (kh, kw, I, O)      -> spatial flip -> ConvTranspose2d
                                          (I, O, kh, kw)
* Linear kernel    (I, O)              -> (O, I)
* BN/LN scale/bias -> weight/bias; batch_stats -> running_mean/running_var
  (+ ``num_batches_tracked`` zeros, required by strict load_state_dict)

This module never imports torch.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv_w(k) -> np.ndarray:
    # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.transpose(_np(k), (3, 2, 0, 1))


def _convT_w(k) -> np.ndarray:
    # inverse of torch_import._convT_w: (kh, kw, I, O) -> (I, O, kh, kw)
    # then un-flip the spatial axes
    return np.transpose(_np(k), (2, 3, 0, 1))[:, :, ::-1, ::-1].copy()


def _linear_w(k) -> np.ndarray:
    return np.transpose(_np(k), (1, 0))


def _conv(out: Dict[str, np.ndarray], p: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _conv_w(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _linear(out, p: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _linear_w(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _norm(out, p: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np(p["scale"])
    out[f"{prefix}.bias"] = _np(p["bias"])


def _bn_stats(out, s: dict, prefix: str) -> None:
    out[f"{prefix}.running_mean"] = _np(s["mean"])
    out[f"{prefix}.running_var"] = _np(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


# ---------------------------------------------------------------- UNet ----

def _double_conv(out, p: dict, s: dict, prefix: str) -> None:
    """torch Sequential indices: 0 conv1, 1 bn1, 3 conv2, 4 bn2
    (train_unet_segmentation.py:181-188)."""
    _conv(out, p["conv1"], f"{prefix}.0")
    _norm(out, p["bn1"], f"{prefix}.1")
    _bn_stats(out, s["bn1"], f"{prefix}.1")
    _conv(out, p["conv2"], f"{prefix}.3")
    _norm(out, p["bn2"], f"{prefix}.4")
    _bn_stats(out, s["bn2"], f"{prefix}.4")


def export_unet_variables(variables: dict) -> Dict[str, np.ndarray]:
    """Flax UNet variables {'params', 'batch_stats'} -> reference UNet
    state_dict (train_unet_segmentation.py:221-250)."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}
    _double_conv(out, params["inc"], stats["inc"], "inc.double_conv")
    for i in range(1, 5):
        _double_conv(out, params[f"down{i}"]["conv"],
                     stats[f"down{i}"]["conv"],
                     f"down{i}.maxpool_conv.1.double_conv")
    for i in range(1, 5):
        up = params[f"up{i}"]
        out[f"up{i}.up.weight"] = _convT_w(up["up"]["kernel"])
        out[f"up{i}.up.bias"] = _np(up["up"]["bias"])
        _double_conv(out, up["conv"], stats[f"up{i}"]["conv"],
                     f"up{i}.conv.double_conv")
    _conv(out, params["outc"], "outc")
    return out


# -------------------------------------------------------------- CSWin ----

def _mlp(out, p: dict, prefix: str) -> None:
    _linear(out, p["fc1"], f"{prefix}.fc1")
    _linear(out, p["fc2"], f"{prefix}.fc2")


def _lepe_attn(out, p: dict, prefix: str) -> None:
    # (kh, kw, 1, C) -> (C, 1, kh, kw)
    out[f"{prefix}.get_v.weight"] = np.transpose(
        _np(p["get_v_kernel"]), (3, 2, 0, 1))
    out[f"{prefix}.get_v.bias"] = _np(p["get_v_bias"])


def _cswin_block(out, p: dict, prefix: str) -> None:
    _norm(out, p["norm1"], f"{prefix}.norm1")
    _norm(out, p["norm2"], f"{prefix}.norm2")
    _linear(out, p["qkv"], f"{prefix}.qkv")
    _linear(out, p["proj"], f"{prefix}.proj")
    _mlp(out, p["mlp"], f"{prefix}.mlp")
    _lepe_attn(out, p["attn0"], f"{prefix}.attns.0")
    if "attn1" in p:
        _lepe_attn(out, p["attn1"], f"{prefix}.attns.1")


def _carafe(out, p: dict, prefix: str) -> None:
    _conv(out, p["down"], f"{prefix}.down")
    _conv(out, p["encoder"], f"{prefix}.encoder")
    _conv(out, p["out"], f"{prefix}.out")


def export_cswin_variables(variables: dict,
                           depth: Sequence[int] = (1, 2, 9, 1),
                           ) -> Dict[str, np.ndarray]:
    """Flax CSWinUNet variables -> reference CSWinTransformer state_dict
    (train_cswinunet_segmentation.py:489-688)."""
    params = variables["params"]
    if any(k.endswith("_scan") for k in params):
        # scan_stages=True training run: unstack to the unrolled layout the
        # reference's per-block names require
        from cswin_simam_unet_tpu.models.scan_params import (
            unstack_scanned_params,
        )
        params = unstack_scanned_params(params)
    out: Dict[str, np.ndarray] = {}
    _conv(out, params["embed_conv"], "stage1_conv_embed.0")
    _norm(out, params["embed_norm"], "stage1_conv_embed.2")
    for s in range(4):
        for i in range(depth[s]):
            _cswin_block(out, params[f"stage{s + 1}_{i}"], f"stage{s + 1}.{i}")
        if s != 3:
            _conv(out, params[f"merge{s + 1}"]["conv"], f"merge{s + 1}.conv")
            _norm(out, params[f"merge{s + 1}"]["norm"], f"merge{s + 1}.norm")
    _norm(out, params["norm"], "norm")
    for i in range(depth[3]):
        _cswin_block(out, params[f"stage_up4_{i}"], f"stage_up4.{i}")
    for s, ups in ((2, "upsample4"), (1, "upsample3"), (0, "upsample2")):
        _carafe(out, params[ups], ups)
        _linear(out, params[f"concat_linear{s + 2}"], f"concat_linear{s + 2}")
        for i in range(depth[s]):
            _cswin_block(out, params[f"stage_up{s + 1}_{i}"],
                         f"stage_up{s + 1}.{i}")
    _norm(out, params["norm_up"], "norm_up")
    _carafe(out, params["upsample1"], "upsample1")
    out["output.weight"] = _conv_w(params["output"]["kernel"])
    return out
