"""One-way PyTorch state_dict -> flax variables importer.

Maps reference checkpoints (train_unet_segmentation.py /
train_cswinunet_segmentation.py module trees) onto this framework's flax
param/batch_stats pytrees, converting layouts:

* Conv2d            (O, I, kh, kw)  -> HWIO (kh, kw, I, O)
* depthwise Conv2d  (C, 1, kh, kw)  -> HWIO (kh, kw, 1, C)
* ConvTranspose2d   (I, O, kh, kw)  -> spatial flip -> HWIO (kh, kw, I, O)
  [verified numerically against torch k2/s2]
* Linear            (O, I)          -> (I, O)
* BatchNorm weight/bias -> scale/bias; running stats -> batch_stats
* LayerNorm weight/bias -> scale/bias

Inputs are name -> numpy arrays (call ``{k: v.numpy() for ...}`` on a torch
state_dict first; this module never imports torch).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _depthwise_w(w: np.ndarray) -> np.ndarray:
    # (C, 1, kh, kw) -> (kh, kw, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    # (I, O, kh, kw) -> spatial flip -> (kh, kw, I, O).  torch's
    # ConvTranspose2d is the gradient of a *convolution* (flipped kernel),
    # lax.conv_transpose of a *cross-correlation* — verified numerically.
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _conv_w(sd[f"{prefix}.weight"])}
    if bias:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _linear(sd, prefix: str, bias: bool = True) -> dict:
    out = {"kernel": _linear_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn_stats(sd, prefix: str) -> dict:
    return {"mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"]}


# ---------------------------------------------------------------- UNet ----

def _double_conv(sd, prefix: str):
    """torch Sequential indices: 0 conv1, 1 bn1, 3 conv2, 4 bn2
    (train_unet_segmentation.py:181-188)."""
    params = {
        "conv1": _conv(sd, f"{prefix}.0"),
        "bn1": _norm(sd, f"{prefix}.1"),
        "conv2": _conv(sd, f"{prefix}.3"),
        "bn2": _norm(sd, f"{prefix}.4"),
    }
    stats = {"bn1": _bn_stats(sd, f"{prefix}.1"),
             "bn2": _bn_stats(sd, f"{prefix}.4")}
    return params, stats


def import_unet_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference UNet (train_unet_segmentation.py:221-250) -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}
    params["inc"], stats["inc"] = _double_conv(sd, "inc.double_conv")
    for i in range(1, 5):
        p, s = _double_conv(sd, f"down{i}.maxpool_conv.1.double_conv")
        params[f"down{i}"] = {"conv": p}
        stats[f"down{i}"] = {"conv": s}
    for i in range(1, 5):
        p, s = _double_conv(sd, f"up{i}.conv.double_conv")
        params[f"up{i}"] = {
            "up": {"kernel": _convT_w(sd[f"up{i}.up.weight"]),
                   "bias": sd[f"up{i}.up.bias"]},
            "conv": p,
        }
        stats[f"up{i}"] = {"conv": s}
    params["outc"] = _conv(sd, "outc")
    return {"params": params, "batch_stats": stats}


# -------------------------------------------------------------- CSWin ----

def _mlp(sd, prefix: str) -> dict:
    return {"fc1": _linear(sd, f"{prefix}.fc1"),
            "fc2": _linear(sd, f"{prefix}.fc2")}


def _lepe_attn(sd, prefix: str) -> dict:
    w = sd[f"{prefix}.get_v.weight"]  # (C, 1, 3, 3)
    return {"get_v_kernel": _depthwise_w(w),
            "get_v_bias": sd[f"{prefix}.get_v.bias"]}


def _cswin_block(sd, prefix: str, two_branches: bool) -> dict:
    out = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "qkv": _linear(sd, f"{prefix}.qkv"),
        "proj": _linear(sd, f"{prefix}.proj"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
        "attn0": _lepe_attn(sd, f"{prefix}.attns.0"),
    }
    if two_branches:
        out["attn1"] = _lepe_attn(sd, f"{prefix}.attns.1")
    return out


def _carafe(sd, prefix: str) -> dict:
    return {"down": _conv(sd, f"{prefix}.down"),
            "encoder": _conv(sd, f"{prefix}.encoder"),
            "out": _conv(sd, f"{prefix}.out")}


def import_cswin_state_dict(sd: Dict[str, np.ndarray],
                            depth: Sequence[int] = (1, 2, 9, 1)) -> dict:
    """Reference CSWinTransformer (train_cswinunet_segmentation.py:489-688)
    -> flax variables {'params': ...}."""
    params: dict = {}
    params["embed_conv"] = _conv(sd, "stage1_conv_embed.0")
    params["embed_norm"] = _norm(sd, "stage1_conv_embed.2")
    # encoder
    for s in range(4):
        two = s != 3  # stage4 is global single-branch
        for i in range(depth[s]):
            params[f"stage{s + 1}_{i}"] = _cswin_block(
                sd, f"stage{s + 1}.{i}", two)
        if s != 3:
            params[f"merge{s + 1}"] = {
                "conv": _conv(sd, f"merge{s + 1}.conv"),
                "norm": _norm(sd, f"merge{s + 1}.norm"),
            }
    params["norm"] = _norm(sd, "norm")
    # decoder
    for i in range(depth[3]):
        params[f"stage_up4_{i}"] = _cswin_block(sd, f"stage_up4.{i}", False)
    for s, ups in ((2, "upsample4"), (1, "upsample3"), (0, "upsample2")):
        params[ups] = _carafe(sd, ups)
        params[f"concat_linear{s + 2}"] = _linear(sd, f"concat_linear{s + 2}")
        for i in range(depth[s]):
            params[f"stage_up{s + 1}_{i}"] = _cswin_block(
                sd, f"stage_up{s + 1}.{i}", True)
    params["norm_up"] = _norm(sd, "norm_up")
    params["upsample1"] = _carafe(sd, "upsample1")
    params["output"] = {"kernel": _conv_w(sd["output.weight"])}
    return {"params": params}
