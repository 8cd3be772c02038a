"""Load the PyTorch reference scripts as importable modules (for golden
parity tests ONLY — reference code is never copied into the framework).

``timm`` is absent in this image, so a minimal stub providing the two
symbols the reference imports (DropPath, trunc_normal_) is installed first;
with drop_path_rate=0 (all parity tests) DropPath is an identity, and
trunc_normal_ only affects init (parity tests export weights, so init is
irrelevant).
"""

import importlib.util
import sys
import types

REFERENCE_DIR = "/root/reference"


def _install_timm_stub():
    if "timm.models.layers" in sys.modules:
        return
    import torch
    import torch.nn as nn

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def load_reference(name: str):
    """name: 'unet' or 'cswin'. Returns the imported reference module."""
    _install_timm_stub()
    fname = {"unet": "train_unet_segmentation.py",
             "cswin": "train_cswinunet_segmentation.py"}[name]
    modname = f"reference_{name}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(
        modname, f"{REFERENCE_DIR}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod
