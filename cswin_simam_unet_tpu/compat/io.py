"""Load reference PyTorch checkpoint FILES into flax variables.

The reference's one training artifact is ``torch.save(model.state_dict())``
(train_unet_segmentation.py:537, train_cswinunet_segmentation.py:992) — a
user migrating from the reference arrives with a ``.pth`` file.  This module
turns that file (or the ``.npz`` fallback our own ``export-torch`` emits on
torch-less machines) into the framework's flax variables, so ``predict`` /
``evaluate`` / ``train --init-weights`` consume reference checkpoints
directly.  The tensor-level layout conversion lives in
:mod:`cswin_simam_unet_tpu.compat.torch_import`; this file only handles
disk formats and tree validation.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from cswin_simam_unet_tpu.compat.torch_import import (
    import_cswin_state_dict,
    import_unet_state_dict,
)

TORCH_SUFFIXES = (".pth", ".pt", ".npz")


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth``/``.pt`` (torch.save) or ``.npz`` state_dict file into
    a name -> numpy mapping.  Accepts the raw ``state_dict`` the reference
    saves, or a dict wrapping one under a ``"state_dict"`` key (a common
    checkpointing convention)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    import torch  # only needed for the pickle container format

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj \
            and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(
            f"{path} does not contain a state_dict (got {type(obj)}); the "
            f"reference saves model.state_dict() directly (ref :537/:992)")
    out = {}
    for k, v in obj.items():
        out[k] = (v.detach().cpu().numpy() if hasattr(v, "detach")
                  else np.asarray(v))
    return out


def import_torch_file(path: str, family: str,
                      depth: Sequence[int] = (1, 2, 9, 1)) -> dict:
    """File -> flax variables for the given model family
    ('unet' -> {'params', 'batch_stats'}, 'cswin' -> {'params'})."""
    sd = load_state_dict_file(path)
    try:
        if family == "unet":
            return import_unet_state_dict(sd)
        return import_cswin_state_dict(sd, depth=tuple(depth))
    except KeyError as e:
        raise ValueError(
            f"{path} is not a reference {family} state_dict (missing tensor "
            f"{e}); check --config matches the checkpoint's architecture "
            f"(family/depth)") from e


def merge_imported_variables(variables: dict, imported: dict,
                             source: Optional[str] = None) -> dict:
    """Replace ``variables``' params/batch_stats with the imported trees,
    validating structure and per-leaf shapes against the initialised model
    (clear errors instead of a deep apply-time failure) and casting each
    leaf to the dtype the model initialised it with."""
    out = dict(variables)
    for col in ("params", "batch_stats"):
        if col not in imported:
            continue
        if col not in variables:
            raise ValueError(
                f"checkpoint{f' {source}' if source else ''} provides "
                f"'{col}' but the configured model has none — --config "
                f"does not match the checkpoint's architecture")
        new = imported[col]
        if col == "params":
            # transparently stack/unstack multi-block stages so checkpoints
            # move freely between scan_stages=True/False models
            from cswin_simam_unet_tpu.models.scan_params import (
                adapt_scan_layout,
            )
            new = adapt_scan_layout(variables[col], new)
        out[col] = _cast_like(variables[col], new, col, source)
    return out


def _cast_like(ref_tree, new_tree, col: str, source):
    import jax

    ref_paths = {jax.tree_util.keystr(p): leaf for p, leaf
                 in jax.tree_util.tree_leaves_with_path(ref_tree)}
    new_paths = {jax.tree_util.keystr(p): leaf for p, leaf
                 in jax.tree_util.tree_leaves_with_path(new_tree)}
    if set(ref_paths) != set(new_paths):
        missing = sorted(set(ref_paths) - set(new_paths))[:5]
        extra = sorted(set(new_paths) - set(ref_paths))[:5]
        raise ValueError(
            f"imported '{col}'{f' from {source}' if source else ''} does "
            f"not match the configured model: missing {missing}, "
            f"unexpected {extra}; check --config (family/depth/n_classes)")
    for k, ref_leaf in ref_paths.items():
        if tuple(ref_leaf.shape) != tuple(np.shape(new_paths[k])):
            raise ValueError(
                f"shape mismatch for {col}{k}: model {ref_leaf.shape} vs "
                f"checkpoint {np.shape(new_paths[k])}; check --config "
                f"(n_classes/embed_dim/num_heads)")
    return jax.tree_util.tree_map(
        lambda ref_leaf, leaf: np.asarray(leaf, dtype=ref_leaf.dtype),
        ref_tree, new_tree)
