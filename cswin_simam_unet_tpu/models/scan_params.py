"""Param-layout converters between the unrolled and scanned CSWinUNet forms.

``CSWinUNet(scan_stages=True)`` runs each multi-block stage as one
``lax.scan`` over params stacked on axis 0 (``stage3_scan/block/...``
instead of ``stage3_0 .. stage3_8``).  These converters move a params tree
between the two layouts so checkpoints, the torch importer/exporter
(``compat/``), and parity tests work in either mode.  Leaf-for-leaf
bijective: ``unstack(stack(p)) == p``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _scanned_stages(depth: Sequence[int]):
    for s, n in enumerate(depth):
        if n > 1:
            yield f"stage{s + 1}", n
            yield f"stage_up{s + 1}", n


def _stack(p: dict, name: str, n: int) -> None:
    blocks = [p.pop(f"{name}_{i}") for i in range(n)]
    p[f"{name}_scan"] = {
        "block": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)
    }


def _unstack(p: dict, key: str) -> None:
    stacked = dict(p.pop(key))["block"]
    n = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(n):
        p[f"{key[:-5]}_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)


def stack_scanned_params(params, depth: Sequence[int] = (1, 2, 9, 1)):
    """Unrolled layout -> ``scan_stages=True`` layout (stacked on axis 0)."""
    p = dict(params)
    for name, n in _scanned_stages(depth):
        if all(f"{name}_{i}" in p for i in range(n)):
            _stack(p, name, n)
    return p


def unstack_scanned_params(params, depth=None):
    """``scan_stages=True`` layout -> unrolled layout.  The block count is
    read off each stacked leaf's leading axis (``depth`` is accepted for
    symmetry but unused)."""
    p = dict(params)
    for key in [k for k in list(p) if k.endswith("_scan")]:
        _unstack(p, key)
    return p


def adapt_scan_layout(ref_params, params):
    """Stack or unstack ``params``' stages so its scan layout matches
    ``ref_params`` (a params tree — or shape-structs — of the configured
    model).  Stages that cannot be converted are left as-is so the caller's
    structure validation produces its usual clear error."""
    out = dict(params)
    for key in ref_params:
        if key.endswith("_scan") and key not in out:
            leaves = jax.tree_util.tree_leaves(ref_params[key])
            n = leaves[0].shape[0]
            base = key[:-5]
            if all(f"{base}_{i}" in out for i in range(n)):
                _stack(out, base, n)
    for key in list(out):
        if key.endswith("_scan") and key not in ref_params:
            _unstack(out, key)
    return out
