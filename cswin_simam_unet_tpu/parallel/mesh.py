"""Device mesh + sharding helpers (data parallelism and hybrid DP x TP).

The reference is strictly single-device (SURVEY.md §2.5); parallelism here is
a new first-class component built the TPU way: a ``jax.sharding.Mesh`` over
the chips, ``NamedSharding`` annotations on batch and params, and XLA
emitting the gradient all-reduce (DP) / activation collectives (TP) over ICI.
No hand-written collectives — the pjit partitioner owns them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default: 1-axis ('data',) over all local devices.  Pass
    ``shape=(d, m), axis_names=('data', 'model')`` for hybrid DP x TP.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; rest replicated."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def state_sharding(state, mesh: Mesh, params_shardings=None):
    """Sharding pytree for a TrainState.

    With ``params_shardings`` (a pytree of NamedSharding matching
    ``state.params``), every state leaf whose path *ends with* a params path
    — the params themselves and the optimizer moments (adam mu/nu) that
    mirror their structure — gets that param's sharding; everything else is
    replicated.  Default: fully replicated (plain data parallelism).
    """
    rep = replicated(mesh)
    if params_shardings is None:
        return jax.tree_util.tree_map(lambda _: rep, state)
    flat = jax.tree_util.tree_flatten_with_path(params_shardings)[0]
    by_path = {tuple(str(k) for k in path): s for path, s in flat}
    max_len = max((len(p) for p in by_path), default=0)

    def assign(path, _leaf):
        keys = tuple(str(k) for k in path)
        for i in range(max(0, len(keys) - max_len), len(keys)):
            s = by_path.get(keys[i:])
            if s is not None:
                return s
        return rep

    return jax.tree_util.tree_map_with_path(assign, state)


def shard_state(state, mesh: Mesh, params_shardings=None):
    """Place a TrainState on the mesh (replicated params by default)."""
    shardings = state_sharding(state, mesh, params_shardings)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "shape") else x,
        state, shardings)
