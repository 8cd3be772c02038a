"""Tensor-parallel partition rules for the CSWin-UNet parameter tree.

The CSWin block is naturally tensor-parallel: the qkv projection and MLP fc1
split over their *output* features (heads / hidden units live on different
chips), and proj / fc2 contract over their *input* features, so a single
pjit-inserted reduce-scatter/all-reduce per block closes the cycle — the
Megatron pattern, expressed purely as NamedSharding annotations and compiled
onto ICI by XLA (SURVEY.md §2.5 TP/SP row; note the reference has no
parallelism at all).

Rules are (path-regex -> PartitionSpec) applied to param path names.  The
head dimension must divide the 'model' axis size for the qkv rule to apply;
rules that don't divide evenly fall back to replication (logged by caller if
desired).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (regex over '/'-joined param path, spec builder)
def partition_rules_cswin(model_axis: str = "model") -> List[Tuple[str, P]]:
    return [
        # attention: qkv output features sharded (heads split over chips)
        (r".*/qkv/kernel$", P(None, model_axis)),
        (r".*/qkv/bias$", P(model_axis)),
        # attention output projection: contract over sharded input
        (r".*/proj/kernel$", P(model_axis, None)),
        # MLP: fc1 output-sharded, fc2 input-sharded
        (r".*/mlp/fc1/kernel$", P(None, model_axis)),
        (r".*/mlp/fc1/bias$", P(model_axis)),
        (r".*/mlp/fc2/kernel$", P(model_axis, None)),
        # LePE depthwise kernels follow their channel shard
        (r".*/get_v_kernel$", P(None, None, None, model_axis)),
        (r".*/get_v_bias$", P(model_axis)),
    ]


def params_shardings(params, mesh: Mesh, rules=None):
    """Map a params pytree to NamedShardings via the partition rules.

    A rule only applies if every sharded dim divides by the mesh axis size;
    otherwise the param is replicated (correct, just not distributed).
    """
    if rules is None:
        rules = partition_rules_cswin()
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def assign(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        for pattern, spec in rules:
            if re.match(pattern, name):
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    if leaf.shape[dim] % axis_sizes[axis] != 0:
                        ok = False
                        break
                if ok:
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
