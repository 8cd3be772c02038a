"""Parallelism: device meshes, shardings, parallel train steps over ICI."""

from cswin_simam_unet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_state,
    state_sharding,
)
from cswin_simam_unet_tpu.parallel.sharding import (  # noqa: F401
    partition_rules_cswin,
    params_shardings,
)
