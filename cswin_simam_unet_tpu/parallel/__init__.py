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
from cswin_simam_unet_tpu.parallel.spatial import (  # noqa: F401
    halo_pad,
    spatial_conv3x3,
    spatial_unet_apply,
    validate_spatial_geometry,
)
from cswin_simam_unet_tpu.parallel.distributed import (  # noqa: F401
    global_batch_from_local,
    initialize_runtime,
    process_local_indices,
)
