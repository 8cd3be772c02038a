"""Compatibility: PyTorch <-> flax weight conversion (both directions)."""

from cswin_simam_unet_tpu.compat.torch_import import (  # noqa: F401
    import_unet_state_dict,
    import_cswin_state_dict,
)
from cswin_simam_unet_tpu.compat.torch_export import (  # noqa: F401
    export_unet_variables,
    export_cswin_variables,
)
