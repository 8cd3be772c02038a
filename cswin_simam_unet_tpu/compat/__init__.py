"""Compatibility: one-way PyTorch -> flax weight import for parity tests."""

from cswin_simam_unet_tpu.compat.torch_import import (  # noqa: F401
    import_unet_state_dict,
    import_cswin_state_dict,
)
