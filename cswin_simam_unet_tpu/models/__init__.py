"""Model zoo: UNet, UNet+SimAM, CSWin-UNet, CSWin-SimAM-UNet."""

from cswin_simam_unet_tpu.models.unet import UNet, DoubleConv, Down, Up  # noqa: F401
from cswin_simam_unet_tpu.models.cswin import CSWinUNet, validate_geometry  # noqa: F401
from cswin_simam_unet_tpu.models.layers import (  # noqa: F401
    CARAFE,
    CSWinBlock,
    DropPath,
    LePEAttention,
    MergeBlock,
    Mlp,
)
