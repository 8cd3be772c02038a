"""Functional TPU compute primitives (pure functions over jnp arrays)."""

from cswin_simam_unet_tpu.ops.windows import (  # noqa: F401
    img2windows,
    windows2img,
    tokens_to_nhwc,
    nhwc_to_tokens,
    stripe_geometry,
)
from cswin_simam_unet_tpu.ops.simam import simam  # noqa: F401
from cswin_simam_unet_tpu.ops.attention import stripe_attention  # noqa: F401
from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble  # noqa: F401
