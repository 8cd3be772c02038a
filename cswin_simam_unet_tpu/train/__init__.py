"""Training engine: losses, metrics, jitted steps, schedulers, reporting."""

from cswin_simam_unet_tpu.train.metrics import dice_coefficient, iou_score  # noqa: F401
from cswin_simam_unet_tpu.train.losses import (  # noqa: F401
    bce_with_logits,
    softmax_cross_entropy,
    segmentation_loss,
)
