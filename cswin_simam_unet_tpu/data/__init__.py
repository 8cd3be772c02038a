"""Data layer: paired image/mask sources, host decode, on-device augmentation."""

from cswin_simam_unet_tpu.data.dataset import SegmentationDataSource, train_test_indices  # noqa: F401
from cswin_simam_unet_tpu.data.augment import augment_batch, AugmentConfig  # noqa: F401
from cswin_simam_unet_tpu.data.pipeline import DataLoader  # noqa: F401
