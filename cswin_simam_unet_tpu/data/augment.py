"""On-device paired image/mask augmentation under jit.

Reproduces the reference ``AugmentationTransform``
(train_unet_segmentation.py:17-84) with explicit jax.random keys instead of
the numpy global RNG, vectorised over the batch, entirely on device:

* horizontal flip p=0.5 and vertical flip p=0.5 (independent draws);
* with p=0.25, rotate by an angle drawn uniformly from {0, 90, 180, 270}
  degrees (so each non-zero rotation has effective probability 3/16);
* always: random crop with scale ~ U(0.75, 1.0) (independent floor for h/w),
  uniform position, bilinear resize back to the original size.

The same transform is applied to image and mask to keep alignment; masks go
through the same bilinear path, so they become soft-valued exactly like the
reference's cv2 pipeline (SURVEY.md §3.5).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from cswin_simam_unet_tpu.ops.image import crop_resize, rot90_batch_select


@dataclass(frozen=True)
class AugmentConfig:
    flip_prob: float = 0.5
    rotate_prob: float = 0.25
    crop_scale: tuple = (0.75, 1.0)
    # nearest-neighbour crop-resize for the mask: required for multiclass
    # masks (bilinear over class ids fabricates classes at boundaries);
    # False keeps the reference's soft bilinear masks for binary seg.
    mask_nearest: bool = False


def _augment_one(image: jnp.ndarray, mask: jnp.ndarray, hflip, vflip, k,
                 scale, top_u, left_u, cfg: AugmentConfig):
    """Apply one sample's augmentation. image (H,W,C), mask (H,W,1)."""
    H, W = image.shape[0], image.shape[1]
    pair = jnp.concatenate([image, mask], axis=-1)  # transform jointly
    pair = jnp.where(hflip, pair[:, ::-1], pair)
    pair = jnp.where(vflip, pair[::-1], pair)
    pair = rot90_batch_select(pair, k)
    new_h = jnp.floor(H * scale).astype(jnp.int32)
    new_w = jnp.floor(W * scale).astype(jnp.int32)
    top = jnp.floor(top_u * (H - new_h + 1).astype(jnp.float32)).astype(jnp.int32)
    left = jnp.floor(left_u * (W - new_w + 1).astype(jnp.float32)).astype(jnp.int32)
    if cfg.mask_nearest:
        image_out = crop_resize(pair[..., :-1], top, left, new_h, new_w, H, W)
        mask_out = crop_resize(pair[..., -1:], top, left, new_h, new_w, H, W,
                               method="nearest")
        return image_out, mask_out
    pair = crop_resize(pair, top, left, new_h, new_w, H, W)
    return pair[..., :-1], pair[..., -1:]


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(rng: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()):
    """Augment a batch on device. images (B,H,W,C) float, masks (B,H,W,1)."""
    B = images.shape[0]
    kh, kv, kr, ka, ks, kt, kl = jax.random.split(rng, 7)
    hflip = jax.random.uniform(kh, (B,)) < cfg.flip_prob
    vflip = jax.random.uniform(kv, (B,)) < cfg.flip_prob
    do_rot = jax.random.uniform(kr, (B,)) < cfg.rotate_prob
    # angle uniform over {0°, 90°cw, 180°, 270°cw}; in CCW-rot90 units that
    # is k ∈ {0, 3, 2, 1} — uniform either way.
    angle = jax.random.randint(ka, (B,), 0, 4)
    k = jnp.where(do_rot, angle, 0)
    scale = jax.random.uniform(ks, (B,), minval=cfg.crop_scale[0],
                               maxval=cfg.crop_scale[1])
    top_u = jax.random.uniform(kt, (B,))
    left_u = jax.random.uniform(kl, (B,))
    aug = jax.vmap(_augment_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
    return aug(images, masks, hflip, vflip, k, scale, top_u, left_u, cfg)
