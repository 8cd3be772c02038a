"""On-device image ops: bilinear resize/crop-resize with cv2 conventions.

The reference does all geometry on host with OpenCV
(train_unet_segmentation.py:17-84,157-158); here resize/flip/rotate/crop run
*inside jit* on device (BASELINE.json north star).  ``resize_bilinear``
reproduces cv2.resize INTER_LINEAR semantics: half-pixel-centre sampling
``src = (dst + 0.5) * scale - 0.5`` with edge clamping, generalised to sample
from a (possibly traced) crop window so random-crop-and-resize-back needs no
dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_coords(out_size: int, crop_start, crop_size, limit: int):
    """Source sampling coordinates for one axis.

    ``crop_start``/``crop_size`` may be traced scalars (random crop);
    ``out_size``/``limit`` are static.  Returns float coords clamped to the
    crop window then to [0, limit-1].
    """
    d = jnp.arange(out_size, dtype=jnp.float32)
    scale = crop_size.astype(jnp.float32) / out_size
    src = (d + 0.5) * scale - 0.5
    # cv2 clamps sampling to the (cropped) image bounds
    src = jnp.clip(src, 0.0, crop_size.astype(jnp.float32) - 1.0)
    src = src + crop_start.astype(jnp.float32)
    return jnp.clip(src, 0.0, float(limit - 1))


def sample_bilinear(img: jnp.ndarray, ys: jnp.ndarray,
                    xs: jnp.ndarray) -> jnp.ndarray:
    """Sample HWC image at the outer product of float coords ys x xs."""
    H, W = img.shape[0], img.shape[1]
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0.astype(jnp.float32))[:, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, :, None]
    rows0 = jnp.take(img, y0, axis=0)
    rows1 = jnp.take(img, y1, axis=0)
    v00 = jnp.take(rows0, x0, axis=1)
    v01 = jnp.take(rows0, x1, axis=1)
    v10 = jnp.take(rows1, x0, axis=1)
    v11 = jnp.take(rows1, x1, axis=1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize(INTER_LINEAR)-compatible resize of an HWC image."""
    H, W = img.shape[0], img.shape[1]
    ys = _axis_coords(out_h, jnp.asarray(0), jnp.asarray(H), H)
    xs = _axis_coords(out_w, jnp.asarray(0), jnp.asarray(W), W)
    return sample_bilinear(img.astype(jnp.float32), ys, xs)


def sample_nearest(img: jnp.ndarray, ys: jnp.ndarray,
                   xs: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sample of an HWC image at float coords ys x xs —
    for categorical masks, where interpolating class ids would fabricate
    intermediate classes at boundaries."""
    y = jnp.round(ys).astype(jnp.int32)
    x = jnp.round(xs).astype(jnp.int32)
    return jnp.take(jnp.take(img, y, axis=0), x, axis=1)


def crop_resize(img: jnp.ndarray, top, left, crop_h, crop_w,
                out_h: int, out_w: int,
                method: str = "bilinear") -> jnp.ndarray:
    """Crop [top:top+crop_h, left:left+crop_w] then resize to (out_h, out_w),
    all with traced crop scalars and static output shape — jit-safe random
    crop-and-resize (reference: train_unet_segmentation.py:67-82).
    ``method='nearest'`` preserves categorical values (multiclass masks)."""
    H, W = img.shape[0], img.shape[1]
    ys = _axis_coords(out_h, top, crop_h, H)
    xs = _axis_coords(out_w, left, crop_w, W)
    if method == "nearest":
        return sample_nearest(img, ys, xs)
    return sample_bilinear(img.astype(jnp.float32), ys, xs)


def rot90_batch_select(img: jnp.ndarray, k) -> jnp.ndarray:
    """Rotate a square HWC image by k*90deg CCW where k is a traced int in
    [0, 4).  All four rotations are computed and selected — pure layout work
    the compiler keeps cheap, with no data-dependent control flow."""
    variants = jnp.stack([img, jnp.rot90(img, 1), jnp.rot90(img, 2),
                          jnp.rot90(img, 3)])
    return variants[k]
