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

TPU-first formulation: the whole flip -> rot90 -> crop -> resize chain is
ONE separable resample ``out = R_r @ X @ R_c^T`` (+ an output transpose for
odd rotations).  Flips and 180-degree rotations are index reversals folded
into the per-sample interpolation matrices; the bilinear weights are the hat
function ``max(0, 1 - |coord - index|)`` — identical values to two-tap
lerping.  This keeps the per-pixel work on the MXU.  The previous
formulation (kept below as the test oracle, ``_augment_batch_gather``)
materialised per-sample full-image selects for both flips, all four rot90
variants, and four bilinear gather taps on (H, W, 4) f32 arrays whose
4-wide minor dim is lane-hostile — measured 16 ms of a 52 ms 512^2 training
step; the matrix form is ~an order of magnitude cheaper.
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


def _draw_params(rng: jax.Array, B: int, cfg: AugmentConfig):
    """The reference's per-sample draws (key order is part of the
    trajectory-exact-resume contract — do not reorder)."""
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
    return hflip, vflip, k, scale, top_u, left_u


def _batched_axis_coords(out_size: int, crop_start, crop_size, limit: int):
    """Batched :func:`ops.image._axis_coords`: (B,) crop scalars ->
    (B, out_size) float source coords, cv2 half-pixel convention,
    crop-window- then image-clamped."""
    d = jnp.arange(out_size, dtype=jnp.float32)[None, :]
    cs = crop_size.astype(jnp.float32)[:, None]
    src = (d + 0.5) * (cs / out_size) - 0.5
    src = jnp.clip(src, 0.0, cs - 1.0)
    src = src + crop_start.astype(jnp.float32)[:, None]
    return jnp.clip(src, 0.0, float(limit - 1))


def _interp_matrix(coords, N: int, nearest: bool = False):
    """(B, O) clamped float coords -> (B, O, N) interpolation matrix.
    Bilinear rows are the hat function (two taps, weights 1-w / w — the
    same values the two-tap lerp uses); nearest rows are one-hot at
    round(coord) (jnp.round = half-to-even, matching sample_nearest)."""
    grid = jnp.arange(N, dtype=jnp.float32)
    if nearest:
        return (jnp.round(coords)[..., None] == grid).astype(jnp.float32)
    d = jnp.abs(coords[..., None] - grid)
    return jnp.maximum(0.0, 1.0 - d)


def _resample(x, Rr, Rc, swap):
    """out[b] = Rr[b] @ x[b] @ Rc[b]^T, transposed per sample where swap.
    HIGHEST precision: DEFAULT would round the f32 image through one bf16
    pass (~4e-3 abs on [0,1] data) — visible against the cv2 parity gates."""
    hi = jax.lax.Precision.HIGHEST
    t = jnp.einsum("boh,bhwc->bowc", Rr, x, precision=hi)
    s = jnp.einsum("bpw,bowc->bopc", Rc, t, precision=hi)
    return jnp.where(swap[:, None, None, None], jnp.swapaxes(s, 1, 2), s)


def _coord_transforms(hflip, vflip, k, ys, xs, N: int):
    """Fold flip^hf,vf then rot90^k (CCW) then crop-sampling into per-axis
    source coordinates of the ORIGINAL image.

    Sampling the transformed image T = rot90^k(vflip(hflip(X))) at
    (ys[o], xs[p]) equals sampling X at separable coords; rot90 maps query
    (y, x) -> (x, N-1-y) per application, so:

      k=0: rows from ys,      cols from xs       (no output transpose)
      k=1: rows from xs,      cols from N-1-ys   (output transposed)
      k=2: rows from N-1-ys,  cols from N-1-xs
      k=3: rows from N-1-xs,  cols from ys       (output transposed)

    then vflip reverses the row coords and hflip the col coords.  Exact:
    reflections map interpolation cells to cells with mirrored weights.
    """
    N1 = float(N - 1)
    k = k[:, None]
    conds = [k == 0, k == 1, k == 2, k == 3]
    r = jnp.select(conds, [ys, xs, N1 - ys, N1 - xs])
    c = jnp.select(conds, [xs, N1 - ys, N1 - xs, ys])
    r = jnp.where(vflip[:, None], N1 - r, r)
    c = jnp.where(hflip[:, None], N1 - c, c)
    swap = (k[:, 0] % 2) == 1
    return r, c, swap


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(rng: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()):
    """Augment a batch on device. images (B,H,W,C) float, masks (B,H,W,1)."""
    B, H, W = images.shape[0], images.shape[1], images.shape[2]
    if H != W:
        raise ValueError(f"augment_batch requires square images for the "
                         f"rot90 family, got {H}x{W}")
    hflip, vflip, k, scale, top_u, left_u = _draw_params(rng, B, cfg)
    new_h = jnp.floor(H * scale).astype(jnp.int32)
    new_w = jnp.floor(W * scale).astype(jnp.int32)
    top = jnp.floor(top_u * (H - new_h + 1).astype(jnp.float32)).astype(
        jnp.int32)
    left = jnp.floor(left_u * (W - new_w + 1).astype(jnp.float32)).astype(
        jnp.int32)
    ys = _batched_axis_coords(H, top, new_h, H)
    xs = _batched_axis_coords(W, left, new_w, W)
    r, c, swap = _coord_transforms(hflip, vflip, k, ys, xs, H)
    Rr = _interp_matrix(r, H)
    Rc = _interp_matrix(c, W)
    if cfg.mask_nearest:
        image_out = _resample(images, Rr, Rc, swap)
        mask_out = _resample(masks, _interp_matrix(r, H, nearest=True),
                             _interp_matrix(c, W, nearest=True), swap)
        return image_out, mask_out
    pair = jnp.concatenate([images, masks], axis=-1)
    out = _resample(pair, Rr, Rc, swap)
    return out[..., :-1], out[..., -1:]


# ---------------------------------------------------------------------------
# gather-based formulation: kept as the numerical ORACLE for the matrix path
# (tests/test_augment.py asserts equality draw-for-draw) and as the
# non-square-capable fallback.
# ---------------------------------------------------------------------------

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
def _augment_batch_gather(rng: jax.Array, images: jnp.ndarray,
                          masks: jnp.ndarray,
                          cfg: AugmentConfig = AugmentConfig()):
    """The per-sample select/rot90-stack/gather composition (see module
    docstring for why the matrix path replaced it in the hot loop)."""
    B = images.shape[0]
    hflip, vflip, k, scale, top_u, left_u = _draw_params(rng, B, cfg)
    aug = jax.vmap(_augment_one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
    return aug(images, masks, hflip, vflip, k, scale, top_u, left_u, cfg)
