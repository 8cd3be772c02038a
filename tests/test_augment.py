"""On-device augmentation tests: deterministic geometry cases + cv2 parity
of the resize kernel (SURVEY.md §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.data.augment import AugmentConfig, augment_batch
from cswin_simam_unet_tpu.ops.image import (
    crop_resize,
    resize_bilinear,
    rot90_batch_select,
)


def test_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(0)
    img = (rs.rand(37, 53, 3) * 255).astype(np.float32)
    for out_hw in [(17, 29), (64, 64), (37, 53)]:
        want = cv2.resize(img, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
        got = np.asarray(resize_bilinear(jnp.asarray(img), *out_hw))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_crop_resize_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(1)
    img = (rs.rand(48, 48, 3) * 255).astype(np.float32)
    top, left, ch, cw = 5, 8, 36, 40  # in-bounds: 8+40 == 48
    want = cv2.resize(img[top:top + ch, left:left + cw], (48, 48),
                      interpolation=cv2.INTER_LINEAR)
    got = np.asarray(crop_resize(
        jnp.asarray(img), jnp.asarray(top), jnp.asarray(left),
        jnp.asarray(ch), jnp.asarray(cw), 48, 48))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_rot90_select():
    img = jnp.arange(4, dtype=jnp.float32).reshape(2, 2, 1)
    np.testing.assert_array_equal(
        np.asarray(rot90_batch_select(img, jnp.asarray(0))),
        np.asarray(img))
    np.testing.assert_array_equal(
        np.asarray(rot90_batch_select(img, jnp.asarray(1)))[..., 0],
        np.rot90(np.asarray(img)[..., 0], 1))


def test_identity_when_no_ops_fire():
    # flip/rot probs 0 and crop scale pinned to 1.0 -> identity transform
    cfg = AugmentConfig(flip_prob=0.0, rotate_prob=0.0, crop_scale=(1.0, 1.0))
    rs = np.random.RandomState(2)
    imgs = jnp.asarray(rs.rand(2, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray(rs.rand(2, 16, 16, 1).astype(np.float32))
    out_i, out_m = augment_batch(jax.random.PRNGKey(0), imgs, masks, cfg)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(imgs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(masks),
                               rtol=1e-5, atol=1e-5)


def test_flip_only():
    cfg = AugmentConfig(flip_prob=1.0, rotate_prob=0.0, crop_scale=(1.0, 1.0))
    rs = np.random.RandomState(3)
    imgs = jnp.asarray(rs.rand(1, 8, 8, 3).astype(np.float32))
    masks = jnp.asarray(rs.rand(1, 8, 8, 1).astype(np.float32))
    out_i, out_m = augment_batch(jax.random.PRNGKey(0), imgs, masks, cfg)
    # both flips fire with p=1 -> h+v flip = 180 rotation
    np.testing.assert_allclose(np.asarray(out_i)[0],
                               np.asarray(imgs)[0][::-1, ::-1],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_m)[0],
                               np.asarray(masks)[0][::-1, ::-1],
                               rtol=1e-5, atol=1e-5)


def test_mask_image_alignment_preserved():
    # encode position into both image and mask; after augmentation they must
    # still agree (the whole point of paired augmentation, ref :17-84)
    cfg = AugmentConfig()
    H = 32
    grid = np.mgrid[0:H, 0:H].astype(np.float32) / H
    img = np.stack([grid[0], grid[1], grid[0] * 0], -1)[None]
    mask = grid[0][None, ..., None].copy()
    for seed in range(4):
        oi, om = augment_batch(jax.random.PRNGKey(seed), jnp.asarray(img),
                               jnp.asarray(mask), cfg)
        np.testing.assert_allclose(np.asarray(oi)[0, :, :, 0],
                                   np.asarray(om)[0, :, :, 0],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mask_nearest", [False, True])
def test_matrix_resample_matches_gather_oracle(mask_nearest):
    """The separable-matrix augmentation must equal the gather/select
    formulation draw-for-draw (same keys -> same transform params) across
    many seeds, hitting every flip/rot/crop combination."""
    from cswin_simam_unet_tpu.data.augment import _augment_batch_gather

    cfg = AugmentConfig(mask_nearest=mask_nearest)
    rs = np.random.RandomState(11)
    imgs = jnp.asarray(rs.rand(4, 24, 24, 3).astype(np.float32))
    masks = jnp.asarray(
        (rs.randint(0, 4, (4, 24, 24, 1)) if mask_nearest
         else rs.rand(4, 24, 24, 1)).astype(np.float32))
    for seed in range(8):
        rng = jax.random.PRNGKey(seed)
        gi, gm = _augment_batch_gather(rng, imgs, masks, cfg)
        mi, mm = augment_batch(rng, imgs, masks, cfg)
        np.testing.assert_allclose(np.asarray(mi), np.asarray(gi),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(gm),
                                   rtol=1e-5, atol=1e-5)


def test_matrix_resample_forced_transforms():
    """Pin each rot90 k with both flips and compare against numpy's own
    flip/rot90 (crop disabled) — catches sign/swap errors the oracle-vs-
    matrix test could share."""
    from cswin_simam_unet_tpu.data.augment import (
        _coord_transforms,
        _interp_matrix,
        _resample,
    )

    rs = np.random.RandomState(12)
    img = rs.rand(1, 12, 12, 2).astype(np.float32)
    ident = (np.arange(12, dtype=np.float32) + 0.0)[None, :]
    for k in range(4):
        for hf in (False, True):
            for vf in (False, True):
                want = img[0]
                if hf:
                    want = want[:, ::-1]
                if vf:
                    want = want[::-1]
                want = np.rot90(want, k)
                r, c, swap = _coord_transforms(
                    jnp.asarray([hf]), jnp.asarray([vf]),
                    jnp.asarray([k]), jnp.asarray(ident),
                    jnp.asarray(ident), 12)
                got = _resample(jnp.asarray(img), _interp_matrix(r, 12),
                                _interp_matrix(c, 12), swap)
                np.testing.assert_allclose(np.asarray(got)[0], want,
                                           rtol=1e-6, atol=1e-6,
                                           err_msg=f"k={k} hf={hf} vf={vf}")


def test_augment_is_jittable_and_deterministic():
    cfg = AugmentConfig()
    rs = np.random.RandomState(5)
    imgs = jnp.asarray(rs.rand(3, 16, 16, 3).astype(np.float32))
    masks = jnp.asarray(rs.rand(3, 16, 16, 1).astype(np.float32))
    a1 = augment_batch(jax.random.PRNGKey(7), imgs, masks, cfg)
    a2 = augment_batch(jax.random.PRNGKey(7), imgs, masks, cfg)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    b = augment_batch(jax.random.PRNGKey(8), imgs, masks, cfg)
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b[0]))
