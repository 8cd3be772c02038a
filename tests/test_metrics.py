"""Metric formula tests vs closed-form cases (SURVEY.md §4.1)."""

import numpy as np
import jax.numpy as jnp

from cswin_simam_unet_tpu.train.metrics import (
    dice_coefficient,
    iou_score,
    threshold_predictions,
    multiclass_dice,
)
from cswin_simam_unet_tpu.train.losses import bce_with_logits, segmentation_loss


def test_dice_perfect_and_disjoint():
    a = jnp.ones((2, 4, 4, 1))
    b = jnp.zeros((2, 4, 4, 1))
    np.testing.assert_allclose(float(dice_coefficient(a, a)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(dice_coefficient(a, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(iou_score(a, a)), 1.0, rtol=1e-6)


def test_dice_closed_form():
    # |P|=2, |T|=2, |P∩T|=1 -> dice = 2/4 = 0.5
    p = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    t = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(dice_coefficient(p, t)), 0.5, rtol=1e-5)
    # iou = 1/3
    np.testing.assert_allclose(float(iou_score(p, t)), 1.0 / 3.0, rtol=1e-5)


def test_soft_targets_semantics():
    # The reference thresholds predictions but NOT targets (bilinear-resized
    # masks are soft); the formulas must accept fractional targets.
    p = jnp.asarray([1.0, 0.0])
    t = jnp.asarray([0.5, 0.5])
    # dice = (2*0.5)/(1+1) = 0.5
    np.testing.assert_allclose(float(dice_coefficient(p, t)), 0.5, rtol=1e-4)


def test_threshold():
    probs = jnp.asarray([0.2, 0.5, 0.7])
    np.testing.assert_array_equal(np.asarray(threshold_predictions(probs)),
                                  [0.0, 0.0, 1.0])


def test_bce_matches_manual():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    targets = jnp.asarray([1.0, 1.0, 0.0])
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    want = -np.mean(np.asarray(targets) * np.log(p)
                    + (1 - np.asarray(targets)) * np.log(1 - p))
    np.testing.assert_allclose(float(bce_with_logits(logits, targets)), want,
                               rtol=1e-4)


def test_multiclass_loss_and_dice():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3),
                         dtype=jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 3, (2, 4, 4)))
    loss = segmentation_loss(logits, labels, n_classes=3)
    assert np.isfinite(float(loss))
    onehot = jnp.eye(3)[labels]
    probs = jnp.exp(logits) / jnp.sum(jnp.exp(logits), -1, keepdims=True)
    d = multiclass_dice(probs, onehot)
    assert 0.0 <= float(d) <= 1.0
    # perfect prediction -> dice 1
    perfect = onehot * 100.0 - 50.0
    probs_p = jnp.exp(perfect) / jnp.sum(jnp.exp(perfect), -1, keepdims=True)
    np.testing.assert_allclose(float(multiclass_dice(probs_p, onehot)), 1.0,
                               rtol=1e-5)
