"""Segmentation metrics with reference-identical semantics.

Parity targets: ``train_unet_segmentation.py:254-270`` /
``train_cswinunet_segmentation.py:691-708``.  Both metrics flatten all dims,
use smooth 1e-6, and are evaluated on *thresholded* predictions (>0.5)
against possibly *soft* targets (the reference bilinear-resizes masks, so
targets hold fractional values at edges — SURVEY.md §3.5).  Keeping that
quirk is required for the Dice-within-0.3% parity gate.

All functions are jit-friendly and return 0-d jnp arrays; the engine averages
them *uniformly over batches* (not samples), matching the reference
(``evaluate_model``, ref :274-309).
"""

from __future__ import annotations

import jax.numpy as jnp


def dice_coefficient(pred: jnp.ndarray, target: jnp.ndarray,
                     smooth: float = 1e-6) -> jnp.ndarray:
    """Dice = (2|P∩T| + s) / (|P| + |T| + s) over flattened inputs."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(pred * target)
    return (2.0 * intersection + smooth) / (jnp.sum(pred) + jnp.sum(target) + smooth)


def iou_score(pred: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1e-6) -> jnp.ndarray:
    """IoU = (|P∩T| + s) / (|P∪T| + s) over flattened inputs."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    intersection = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target) - intersection
    return (intersection + smooth) / (union + smooth)


def threshold_predictions(probs: jnp.ndarray, thresh: float = 0.5) -> jnp.ndarray:
    """Hard {0,1} predictions, as the reference computes before metrics
    (ref train_unet_segmentation.py:351-356)."""
    return (probs > thresh).astype(jnp.float32)


def multiclass_dice(probs: jnp.ndarray, target_onehot: jnp.ndarray,
                    smooth: float = 1e-6) -> jnp.ndarray:
    """Mean per-class Dice for multi-class segmentation (framework extension
    for BASELINE.json config 5; argmax predictions vs one-hot targets)."""
    n_classes = probs.shape[-1]
    pred = jnp.argmax(probs, axis=-1)
    pred_onehot = jnp.eye(n_classes, dtype=jnp.float32)[pred]
    axes = tuple(range(pred_onehot.ndim - 1))
    intersection = jnp.sum(pred_onehot * target_onehot, axis=axes)
    denom = jnp.sum(pred_onehot, axis=axes) + jnp.sum(target_onehot, axis=axes)
    return jnp.mean((2.0 * intersection + smooth) / (denom + smooth))
