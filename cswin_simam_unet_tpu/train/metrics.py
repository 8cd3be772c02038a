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

import jax
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


def multiclass_metrics(scores: jnp.ndarray, target_onehot: jnp.ndarray,
                       smooth: float = 1e-6
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mean per-class Dice, mean per-class IoU) for multi-class
    segmentation (framework extension for BASELINE.json config 5; argmax
    predictions vs one-hot targets).  ``scores`` may be logits or
    probabilities — only their argmax is used.  One pred one-hot and one
    set of class reductions feed both metrics."""
    n_classes = scores.shape[-1]
    pred_onehot = jax.nn.one_hot(jnp.argmax(scores, axis=-1), n_classes,
                                 dtype=jnp.float32)
    axes = tuple(range(pred_onehot.ndim - 1))
    intersection = jnp.sum(pred_onehot * target_onehot, axis=axes)
    sp = jnp.sum(pred_onehot, axis=axes)
    st = jnp.sum(target_onehot, axis=axes)
    dice = jnp.mean((2.0 * intersection + smooth) / (sp + st + smooth))
    iou = jnp.mean((intersection + smooth) / (sp + st - intersection + smooth))
    return dice, iou


def multiclass_dice(probs: jnp.ndarray, target_onehot: jnp.ndarray,
                    smooth: float = 1e-6) -> jnp.ndarray:
    """Mean per-class Dice (see :func:`multiclass_metrics`)."""
    return multiclass_metrics(probs, target_onehot, smooth)[0]
