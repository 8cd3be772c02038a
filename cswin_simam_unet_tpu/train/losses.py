"""Segmentation losses — logits-space, numerically stable.

The reference pairs ``nn.BCELoss`` with a sigmoid baked into the model
forward (train_unet_segmentation.py:250,485) — unstable in probability
space.  We keep models logits-out and fuse sigmoid+BCE (mathematically
identical, stable); parity of the *loss value* holds to fp tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy over all elements (torch BCELoss default
    reduction='mean'), computed stably from logits."""
    losses = optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32),
                                                targets.astype(jnp.float32))
    return jnp.mean(losses)


def softmax_cross_entropy(logits: jnp.ndarray,
                          target_labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy vs integer labels (framework extension for
    multi-class segmentation, BASELINE.json config 5)."""
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), target_labels.astype(jnp.int32))
    return jnp.mean(losses)


def soft_dice_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                   smooth: float = 1.0) -> jnp.ndarray:
    """1 - soft Dice on sigmoid probabilities (optional auxiliary loss)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    t = targets.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(probs * t)
    return 1.0 - (2.0 * inter + smooth) / (jnp.sum(probs) + jnp.sum(t) + smooth)


def segmentation_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                      n_classes: int = 1, dice_weight: float = 0.0) -> jnp.ndarray:
    """Dispatch: binary BCE (reference semantics) or multi-class CE, with an
    optional soft-dice auxiliary term."""
    if n_classes == 1:
        loss = bce_with_logits(logits, targets)
    else:
        loss = softmax_cross_entropy(logits, targets)
    if dice_weight > 0.0 and n_classes == 1:
        loss = loss + dice_weight * soft_dice_loss(logits, targets)
    return loss
