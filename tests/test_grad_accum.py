"""Gradient accumulation: A micro-batches -> one optimizer step.

Framework extension (nothing equivalent in the reference): the equality
target is the framework's own full-batch step — identical updated params,
loss, and Dice/IoU when the model is batch-independent (no BatchNorm) and
deterministic (drop rates 0), because per-micro mean gradients average to
the full-batch mean gradient and the metric sums add exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.models import CSWinUNet, UNet
from cswin_simam_unet_tpu.train.engine import (
    create_train_state,
    make_train_step,
)


def _tiny_cswin(n_classes=1):
    return CSWinUNet(img_size=64, embed_dim=16, depth=(1, 1, 1, 1),
                     split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
                     num_classes=n_classes, use_simam=True)


def _batch(rs, batch, img, n_classes):
    images = rs.randint(0, 256, (batch, img, img, 3), dtype=np.uint8)
    if n_classes == 1:
        masks = rs.randint(0, 2, (batch, img, img, 1), dtype=np.uint8) * 255
    else:
        masks = rs.randint(0, n_classes, (batch, img, img, 1),
                           dtype=np.uint8)
    return jnp.asarray(images), jnp.asarray(masks)


@pytest.mark.parametrize("n_classes", [1, 4])
def test_grad_accum_equals_full_batch(n_classes):
    model = _tiny_cswin(n_classes)
    rs = np.random.RandomState(0)
    images, masks = _batch(rs, 4, 64, n_classes)
    rng = jax.random.PRNGKey(7)

    def run(accum):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3), "adamw", 1e-4, 1e-4)
        step = make_train_step(model, n_classes, augment=None, donate=False,
                               grad_accum=accum)
        return step(state, images, masks, rng)

    state1, m1 = run(1)
    state4, m4 = run(4)

    assert np.isfinite(float(m4["loss"]))
    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]),
                               rtol=0, atol=1e-5)
    # metric sums add exactly across micro-batches
    np.testing.assert_allclose(float(m4["dice"]), float(m1["dice"]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(m4["iou"]), float(m1["iou"]),
                               rtol=0, atol=1e-5)
    # averaged micro gradients == full-batch gradient -> same updated params
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat4 = jax.tree_util.tree_leaves(state4.params)
    for a, b in zip(flat1, flat4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_grad_accum_ragged_batch_equals_full_batch():
    # the reference-parity loader keeps partial last batches
    # (drop_last=False): an indivisible batch takes the unrolled
    # size-weighted path and must still equal the full-batch step
    model = _tiny_cswin()
    rs = np.random.RandomState(0)
    images, masks = _batch(rs, 5, 64, 1)  # 5 % 2 != 0 -> chunks (2, 3)
    rng = jax.random.PRNGKey(3)

    def run(accum):
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3), "adamw", 1e-4, 1e-4)
        step = make_train_step(model, 1, augment=None, donate=False,
                               grad_accum=accum)
        return step(state, images, masks, rng)

    state1, m1 = run(1)
    state2, m2 = run(2)
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(m2["dice"]), float(m1["dice"]),
                               rtol=0, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_grad_accum_batchnorm_smoke():
    # UNet carries BatchNorm running stats: with accumulation they update
    # sequentially per micro-batch (documented semantics, not full-batch
    # equality) — assert the step runs, stats move, loss finite.
    model = UNet(base_features=4)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3),
                               "adam", 1e-3, 1e-4)
    step = make_train_step(model, 1, augment=None, donate=False,
                           grad_accum=2)
    rs = np.random.RandomState(1)
    images, masks = _batch(rs, 4, 32, 1)
    new_state, m = step(state, images, masks, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
