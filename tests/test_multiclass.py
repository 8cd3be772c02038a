"""Multi-class segmentation path (BASELINE.json config 5 semantics):
softmax-CE loss, per-class Dice/IoU, end-to-end train steps."""

import numpy as np
import jax
import jax.numpy as jnp

from cswin_simam_unet_tpu.models import UNet
from cswin_simam_unet_tpu.train.engine import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _state(n_classes=4):
    model = UNet(base_features=4, n_classes=n_classes)
    return model, create_train_state(model, jax.random.PRNGKey(0),
                                     (1, 16, 16, 3), "adamw", 1e-3, 1e-4)


def _batch(rs, b=4, size=16, n_classes=4):
    imgs = (rs.rand(b, size, size, 3) * 255).astype(np.uint8)
    # class id grows with brightness -> learnable
    labels = (imgs.mean(-1, keepdims=True) / 256 * n_classes).astype(np.uint8)
    return imgs, labels


def test_multiclass_train_step_and_loss_decreases():
    model, state = _state()
    step = make_train_step(model, n_classes=4, augment=None, donate=False)
    rs = np.random.RandomState(0)
    imgs, labels = _batch(rs)
    losses = []
    for i in range(25):
        state, m = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                        jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert 0.0 <= float(m["dice"]) <= 1.0
        assert 0.0 <= float(m["iou"]) <= 1.0
    assert losses[-1] < losses[0] * 0.9, losses


def test_multiclass_eval_step():
    model, state = _state()
    estep = make_eval_step(model, n_classes=4)
    rs = np.random.RandomState(1)
    imgs, labels = _batch(rs, b=2)
    m = estep(state, jnp.asarray(imgs), jnp.asarray(labels))
    assert np.isfinite(float(m["loss"]))


def test_multiclass_perfect_prediction_dice_one():
    # an oracle model output yields dice == iou == 1
    from cswin_simam_unet_tpu.train.engine import _batch_metrics
    labels = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 8, 8)))
    logits = jax.nn.one_hot(labels, 4) * 50.0
    d, i = _batch_metrics(logits, labels, n_classes=4)
    np.testing.assert_allclose(float(d), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(i), 1.0, rtol=1e-5)
