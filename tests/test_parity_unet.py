"""Golden parity: UNet vs the PyTorch reference with identical weights.

The real test strategy of this framework (SURVEY.md §4.2): import the
reference module, export its state_dict, map it through
``compat.torch_import``, and assert probabilities match to numerical
tolerance in both eval (running BN stats) and train (batch BN stats) modes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cswin_simam_unet_tpu.compat import import_unet_state_dict  # noqa: E402
from cswin_simam_unet_tpu.models import UNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402


@pytest.fixture(scope="module")
def ref_unet():
    mod = load_reference("unet")
    torch.manual_seed(0)
    model = mod.UNet(n_channels=3, n_classes=1)
    model.eval()
    # randomise BN running stats so eval-mode parity actually tests them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
    return model


def test_unet_eval_parity(ref_unet):
    sd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    variables = import_unet_state_dict(sd)
    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref_unet(torch.tensor(x)).numpy()  # (B,1,H,W) probabilities
    model = UNet()
    got = np.asarray(model.predict(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unet_train_mode_parity(ref_unet):
    # train mode: BN uses batch statistics — checks our BatchNorm semantics
    sd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    variables = import_unet_state_dict(sd)
    x = np.random.RandomState(1).rand(4, 3, 32, 32).astype(np.float32)
    ref_unet.train()
    with torch.no_grad():
        want = ref_unet(torch.tensor(x)).numpy()
    ref_unet.eval()
    model = UNet()
    logits, _ = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
        mutable=["batch_stats"])
    got = np.asarray(jax.nn.sigmoid(logits)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_unet_loss_and_metrics_parity(ref_unet):
    # end-to-end batch parity: loss + dice + iou vs reference formulas
    mod = load_reference("unet")
    sd = {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()}
    variables = import_unet_state_dict(sd)
    rs = np.random.RandomState(2)
    x = rs.rand(2, 3, 64, 64).astype(np.float32)
    y = (rs.rand(2, 1, 64, 64) > 0.5).astype(np.float32)

    with torch.no_grad():
        probs_t = ref_unet(torch.tensor(x))
        loss_t = torch.nn.BCELoss()(probs_t, torch.tensor(y)).item()
        preds_t = (probs_t > 0.5).float()
        dice_t = mod.dice_coefficient(preds_t, torch.tensor(y))
        iou_t = mod.iou_score(preds_t, torch.tensor(y))

    from cswin_simam_unet_tpu.train.losses import bce_with_logits
    from cswin_simam_unet_tpu.train.metrics import (
        dice_coefficient, iou_score, threshold_predictions)
    model = UNet()
    logits = model.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                         jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    target = jnp.asarray(y.transpose(0, 2, 3, 1))
    loss_j = float(bce_with_logits(logits, target))
    preds_j = threshold_predictions(jax.nn.sigmoid(logits))
    dice_j = float(dice_coefficient(preds_j, target))
    iou_j = float(iou_score(preds_j, target))

    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-4)
    np.testing.assert_allclose(dice_j, dice_t, rtol=1e-4)
    np.testing.assert_allclose(iou_j, iou_t, rtol=1e-4)
