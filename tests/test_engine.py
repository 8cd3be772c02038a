"""Train-engine tests: plateau scheduler parity, optimizer update rules,
train/eval steps, loss-decreases integration on synthetic data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.models import UNet
from cswin_simam_unet_tpu.train.engine import (
    FitConfig,
    create_train_state,
    evaluate,
    fit,
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)
from cswin_simam_unet_tpu.train.schedule import ReduceLROnPlateau
from cswin_simam_unet_tpu.data.augment import AugmentConfig


def test_plateau_matches_torch_semantics():
    # mirrors torch.optim.lr_scheduler.ReduceLROnPlateau(factor=0.5,
    # patience=2, min_lr=1e-3) behaviour on a plateau
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2, min_lr=1e-3)
    lrs = [s.step(1.0) for _ in range(10)]
    # epoch 0 improves (inf -> 1.0); epochs 1..3 are bad; reduction happens
    # when num_bad_epochs > patience, i.e. on the 4th step
    assert lrs[:3] == [1.0, 1.0, 1.0]
    assert lrs[3] == 0.5
    # counter resets; next reduction 3 bad epochs later
    assert lrs[4:6] == [0.5, 0.5]
    assert lrs[6] == 0.25


def test_plateau_torch_reference():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.Adam(lin.parameters(), lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=0.5, patience=5, min_lr=1e-7)
    ours = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=5, min_lr=1e-7)
    rs = np.random.RandomState(0)
    metrics = list(rs.rand(30)) + [0.5] * 30  # noise then hard plateau
    for m in metrics:
        sched.step(m)
        ours_lr = ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert abs(ours_lr - torch_lr) < 1e-12, (m, ours_lr, torch_lr)


def test_adam_matches_torch_update():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    w0 = rs.randn(4, 3).astype(np.float32)
    grads_seq = [rs.randn(4, 3).astype(np.float32) for _ in range(5)]

    # torch Adam with coupled weight decay
    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([p], lr=1e-3, weight_decay=1e-4)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    want = p.detach().numpy()

    # ours
    from cswin_simam_unet_tpu.train.engine import make_optimizer
    tx = make_optimizer("adam", 1e-3, 1e-4)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = jax.tree_util.tree_map(lambda p_, u: p_ + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=1e-5,
                               atol=1e-6)


def test_adamw_matches_torch_update():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(1)
    w0 = rs.randn(4, 3).astype(np.float32)
    grads_seq = [rs.randn(4, 3).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.AdamW([p], lr=1e-3, weight_decay=1e-4)
    for g in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(g)
        opt.step()
    want = p.detach().numpy()

    from cswin_simam_unet_tpu.train.engine import make_optimizer
    tx = make_optimizer("adamw", 1e-3, 1e-4)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads_seq:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = jax.tree_util.tree_map(lambda p_, u: p_ + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=1e-5,
                               atol=1e-6)


def _tiny_unet_state(image=16, lr=1e-3):
    model = UNet(base_features=4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, image, image, 3), "adam", lr, 1e-4)
    return model, state


def _synthetic_batch(rs, b=2, size=16):
    # images: blobs; masks: thresholded blobs -> learnable signal
    imgs = (rs.rand(b, size, size, 3) * 255).astype(np.uint8)
    masks = (imgs[..., :1] > 128).astype(np.uint8) * 255
    return imgs, masks


def test_train_step_updates_and_metrics():
    model, state = _tiny_unet_state()
    step = make_train_step(model, augment=None, donate=False)
    rs = np.random.RandomState(0)
    imgs, masks = _synthetic_batch(rs)
    p_before = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, m = step(state, jnp.asarray(imgs), jnp.asarray(masks),
                    jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert 0.0 <= float(m["dice"]) <= 1.0
    assert 0.0 <= float(m["iou"]) <= 1.0
    p_after = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p_before), np.asarray(p_after))
    # BN running stats updated
    bs = jax.tree_util.tree_leaves(state.batch_stats)
    assert any(np.any(np.asarray(x) != 0) for x in bs)


def test_multiclass_out_of_range_labels_stay_finite():
    # A binary 0/255 intensity mask fed to a multiclass config must not
    # NaN the loss: out-of-range ids would gather out of bounds inside the
    # integer-label CE (JAX fills with NaN).  The step clips to the valid
    # label range instead; the CLI warns host-side.
    model = UNet(base_features=4, n_classes=4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 16, 16, 3), "adam", 1e-3, 1e-4)
    rs = np.random.RandomState(0)
    imgs, masks = _synthetic_batch(rs)  # mask values in {0, 255}
    step = make_train_step(model, n_classes=4, augment=None, donate=False)
    state, m = step(state, jnp.asarray(imgs), jnp.asarray(masks),
                    jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    eval_step = make_eval_step(model, n_classes=4)
    em = eval_step(state, jnp.asarray(imgs), jnp.asarray(masks))
    assert np.isfinite(float(em["loss"]))


def test_set_learning_rate_roundtrip():
    _, state = _tiny_unet_state(lr=1e-3)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9
    set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


def test_loss_decreases_over_steps():
    model, state = _tiny_unet_state()
    step = make_train_step(model, augment=None, donate=False)
    rs = np.random.RandomState(0)
    imgs, masks = _synthetic_batch(rs, b=4, size=16)
    imgs_j, masks_j = jnp.asarray(imgs), jnp.asarray(masks)
    losses = []
    for i in range(30):
        state, m = step(state, imgs_j, masks_j, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.9, losses


def test_fit_loop_history_and_uniform_batch_averaging():
    model, state = _tiny_unet_state()

    class ListLoader:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

    rs = np.random.RandomState(0)
    # deliberately unequal batch sizes: uniform-over-batches averaging
    batches = [_synthetic_batch(rs, b=3), _synthetic_batch(rs, b=1)]
    cfg = FitConfig(num_epochs=2, augment=AugmentConfig(), verbose=False)
    state, history = fit(model, state, ListLoader(batches),
                         ListLoader(batches[:1]), cfg)
    assert len(history["train_loss"]) == 2
    assert len(history["learning_rates"]) == 2
    assert all(np.isfinite(v) for v in history["train_loss"])


def test_evaluate_uniform_mean():
    model, state = _tiny_unet_state()
    estep = make_eval_step(model)
    rs = np.random.RandomState(0)
    b1 = _synthetic_batch(rs, b=4)
    b2 = _synthetic_batch(rs, b=1)
    m1 = estep(state, jnp.asarray(b1[0]), jnp.asarray(b1[1]))
    m2 = estep(state, jnp.asarray(b2[0]), jnp.asarray(b2[1]))
    got = evaluate(estep, state, [b1, b2])
    # uniform over batches regardless of batch size (reference quirk)
    np.testing.assert_allclose(
        got["loss"], (float(m1["loss"]) + float(m2["loss"])) / 2, rtol=1e-6)


def test_flat_logits_step_equals_full_layout():
    """The flat-head train/eval path (pre-pixel-shuffle logits + unshuffled
    targets) must produce the same loss/metrics and BIT-IDENTICAL parameter
    updates as the full-resolution layout: BCE/dice/IoU are global means, so
    pixel permutation changes only fp reduce order (and the mean's gradient
    is uniform, so backward is exactly invariant)."""
    from cswin_simam_unet_tpu.models import CSWinUNet

    # img 64 is the smallest geometry where every SimAM site sees >1 pixel
    # (at img 32 the last merge outputs a 1x1 map -> n = H*W - 1 = 0 -> NaN)
    kw = dict(img_size=64, embed_dim=16, depth=(1, 1, 1, 1),
              split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
              use_simam=True, drop_rate=0.1, attn_drop_rate=0.1,
              drop_path_rate=0.1)

    class NoFlat(CSWinUNet):
        @property
        def supports_flat_logits(self):
            return False

    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    masks = rs.randint(0, 2, (2, 64, 64, 1), dtype=np.uint8) * 255
    rng = jax.random.PRNGKey(1)

    results = []
    for cls in (CSWinUNet, NoFlat):
        model = cls(**kw)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, 64, 64, 3), "adamw", 1e-4, 1e-4)
        m_ev = make_eval_step(model, 1)(state, images, masks)
        state, m_tr = make_train_step(model, 1, augment=None)(
            state, images, masks, rng)
        results.append((state, m_tr, m_ev))
    (s_flat, tr_flat, ev_flat), (s_full, tr_full, ev_full) = results
    for k in tr_flat:
        np.testing.assert_allclose(float(tr_flat[k]), float(tr_full[k]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(ev_flat[k]), float(ev_full[k]),
                                   rtol=1e-5)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        s_flat.params, s_full.params)
    assert max(jax.tree_util.tree_leaves(deltas)) == 0.0
