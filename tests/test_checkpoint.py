"""Checkpoint/resume tests (SURVEY.md §5): round-trip fidelity, resume
continuation, best-dice tracking, and a fault-injection resume that
simulates a mid-run crash."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.models import UNet
from cswin_simam_unet_tpu.train.checkpoint import CheckpointStore
from cswin_simam_unet_tpu.train.engine import (
    FitConfig,
    create_train_state,
    fit,
    make_train_step,
)
from cswin_simam_unet_tpu.train.schedule import ReduceLROnPlateau


def _state(seed=0, lr=1e-3):
    model = UNet(base_features=4)
    return model, create_train_state(model, jax.random.PRNGKey(seed),
                                     (1, 16, 16, 3), "adam", lr, 1e-4)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_roundtrip(tmp_path):
    model, state = _state()
    # advance a step so opt_state moments are non-trivial
    step = make_train_step(model, augment=None, donate=False)
    rs = np.random.RandomState(0)
    imgs = (rs.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    masks = (rs.rand(2, 16, 16, 1) > 0.5).astype(np.uint8) * 255
    state, _ = step(state, jnp.asarray(imgs), jnp.asarray(masks),
                    jax.random.PRNGKey(0))

    sched = ReduceLROnPlateau(lr=1e-3, factor=0.5, patience=5, min_lr=1e-7)
    sched.step(0.4)
    history = {"train_loss": [0.5], "train_dice": [0.6], "train_iou": [0.4],
               "test_loss": [0.4], "test_dice": [0.62], "test_iou": [0.45],
               "learning_rates": [1e-3]}
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save_epoch(1, state, sched, history, test_dice=0.62)
    store.manager.wait_until_finished()

    _, fresh = _state(seed=1)  # different init
    restored, sched2, hist2, epoch, gstep = store.restore(fresh)
    assert epoch == 1
    assert gstep == 0
    _trees_equal(state.params, restored.params)
    _trees_equal(state.opt_state, restored.opt_state)
    _trees_equal(state.batch_stats, restored.batch_stats)
    assert restored.step == state.step
    assert sched2.state_dict() == sched.state_dict()
    assert hist2 == history
    store.close()


def test_best_dice_tracking(tmp_path):
    model, state = _state()
    sched = ReduceLROnPlateau(lr=1e-3)
    h = {k: [] for k in ("train_loss", "train_dice", "train_iou", "test_loss",
                         "test_dice", "test_iou", "learning_rates")}
    store = CheckpointStore(str(tmp_path / "ckpt"), max_to_keep=2)
    store.save_epoch(1, state, sched, h, test_dice=0.5)
    store.save_epoch(2, state, sched, h, test_dice=0.8)
    store.save_epoch(3, state, sched, h, test_dice=0.6)
    store.manager.wait_until_finished()
    epoch, dice = store.best_epoch()
    assert epoch == 2 and abs(dice - 0.8) < 1e-9
    assert store.latest_epoch() == 3
    store.close()


def test_reset_clears_stale_run(tmp_path):
    """A fresh (non-resume) run over an old store must not inherit the old
    run's epochs or best-Dice meta (the CLI calls reset() in that case)."""
    model, state = _state()
    sched = ReduceLROnPlateau(lr=1e-3)
    h = {k: [] for k in ("train_loss", "train_dice", "train_iou", "test_loss",
                         "test_dice", "test_iou", "learning_rates")}
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save_epoch(1, state, sched, h, test_dice=0.7)
    store.save_epoch(2, state, sched, h, test_dice=0.9)
    store.manager.wait_until_finished()
    store.close()

    store2 = CheckpointStore(str(tmp_path / "ckpt"))
    assert store2.latest_epoch() == 2
    store2.reset()
    assert store2.latest_epoch() is None
    assert store2.best_epoch() == (0, -1.0)
    assert store2.best_weights_path() is None
    # the new run's records start clean
    store2.save_epoch(1, state, sched, h, test_dice=0.4)
    store2.manager.wait_until_finished()
    assert store2.best_epoch()[1] == pytest.approx(0.4)
    assert store2.latest_epoch() == 1
    store2.close()


def test_best_weights_survive_retention_pruning(tmp_path):
    """The best-on-test-Dice WEIGHTS must remain loadable after
    max_to_keep prunes the best epoch's orbax checkpoint (it used to be
    deleted while meta.json still pointed at it)."""
    from cswin_simam_unet_tpu.train.checkpoint import load_weights

    model, state = _state()
    sched = ReduceLROnPlateau(lr=1e-3)
    h = {k: [] for k in ("train_loss", "train_dice", "train_iou", "test_loss",
                         "test_dice", "test_iou", "learning_rates")}
    store = CheckpointStore(str(tmp_path / "ckpt"), max_to_keep=2)

    def bump(s, delta):  # distinguishable params per epoch
        return s.replace(params=jax.tree_util.tree_map(
            lambda x: x + delta, s.params))

    best_state = bump(state, 1.0)
    store.save_epoch(1, bump(state, 0.5), sched, h, test_dice=0.5)
    store.save_epoch(2, best_state, sched, h, test_dice=0.9)  # the best
    store.save_epoch(3, bump(state, 2.0), sched, h, test_dice=0.6)
    store.save_epoch(4, bump(state, 3.0), sched, h, test_dice=0.4)
    store.manager.wait_until_finished()
    # epoch 2 pruned by max_to_keep=2 ...
    assert 2 not in store.manager.all_steps()
    epoch, dice = store.best_epoch()
    assert epoch == 2 and abs(dice - 0.9) < 1e-9
    # ... but its weights artifact survives and holds epoch-2 params
    path = store.best_weights_path()
    assert path is not None
    _, fresh = _state(seed=1)
    loaded = load_weights(path, fresh)
    _trees_equal(best_state.params, loaded.params)
    store.close()


def test_restore_weights_matches_full_restore(tmp_path):
    """Template-free weights-only restore (predict/evaluate path) returns
    the same params/batch_stats as the full restore."""
    model, state = _state()
    sched = ReduceLROnPlateau(lr=1e-3)
    h = {k: [] for k in ("train_loss", "train_dice", "train_iou", "test_loss",
                         "test_dice", "test_iou", "learning_rates")}
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.save_epoch(1, state, sched, h, test_dice=0.5)
    store.manager.wait_until_finished()
    payload, epoch = store.restore_weights()
    assert epoch == 1
    _trees_equal(state.params, payload["params"])
    _trees_equal(state.batch_stats, payload["batch_stats"])
    store.close()


@pytest.mark.slow
def test_checkpoint_every_period(tmp_path):
    """checkpoint_every=N saves only every Nth epoch plus the final one
    (0 = final only); best-Dice meta still tracks every epoch's metric."""
    rs = np.random.RandomState(0)
    imgs = (rs.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    masks = (imgs[..., :1] > 128).astype(np.uint8) * 255
    batches = [(imgs, masks)]

    class Loader:
        def __iter__(self):
            return iter(batches)

    def run(store, every, n_epochs=5):
        model, state = _state()
        cfg = FitConfig(num_epochs=n_epochs, augment=None, verbose=False,
                        checkpoint_manager=store, checkpoint_every=every)
        fit(model, state, Loader(), Loader(), cfg)
        store.manager.wait_until_finished()
        return sorted(store.manager.all_steps())

    assert run(CheckpointStore(str(tmp_path / "p2"), max_to_keep=10),
               every=2) == [2, 4, 5]
    assert run(CheckpointStore(str(tmp_path / "p0"), max_to_keep=10),
               every=0) == [5]


def test_fault_injection_resume(tmp_path):
    """Train 3 epochs saving each; then restart from epoch 2's checkpoint
    and verify the continued run reproduces epoch 3 exactly (bitwise params
    AND identical history) — trajectory-exact resume, the crash-recovery
    guarantee the reference lacks (it saves only after all 100 epochs,
    train_unet_segmentation.py:537).

    RNG-sensitivity matters here: augmentation is ON and the shuffling
    loader is epoch-keyed, so a resume that mis-restores ``global_step`` or
    the loader epoch produces different augment draws / batch order and the
    bitwise-params assertion fails.
    """
    from cswin_simam_unet_tpu.data.augment import AugmentConfig

    rs = np.random.RandomState(0)
    imgs = (rs.rand(4, 16, 16, 3) * 255).astype(np.uint8)
    masks = (imgs[..., :1] > 128).astype(np.uint8) * 255

    class Loader:
        """Shuffling loader keyed by set_epoch, like data.pipeline.DataLoader."""

        def __init__(self):
            self._epoch = 0

        def set_epoch(self, epoch):
            self._epoch = epoch

        def __iter__(self):
            order = np.random.RandomState(7 + self._epoch).permutation(4)
            half = [order[:2], order[2:]]
            return iter([(imgs[i], masks[i]) for i in half])

    def run(n_epochs, store, state=None, scheduler=None, history=None,
            start_epoch=0, global_step=0):
        model, s0 = _state()
        state = state if state is not None else s0
        cfg = FitConfig(num_epochs=n_epochs, augment=AugmentConfig(),
                        verbose=False, checkpoint_manager=store)
        return fit(model, state, Loader(), Loader(), cfg, history=history,
                   scheduler=scheduler, start_epoch=start_epoch,
                   global_step=global_step)

    store_a = CheckpointStore(str(tmp_path / "a"))
    state_a, hist_a = run(3, store_a)
    store_a.manager.wait_until_finished()

    # "crash" after epoch 2: restore from epoch 2 in a fresh process-like
    # context and continue to epoch 3
    _, fresh = _state(seed=9)
    store_b = CheckpointStore(str(tmp_path / "a"))
    state_r, sched_r, hist_r, epoch_r, gstep_r = store_b.restore(fresh,
                                                                 epoch=2)
    assert epoch_r == 2
    assert gstep_r == 4  # 2 epochs x 2 batches
    state_b, hist_b = run(3, CheckpointStore(str(tmp_path / "c")),
                          state=state_r, scheduler=sched_r, history=hist_r,
                          start_epoch=2, global_step=gstep_r)

    _trees_equal(state_a.params, state_b.params)
    assert hist_a == hist_b
    store_a.close()
    store_b.close()
