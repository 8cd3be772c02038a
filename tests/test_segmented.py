"""Segmented (per-stage jit chain) train step == monolithic train step.

The segmented executor re-derives the CSWin-UNet topology as standalone
segment modules sharing the monolithic model's parameter names — these
tests pin that equivalence so the two cannot drift: identical forward
logits, and an identical training step (loss, metrics, updated params)
when stochastic layers are inert.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cswin_simam_unet_tpu.models import CSWinUNet
from cswin_simam_unet_tpu.train.engine import (
    create_train_state,
    make_train_step,
)
from cswin_simam_unet_tpu.train.segmented import (
    build_segments,
    make_segmented_train_step,
    segment_param_keys,
)

IMG = 64


def _model(**kw):
    return CSWinUNet(img_size=IMG, embed_dim=32, depth=(1, 2, 2, 1),
                     split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
                     use_simam=True, **kw)


def _data(batch=2, seed=0):
    rs = np.random.RandomState(seed)
    return (rs.randint(0, 256, (batch, IMG, IMG, 3), dtype=np.uint8),
            rs.randint(0, 2, (batch, IMG, IMG, 1), dtype=np.uint8) * 255)


def _state(model):
    return create_train_state(model, jax.random.PRNGKey(0),
                              (1, IMG, IMG, 3), "adamw", 1e-4, 1e-4)


def test_segment_param_partition_covers_everything():
    model = _model()
    state = _state(model)
    segments = build_segments(model)
    part = segment_param_keys(state.params, segments)
    flat = [k for keys in part for k in keys]
    assert sorted(flat) == sorted(state.params)
    assert len(flat) == len(set(flat))  # no double-claims


@pytest.mark.parametrize("scan_stages", [False, True])
def test_segmented_forward_matches_monolithic(scan_stages):
    model = _model(scan_stages=scan_stages)
    state = _state(model)
    images_u8, _ = _data()
    images = jnp.asarray(images_u8, jnp.float32) / 255.0

    want = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(
        state.params, images)

    segments = build_segments(model)
    part = segment_param_keys(state.params, segments)
    carry = {"x": images}
    for (name, run), keys in zip(segments, part):
        params_i = {k: state.params[k] for k in keys}
        carry = run({"params": params_i}, carry, True,
                    {"dropout": jax.random.PRNGKey(0)})
    got = carry["tokens"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_segmented_step_matches_monolithic_step():
    # drop rates 0 -> stochastic layers inert, so the two steps compute the
    # same mathematics and must agree to f32 reassociation tolerance
    model = _model()
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(7)

    state_a = _state(model)
    mono = make_train_step(model, n_classes=1, augment=None, donate=False)
    new_a, metrics_a = mono(state_a, jnp.asarray(images_u8),
                            jnp.asarray(masks_u8), rng)

    state_b = _state(model)
    seg = make_segmented_train_step(model, n_classes=1)
    new_b, metrics_b = seg(state_b, jnp.asarray(images_u8),
                           jnp.asarray(masks_u8), rng)

    assert float(metrics_b["loss"]) == pytest.approx(
        float(metrics_a["loss"]), abs=1e-5)
    assert float(metrics_b["dice"]) == pytest.approx(
        float(metrics_a["dice"]), abs=1e-5)

    leaves_a = jax.tree_util.tree_leaves_with_path(
        jax.device_get(new_a.params))
    leaves_b = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(
                    jax.device_get(new_b.params))}
    worst = 0.0
    for path, a in leaves_a:
        b = leaves_b[jax.tree_util.keystr(path)]
        worst = max(worst, float(np.max(np.abs(a - b))))
    assert worst < 5e-6, f"updated params deviate by {worst}"


def test_segmented_eval_matches_monolithic_eval():
    from cswin_simam_unet_tpu.train.engine import make_eval_step
    model = _model()
    state = _state(model)
    images_u8, masks_u8 = _data()
    want = make_eval_step(model, n_classes=1)(
        state, jnp.asarray(images_u8), jnp.asarray(masks_u8))
    seg = make_segmented_train_step(model, n_classes=1)
    got = seg.eval_step(state, jnp.asarray(images_u8),
                        jnp.asarray(masks_u8))
    for k in ("loss", "dice", "iou"):
        assert float(got[k]) == pytest.approx(float(want[k]), abs=1e-5), k


def test_segmented_step_trains_with_dropout():
    # Stochastic layers must be ACTIVE in the segmented TRAIN pass (the
    # monolithic step's train=True semantics) and INERT in its eval chain
    # — this pins the deterministic-flag orientation, which a review
    # caught inverted once (train ran dropout-free, eval with dropout).
    from cswin_simam_unet_tpu.train.engine import make_eval_step
    model = _model(drop_rate=0.2, attn_drop_rate=0.2, drop_path_rate=0.2)
    images_u8, masks_u8 = _data()
    state = _state(model)
    seg = make_segmented_train_step(model, n_classes=1,
                                    donate_state=False)

    before = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), state.params, 0.0))
    _, m1 = seg(state, jnp.asarray(images_u8), jnp.asarray(masks_u8),
                jax.random.PRNGKey(3))
    new_state, m2 = seg(state, jnp.asarray(images_u8),
                        jnp.asarray(masks_u8), jax.random.PRNGKey(4))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    # different dropout streams -> different losses (dropout is ON)
    assert float(m1["loss"]) != float(m2["loss"])
    after = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.abs(x).sum(), new_state.params, 0.0))
    assert after != before

    # eval: stochastic layers inert -> equals the monolithic eval exactly
    want = make_eval_step(model, n_classes=1)(
        state, jnp.asarray(images_u8), jnp.asarray(masks_u8))
    got = seg.eval_step(state, jnp.asarray(images_u8),
                        jnp.asarray(masks_u8))
    for k in ("loss", "dice", "iou"):
        assert float(got[k]) == pytest.approx(float(want[k]), abs=1e-5), k


def test_segmented_data_parallel_matches_single_device():
    """Segmented + DP (VERDICT r03 #4): the chain over an 8-device
    ('data',) mesh — batch sharded, state replicated, per-segment grads
    psum'd by the SPMD partitioner — must equal the single-device
    segmented step (loss, metrics, updated params) when stochastic layers
    are inert."""
    from cswin_simam_unet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_state,
    )

    model = _model()
    images_u8, masks_u8 = _data(batch=8)
    rng = jax.random.PRNGKey(7)

    state_a = _state(model)
    seg = make_segmented_train_step(model, n_classes=1, donate_state=False)
    new_a, metrics_a = seg(state_a, jnp.asarray(images_u8),
                           jnp.asarray(masks_u8), rng)

    mesh = make_mesh((8,), ("data",))
    state_b = shard_state(_state(model), mesh)
    bs = batch_sharding(mesh, 4)
    seg_dp = make_segmented_train_step(model, n_classes=1,
                                       donate_state=False, mesh=mesh)
    new_b, metrics_b = seg_dp(state_b,
                              jax.device_put(jnp.asarray(images_u8), bs),
                              jax.device_put(jnp.asarray(masks_u8), bs),
                              rng)

    for k in ("loss", "dice", "iou"):
        assert float(metrics_b[k]) == pytest.approx(
            float(metrics_a[k]), abs=1e-5), k

    leaves_a = jax.tree_util.tree_leaves_with_path(
        jax.device_get(new_a.params))
    leaves_b = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(
                    jax.device_get(new_b.params))}
    worst = 0.0
    for path, a in leaves_a:
        b = leaves_b[jax.tree_util.keystr(path)]
        worst = max(worst, float(np.max(np.abs(a - b))))
    assert worst < 5e-6, f"updated params deviate by {worst}"

    # the DP eval chain agrees too
    ev_a = seg.eval_step(state_a, jnp.asarray(images_u8),
                         jnp.asarray(masks_u8))
    ev_b = seg_dp.eval_step(state_b,
                            jax.device_put(jnp.asarray(images_u8), bs),
                            jax.device_put(jnp.asarray(masks_u8), bs))
    for k in ("loss", "dice", "iou"):
        assert float(ev_b[k]) == pytest.approx(float(ev_a[k]), abs=1e-5), k


def test_segmented_cost_flops_orders():
    """cost_flops (VERDICT r03 #3): useful <= executed, and useful is
    within a sane band of the monolithic step's compiled cost analysis."""
    model = _model()
    state = _state(model)
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(3)
    seg = make_segmented_train_step(model, n_classes=1, donate_state=False)
    seg(state, jnp.asarray(images_u8), jnp.asarray(masks_u8), rng)
    cost = seg.cost_flops(state, jnp.asarray(images_u8),
                          jnp.asarray(masks_u8), rng)
    assert 0 < cost["useful"] <= cost["executed"]

    mono = make_train_step(model, n_classes=1, augment=None, donate=False)
    c = mono.lower(state, jnp.asarray(images_u8), jnp.asarray(masks_u8),
                   rng).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    mono_flops = float(c.get("flops", 0.0))
    if mono_flops > 0:
        # XLA's optimised-HLO flop counts differ across fusion decisions;
        # the numerator must agree to first order, not bitwise
        assert 0.5 * mono_flops < cost["useful"] < 2.0 * mono_flops
