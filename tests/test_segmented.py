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

    from cswin_simam_unet_tpu.train.segmented import _SEG_IO
    segments = build_segments(model)
    part = segment_param_keys(state.params, segments)
    cur, skips = {"x": images}, {}
    for (name, run), keys in zip(segments, part):
        in_keys, out_keys = _SEG_IO[name]
        cin = {k: (cur.pop(k) if k in cur else skips.pop(k))
               for k in in_keys}
        params_i = {k: state.params[k] for k in keys}
        cur = dict(run({"params": params_i}, cin, True,
                       {"dropout": jax.random.PRNGKey(0)}))
        for k in out_keys:
            if k.startswith("skip"):
                skips[k] = cur.pop(k)
    got = cur["tokens"]
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


def test_segmented_recompute_mode_matches_residual_mode():
    """save_residuals=False (the O(one-segment)-memory recompute chain)
    computes the identical step to the default residual-saving chain —
    both match the monolithic step when stochastic layers are inert."""
    model = _model()
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(7)

    outs = []
    for save in (True, False):
        st = _state(model)
        seg = make_segmented_train_step(model, n_classes=1,
                                        donate_state=False,
                                        save_residuals=save)
        new, metrics = seg(st, jnp.asarray(images_u8),
                           jnp.asarray(masks_u8), rng)
        outs.append((new, metrics))
    (new_a, m_a), (new_b, m_b) = outs
    assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), abs=1e-6)
    la = jax.tree_util.tree_leaves(jax.device_get(new_a.params))
    lb = jax.tree_util.tree_leaves(jax.device_get(new_b.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(la, lb))
    assert worst < 1e-6, f"residual vs recompute params deviate by {worst}"


def test_segmented_mixed_and_auto_residual_policies_match():
    """Round-5: the per-segment residual policy (save some segments,
    recompute others) and the "auto" HBM-budget policy compute the
    identical step to the all-save chain.  A tiny forced budget must
    demote segments (mixed mode actually engages) and cost_flops must
    report the recompute tax of exactly the demoted segments."""
    model = _model()
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(13)

    def run(**kw):
        seg = make_segmented_train_step(model, n_classes=1,
                                        donate_state=False, **kw)
        new, metrics = seg(_state(model), jnp.asarray(images_u8),
                           jnp.asarray(masks_u8), rng)
        return seg, new, metrics

    _, ref_new, ref_m = run(save_residuals=True)
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(ref_new.params))

    for kw in ({"save_residuals": {"embed", "enc1", "dec1", "head"}},
               {"save_residuals": "auto"},
               {"save_residuals": "auto",
                "residual_budget_bytes": 2_000_000}):
        seg, new, metrics = run(**kw)
        assert float(metrics["loss"]) == pytest.approx(
            float(ref_m["loss"]), abs=1e-6)
        leaves = jax.tree_util.tree_leaves(jax.device_get(new.params))
        worst = max(float(np.max(np.abs(a - b)))
                    for a, b in zip(leaves, ref_leaves))
        assert worst < 1e-6, (kw, worst)
        policy = seg.residual_policy()
        assert policy is not None and set(policy) == {
            "embed", "enc1", "enc2", "enc3", "bottleneck",
            "dec3", "dec2", "dec1", "head"}
        if kw.get("residual_budget_bytes"):
            demoted = [n for n, m in policy.items() if not m]
            assert demoted, "tiny budget must demote segments to recompute"
            cost = seg.cost_flops(_state(model), jnp.asarray(images_u8),
                                  jnp.asarray(masks_u8), rng)
            assert cost["executed"] > cost["useful"] > 0

    with pytest.raises(ValueError, match="not segments"):
        make_segmented_train_step(model, n_classes=1,
                                  save_residuals={"nope"})


def test_segmented_depth_split_matches_unsplit():
    """Round-5: chunking deep stages into <=N-block segments
    (build_segments depth_split — finer residual grains for the auto
    policy at 2048^2) computes the identical step, and the chunked param
    partition still covers every root key exactly once."""
    from cswin_simam_unet_tpu.train.segmented import segment_param_keys
    model = _model()  # depth (1, 2, 2, 1): stage 2/3 chunk at split 1
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(17)

    segs = build_segments(model, depth_split=1)
    names = [n for n, _ in segs]
    assert "enc3x0" in names and "enc3x1" in names and "dec3x1" in names
    st = _state(model)
    part = segment_param_keys(st.params, segs)
    assert sum(len(p) for p in part) == len(st.params)

    outs = []
    for ds in (0, 1):
        seg = make_segmented_train_step(model, n_classes=1,
                                        donate_state=False, depth_split=ds)
        new, metrics = seg(_state(model), jnp.asarray(images_u8),
                           jnp.asarray(masks_u8), rng)
        outs.append((float(metrics["loss"]),
                     jax.tree_util.tree_leaves(jax.device_get(new.params))))
    (l0, p0), (l1, p1) = outs
    assert l0 == pytest.approx(l1, abs=1e-6)
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(p0, p1))
    assert worst < 1e-6, f"depth_split chain deviates by {worst}"


def test_segmented_augment_matches_monolithic():
    """Segmented + on-device augmentation (VERDICT r04 #5): with dropout
    inert, the augment streams are keyed identically (k_aug = first split
    of rng, as in the monolithic step), so the steps must agree."""
    from cswin_simam_unet_tpu.data.augment import AugmentConfig
    model = _model()
    images_u8, masks_u8 = _data()
    rng = jax.random.PRNGKey(11)
    aug = AugmentConfig()

    state_a = _state(model)
    mono = make_train_step(model, n_classes=1, augment=aug, donate=False)
    new_a, m_a = mono(state_a, jnp.asarray(images_u8),
                      jnp.asarray(masks_u8), rng)

    state_b = _state(model)
    seg = make_segmented_train_step(model, n_classes=1, augment=aug,
                                    donate_state=False)
    new_b, m_b = seg(state_b, jnp.asarray(images_u8),
                     jnp.asarray(masks_u8), rng)

    for k in ("loss", "dice", "iou"):
        assert float(m_b[k]) == pytest.approx(float(m_a[k]), abs=1e-5), k
    la = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(jax.device_get(new_b.params))}
    worst = 0.0
    for path, a in jax.tree_util.tree_leaves_with_path(
            jax.device_get(new_a.params)):
        worst = max(worst, float(np.max(np.abs(
            a - la[jax.tree_util.keystr(path)]))))
    assert worst < 5e-6, f"augmented params deviate by {worst}"


def test_segmented_grad_accum_matches_plain():
    """Segmented grad_accum=2 (VERDICT r04 #5) == the plain segmented step
    (per-sample losses are independent, so the mean-of-micro-grads equals
    the full-batch gradient exactly) when stochastic layers are inert."""
    model = _model()
    images_u8, masks_u8 = _data(batch=4)
    rng = jax.random.PRNGKey(5)

    state_a = _state(model)
    seg1 = make_segmented_train_step(model, n_classes=1,
                                     donate_state=False)
    new_a, m_a = seg1(state_a, jnp.asarray(images_u8),
                      jnp.asarray(masks_u8), rng)

    state_b = _state(model)
    seg2 = make_segmented_train_step(model, n_classes=1, grad_accum=2,
                                     donate_state=False)
    new_b, m_b = seg2(state_b, jnp.asarray(images_u8),
                      jnp.asarray(masks_u8), rng)

    for k in ("loss", "dice", "iou"):
        assert float(m_b[k]) == pytest.approx(float(m_a[k]), abs=2e-5), k
    la = jax.tree_util.tree_leaves(jax.device_get(new_a.params))
    lb = jax.tree_util.tree_leaves(jax.device_get(new_b.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(la, lb))
    assert worst < 5e-6, f"grad-accum params deviate by {worst}"

    with pytest.raises(ValueError, match="batch % accum"):
        seg3 = make_segmented_train_step(model, n_classes=1, grad_accum=3,
                                         donate_state=False)
        seg3(_state(model), jnp.asarray(images_u8), jnp.asarray(masks_u8),
             rng)


def test_segmented_cost_flops_dp_matches_single_device():
    """cost_flops under a DP mesh (VERDICT r04 #3): lowered from concrete
    sharding snapshots, scaled by the mesh size — the global numbers must
    match the single-device chain's to first order."""
    from cswin_simam_unet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_state,
    )
    model = _model()
    images_u8, masks_u8 = _data(batch=8)
    rng = jax.random.PRNGKey(3)

    seg = make_segmented_train_step(model, n_classes=1, donate_state=False)
    st = _state(model)
    seg(st, jnp.asarray(images_u8), jnp.asarray(masks_u8), rng)
    c1 = seg.cost_flops(st, jnp.asarray(images_u8), jnp.asarray(masks_u8),
                        rng)

    mesh = make_mesh((8,), ("data",))
    st_dp = shard_state(_state(model), mesh)
    bs = batch_sharding(mesh, 4)
    seg_dp = make_segmented_train_step(model, n_classes=1,
                                       donate_state=False, mesh=mesh)
    im = jax.device_put(jnp.asarray(images_u8), bs)
    mk = jax.device_put(jnp.asarray(masks_u8), bs)
    seg_dp(st_dp, im, mk, rng)
    c8 = seg_dp.cost_flops(st_dp, im, mk, rng)

    assert c1["useful"] > 0 and c8["useful"] > 0
    # collectives add a little; partitioning quantisation removes a little
    assert 0.8 < c8["useful"] / c1["useful"] < 1.25
    assert 0.8 < c8["executed"] / c1["executed"] < 1.25


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
