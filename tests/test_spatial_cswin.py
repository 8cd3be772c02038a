"""Model-level H-sharded CSWin forward/backward vs the single-device model.

VERDICT r03 #5: ``spatial_cswin_apply`` composes the op-level spatial
pieces (halo'd convs, cross-shard stripe attention, psum'd SimAM,
halo-extended CARAFE reassembly) into an end-to-end flagship-family
forward.  The contract: numerically equal to ``model.apply(variables, x,
train=False)`` on one device — forward AND parameter gradients — on the
simulated CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_simam_unet_tpu.models import CSWinUNet
from cswin_simam_unet_tpu.parallel import make_mesh
from cswin_simam_unet_tpu.parallel.spatial_cswin import (
    spatial_cswin_apply,
    validate_spatial_cswin,
)


def _setup(img, use_simam=True, num_classes=1, **extra):
    model = CSWinUNet(img_size=img, embed_dim=16, depth=(1, 1, 1, 1),
                      split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
                      use_simam=use_simam, num_classes=num_classes, **extra)
    x = jnp.asarray(np.random.RandomState(0).rand(2, img, img, 3),
                    jnp.float32)
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    return model, variables, x


@pytest.mark.parametrize("n_shards,use_simam", [(2, True), (2, False),
                                                (4, True)])
def test_spatial_cswin_matches_single_device(n_shards, use_simam):
    img = 64 if n_shards == 2 else 128
    model, variables, x = _setup(img, use_simam)
    mesh = make_mesh((n_shards,), ("spatial",))
    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, x: spatial_cswin_apply(model, v, x, mesh))(
        variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_spatial_cswin_gradients_match():
    model, variables, x = _setup(64)
    mesh = make_mesh((2,), ("spatial",))

    def loss_single(params, x):
        o = model.apply({"params": params}, x, train=False)
        return jnp.sum(o * jnp.cos(o))

    def loss_spatial(params, x):
        o = spatial_cswin_apply(model, {"params": params}, x, mesh)
        return jnp.sum(o * jnp.cos(o))

    g_want = jax.jit(jax.grad(loss_single))(variables["params"], x)
    g_got = jax.jit(jax.grad(loss_spatial))(variables["params"], x)
    flat_w = jax.tree_util.tree_leaves_with_path(g_want)
    flat_g = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(g_got)}
    for path, w in flat_w:
        g = flat_g[jax.tree_util.keystr(path)]
        scale = max(1.0, float(np.max(np.abs(np.asarray(w)))))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_spatial_cswin_multiclass_head():
    model, variables, x = _setup(64, num_classes=3)
    mesh = make_mesh((2,), ("spatial",))
    want = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    got = jax.jit(lambda v, x: spatial_cswin_apply(model, v, x, mesh))(
        variables, x)
    assert got.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def _per_stage_devs(got_caps, want_caps):
    devs = {}
    for name, w in want_caps.items():
        g = got_caps[name]
        scale = max(1.0, float(np.max(np.abs(np.asarray(w)))))
        devs[name] = float(np.max(np.abs(np.asarray(g) - np.asarray(w)))) \
            / scale
    return devs


def test_spatial_cswin_per_stage_breakdown():
    """Localise WHERE sharded-collective drift enters (VERDICT r04 weak #4):
    every captured stage output of the 2-shard run must sit within the
    end-to-end band vs the single-device model's captured intermediates —
    a genuinely wrong halo at stage k would explode at stage k instead of
    hiding inside a passing end-to-end tolerance."""
    model, variables, x = _setup(64)
    mesh = make_mesh((2,), ("spatial",))
    got, caps = jax.jit(lambda v, x: spatial_cswin_apply(
        model, v, x, mesh, capture_stages=True))(variables, x)

    _, state = model.apply(
        variables, x, train=False, capture_intermediates=True,
        mutable=["intermediates"])
    inter = state["intermediates"]

    def model_out(key):
        return inter[key]["__call__"][0]

    # spatial capture point -> the flax module whose output matches it
    mapping = {
        "stage1": "stage1_0", "stage2": "stage2_0", "stage3": "stage3_0",
        "stage4": "stage4_0", "merge1": "merge1", "merge2": "merge2",
        "merge3": "merge3", "stage_up4": "stage_up4_0",
        "upsample4": "upsample4", "stage_up3": "stage_up3_0",
        "upsample3": "upsample3", "stage_up2": "stage_up2_0",
        "upsample2": "upsample2", "stage_up1": "stage_up1_0",
    }
    devs = {}
    for cap_name, mod_name in mapping.items():
        w = np.asarray(model_out(mod_name))
        g = np.asarray(caps[cap_name])
        scale = max(1.0, float(np.max(np.abs(w))))
        devs[cap_name] = float(np.max(np.abs(g - w))) / scale
    # every stage within the end-to-end band — the breakdown in the assert
    # message pins the first stage at fault when one blows up
    assert all(d < 2e-4 for d in devs.values()), devs


@pytest.mark.parametrize("n_shards", [2, 4])
def test_spatial_cswin_train_mode_matches_single_shard(n_shards):
    """Train-mode fwd + bwd oracle equality (VERDICT r04 #4): dropout /
    attn-drop / drop-path masks are keyed on GLOBAL positions, so an
    N-shard run draws exactly the masks the 1-shard run draws — equality
    vs the 1-shard oracle is tight.  (The stream differs from
    ``model.apply``'s flax fold order — documented in
    parallel/spatial_cswin.py; eval-mode equality to ``model.apply`` is
    proven separately above.)"""
    img = 64 if n_shards == 2 else 128
    model, variables, x = _setup(img, drop_rate=0.3, attn_drop_rate=0.3,
                                 drop_path_rate=0.3)
    key = jax.random.PRNGKey(7)
    mesh1 = make_mesh((1,), ("spatial",))
    meshN = make_mesh((n_shards,), ("spatial",))

    def fwd(mesh):
        return jax.jit(lambda v, x: spatial_cswin_apply(
            model, v, x, mesh, train=True, dropout_rng=key))(variables, x)

    want, got = fwd(mesh1), fwd(meshN)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    def loss(mesh):
        def f(params, x):
            o = spatial_cswin_apply(model, {"params": params}, x, mesh,
                                    train=True, dropout_rng=key)
            return jnp.sum(o * jnp.cos(o))
        return jax.jit(jax.grad(f))(variables["params"], x)

    g_want = loss(mesh1)
    g_got = loss(meshN)
    flat_g = {jax.tree_util.keystr(p): v for p, v in
              jax.tree_util.tree_leaves_with_path(g_got)}
    for path, w in jax.tree_util.tree_leaves_with_path(g_want):
        g = flat_g[jax.tree_util.keystr(path)]
        scale = max(1.0, float(np.max(np.abs(np.asarray(w)))))
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"train-mode grad mismatch at "
                    f"{jax.tree_util.keystr(path)}")


def test_spatial_cswin_train_dropout_active_eval_inert():
    """The train path must actually drop (different output from eval) and
    the eval path must be unchanged by the rng argument."""
    model, variables, x = _setup(64, drop_rate=0.3, attn_drop_rate=0.3,
                                 drop_path_rate=0.3)
    mesh = make_mesh((2,), ("spatial",))
    ev = spatial_cswin_apply(model, variables, x, mesh)
    tr = spatial_cswin_apply(model, variables, x, mesh, train=True,
                             dropout_rng=jax.random.PRNGKey(1))
    tr2 = spatial_cswin_apply(model, variables, x, mesh, train=True,
                              dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(tr), np.asarray(ev), atol=1e-3)
    assert not np.allclose(np.asarray(tr), np.asarray(tr2), atol=1e-3)
    # same key -> bitwise-deterministic resample
    tr_rep = spatial_cswin_apply(model, variables, x, mesh, train=True,
                                 dropout_rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(tr), np.asarray(tr_rep))


def test_spatial_cswin_geometry_validation():
    with pytest.raises(ValueError, match="not divisible by n_shards"):
        validate_spatial_cswin(224, 8, (1, 2, 7, 7))  # stage-2 reso 28 / 8
    with pytest.raises(ValueError, match="stripe height"):
        # 224^2 over 7 shards: every reso divides, but stage-3's local slab
        # (14/7 = 2 rows) cannot hold a height-7 horizontal stripe
        validate_spatial_cswin(224, 7, (1, 2, 7, 7))
    validate_spatial_cswin(64, 2, (1, 2, 2, 2))  # valid
    validate_spatial_cswin(448, 2, (1, 2, 7, 7))  # flagship, 2 shards
