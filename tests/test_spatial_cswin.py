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


def _setup(img, use_simam=True, num_classes=1):
    model = CSWinUNet(img_size=img, embed_dim=16, depth=(1, 1, 1, 1),
                      split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
                      use_simam=use_simam, num_classes=num_classes)
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


def test_spatial_cswin_geometry_validation():
    with pytest.raises(ValueError, match="not divisible by n_shards"):
        validate_spatial_cswin(224, 8, (1, 2, 7, 7))  # stage-2 reso 28 / 8
    with pytest.raises(ValueError, match="stripe height"):
        # 224^2 over 7 shards: every reso divides, but stage-3's local slab
        # (14/7 = 2 rows) cannot hold a height-7 horizontal stripe
        validate_spatial_cswin(224, 7, (1, 2, 7, 7))
    validate_spatial_cswin(64, 2, (1, 2, 2, 2))  # valid
    validate_spatial_cswin(448, 2, (1, 2, 7, 7))  # flagship, 2 shards
