"""2-D spatial sharding (halo-exchange CP equivalent) vs single-device oracle.

Runs on the simulated 8-device CPU mesh (conftest.py).  The contract under
test: ``spatial_unet_apply`` — the full UNet forward with H sharded over a
('spatial',) mesh axis, halo exchange on every 3x3 conv, psum'd BN/SimAM
statistics — is numerically equal to ``model.apply`` on one device, for
forward (eval + train modes) AND gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_simam_unet_tpu.models import UNet
from cswin_simam_unet_tpu.parallel import make_mesh
from cswin_simam_unet_tpu.parallel.spatial import (
    halo_pad,
    spatial_unet_apply,
    validate_spatial_geometry,
)

H = W = 128  # min height for 8 shards x 4 pool levels (128/8/16 = 1 row)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((8,), ("spatial",))


@pytest.fixture(scope="module", params=[False, True],
                ids=["plain", "simam"])
def unet_setup(request):
    model = UNet(n_channels=3, n_classes=1, base_features=8,
                 use_simam=request.param)
    x = jnp.asarray(np.random.RandomState(0).rand(2, H, W, 3), jnp.float32)
    # jit everything in this module: eager dispatch of a whole UNet op-by-op
    # on the single-core CPU host costs minutes per call (measured 396s for
    # the two unjitted grad tests vs ~10s compiled).
    variables = jax.jit(lambda r: model.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    return model, variables, x


def test_halo_pad_matches_global_zero_pad(mesh):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    x = jnp.arange(2 * 16 * 4 * 3, dtype=jnp.float32).reshape(2, 16, 4, 3)
    f = shard_map(lambda b: halo_pad(b, 1, "spatial", 8), mesh=mesh,
                  in_specs=P(None, "spatial"), out_specs=P(None, "spatial"),
                  check_vma=False)
    out = f(x)
    # each 2-row slab becomes 4 rows; reassemble and check interior halos
    out = np.asarray(out).reshape(2, 8, 4, 4, 3)
    ref = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0), (0, 0)))
    for s in range(8):
        np.testing.assert_array_equal(out[:, s], ref[:, 2 * s:2 * s + 4])


@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_spatial_unet_matches_single_device(mesh, unet_setup, train):
    model, variables, x = unet_setup
    if train:
        ref, _ = jax.jit(lambda v: model.apply(v, x, train=True,
                                               mutable=["batch_stats"]))(
            variables)
    else:
        ref = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    out = jax.jit(lambda v: spatial_unet_apply(model, v, x, mesh,
                                               train=train))(variables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_spatial_unet_gradients_match(mesh, unet_setup):
    model, variables, x = unet_setup
    params, rest = variables["params"], dict(variables)

    def loss_ref(p):
        v = {**rest, "params": p}
        y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(y))

    def loss_sp(p):
        v = {**rest, "params": p}
        return jnp.mean(jnp.square(
            spatial_unet_apply(model, v, x, mesh, train=True)))

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_sp = jax.jit(jax.grad(loss_sp))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = dict(jax.tree_util.tree_leaves_with_path(g_sp))
    assert flat_sp
    for path, leaf in flat_ref:
        got = flat_sp[path]
        scale = max(1.0, float(np.abs(np.asarray(leaf)).max()))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), atol=3e-4 * scale,
            rtol=2e-3, err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("hsp,wsp", [(16, 2), (2, 16), (16, 16)],
                         ids=["vertical", "horizontal", "global"])
def test_spatial_stripe_attention_matches_oracle(mesh, hsp, wsp):
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from cswin_simam_unet_tpu.ops.attention import stripe_attention
    from cswin_simam_unet_tpu.parallel.spatial import spatial_stripe_attention

    Hh = Ww = 16
    B, C, heads = 2, 8, 2
    rs = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rs.randn(B, Hh * Ww, C), jnp.float32)
               for _ in range(3))
    lepe = jnp.asarray(rs.randn(3, 3, 1, C), jnp.float32)

    ref = stripe_attention(q, k, v, lepe, H=Hh, W=Ww, hsp=hsp, wsp=wsp,
                           num_heads=heads)

    body = partial(spatial_stripe_attention, H=Hh, W=Ww, hsp=hsp, wsp=wsp,
                   num_heads=heads, axis_name="spatial", n_shards=8)
    f = shard_map(lambda a, b, c, w: body(a, b, c, w), mesh=mesh,
                  in_specs=(P(None, "spatial"),) * 3 + (P(),),
                  out_specs=P(None, "spatial"), check_vma=False)
    out = f(q, k, v, lepe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_geometry_validation():
    with pytest.raises(ValueError, match="divisible"):
        validate_spatial_geometry(120, 8)
    validate_spatial_geometry(128, 8)
