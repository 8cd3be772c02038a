"""scan_stages=True: lax.scan over multi-block CSWin stages.

The scanned form must be a pure re-layout of the unrolled model — identical
deterministic outputs from converted params, identical param counts, and a
bijective stack/unstack converter pair (models/scan_params.py) so
checkpoints and the torch importer/exporter work in either mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_simam_unet_tpu.models import CSWinUNet
from cswin_simam_unet_tpu.models.scan_params import (
    adapt_scan_layout,
    stack_scanned_params,
    unstack_scanned_params,
)

KW = dict(img_size=64, embed_dim=16, depth=(1, 2, 2, 1),
          split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2), use_simam=True)


def _models(**extra):
    return (CSWinUNet(**KW, **extra),
            CSWinUNet(**KW, scan_stages=True, **extra))


def test_scan_matches_unrolled_deterministic():
    plain, scanned = _models()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    v = jax.jit(lambda r: plain.init(r, x, train=False))(
        jax.random.PRNGKey(0))
    v_scan = {"params": stack_scanned_params(v["params"], KW["depth"])}
    out = jax.jit(lambda v: plain.apply(v, x, train=False))(v)
    out_s = jax.jit(lambda v: scanned.apply(v, x, train=False))(v_scan)
    # NB: assert_allclose treats NaN == NaN as equal — guard finiteness
    # explicitly so a degenerate geometry can't "pass" with NaNs.
    assert bool(jnp.isfinite(out).all())
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_scan_param_count_and_roundtrip():
    plain, scanned = _models()
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r: plain.init(r, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0))
    shapes_s = jax.eval_shape(
        lambda r: scanned.init(r, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0))
    count = sum(int(np.prod(l.shape)) for l in
                jax.tree_util.tree_leaves(shapes["params"]))
    count_s = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(shapes_s["params"]))
    assert count == count_s
    # scanned tree has _scan groups; unrolled does not
    assert any(k.endswith("_scan") for k in shapes_s["params"])
    assert not any(k.endswith("_scan") for k in shapes["params"])

    # converter bijectivity on a real (tiny) init
    v = plain.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    p = v["params"]
    back = unstack_scanned_params(stack_scanned_params(p, KW["depth"]))
    ref = {jax.tree_util.keystr(k): l for k, l in
           jax.tree_util.tree_leaves_with_path(p)}
    got = {jax.tree_util.keystr(k): l for k, l in
           jax.tree_util.tree_leaves_with_path(back)}
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k]),
                                      np.asarray(got[k]))


def test_scan_train_mode_grads():
    """Training step semantics: dropout/drop-path rngs thread through the
    scan, gradients flow to every stacked block."""
    _, scanned = _models(drop_rate=0.1, attn_drop_rate=0.1,
                         drop_path_rate=0.1)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                    jnp.float32)
    v = scanned.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(params):
        out = scanned.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(out ** 2)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(loss))
    stacked = grads["stage3_scan"]["block"]["qkv"]["kernel"]
    g = np.asarray(stacked)
    assert g.shape[0] == KW["depth"][2]
    # every block in the stack receives signal
    assert all(np.abs(g[i]).max() > 0 for i in range(g.shape[0]))


def test_adapt_scan_layout_both_directions():
    plain, scanned = _models()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    v_s = scanned.init(jax.random.PRNGKey(0), x, train=False)

    to_scan = adapt_scan_layout(v_s["params"], v["params"])
    assert set(to_scan) == set(v_s["params"])
    to_plain = adapt_scan_layout(v["params"], v_s["params"])
    assert set(to_plain) == set(v["params"])
    # unscanned target + unscanned input: untouched
    same = adapt_scan_layout(v["params"], v["params"])
    assert set(same) == set(v["params"])


def test_export_roundtrip_with_scan():
    """export-torch from a scan_stages model == export from the unrolled
    model with the same (converted) weights."""
    from cswin_simam_unet_tpu.compat import export_cswin_variables

    plain, scanned = _models()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = plain.init(jax.random.PRNGKey(3), x, train=False)
    sd = export_cswin_variables(v, depth=KW["depth"])
    v_scan = {"params": stack_scanned_params(v["params"], KW["depth"])}
    sd_s = export_cswin_variables(v_scan, depth=KW["depth"])
    assert set(sd) == set(sd_s)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd_s[k])
