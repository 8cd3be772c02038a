"""Hardware-numerics tests: Pallas kernels vs XLA oracles on a REAL TPU.

The CPU conftest runs every kernel in interpret mode, which executes the
*JAX semantics* of each op — not the Mosaic lowering.  The two can diverge
silently: ``pltpu.repeat`` is a tile repeat on hardware but was emulated
with the element-wise ``jnp.repeat`` in interpret mode, so the CARAFE
kernels passed every CPU test while computing garbage on the chip (caught
2026-08-16; fixed in ops/pallas_carafe.py::_expand_s).  These tests re-run
the kernel-vs-oracle parity checks on the actual hardware lowering.

They skip under the CPU conftest; run directly against the TPU with:

    cd /root/repo && python -m pytest tests/test_tpu_numerics.py \
        -q -p no:cacheprovider --noconftest
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# remote TPU compiles run ~40 s each through the axon tunnel; the
# shared repo-local persistent cache makes re-runs near-instant
from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import cswin_simam_unet_tpu.ops.carafe as oc
import cswin_simam_unet_tpu.ops.pallas_carafe as pc
import cswin_simam_unet_tpu.ops.pallas_layernorm as pln
from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.pallas_attention_v2 import (
    stripe_attention_pallas_v2,
)

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="hardware-lowering parity needs a real TPU")


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


def _rel_err(got, want):
    got, want = np.asarray(got), np.asarray(want)
    return np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12)


# the model's CARAFE geometries: the deepest decoder 2x upsample (C=256,
# W=16 — narrow sublane tiles), a C=128 2x, and the final 4x head (C=64 —
# lane-UNaligned, exercises the broadcast path of _expand_s)
CARAFE_GEOMS = [(1, 16, 32, 128, 2), (2, 32, 32, 64, 4)]
CARAFE_FWD_GEOMS = CARAFE_GEOMS + [(1, 16, 16, 256, 2)]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B,H,W,C,S", CARAFE_FWD_GEOMS)
def test_carafe_forward_on_tpu(B, H, W, C, S, dtype):
    x = _rand((B, H, W, C), 0).astype(dtype)
    enc = _rand((B, H, W, 9 * S * S), 1).astype(dtype)
    got = pc.carafe_reassemble_pallas(x, enc, S, 3)
    want = oc.carafe_reassemble(x, enc, S, 3)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    assert _rel_err(got, want) < tol


@pytest.mark.parametrize("B,H,W,C,S", CARAFE_GEOMS)
def test_carafe_gradients_on_tpu(B, H, W, C, S):
    x = _rand((B, H, W, C), 2)
    enc = _rand((B, H, W, 9 * S * S), 3)

    def loss_pl(x, enc):
        return jnp.sum(jnp.sin(pc.carafe_reassemble_pallas(x, enc, S, 3)))

    def loss_xla(x, enc):
        return jnp.sum(jnp.sin(oc.carafe_reassemble(x, enc, S, 3)))

    g_pl = jax.jit(jax.grad(loss_pl, argnums=(0, 1)))(x, enc)
    g_xla = jax.jit(jax.grad(loss_xla, argnums=(0, 1)))(x, enc)
    assert _rel_err(g_pl[0], g_xla[0]) < 1e-5, "dx mismatch on TPU"
    assert _rel_err(g_pl[1], g_xla[1]) < 1e-5, "denc mismatch on TPU"


# (H, W, hsp, wsp): horizontal stripe, vertical stripe, and global window
ATTN_GEOMS = [(16, 16, 2, 16), (16, 16, 16, 2), (8, 8, 8, 8)]


@pytest.mark.parametrize("H,W,hsp,wsp", ATTN_GEOMS)
def test_stripe_attention_v2_on_tpu(H, W, hsp, wsp):
    B, C, heads = 2, 32, 2
    q, k, v = (_rand((B, H * W, C), s, 0.5) for s in (0, 1, 2))
    kernel = _rand((3, 3, 1, C), 3, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)

    def f_pl(q, k, v, kernel):
        return jnp.sum(
            jnp.sin(stripe_attention_pallas_v2(q, k, v, kernel, **kw)))

    def f_xla(q, k, v, kernel):
        return jnp.sum(jnp.sin(stripe_attention(q, k, v, kernel, **kw)))

    out_pl = stripe_attention_pallas_v2(q, k, v, kernel, **kw)
    out_xla = stripe_attention(q, k, v, kernel, **kw)
    assert _rel_err(out_pl, out_xla) < 1e-5

    # Backward: both the fused kernel and XLA's own backward run MXU
    # matmuls at default (single-bf16-pass) precision, so each differs
    # from a HIGHEST-precision oracle by ~1e-3 rel (measured: pallas is
    # at or below xla-default's own error on every cotangent).  Judge
    # the kernel against the HIGHEST oracle at bf16-noise tolerance —
    # a layout bug shows up as O(1) error, far above this.
    g_pl = jax.jit(jax.grad(f_pl, argnums=(0, 1, 2, 3)))(q, k, v, kernel)
    with jax.default_matmul_precision("highest"):
        g_hi = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2, 3)))(
            q, k, v, kernel)
    for a, b, name in zip(g_pl, g_hi, ("dq", "dk", "dv", "dlepe")):
        assert _rel_err(a, b) < 1e-2, f"{name} mismatch on TPU"


# (M, C) token geometries of every LN in the 512^2 flagship model
LN_GEOMS = [(8 * 16384, 64), (8 * 4096, 128), (8 * 1024, 256), (8 * 256, 512)]


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("M,C", LN_GEOMS[:2] + LN_GEOMS[3:])
def test_layernorm_on_tpu(M, C, dtype):
    x = _rand((M // 256, 256, C), 0, 0.7).astype(dtype)
    scale = _rand((C,), 1, 0.3).astype(jnp.float32) + 1.0
    bias = _rand((C,), 2, 0.1).astype(jnp.float32)

    out = pln.layer_norm(x, scale, bias, 1e-5)
    want = pln._ln_reference(x, scale, bias, 1e-5)
    assert _rel_err(out, want) < (1e-5 if dtype == jnp.float32 else 1e-2)

    def f_pl(x, s, b):
        return jnp.sum(jnp.sin(pln.layer_norm(x, s, b, 1e-5)))

    def f_ref(x, s, b):
        return jnp.sum(jnp.sin(pln._ln_reference(x, s, b, 1e-5)))

    g_pl = jax.jit(jax.grad(f_pl, argnums=(0, 1, 2)))(x, scale, bias)
    g_ref = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(x, scale, bias)
    tol = 1e-4 if dtype == jnp.float32 else 2e-2
    for a, b_, name in zip(g_pl, g_ref, ("dx", "dscale", "dbias")):
        assert _rel_err(a, b_) < tol, f"{name} mismatch on TPU"


# fused flat-head: gate both on and off, binary + small multiclass heads,
# both compute dtypes (the f32 path must be exact vs a HIGHEST-precision
# oracle; bf16 differs only at quantization level)
# fully-fused CARAFE head (reassembly + bias + SimAM + head dot, one
# custom-VJP op): the flagship S=4/C=64 geometry in both dtypes, gate on
# and off, plus a multiclass head — fwd and all four cotangents vs the
# HIGHEST-precision XLA oracle
@pytest.mark.parametrize("dtype,gate,F", [
    (jnp.float32, True, 1), (jnp.float32, False, 1),
    (jnp.bfloat16, True, 1), (jnp.bfloat16, True, 4),
])
def test_carafe_head_on_tpu(dtype, gate, F):
    import cswin_simam_unet_tpu.ops.pallas_carafe_head as ch
    B, H, W, C, S = 2, 32, 32, 64, 4
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32)).astype(dtype)
    enc = jnp.asarray(
        rs.randn(B, H, W, 9 * S * S).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1).astype(dtype)
    w = jnp.asarray(rs.randn(C, F).astype(np.float32))
    dy = jnp.asarray(
        rs.randn(B, H, W, S * S * F).astype(np.float32)).astype(dtype)
    with jax.default_matmul_precision("highest"):
        o1, vjp1 = jax.vjp(
            jax.jit(lambda x, enc, b, w: ch.carafe_simam_head(
                x, enc, b, w, S, 3, 1e-4, gate)), x, enc, b, w)
        g1 = vjp1(dy)
        o2, vjp2 = jax.vjp(
            jax.jit(lambda x, enc, b, w: ch._reference(
                x, enc, b, w, S, 3, 1e-4, gate)), x, enc, b, w)
        g2 = vjp2(dy)
    tol = 5e-6 if dtype == jnp.float32 else 2e-2
    assert _rel_err(o1, o2) < tol
    for a, c, name in zip(g1, g2, ("dx", "denc", "dbias", "dw")):
        assert _rel_err(a, c) < tol, f"{name} mismatch on TPU"


@pytest.mark.parametrize("dtype,gate,F", [
    (jnp.float32, True, 1), (jnp.float32, False, 1),
    (jnp.bfloat16, True, 1), (jnp.bfloat16, False, 1),
    (jnp.bfloat16, True, 3),
])
def test_simam_head_on_tpu(dtype, gate, F):
    import cswin_simam_unet_tpu.ops.pallas_simam_head as sh
    B, H, W, G, C = 2, 32, 32, 16, 64
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, G * C).astype(np.float32)).astype(dtype)
    b = jnp.asarray(rs.randn(C).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rs.randn(C, F).astype(np.float32))
    dy = jnp.asarray(rs.randn(B, H, W, G * F).astype(np.float32)).astype(dtype)
    with jax.default_matmul_precision("highest"):
        o1, vjp1 = jax.vjp(
            jax.jit(lambda x, b, w: sh.simam_head(x, b, w, G, 1e-4, gate)),
            x, b, w)
        g1 = vjp1(dy)
        o2, vjp2 = jax.vjp(
            jax.jit(lambda x, b, w: sh._reference(x, b, w, G, 1e-4, gate)),
            x, b, w)
        g2 = vjp2(dy)
    tol = 5e-6 if dtype == jnp.float32 else 2e-2
    assert _rel_err(o1, o2) < tol
    for a, c in zip(g1, g2):
        assert _rel_err(a, c) < tol


# Flash-attention hardware lowering: the tiled online-softmax sweep with
# its fori_loop dynamic slices and lane-column L stores is exactly the
# kind of code where Mosaic and interpret mode can diverge.  Windows
# chosen to exercise multi-tile sweeps (N=2048: 4 KV tiles) and the
# dispatch boundary geometry.
FLASH_GEOMS = [(64, 64, 32, 64), (64, 64, 64, 64)]  # band N=2048, global 4096


@pytest.mark.parametrize("H,W,hsp,wsp", FLASH_GEOMS)
def test_flash_attention_on_tpu(H, W, hsp, wsp):
    from cswin_simam_unet_tpu.ops.pallas_attention_flash import (
        stripe_attention_pallas_flash,
    )
    B, C, heads = 1, 32, 2
    q, k, v = (_rand((B, H * W, C), s, 0.5) for s in (0, 1, 2))
    kernel = _rand((3, 3, 1, C), 3, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)

    def f_pl(q, k, v, kernel):
        return jnp.sum(
            jnp.sin(stripe_attention_pallas_flash(q, k, v, kernel, **kw)))

    def f_xla(q, k, v, kernel):
        return jnp.sum(jnp.sin(stripe_attention(q, k, v, kernel, **kw)))

    out_pl = stripe_attention_pallas_flash(q, k, v, kernel, **kw)
    out_xla = stripe_attention(q, k, v, kernel, **kw)
    assert _rel_err(out_pl, out_xla) < 1e-4

    g_pl = jax.jit(jax.grad(f_pl, argnums=(0, 1, 2, 3)))(q, k, v, kernel)
    with jax.default_matmul_precision("highest"):
        g_hi = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2, 3)))(
            q, k, v, kernel)
    for a, b, name in zip(g_pl, g_hi, ("dq", "dk", "dv", "dlepe")):
        assert _rel_err(a, b) < 1e-2, f"{name} mismatch on TPU"


def test_pallas_bundle_export_on_tpu(tmp_path):
    """``export_serving(batch_size=None)`` on a use_pallas=True model
    (VERDICT r04 #7): auto-bundles fixed-batch modules whose Mosaic
    custom calls lower for real, and the loaded dispatcher pads/chunks any
    request batch to match in-process predict."""
    from cswin_simam_unet_tpu.models import CSWinUNet
    from cswin_simam_unet_tpu.serving import (
        export_serving,
        load_serving,
        make_serving_fn,
        save_serving,
    )
    model = CSWinUNet(img_size=64, embed_dim=16, depth=(1, 1, 1, 1),
                      split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2),
                      use_simam=True, use_pallas=True, dtype=jnp.bfloat16)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3)), train=False))(jax.random.PRNGKey(0))
    blob = export_serving(model, variables, batch_size=None, image_size=64,
                          bundle_batch_sizes=(1, 2))
    path = str(tmp_path / "pallas_bundle.stablehlo")
    save_serving(path, blob)
    serve = load_serving(path)
    rs = np.random.RandomState(0)
    for b in (1, 2, 5):  # exact, exact, chunk+pad
        x = rs.randint(0, 256, (b, 64, 64, 3), dtype=np.uint8)
        got = np.asarray(serve(x))
        want = np.asarray(make_serving_fn(model, variables)(
            jnp.asarray(x)))
        assert got.shape == want.shape == (b, 64, 64, 1)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_flash_attention_dropout_on_tpu():
    """ADVICE r04: the flash kernel's in-kernel PRNG dropout path had zero
    hardware coverage while the shipped 2048^2 config trains through it.
    Three gates at attn_drop=0.3 on the 4096-token global window (the
    exact stage-4 geometry that dispatches here):

    1. fixed seed -> bitwise-deterministic resample; different seed (and
       dropout-free) -> different output;
    2. mask-exact oracle: rebuild the kernels' exact keep mask in plain
       jnp (possible because the mask is a value-pure counter hash) and
       compare fwd + dq/dk/dv against an explicit-mask XLA softmax —
       passes ONLY if the fwd/dq/dkv kernels regenerate identical keep
       masks (a divergence would bias gradients by O(attn_drop));
    3. unbiasedness: the seed-mean of the dropped forward converges to the
       dropout-free forward (inverted-dropout scaling is right in the
       hardware lowering, not just interpret mode).
    """
    from cswin_simam_unet_tpu.ops.pallas_attention_flash import (
        stripe_attention_pallas_flash,
    )
    H, W, hsp, wsp = 64, 64, 64, 64  # one 4096-token global window
    B, C, heads = 1, 32, 2
    q, k, v = (_rand((B, H * W, C), s, 0.5) for s in (0, 1, 2))
    kernel = _rand((3, 3, 1, C), 3, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)
    drop_kw = dict(attn_drop=0.3, deterministic=False, **kw)

    flash = stripe_attention_pallas_flash
    run = jax.jit(lambda q, k, v, kernel, key: flash(
        q, k, v, kernel, dropout_rng=key, **drop_kw))

    key7 = jax.random.PRNGKey(7)
    out_a = run(q, k, v, kernel, key7)
    out_b = run(q, k, v, kernel, key7)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    out_c = run(q, k, v, kernel, jax.random.PRNGKey(8))
    out_free = jax.jit(lambda q, k, v, kernel: flash(
        q, k, v, kernel, **kw))(q, k, v, kernel)
    assert _rel_err(out_a, out_c) > 1e-3
    assert _rel_err(out_a, out_free) > 1e-3

    # 2. mask-exact oracle: the value-pure counter hash lets plain jnp
    # rebuild the EXACT keep mask the kernels draw, so the dropped
    # attention fwd AND all three gradients can be compared directly
    # against an explicit-mask XLA softmax — a far sharper gate than
    # finite differences, whose error at this scale is dominated by the
    # f32 online-softmax forward's rounding noise (measured: 60% FD error
    # at eps=2e-3, 4.8% at 1e-2, while this comparison pins ~4e-4; a
    # fwd/bwd mask divergence would show up here as O(drop) = O(0.3)).
    from cswin_simam_unet_tpu.ops.pallas_attention_flash import (
        _drop_params,
        _flash_attention_bands,
        _pick_tile,
        hash_keep_mask,
    )
    N, Cb, dh = hsp * wsp, C, C // heads
    TQ = TK = _pick_tile(N)
    nT = N // TQ
    threshold, inv_keep = _drop_params(0.3)
    scale = dh ** -0.5
    seed = jnp.asarray([20260821], jnp.int32)
    rs = np.random.RandomState(11)
    qb, kb, vb = (jnp.asarray(rs.randn(1, N, Cb).astype(np.float32) * 0.5)
                  for _ in range(3))

    def full_mask(h):
        return jnp.concatenate([
            jnp.concatenate([hash_keep_mask(seed[0], 0, h, qi, kj, TQ, TK,
                                            threshold)
                             for kj in range(nT)], axis=1)
            for qi in range(nT)], axis=0)

    masks = [full_mask(h) for h in range(heads)]
    keep_rates = [float(jnp.mean(m)) for m in masks]
    assert all(abs(r - 0.7) < 0.01 for r in keep_rates), keep_rates

    def oracle(qb, kb, vb):
        outs = []
        for h in range(heads):
            cs = slice(h * dh, (h + 1) * dh)
            s = (qb[0, :, cs] * scale) @ kb[0, :, cs].T
            p = jax.nn.softmax(s, axis=-1)
            pt = jnp.where(masks[h], p * inv_keep, 0.0)
            outs.append(pt @ vb[0, :, cs])
        return jnp.concatenate(outs, axis=-1)[None]

    bands_fn = lambda qb, kb, vb: _flash_attention_bands(  # noqa: E731
        qb, kb, vb, seed, heads, scale, 0.3)
    out_k = jax.jit(bands_fn)(qb, kb, vb)
    out_o = jax.jit(oracle)(qb, kb, vb)
    assert _rel_err(out_k, out_o) < 6e-3, _rel_err(out_k, out_o)

    co = jnp.asarray(rs.randn(*out_o.shape).astype(np.float32))
    gk = jax.jit(jax.grad(
        lambda q_, k_, v_: jnp.vdot(bands_fn(q_, k_, v_), co),
        argnums=(0, 1, 2)))(qb, kb, vb)
    go = jax.jit(jax.grad(
        lambda q_, k_, v_: jnp.vdot(oracle(q_, k_, v_), co),
        argnums=(0, 1, 2)))(qb, kb, vb)
    for name, a, b in zip(("dq", "dk", "dv"), gk, go):
        assert _rel_err(a, b) < 3e-3, (name, _rel_err(a, b))

    # 3. unbiasedness over seeds (law of large numbers on the keep masks)
    S = 192
    acc = jnp.zeros_like(out_free)
    base = jax.random.PRNGKey(100)
    add = jax.jit(lambda acc, q, k, v, kernel, key: acc + flash(
        q, k, v, kernel, dropout_rng=key, **drop_kw))
    for s in range(S):
        acc = add(acc, q, k, v, kernel, jax.random.fold_in(base, s))
    mean = acc / S
    assert _rel_err(mean, out_free) < 0.08
