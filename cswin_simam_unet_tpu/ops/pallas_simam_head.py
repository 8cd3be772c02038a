"""Fused Pallas TPU kernel for the flat segmentation head:
bias-add -> SimAM gate -> grouped 1x1 head dot, in ONE pass over the
pre-pixel-shuffle CARAFE output.

At the 512^2 flagship geometry the flat tensor is (8, 128, 128, 1024)
bf16 = 268 MB, and the unfused chain (ops/simam.py::simam_flat +
ops/flat_dot.py::flat_grouped_dot) walks it once per logical op: forward
stats read, gate read+write, head-dot read; backward dW read, d_gated
write, two simam-VJP read passes, dacc write — ~3.2 GB of HBM traffic
(~5.5 ms measured in XLA fusions).  These kernels do the whole head in
one forward pass and two backward passes (~1.1 GB):

  fwd   :  stats (XLA kLoop over x, nothing materialised) ->
           kernel: xb = x + tile(bias) -> gate(xb; mu, v) ->
           logits = gated . kron(I_G, W)                      [1 read]
  bwd p1:  d_gated = dy . kron(I_G, W^T) recomputed in-VMEM; per-tile
           partials of the SimAM-VJP reductions A = sum t*(x-mu),
           B = sum t*(x-mu)^2 and of dW                       [1 read]
  bwd p2:  dacc (= dx_flat = d bias-added input) from the closed-form
           SimAM VJP + per-tile dbias partials          [1 read, 1 write]

Math and op order are IDENTICAL to the unfused chain (bf16 bias add, f32
gate statistics/energy, bf16 gated values into a bf16 MXU dot with f32
accumulation, f32 dW/A/B reductions), so this is a scheduling change, not
a numerics change; see tests/test_simam_head.py (oracle parity, fwd+grads)
and the hardware-lowering run in tests/test_tpu_numerics.py.

``gate=False`` fuses just bias-add + head dot (the plain CSWin config
without SimAM) — XLA cannot producer-fuse an elementwise add into a dot
operand, so even that saves a full read+write of the flat tensor.

Reference context: the head this fuses is the CARAFE4 output bias +
optional SimAM + final 1x1 conv of train_cswinunet_segmentation.py:432,
:674-682 (SimAM itself is absent from the reference; SURVEY.md preamble).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one source of truth for the block-diagonal head expansion, kron(I_G, w)
# (also imported from here by pallas_carafe_head)
from cswin_simam_unet_tpu.ops.flat_dot import _kron_eye  # noqa: F401
from cswin_simam_unet_tpu.ops.simam import _flat_stats

_INTERPRET = False


def _tile_h(H: int) -> int:
    """Row-tile height: ~8 rows keeps f32 intermediates of a (TH, W, G*C)
    tile within a few MB of VMEM at the flagship geometry."""
    th = 8
    while th > 1 and H % th:
        th //= 2
    return th




def _mm(a, b):
    """MXU matmul with f32 accumulation; HIGHEST precision for f32 operands
    (DEFAULT would round through bf16), DEFAULT for bf16 (already exact and
    HIGHEST does not lower in Mosaic)."""
    prec = (lax.Precision.HIGHEST if a.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32, precision=prec)


def _gate_terms(xf, mu, v, lam):
    """f32 energy + sigmoid gate, matching ops.simam._gate exactly."""
    xc = xf - mu
    e = jnp.square(xc) / (4.0 * (v + lam)) + 0.5
    g = jax.nn.sigmoid(e)
    return xc, g


def _row8(vec, C):
    """(C,) f32 -> (8, C) with the value in row 0 (Pallas sublane padding;
    rows 1-7 vanish in the outer sum, same trick as pallas_layernorm)."""
    return jnp.concatenate([vec[None, :], jnp.zeros((7, C), jnp.float32)],
                           axis=0)


def _dw_rows(gated, dyf, G, C, F):
    """Per-tile dW partials as an (8, C) block, row f = class-f column:
    dW[c, f] = sum_{pos, g} gated(pos, g*C+c) * dy(pos, g*F+f).  Rows are
    used instead of a (C*F,) lane concat (Mosaic cannot concatenate
    lane-unaligned 1-D vectors); requires F <= 8 (checked by the caller)."""
    rows = []
    for f in range(F):
        acc = None
        for gi in range(G):
            xg = lax.slice_in_dim(gated, gi * C, (gi + 1) * C, axis=-1)
            dyg = lax.slice_in_dim(dyf, gi * F + f, gi * F + f + 1, axis=-1)
            s = jnp.sum(xg * dyg, axis=(0, 1), keepdims=False)
            acc = s if acc is None else acc + s
        rows.append(acc[None, :])
    rows.append(jnp.zeros((8 - F, C), jnp.float32))
    return jnp.concatenate(rows, axis=0)


def _fwd_kernel(x_ref, mu_ref, v_ref, b_ref, kw_ref, o_ref, *,
                lam: float, gate: bool, GF: int):
    xb = x_ref[0] + b_ref[...]                     # bias add in x dtype
    if gate:
        xf = xb.astype(jnp.float32)
        _, g = _gate_terms(xf, mu_ref[0, 0].astype(jnp.float32),
                           v_ref[0, 0].astype(jnp.float32), lam)
        y = (xf * g).astype(x_ref.dtype)
    else:
        y = xb
    TH, W, GC = y.shape
    out = _mm(y.reshape(TH * W, GC), kw_ref[...])
    o_ref[0] = out.reshape(TH, W, GF).astype(o_ref.dtype)


def _bwd1_kernel(x_ref, dy_ref, mu_ref, v_ref, b_ref, kwt_ref,
                 A_ref, B_ref, dW_ref, *, lam: float, G: int, C: int, F: int):
    """Reduction pass: per-tile partials of A, B (SimAM VJP) and dW."""
    xf = (x_ref[0] + b_ref[...]).astype(jnp.float32)   # biased input, f32
    mu = mu_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    xc, g = _gate_terms(xf, mu, v, lam)
    gp = g * (1.0 - g)
    TH, W, GC = xf.shape
    dy2 = dy_ref[0].reshape(TH * W, G * F)
    dg = _mm(dy2, kwt_ref[...]).reshape(TH, W, GC)      # d_gated, f32
    t = dg * xf * gp
    A_ref[0, 0] = _row8(jnp.sum(t * xc, axis=(0, 1)), GC)
    B_ref[0, 0] = _row8(jnp.sum(t * jnp.square(xc), axis=(0, 1)), GC)
    # dW[c, f] = sum_{pos, g} gated(pos, g*C+c) * dy(pos, g*F+f); gated in
    # x dtype to match the forward dot's operands, products summed in f32
    gated = (xf * g).astype(x_ref.dtype).astype(jnp.float32)
    dyf = dy_ref[0].astype(jnp.float32)
    dW_ref[0, 0] = _dw_rows(gated, dyf, G, C, F)


def _bwd2_kernel(x_ref, dy_ref, mu_ref, v_ref, A_ref, B_ref, b_ref, kwt_ref,
                 dx_ref, db_ref, *, lam: float, G: int, F: int,
                 N: int, n: int):
    """Elementwise pass: dacc from the closed-form SimAM VJP (the exact
    formula of ops.simam._simam_flat_bwd) + per-tile dbias partials."""
    xf = (x_ref[0] + b_ref[...]).astype(jnp.float32)
    mu = mu_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    w4 = 1.0 / (4.0 * (v + lam))
    xc, g = _gate_terms(xf, mu, v, lam)
    gp = g * (1.0 - g)
    TH, W, GC = xf.shape
    dy2 = dy_ref[0].reshape(TH * W, G * F)
    dg = _mm(dy2, kwt_ref[...]).reshape(TH, W, GC)
    t = dg * xf * gp
    A_ = A_ref[0, 0].astype(jnp.float32)
    B_ = B_ref[0, 0].astype(jnp.float32)
    dx = (dg * g + 2.0 * w4 * t * xc
          - (2.0 * w4 / N) * A_
          - (8.0 * jnp.square(w4) / n) * B_ * xc)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    db_ref[0, 0] = _row8(jnp.sum(dx, axis=(0, 1)), GC)


def _bwd2_nogate_kernel(dy_ref, kwt_ref, dx_ref, db_ref, *, G: int, F: int):
    TH, W, GF = dy_ref[0].shape
    dg = _mm(dy_ref[0].reshape(TH * W, GF), kwt_ref[...])
    GC = dg.shape[-1]
    dx = dg.reshape(TH, W, GC)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    db_ref[0, 0] = _row8(jnp.sum(dx, axis=(0, 1)), GC)


def _bwd1_nogate_kernel(x_ref, dy_ref, b_ref, dW_ref, *, G: int, C: int,
                        F: int):
    y = (x_ref[0] + b_ref[...]).astype(jnp.float32)
    dyf = dy_ref[0].astype(jnp.float32)
    dW_ref[0, 0] = _dw_rows(y, dyf, G, C, F)


def _reference(x, bias, w, G, lam, gate):
    """Pure-XLA composition with identical math (the pre-fusion code path);
    also the autodiff oracle for the kernel tests."""
    xb = x + jnp.tile(bias, G)
    if gate:
        mu, v, _, _ = _flat_stats(xb, G)
        xf = xb.astype(jnp.float32)
        _, g = _gate_terms(xf, mu, v, lam)
        xb = (xf * g).astype(x.dtype)
    return jnp.dot(xb, _kron_eye(w, G, x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def simam_head(x, bias, w, G: int, lam: float = 1e-4, gate: bool = True):
    """Fused flat head: ``(x + tile(bias, G))`` -> optional SimAM gate
    (statistics pooled per real channel over (H, W, G), exactly
    :func:`ops.simam.simam_flat`) -> ``. kron(I_G, w)``.

    x (B, H, W, G*C) in compute dtype; bias (C,) in compute dtype;
    w (C, F) f32 param, F <= 8 (the backward packs per-class dW partials
    into sublane rows).  Returns (B, H, W, G*F) in x.dtype.
    """
    if w.shape[-1] > 8:
        raise ValueError(f"simam_head supports at most 8 classes, got "
                         f"{w.shape[-1]}; use the unfused head")
    return _fwd(x, bias, w, G, lam, gate)[0]


def _specs(B, H, W, GC, TH):
    nR = H // TH
    x_spec = pl.BlockSpec((1, TH, W, GC), lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
    # per-batch row vectors are passed as (B, 1, GC): Mosaic requires the
    # second-to-last block dim to be 8-divisible or the full array dim
    row_spec = pl.BlockSpec((1, 1, GC), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((n,), lambda b, i: (0,),
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda b, i: (0, 0),
                                    memory_space=pltpu.VMEM)
    part_spec = lambda n: pl.BlockSpec((1, 1, 8, n),
                                       lambda b, i: (b, i, 0, 0),
                                       memory_space=pltpu.VMEM)
    return nR, x_spec, row_spec, vec, mat, part_spec


def head_fwd_pallas(x, mu, v, bias_t, kw, G, F, lam, gate,
                    interpret=False):
    """The forward pallas_call alone, with PRECOMPUTED stats (mu, v) as
    (B, G*C) f32 and an already-tiled bias (G*C,).  Shared by
    :func:`simam_head` and the fully-fused CARAFE head
    (ops/pallas_carafe_head.py), whose reassembly kernel emits the moments."""
    B, H, W, GC = x.shape
    TH = _tile_h(H)
    nR, x_spec, row_spec, vec, mat, _ = _specs(B, H, W, GC, TH)
    kernel = functools.partial(_fwd_kernel, lam=lam, gate=gate, GF=G * F)
    return pl.pallas_call(
        kernel,
        grid=(B, nR),
        in_specs=[x_spec, row_spec, row_spec, vec(GC), mat(GC, G * F)],
        out_specs=pl.BlockSpec((1, TH, W, G * F), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, G * F), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * GC * (G * F + 2),
            transcendentals=B * H * W * GC,
            bytes_accessed=2 * x.size + 2 * B * H * W * G * F),
        interpret=interpret,
    )(x, mu[:, None, :], v[:, None, :], bias_t, kw)


def head_bwd1_pallas(x, dy, mu, v, bias_t, kwt, G, C, F, lam,
                     interpret=False):
    """The gate-path reduction pallas_call alone (pass 1 of the backward):
    returns POOLED (A, Bq) as (B, G*C) f32 (per-real-channel sums re-tiled
    across slots, the simam_flat pooling) and dW (C, F) f32."""
    B, H, W, GC = x.shape
    TH = _tile_h(H)
    nR, x_spec, row_spec, vec, mat, part = _specs(B, H, W, GC, TH)
    dy_spec = pl.BlockSpec((1, TH, W, G * F), lambda b, i: (b, i, 0, 0),
                           memory_space=pltpu.VMEM)
    k1 = functools.partial(_bwd1_kernel, lam=lam, G=G, C=C, F=F)
    A_p, B_p, dW_p = pl.pallas_call(
        k1,
        grid=(B, nR),
        in_specs=[x_spec, dy_spec, row_spec, row_spec, vec(GC),
                  mat(G * F, GC)],
        out_specs=[part(GC), part(GC), part(C)],
        out_shape=[jax.ShapeDtypeStruct((B, nR, 8, GC), jnp.float32),
                   jax.ShapeDtypeStruct((B, nR, 8, GC), jnp.float32),
                   jax.ShapeDtypeStruct((B, nR, 8, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * W * GC,
            transcendentals=B * H * W * GC,
            bytes_accessed=2 * x.size),
        interpret=interpret,
    )(x, dy, mu[:, None, :], v[:, None, :], bias_t, kwt)
    A = jnp.sum(A_p, axis=(1, 2))                # (B, GC)
    Bq = jnp.sum(B_p, axis=(1, 2))
    # pool the per-slot partials per real channel, re-tile (simam_flat)
    A = jnp.tile(jnp.sum(A.reshape(B, G, C), axis=1), (1, G))
    Bq = jnp.tile(jnp.sum(Bq.reshape(B, G, C), axis=1), (1, G))
    dW = jnp.sum(dW_p, axis=(0, 1))[:F, :].T       # rows f -> (C, F)
    return A, Bq, dW


def _fwd(x, bias, w, G, lam, gate):
    B, H, W, GC = x.shape
    C = GC // G
    F = w.shape[-1]
    if gate:
        mu, v, _, _ = _flat_stats(x + jnp.tile(bias, G), G)
        mu, v = mu[:, 0, 0, :], v[:, 0, 0, :]        # (B, GC) f32
    else:
        mu = v = jnp.zeros((B, GC), jnp.float32)
    if _INTERPRET:
        return _reference(x, bias, w, G, lam, gate), (x, bias, w, mu, v)
    kw = _kron_eye(w, G, x.dtype)
    out = head_fwd_pallas(x, mu, v, jnp.tile(bias, G), kw, G, F, lam, gate)
    return out, (x, bias, w, mu, v)


def _bwd(G, lam, gate, residuals, dy):
    x, bias, w, mu, v = residuals
    B, H, W, GC = x.shape
    C = GC // G
    F = w.shape[-1]
    if _INTERPRET:
        def f(x_, b_, w_):
            return _reference(x_, b_, w_, G, lam, gate)
        _, vjp = jax.vjp(f, x, bias, w)
        return vjp(dy)
    kwt = _kron_eye(w.T, G, dy.dtype)                # (G*F, G*C)
    bias_t = jnp.tile(bias, G)
    TH = _tile_h(H)
    nR, x_spec, row_spec, vec, mat, part = _specs(B, H, W, GC, TH)
    dy_spec = pl.BlockSpec((1, TH, W, G * F), lambda b, i: (b, i, 0, 0),
                           memory_space=pltpu.VMEM)
    N = H * W * G
    n = N - 1

    if gate:
        A, Bq, dW = head_bwd1_pallas(x, dy, mu, v, bias_t, kwt, G, C, F, lam)

        k2 = functools.partial(_bwd2_kernel, lam=lam, G=G, F=F, N=N, n=n)
        dx, db_p = pl.pallas_call(
            k2,
            grid=(B, nR),
            in_specs=[x_spec, dy_spec, row_spec, row_spec, row_spec,
                      row_spec, vec(GC), mat(G * F, GC)],
            out_specs=[x_spec, part(GC)],
            out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct((B, nR, 8, GC), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=14 * B * H * W * GC,
                transcendentals=B * H * W * GC,
                bytes_accessed=4 * x.size),
            interpret=False,
        )(x, dy, mu[:, None, :], v[:, None, :], A[:, None, :], Bq[:, None, :], bias_t, kwt)
    else:
        k1 = functools.partial(_bwd1_nogate_kernel, G=G, C=C, F=F)
        dW_p = pl.pallas_call(
            k1,
            grid=(B, nR),
            in_specs=[x_spec, dy_spec, vec(GC)],
            out_specs=part(C),
            out_shape=jax.ShapeDtypeStruct((B, nR, 8, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(x, dy, bias_t)
        dW = jnp.sum(dW_p, axis=(0, 1))[:F, :].T       # rows f -> (C, F)
        k2 = functools.partial(_bwd2_nogate_kernel, G=G, F=F)
        dx, db_p = pl.pallas_call(
            k2,
            grid=(B, nR),
            in_specs=[dy_spec, mat(G * F, GC)],
            out_specs=[x_spec, part(GC)],
            out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct((B, nR, 8, GC), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=False,
        )(dy, kwt)

    db = jnp.sum(db_p, axis=(0, 1, 2))               # (GC,)
    db = jnp.sum(db.reshape(G, C), axis=0).astype(bias.dtype)
    return dx, db, dW.astype(w.dtype)


simam_head.defvjp(_fwd, _bwd)
