"""Fused Pallas TPU LayerNorm (forward + backward custom VJP).

XLA lowers flax's LayerNorm into several sequential passes over the token
tensor (an f32 convert+reduce for the statistics, the normalize-scale
chain, and two more reduction passes in the backward), each of which it
schedules as a lane-dim reduction loop fusion — measured ~0.5 ms per LN at
the 512^2 stage-1 geometry (B 8, L 16384, C 64) where the pure
HBM-bandwidth floor is ~0.04 ms.  These kernels do stats + normalize in a
single VMEM pass (and the full input-gradient formula plus per-tile
param-grad partials in one backward pass).

Statistics use flax's ``use_fast_variance`` raw-moment form
(var = E[x^2] - E[x]^2) in f32, matching ``nn.LayerNorm`` defaults; see
tests/test_layernorm.py for fwd+grad parity against flax on every model
geometry.  Reference usage: LayerNorm before attention/MLP in every CSWin
block (train_cswinunet_segmentation.py:318-332).

Layout: x is processed as (M, C) tokens; callers reshape (B, L, C) ->
(B*L, C) (free).  Token tiles of TM rows; scale/bias live in VMEM whole.
"""

from __future__ import annotations

import functools

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def _tile_m(M: int, C: int) -> int:
    """Largest power-of-two token tile with ~128K elements that divides M."""
    tm = max(8, min(M, (1 << 17) // max(C, 1)))
    while tm > 1 and M % tm:
        tm //= 2
    return tm


def _stats(xf, C: int, eps: float):
    s = jnp.sum(xf, axis=-1, keepdims=True)
    ss = jnp.sum(jnp.square(xf), axis=-1, keepdims=True)
    mu = s / C
    var = jnp.maximum(0.0, ss / C - jnp.square(mu))
    return mu, lax.rsqrt(var + eps)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, C: int, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mu, rstd = _stats(xf, C, eps)
    # flax op order: mul = rsqrt(var+eps) * scale; y = (x-mean)*mul + bias
    mul = rstd * g_ref[...].astype(jnp.float32)[None, :]
    y = (xf - mu) * mul + b_ref[...].astype(jnp.float32)[None, :]
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(x_ref, g_ref, dy_ref, dx_ref, dg_ref, db_ref, *,
                C: int, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    dyf = dy_ref[...].astype(jnp.float32)
    mu, rstd = _stats(xf, C, eps)
    xhat = (xf - mu) * rstd
    a = dyf * g_ref[...].astype(jnp.float32)[None, :]
    m1 = jnp.sum(a, axis=-1, keepdims=True) / C
    m2 = jnp.sum(a * xhat, axis=-1, keepdims=True) / C
    dx_ref[...] = (rstd * (a - m1 - xhat * m2)).astype(dx_ref.dtype)
    # per-tile param-grad partials; the (8, C) block is sublane-padding
    # (Pallas requires the second-to-last block dim divisible by 8) — row 0
    # carries the partial, rows 1-7 are zero and vanish in the outer sum
    zeros = jnp.zeros((7, C), jnp.float32)
    dg_ref[0] = jnp.concatenate(
        [jnp.sum(dyf * xhat, axis=0, keepdims=True), zeros], axis=0)
    db_ref[0] = jnp.concatenate(
        [jnp.sum(dyf, axis=0, keepdims=True), zeros], axis=0)


def _ln_reference(x, scale, bias, eps):
    """Pure-XLA fallback with identical (fast-variance, f32) math."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        - jnp.square(mu))  # flax clamps fast-variance at 0
    mul = lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mu) * mul + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, scale, bias, eps: float = 1e-5):
    """LayerNorm over the last axis of x (any leading shape), fused on TPU.

    Semantics match ``nn.LayerNorm(epsilon=eps)`` defaults: f32 fast-variance
    statistics, f32 scale/bias application, output cast to x.dtype.
    """
    return _ln_fwd(x, scale, bias, eps)[0]


def _ln_fwd_impl(x, scale, bias, eps):
    if _INTERPRET:
        return _ln_reference(x, scale, bias, eps)
    orig_shape = x.shape
    C = orig_shape[-1]
    x2 = x.reshape(-1, C)
    M = x2.shape[0]
    TM = _tile_m(M, C)
    kernel = functools.partial(_fwd_kernel, C=C, eps=eps)
    y = pl.pallas_call(
        kernel,
        grid=(M // TM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        interpret=_INTERPRET,
    )(x2, scale, bias)
    return y.reshape(orig_shape)


def _ln_fwd(x, scale, bias, eps):
    return _ln_fwd_impl(x, scale, bias, eps), (x, scale)


def _ln_bwd(eps, residuals, dy):
    x, scale = residuals
    if _INTERPRET:
        def f(x_, s_, b_):
            return _ln_reference(x_, s_, b_, eps)
        zero_b = jnp.zeros_like(scale)
        _, vjp = jax.vjp(f, x, scale, zero_b)
        return vjp(dy)
    orig_shape = x.shape
    C = orig_shape[-1]
    x2 = x.reshape(-1, C)
    dy2 = dy.reshape(-1, C)
    M = x2.shape[0]
    TM = _tile_m(M, C)
    nM = M // TM
    kernel = functools.partial(_bwd_kernel, C=C, eps=eps)
    dx, dg_part, db_part = pl.pallas_call(
        kernel,
        grid=(nM,),
        in_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((nM, 8, C), jnp.float32),
            jax.ShapeDtypeStruct((nM, 8, C), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x2, scale, dy2)
    dg = jnp.sum(dg_part, axis=(0, 1)).astype(scale.dtype)
    db = jnp.sum(db_part, axis=(0, 1)).astype(scale.dtype)
    return dx.reshape(orig_shape), dg, db


layer_norm.defvjp(_ln_fwd, _ln_bwd)
