"""Flash (KV-tiled, online-softmax) stripe attention for LARGE windows.

The v2 kernel (:mod:`cswin_simam_unet_tpu.ops.pallas_attention_v2`)
materialises the full (TW, N, N) score block per grid step, so VMEM and the
Mosaic compile scale with N^2 — pathological for single windows >= 4096
tokens (the 2048^2 stage-4 global window; round-3 guard at
models/layers.py routed those to the XLA oracle).  This module removes that
ceiling: windows are processed as (TQ-row query tiles) x (an in-kernel
online-softmax sweep over TK-column KV tiles), so peak VMEM and compile
size scale with TQ*TK, not N^2.  Reference math:
train_cswinunet_segmentation.py:287-292 (scaled qk^T -> softmax ->
[dropout] -> @v), :326-332 (the full-window global branch this kernel
mainly serves).

Design (differs from v2 where the trade-offs differ at large N):

* Same band layout as v2 — vertical stripes transposed in XLA so every
  window is a full-width row band; a window partition of the image is a
  FREE row-major reshape to (G, N, Cb) with G = B * n_windows.
* LePE is NOT fused.  For the big-window geometries this kernel serves,
  the depthwise 3x3 conv is a vanishing share of the O(N^2) attention
  work, so it runs as a plain XLA windowed depthwise conv *outside* the
  custom VJP (autodiff handles its gradient; the fused attention VJP
  stays purely attention).
* Forward: grid (G, n_q); full-window K/V live in VMEM (bounded by
  ``flash_vmem_bytes`` — beyond that the caller should fall back to XLA);
  per head, a ``fori_loop`` over KV tiles maintains the running max ``m``,
  normaliser ``l`` and f32 accumulator — the standard flash recurrence.
  The per-row log-sum-exp ``L = m + log(l)`` is written out (layout
  (G, N, heads), heads in lanes) for the backward recompute.
* Backward: ``delta = rowsum(dO * O_attn)`` per head is computed in XLA
  (cheap, bandwidth-bound), then two kernels: dQ on grid (G, n_q) sweeping
  KV tiles, and dK/dV on grid (G, n_kv) sweeping Q tiles.  Both recompute
  p = exp(s - L) from the saved statistics — no N^2 residuals.
* Attention dropout derives each element's keep bit from a vectorised
  counter hash of (seed, window, head, q-tile, kv-tile, row, col) — a
  pure function of VALUES, so forward and both backward kernels
  regenerate bitwise identical masks regardless of their different sweep
  orders and of whatever layout Mosaic assigns (see ``_keep_mask`` for
  why the hardware PRNG cannot provide this).

On non-TPU backends (interpret mode) active dropout falls back to the XLA
path, exactly like v2 — the dropout-free fwd+bwd kernels are fully
interpret-testable.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_simam_unet_tpu.ops.attention import lepe_depthwise, stripe_attention
from cswin_simam_unet_tpu.ops.windows import (
    img2windows,
    tokens_to_nhwc,
    windows2img,
)

_INTERPRET = False

# Query/KV tile sizes in tokens.  FIXED for fwd and both bwd kernels so the
# per-(window, head, q-tile, kv-tile) dropout PRNG streams are identical
# across the three sweep orders.  512x512 f32 scores = 1 MB VMEM/tile.
_TILE = 512


def _pick_tile(N: int, target: int = _TILE) -> int:
    """Largest divisor of N that is <= target, preferring sublane-aligned
    (multiple-of-8) tiles."""
    cap = min(N, target)
    aligned = [t for t in range(8, cap + 1, 8) if N % t == 0]
    if aligned:
        return aligned[-1]
    return max(t for t in range(1, cap + 1) if N % t == 0)


def flash_vmem_bytes(N: int, Cb: int, itemsize: int) -> int:
    """Approximate peak VMEM of the widest kernel (dkv: resident Q + dO +
    double-buffered blocks).  Used by callers to gate dispatch."""
    resident = 2 * N * Cb * itemsize      # q + do (dkv kernel)
    blocks = 4 * _TILE * Cb * itemsize    # k/v/dk/dv tiles (double-buffered)
    stats = 2 * N * max(8, 128) * 4       # L + delta lane-padded
    return 2 * (resident + blocks) + stats


def _drop_params(attn_drop: float):
    if attn_drop <= 0.0:
        return 0, 1.0
    threshold = min(int(round(attn_drop * 2.0 ** 32)), 2 ** 32 - 1)
    return threshold, 1.0 / (1.0 - attn_drop)


def _keep_mask(seed_ref, g, h: int, qi, kj, TQ: int, TK: int, threshold: int):
    """Per-element keep decisions as a PURE FUNCTION of (seed, window,
    head, q-tile, kv-tile, element row/col), computed with vector integer
    ops (a murmur3-style finalizer over an iota counter).

    Deliberately NOT ``pltpu.prng_random_bits``: the hardware PRNG fills
    its output buffer in the order of the layout Mosaic picks for the
    consumer, so the same seed can map bits to DIFFERENT (row, col)
    elements in kernels that consume the mask in different orientations.
    Measured on v5e (2026-08-21): each kernel alone was bitwise
    deterministic, but the fwd/dq/dkv keep masks diverged — a 28-44%
    finite-difference-vs-analytic gradient gap at attn_drop=0.3
    (tests/test_tpu_numerics.py::test_flash_attention_dropout_on_tpu).
    An iota-derived counter hash is layout-independent by construction:
    an element's VALUE determines its bits wherever Mosaic places it, so
    the three sweep orders regenerate identical masks — and tests can
    rebuild the exact mask in plain jnp (``hash_keep_mask``) to compare
    the kernels against a mask-exact XLA oracle, a direct gradient gate
    that a finite-difference check cannot provide at this scale (the f32
    online-softmax forward's ~6e-4 relative rounding noise divided by a
    usable eps swamps small directional derivatives — measured 2026-08-21:
    FD error 60% at eps=2e-3, 4.8% at eps=1e-2, while the oracle
    comparison pins dq/dk/dv at ~4e-4)."""
    return hash_keep_mask(seed_ref[0], g, h, qi, kj, TQ, TK, threshold)


def hash_keep_mask(seed, g, h, qi, kj, TQ: int, TK: int, threshold: int):
    """The keep mask as pure jnp — the single source of truth shared by
    the three kernels and by test oracles (see ``_keep_mask``)."""
    tile = ((g * jnp.int32(1_000_003) + jnp.int32(h)) * 4099
            + qi) * 257 + kj
    x = (lax.broadcasted_iota(jnp.int32, (TQ, TK), 0).astype(jnp.uint32)
         * jnp.uint32(TK)
         + lax.broadcasted_iota(jnp.int32, (TQ, TK), 1).astype(jnp.uint32))
    x = x ^ (jnp.asarray(seed).astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x ^ (tile.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    # murmur3 fmix32: full avalanche so consecutive counters decorrelate
    x = (x ^ (x >> 16)) * jnp.uint32(0x85EBCA6B)
    x = (x ^ (x >> 13)) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x >= jnp.uint32(threshold)


def _dot(a, b, ca: int, cb: int):
    return lax.dot_general(a, b, (((ca,), (cb,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, l_ref, *,
                      TQ: int, TK: int, n_kv: int, heads: int, scale: float,
                      drop_threshold: int, inv_keep: float):
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    work = q_ref.dtype
    g = pl.program_id(0)
    qi = pl.program_id(1)
    scale_w = jnp.asarray(scale, work)
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        q_h = q_ref[0, :, cs] * scale_w  # (TQ, dh)

        def body(j, carry):
            m, l, acc = carry
            off = pl.multiple_of(j * TK, TK)
            k_t = k_ref[0, pl.ds(off, TK), cs]   # (TK, dh)
            v_t = v_ref[0, pl.ds(off, TK), cs]
            s = _dot(q_h, k_t, 1, 1)             # (TQ, TK) f32
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            if drop_threshold > 0:
                keep = _keep_mask(seed_ref, g, h, qi, j, TQ, TK,
                                  drop_threshold)
                p = jnp.where(keep, p * inv_keep, 0.0)
            acc_new = alpha * acc + _dot(p.astype(work), v_t, 1, 0)
            return m_new, l_new, acc_new

        m0 = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((TQ, 1), jnp.float32)
        a0 = jnp.zeros((TQ, dh), jnp.float32)
        m, l, acc = lax.fori_loop(0, n_kv, body, (m0, l0, a0))
        o_ref[0, :, cs] = (acc / l).astype(o_ref.dtype)
        l_ref[0, :, h:h + 1] = m + jnp.log(l)


def _flash_dq_kernel(q_ref, k_ref, v_ref, L_ref, delta_ref, do_ref, seed_ref,
                     dq_ref, *, TQ: int, TK: int, n_kv: int, heads: int,
                     scale: float, drop_threshold: int, inv_keep: float):
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    work = q_ref.dtype
    g = pl.program_id(0)
    qi = pl.program_id(1)
    scale_w = jnp.asarray(scale, work)
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        q_h = q_ref[0, :, cs] * scale_w
        do_h = do_ref[0, :, cs]
        L_h = L_ref[0, :, h:h + 1]          # (TQ, 1) f32
        d_h = delta_ref[0, :, h:h + 1]

        def body(j, dq_acc):
            off = pl.multiple_of(j * TK, TK)
            k_t = k_ref[0, pl.ds(off, TK), cs]
            v_t = v_ref[0, pl.ds(off, TK), cs]
            s = _dot(q_h, k_t, 1, 1)
            p = jnp.exp(s - L_h)             # true softmax probabilities
            dp = _dot(do_h, v_t, 1, 1)       # (TQ, TK)
            if drop_threshold > 0:
                keep = _keep_mask(seed_ref, g, h, qi, j, TQ, TK,
                                  drop_threshold)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            ds = (p * (dp - d_h)).astype(work)
            return dq_acc + _dot(ds, k_t, 1, 0)

        dq_h = lax.fori_loop(0, n_kv, body, jnp.zeros((TQ, dh), jnp.float32))
        dq_ref[0, :, cs] = (dq_h * scale).astype(dq_ref.dtype)


def _flash_dkv_kernel(q_ref, k_ref, v_ref, L_ref, delta_ref, do_ref,
                      seed_ref, dk_ref, dv_ref, *, TQ: int, TK: int,
                      n_q: int, heads: int, scale: float,
                      drop_threshold: int, inv_keep: float):
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    work = q_ref.dtype
    g = pl.program_id(0)
    kj = pl.program_id(1)
    scale_w = jnp.asarray(scale, work)
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        k_h = k_ref[0, :, cs]               # (TK, dh)
        v_h = v_ref[0, :, cs]

        def body(i, carry):
            dk_acc, dv_acc = carry
            off = pl.multiple_of(i * TQ, TQ)
            q_t = q_ref[0, pl.ds(off, TQ), cs]
            do_t = do_ref[0, pl.ds(off, TQ), cs]
            L_t = L_ref[0, pl.ds(off, TQ), h:h + 1]
            d_t = delta_ref[0, pl.ds(off, TQ), h:h + 1]
            s = _dot(q_t * scale_w, k_h, 1, 1)   # (TQ, TK)
            p = jnp.exp(s - L_t)
            dp = _dot(do_t, v_h, 1, 1)
            if drop_threshold > 0:
                keep = _keep_mask(seed_ref, g, h, i, kj, TQ, TK,
                                  drop_threshold)
                pd = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            else:
                pd = p
            ds = (p * (dp - d_t)).astype(work)
            dv_new = dv_acc + _dot(pd.astype(work), do_t, 0, 0)  # (TK, dh)
            dk_new = dk_acc + _dot(ds, q_t, 0, 0)                # (TK, dh)
            return dk_new, dv_new

        z = jnp.zeros((TK, dh), jnp.float32)
        dk_h, dv_h = lax.fori_loop(0, n_q, body, (z, z))
        dk_ref[0, :, cs] = (dk_h * scale).astype(dk_ref.dtype)
        dv_ref[0, :, cs] = dv_h.astype(dv_ref.dtype)


_SEED_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)
_VMEM_LIMIT = 110 * 1024 * 1024


def _specs(G: int, N: int, Cb: int, heads: int, T: int):
    """Block specs shared by the kernels: a (1, T, Cb) tile spec indexed by
    (g, i), a (1, N, Cb) full-window spec indexed by (g,), and the
    (1, T, heads)/(1, N, heads) stats variants."""
    tile = pl.BlockSpec((1, T, Cb), lambda g, i: (g, i, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, N, Cb), lambda g, i: (g, 0, 0),
                        memory_space=pltpu.VMEM)
    stat_tile = pl.BlockSpec((1, T, heads), lambda g, i: (g, i, 0),
                             memory_space=pltpu.VMEM)
    stat_full = pl.BlockSpec((1, N, heads), lambda g, i: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    return tile, full, stat_tile, stat_full


def _flash_fwd_bands(qb, kb, vb, seed, heads, scale, attn_drop):
    G, N, Cb = qb.shape
    TQ = TK = _pick_tile(N)
    n_q, n_kv = N // TQ, N // TK
    threshold, inv_keep = _drop_params(attn_drop)
    tile, full, stat_tile, _ = _specs(G, N, Cb, heads, TQ)
    kernel = functools.partial(
        _flash_fwd_kernel, TQ=TQ, TK=TK, n_kv=n_kv, heads=heads,
        scale=scale, drop_threshold=threshold, inv_keep=inv_keep)
    out, L = pl.pallas_call(
        kernel,
        grid=(G, n_q),
        in_specs=[tile, full, full, _SEED_SPEC],
        out_specs=[tile, stat_tile],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, Cb), qb.dtype),
            jax.ShapeDtypeStruct((G, N, heads), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * N * N * Cb,
            transcendentals=G * N * N * heads,
            bytes_accessed=8 * G * N * Cb),
        interpret=_INTERPRET,
    )(qb, kb, vb, seed)
    return out, L


def _flash_bwd_bands(qb, kb, vb, seed, out, L, dob, heads, scale, attn_drop):
    G, N, Cb = qb.shape
    dh = Cb // heads
    TQ = TK = _pick_tile(N)
    n_q, n_kv = N // TQ, N // TK
    threshold, inv_keep = _drop_params(attn_drop)
    # delta = rowsum(dO * O_attn) per head — O_attn excludes LePE (which
    # lives outside this custom VJP), so the flash identity
    # rowsum(dp ∘ p_dropped) == rowsum(dO ∘ O_attn) holds with dropout.
    delta = (dob.astype(jnp.float32) * out.astype(jnp.float32)) \
        .reshape(G, N, heads, dh).sum(axis=-1)

    tile, full, stat_tile, stat_full = _specs(G, N, Cb, heads, TQ)
    dq = pl.pallas_call(
        functools.partial(
            _flash_dq_kernel, TQ=TQ, TK=TK, n_kv=n_kv, heads=heads,
            scale=scale, drop_threshold=threshold, inv_keep=inv_keep),
        grid=(G, n_q),
        in_specs=[tile, full, full, stat_tile, stat_tile, tile, _SEED_SPEC],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((G, N, Cb), qb.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * G * N * N * Cb,
            transcendentals=G * N * N * heads,
            bytes_accessed=10 * G * N * Cb),
        interpret=_INTERPRET,
    )(qb, kb, vb, L, delta, dob, seed)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_dkv_kernel, TQ=TQ, TK=TK, n_q=n_q, heads=heads,
            scale=scale, drop_threshold=threshold, inv_keep=inv_keep),
        grid=(G, n_kv),
        in_specs=[full, tile, tile, stat_full, stat_full, full, _SEED_SPEC],
        out_specs=[tile, tile],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, Cb), qb.dtype),
            jax.ShapeDtypeStruct((G, N, Cb), qb.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * G * N * N * Cb,
            transcendentals=G * N * N * heads,
            bytes_accessed=10 * G * N * Cb),
        interpret=_INTERPRET,
    )(qb, kb, vb, L, delta, dob, seed)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention_bands(qb, kb, vb, seed, heads, scale, attn_drop):
    out, _ = _flash_fwd_bands(qb, kb, vb, seed, heads, scale, attn_drop)
    return out


def _flash_fwd_rule(qb, kb, vb, seed, heads, scale, attn_drop):
    out, L = _flash_fwd_bands(qb, kb, vb, seed, heads, scale, attn_drop)
    return out, (qb, kb, vb, seed, out, L)


def _flash_bwd_rule(heads, scale, attn_drop, residuals, dob):
    qb, kb, vb, seed, out, L = residuals
    dq, dk, dv = _flash_bwd_bands(qb, kb, vb, seed, out, L, dob, heads,
                                  scale, attn_drop)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_flash_attention_bands.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _lepe_tokens(v, lepe_kernel, H, W, hsp, wsp):
    """Per-window zero-padded depthwise 3x3 LePE as differentiable XLA ops
    (the oracle's own formulation, ops/attention.py:36-56)."""
    B, L, C = v.shape
    v_wins = img2windows(tokens_to_nhwc(v, H, W), hsp, wsp)
    lepe = lepe_depthwise(v_wins, lepe_kernel, hsp, wsp)
    return windows2img(lepe, hsp, wsp, H, W).reshape(B, L, C)


def stripe_attention_pallas_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lepe_kernel: jnp.ndarray,
    *,
    H: int,
    W: int,
    hsp: int,
    wsp: int,
    num_heads: int,
    scale: float | None = None,
    attn_drop: float = 0.0,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Drop-in stripe attention with the flash kernels (API-compatible with
    :func:`stripe_attention_pallas_v2`); intended for windows whose N^2
    score matrix cannot be materialised (hsp*wsp > 2048).

    In interpret mode (non-TPU) active dropout falls back to the XLA path —
    the TPU PRNG has no CPU lowering."""
    drop_active = attn_drop > 0.0 and not deterministic
    if drop_active and _INTERPRET:
        return stripe_attention(
            q, k, v, lepe_kernel, H=H, W=W, hsp=hsp, wsp=wsp,
            num_heads=num_heads, scale=scale, attn_drop=attn_drop,
            deterministic=deterministic, dropout_rng=dropout_rng)
    B, L, Cb = q.shape
    if scale is None:
        scale = (Cb // num_heads) ** -0.5
    if drop_active:
        kd = (jax.random.key_data(dropout_rng)
              if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key)
              else dropout_rng)
        seed = lax.bitcast_convert_type(kd.reshape(-1)[-1],
                                        jnp.int32).reshape(1)
        rate = float(attn_drop)
    else:
        seed = jnp.zeros((1,), jnp.int32)
        rate = 0.0

    flip = hsp == H and wsp < W  # vertical stripes -> horizontal bands
    if flip:
        Ht, Wt, wht = W, H, wsp
    else:
        Ht, Wt, wht = H, W, hsp
    N = wht * Wt
    n_windows = Ht // wht

    def bands(x):
        x = x.reshape(B, H, W, Cb)
        if flip:
            x = x.transpose(0, 2, 1, 3)
        return x.reshape(B * n_windows, N, Cb)  # free row-major merge

    attn = _flash_attention_bands(bands(q), bands(k), bands(v), seed,
                                  num_heads, float(scale), rate)
    attn = attn.reshape(B, Ht, Wt, Cb)
    if flip:
        attn = attn.transpose(0, 2, 1, 3)
    attn = attn.reshape(B, L, Cb)
    return attn + _lepe_tokens(v, lepe_kernel, H, W, hsp, wsp)
