"""Fused CSWin stripe-attention kernel v2 — batched full-width band windows.

The v1 kernel (:mod:`cswin_simam_unet_tpu.ops.pallas_attention`) fuses the
attention math but consumes window-partitioned (G, N, D) tensors built in
XLA — with d_head 32 those are 4x lane-padded in HBM, so layout shuffles
dominate.  v2 keeps tensors in image layout end to end:

* Vertical stripes are transposed in XLA (~0.1 ms) so EVERY window is a
  full-width horizontal band (wh rows x W cols); the global window is the
  single (H, W) band.  A band partition of the image is a FREE row-major
  reshape (B, H, W, Cb) -> (B, n_windows, N, Cb) with N = wh*W, so the
  Pallas block (1, TW, N, Cb) delivers TW whole windows with no in-kernel
  reshapes or strided slices.
* Each grid step computes, fully in VMEM and BATCHED over the TW windows
  (one dot_general with a batch dim per head instead of a python loop of
  tiny per-window matmuls — the loop serialized VPU<->MXU and left the
  MXU idle; batching was worth ~2x at the flagship stage geometries):

      scaled q k^T -> softmax -> [in-kernel PRNG dropout] -> p v
      + LePE (window-local zero-padded depthwise 3x3 on v)

  LePE's 2-D taps are expressed directly on the (TW, N, Cb) band layout:
  a (dy, dx) tap is a sublane shift by dy*W + dx with an iota mask zeroing
  the columns that crossed the left/right window edge — no (wh, W)
  re-materialisation.
* The backward is a second fused kernel in the same layout (softmax VJP +
  four batched matmuls per head + LePE transpose taps), with the
  depthwise-kernel gradient accumulated across grid steps into a revisited
  output block (TPU grids execute sequentially).

Attention dropout runs in-kernel via the TPU PRNG: the mask is regenerated
in the backward by re-seeding per (batch, window, head) —
``pltpu.prng_seed(seed, mix(b, window, head))`` then one (N, N) draw — so
forward and backward masks are bitwise identical regardless of tiling or
loop order.  Reference math: train_cswinunet_segmentation.py:287-292
(attn softmax/dropout/matmul).

On non-TPU backends (interpret mode) the TPU PRNG is unavailable, so
dropout routes to the XLA path; the dropout-free fwd+bwd kernels are fully
interpret-testable.

Measured dead end (kept out, 2026-08-17): carving vertical stripes
untransposed and transposing in-VMEM — Mosaic's sublane transposes cost
more than the XLA image transpose they replace (133.9 -> 109.7 img/s).

Measured dead end (kept out, 2026-08-19): hoisting the vertical branch's
flip out of this op into CSWinBlock — qkv computed from ONE full-channel
transpose of the normed tokens via the branch's weight columns (row
permutations commute with channel matmuls) and a per-branch split proj so
the un-flip rides a full-C tensor, replacing the three half-channel
(4x lane-padded) q/k/v flips + the output un-flip.  Param-tree-identical
and numerically correct (grad diff ~5e-4 from split-sum reassociation),
but a reproducible ~1% LOSS at the 512^2 flagship (151.0-151.2 vs
152.5-153.0 img/s): the two half-width qkv matmuls (96-lane outputs, two
dispatches, lost epilogue fusion) cost more than the lane-padded flips
they remove.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_simam_unet_tpu.ops.attention import stripe_attention

_INTERPRET = False

# tokens per grid tile (forward / backward).  Swept IN-STEP on hardware
# (flagship 512^2 training config, 2026-08-18): (2048, 1024) 152.7 img/s,
# (4096, 2048) 150.8, (4096, 8192) 151.1.  NB the dropout-free MICRO sweep
# said the opposite (stage-3 fwd+bwd 0.126 -> 0.081 ms/block at bwd 8192)
# — with in-kernel dropout active the per-(window, head) PRNG reseed chain
# grows with TW per step and erases the launch-overhead saving, so the
# in-step numbers are the arbiter.
_FWD_TOKENS = 2048
_BWD_TOKENS = 1024


def _band_shift(x, dy: int, dx: int, W: int):
    """Band-layout LePE tap shift: result[t, n] = x[t, n + dy*W + dx], zero
    where the source falls outside the (wh, W) window.

    Row (dy) overflow is exactly the sublane shift's zero fill (the band is
    wh*W sublanes; shifting by W drops one row).  Column (dx) overflow
    wraps to an adjacent row instead, so a lane-position mask zeroes the
    columns whose x-coordinate crossed the window edge."""
    TW, N, Cb = x.shape
    off = dy * W + dx
    if off > 0:
        shifted = jnp.concatenate(
            [x[:, off:], jnp.zeros((TW, off, Cb), x.dtype)], axis=1)
    elif off < 0:
        shifted = jnp.concatenate(
            [jnp.zeros((TW, -off, Cb), x.dtype), x[:, :off]], axis=1)
    else:
        shifted = x
    if dx == 0:
        return shifted
    col = lax.broadcasted_iota(jnp.int32, (TW, N, Cb), 1) % W
    if dx > 0:  # source column x+1: invalid for x == W-1
        keep = col != (W - 1)
    else:       # source column x-1: invalid for x == 0
        keep = col != 0
    return jnp.where(keep, shifted, jnp.zeros((), x.dtype))


def _taps(wh: int, W: int):
    """Valid 3x3 taps for a (wh, W) band window (taps entirely outside a
    1-tall/1-wide window read only zero padding and contribute nothing)."""
    return [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (wh == 1 and dy != 0) and not (W == 1 and dx != 0)]


def _lepe_band(v, kernel, wh: int, W: int):
    """Depthwise 3x3 conv of (TW, N, Cb) band windows with zero padding at
    window edges; kernel (3, 3, Cb), tap w[dy+1, dx+1] multiplies the input
    at (y + dy, x + dx) — HWIO conv semantics."""
    out = None
    for dy, dx in _taps(wh, W):
        term = _band_shift(v, dy, dx, W) * kernel[dy + 1, dx + 1]
        out = term if out is None else out + term
    return out


def _lepe_band_transpose(g, kernel, wh: int, W: int):
    """VJP of _lepe_band wrt its input."""
    out = None
    for dy, dx in _taps(wh, W):
        term = _band_shift(g, -dy, -dx, W) * kernel[dy + 1, dx + 1]
        out = term if out is None else out + term
    return out


def _drop_bits(N: int):
    return pltpu.bitcast(pltpu.prng_random_bits((N, N)), jnp.uint32)


def _seed_window(seed_ref, t: int, TW: int, h: int, nw: int):
    """Re-seed the PRNG per (batch, in-batch window, head) so the draw
    stream is independent of tile width and loop order — forward and
    backward may tile differently (and tiles may SPAN batch items on the
    flattened grid) yet must regenerate identical masks.  The grid is flat
    over batch*windows; (batch, window) are recovered from the global
    window index, keeping the streams bitwise those of the per-batch grid.
    Mosaic accepts at most two seed values, so batch/window/head mix into
    one."""
    g = pl.program_id(0) * TW + t
    b = g // nw
    widx = g % nw
    pltpu.prng_seed(seed_ref[0], (b * 1_000_003 + widx) * 31 + h)


def _stacked_masks(seed_ref, TW: int, N: int, h: int, nw: int,
                   threshold: int):
    """TW per-window dropout masks for head h, drawn with per-window seeds
    (tiling-independent streams); raw u32 bits are stacked and compared
    once (stacking i1 vectors is Mosaic-fragile)."""
    bits = []
    for t in range(TW):
        _seed_window(seed_ref, t, TW, h, nw)
        bits.append(_drop_bits(N))
    stacked = jnp.stack(bits, axis=0) if TW > 1 else bits[0][None]
    return stacked >= jnp.uint32(threshold)


def _bdot(a, b, contract_a: int, contract_b: int):
    """Batched (leading-dim) matmul with f32 accumulation in input dtype."""
    return lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _attn_kernel(q_ref, k_ref, v_ref, w_ref, seed_ref, o_ref, *,
                 TW: int, wh: int, W: int, heads: int, scale: float,
                 drop_threshold: int, inv_keep: float, nw: int):
    """One block of TW full-width band windows, attention batched over
    windows per head.  The grid is FLAT over batch*windows — windows are
    independent, so a tile may span batch items; fewer, fatter grid steps
    amortise the fixed per-step pipeline cost that dominated the small
    stage geometries."""
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    N = wh * W
    kern = w_ref[:, :, 0, :].astype(jnp.float32)  # (3, 3, Cb)

    # Matmuls run in the INPUT dtype with f32 accumulation (the MXU's
    # native bf16 x bf16 -> f32 path); softmax statistics stay f32.  An
    # all-f32 formulation forces fp32-contract matmuls (multi-pass on the
    # MXU) — measured ~2x slower kernels at the bf16 flagship config.
    work = q_ref.dtype
    qb = q_ref[...]  # (TW, N, Cb)
    kb = k_ref[...]
    vb = v_ref[...]
    lepe = _lepe_band(vb, kern.astype(work), wh, W).astype(jnp.float32)

    outs = []
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        s = _bdot(qb[:, :, cs] * jnp.asarray(scale, work), kb[:, :, cs], 2, 2)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if drop_threshold > 0:
            keep = _stacked_masks(seed_ref, TW, N, h, nw, drop_threshold)
            p = jnp.where(keep, p * inv_keep, 0.0)
        o_h = _bdot(p.astype(work), vb[:, :, cs], 2, 1)
        outs.append(o_h + lepe[:, :, cs])
    o2 = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
    o_ref[...] = o2.astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, w_ref, seed_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dw_ref, *,
                     TW: int, wh: int, W: int, heads: int, scale: float,
                     drop_threshold: int, inv_keep: float, nw: int):
    """Fused backward for one band block: recompute softmax (and the dropout
    masks, bitwise-identical via per-(window, head) re-seeding), then the
    softmax VJP and the LePE transpose; dw accumulates across the grid."""
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    N = wh * W
    kern = w_ref[:, :, 0, :].astype(jnp.float32)  # (3, 3, Cb)

    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    work = q_ref.dtype
    kern_w = kern.astype(work)
    qb = q_ref[...]
    kb = k_ref[...]
    vb = v_ref[...]
    gb = do_ref[...]

    dqs, dks, dvs = [], [], []
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        s = _bdot(qb[:, :, cs] * jnp.asarray(scale, work), kb[:, :, cs], 2, 2)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        g_h = gb[:, :, cs]
        if drop_threshold > 0:
            keep = _stacked_masks(seed_ref, TW, N, h, nw, drop_threshold)
            pd = jnp.where(keep, p * inv_keep, 0.0)
        else:
            pd = p
        # dV = Pd^T dO (batched over windows)
        dvs.append(_bdot(pd.astype(work), g_h, 1, 1))
        # dPd = dO V^T; dP = mask-scaled dPd; dS = P*(dP - rowsum(dP*P))
        dp = _bdot(g_h, vb[:, :, cs], 2, 2)
        if drop_threshold > 0:
            dp = jnp.where(keep, dp * inv_keep, 0.0)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(work)
        dqs.append(_bdot(ds, kb[:, :, cs], 2, 1) * scale)
        dks.append(_bdot(ds, qb[:, :, cs], 1, 1) * scale)

    def cat(xs):
        return xs[0] if heads == 1 else jnp.concatenate(xs, axis=-1)

    # LePE enters additively per window: dv += conv-transpose taps of dO,
    # dw[tap] += sum_windows dO * shift(v, tap) (f32 accumulation)
    dv = cat(dvs) + _lepe_band_transpose(gb, kern_w, wh, W).astype(
        jnp.float32)
    gb_f = gb.astype(jnp.float32)
    tap_cols = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) in _taps(wh, W):
                shifted = _band_shift(vb, dy, dx, W)
                tap_cols.append(jnp.sum(gb_f * shifted.astype(jnp.float32),
                                        axis=(0, 1)))
            else:
                tap_cols.append(jnp.zeros((Cb,), jnp.float32))
    dw_tile = jnp.stack(tap_cols, axis=0).reshape(3, 3, Cb)
    dw_ref[:, :, 0, :] += dw_tile

    dq_ref[...] = cat(dqs).astype(dq_ref.dtype)
    dk_ref[...] = cat(dks).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _pick_tw(n_windows: int, N: int, target_tokens: int) -> int:
    """Windows per grid tile: the largest divisor of n_windows whose tile
    stays near the token target (band blocks have no alignment constraints
    — the sublane dim is the full N)."""
    target = max(1, target_tokens // N)
    for tw in range(min(target, n_windows), 0, -1):
        if n_windows % tw == 0:
            return tw
    return 1


def _geometry(B, H, W, wh, Cb, target_tokens):
    """Band-window geometry: (TW, N, Cb) blocks of the FREE reshape
    (B, H, W, Cb) -> (B*n_windows, N, Cb).  The grid is FLAT over
    batch*windows so a tile can span batch items — at the deep stages
    (few windows per image) a per-batch grid left tiles of 1-4 windows
    whose fixed per-step pipeline cost dominated the kernel."""
    N = wh * W
    n_windows = H // wh
    TW = _pick_tw(B * n_windows, N, target_tokens)
    spec = pl.BlockSpec((TW, N, Cb), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    grid = (B * n_windows // TW,)
    return N, n_windows, TW, grid, spec


_SEED_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)
_W_SPEC = lambda Cb: pl.BlockSpec((3, 3, 1, Cb), lambda i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)


def _drop_params(attn_drop: float):
    if attn_drop <= 0.0:
        return 0, 1.0
    threshold = min(int(round(attn_drop * 2.0 ** 32)), 2 ** 32 - 1)
    return threshold, 1.0 / (1.0 - attn_drop)


def _transpose_if_vertical(H, W, hsp, wsp):
    """Vertical stripes (full-height, width < W) are transposed in XLA
    (~0.1 ms for the flagship stage-1 tensor) into horizontal bands so
    every window is a contiguous full-width row band; the LePE 3x3 kernel
    transposes its taps to match.  Global windows stay untransposed."""
    return hsp == H and wsp < W


def _branch_fwd_impl(q, k, v, lepe_kernel, seed, H, W, hsp, wsp, num_heads,
                     scale, attn_drop):
    B, L, Cb = q.shape
    flip = _transpose_if_vertical(H, W, hsp, wsp)
    if flip:
        Ht, Wt, wht = W, H, wsp
        lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
    else:
        Ht, Wt, wht = H, W, hsp
    N, n_windows, TW, grid, spec = _geometry(B, Ht, Wt, wht, Cb, _FWD_TOKENS)
    threshold, inv_keep = _drop_params(attn_drop)

    def bands(x):
        x = x.reshape(B, H, W, Cb)
        if flip:
            x = x.transpose(0, 2, 1, 3)
        return x.reshape(B * n_windows, N, Cb)  # free row-major merge

    kernel = functools.partial(
        _attn_kernel, TW=TW, wh=wht, W=Wt, heads=num_heads, scale=scale,
        drop_threshold=threshold, inv_keep=inv_keep, nw=n_windows)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, _W_SPEC(Cb), _SEED_SPEC],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * n_windows, N, Cb), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * N * Cb + 18 * B * L * Cb,
            transcendentals=B * L * N,
            bytes_accessed=8 * B * L * Cb),
        interpret=_INTERPRET,
    )(bands(q), bands(k), bands(v), lepe_kernel, seed)
    out = out.reshape(B, Ht, Wt, Cb)
    if flip:
        out = out.transpose(0, 2, 1, 3)
    return out.reshape(B, L, Cb)


def _branch_bwd_impl(q, k, v, lepe_kernel, seed, dout, H, W, hsp, wsp,
                     num_heads, scale, attn_drop):
    B, L, Cb = q.shape
    flip = _transpose_if_vertical(H, W, hsp, wsp)
    orig_dtype = lepe_kernel.dtype
    if flip:
        Ht, Wt, wht = W, H, wsp
        lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
    else:
        Ht, Wt, wht = H, W, hsp
    N, n_windows, TW, grid, spec = _geometry(B, Ht, Wt, wht, Cb, _BWD_TOKENS)
    threshold, inv_keep = _drop_params(attn_drop)

    def bands(x):
        x = x.reshape(B, H, W, Cb)
        if flip:
            x = x.transpose(0, 2, 1, 3)
        return x.reshape(B * n_windows, N, Cb)

    kernel = functools.partial(
        _attn_bwd_kernel, TW=TW, wh=wht, W=Wt, heads=num_heads, scale=scale,
        drop_threshold=threshold, inv_keep=inv_keep, nw=n_windows)
    dq, dk, dv, dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, _W_SPEC(Cb), _SEED_SPEC, spec],
        out_specs=[spec, spec, spec, _W_SPEC(Cb)],
        out_shape=[
            jax.ShapeDtypeStruct((B * n_windows, N, Cb), q.dtype),
            jax.ShapeDtypeStruct((B * n_windows, N, Cb), q.dtype),
            jax.ShapeDtypeStruct((B * n_windows, N, Cb), q.dtype),
            jax.ShapeDtypeStruct((3, 3, 1, Cb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * L * N * Cb + 40 * B * L * Cb,
            transcendentals=B * L * N,
            bytes_accessed=16 * B * L * Cb),
        interpret=_INTERPRET,
    )(bands(q), bands(k), bands(v), lepe_kernel, seed, bands(dout))

    def unband(x):
        x = x.reshape(B, Ht, Wt, Cb)
        if flip:
            x = x.transpose(0, 2, 1, 3)
        return x.reshape(B, L, Cb)

    if flip:  # lepe kernel taps were transposed on the way in
        dw = dw.transpose(1, 0, 2, 3)
    return unband(dq), unband(dk), unband(dv), dw.astype(orig_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _branch_attention(q, k, v, lepe_kernel, seed, H, W, hsp, wsp, num_heads,
                      scale, attn_drop):
    return _branch_fwd_impl(q, k, v, lepe_kernel, seed, H, W, hsp, wsp,
                            num_heads, scale, attn_drop)


def _branch_fwd(q, k, v, lepe_kernel, seed, H, W, hsp, wsp, num_heads,
                scale, attn_drop):
    out = _branch_fwd_impl(q, k, v, lepe_kernel, seed, H, W, hsp, wsp,
                           num_heads, scale, attn_drop)
    return out, (q, k, v, lepe_kernel, seed)


def _branch_bwd(H, W, hsp, wsp, num_heads, scale, attn_drop, residuals,
                dout):
    q, k, v, lepe_kernel, seed = residuals
    dq, dk, dv, dw = _branch_bwd_impl(
        q, k, v, lepe_kernel, seed, dout, H, W, hsp, wsp, num_heads, scale,
        attn_drop)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dw, dseed


_branch_attention.defvjp(_branch_fwd, _branch_bwd)


def stripe_attention_pallas_v2(
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
    """Drop-in stripe-attention with v2 fused kernels (band-batched windows,
    in-kernel LePE, fused backward, in-kernel PRNG dropout).

    In interpret mode (non-TPU) active dropout falls back to the XLA path —
    the TPU PRNG has no CPU lowering."""
    drop_active = attn_drop > 0.0 and not deterministic
    if drop_active and _INTERPRET:
        return stripe_attention(
            q, k, v, lepe_kernel, H=H, W=W, hsp=hsp, wsp=wsp,
            num_heads=num_heads, scale=scale, attn_drop=attn_drop,
            deterministic=deterministic, dropout_rng=dropout_rng)
    Cb = q.shape[-1]
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
    return _branch_attention(q, k, v, lepe_kernel, seed, H, W, hsp, wsp,
                             num_heads, float(scale), rate)
