"""Fused CSWin stripe-attention kernel v2 — windows carved from image layout.

The v1 kernel (:mod:`cswin_simam_unet_tpu.ops.pallas_attention`) fuses the
attention math but still consumes window-partitioned (G, N, D) tensors built
in XLA — and with d_head 32 those are 4x lane-padded in HBM, so the layout
shuffles dominate (a stage-1 block spends ~13 ms of 16.8 ms outside the MLP
at 512^2 batch 16).  v2 eliminates the window materialisation entirely: the
Pallas grid tiles the (B, H, W, C) *image* directly (BlockSpec index maps do
the stripe carving), and each grid step computes, fully in VMEM:

    window tokens -> per-head scaled qk^T -> softmax -> [dropout] -> pv
    + LePE (window-local zero-padded depthwise 3x3 on v, 9 shifted FMAs)

and writes the output back in image layout.  No (G, N, D) arrays, no
padded HBM buffers, no separate LePE convolution.

The backward is a second fused kernel in the same image-carved layout
(softmax VJP + four matmuls per head + LePE transpose taps), with the
depthwise-kernel gradient accumulated across grid steps into a revisited
output block (TPU grids execute sequentially).  Attention dropout runs
in-kernel via the TPU PRNG: the mask is regenerated in the backward by
re-seeding per (batch, window) — ``pltpu.prng_seed(seed, b, window_index)``
then per-head draws in fixed order — so forward and backward masks are
bitwise identical regardless of tiling.  Reference math:
train_cswinunet_segmentation.py:287-292 (attn softmax/dropout/matmul).

On non-TPU backends (interpret mode) the TPU PRNG is unavailable, so
dropout routes to the XLA path; the dropout-free fwd+bwd kernels are fully
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

from cswin_simam_unet_tpu.ops.attention import stripe_attention

_INTERPRET = False

# tokens per grid tile (forward / backward); the backward keeps ~2.3x the
# forward's live VMEM so it defaults to smaller tiles.  Swept in
# benchmarks/micro_attention.py.
_FWD_TOKENS = 2048
_BWD_TOKENS = 1024

# Vertical stripes: transpose the carved block in VMEM inside the kernel
# instead of transposing the whole image in XLA.  Hypothesis: the XLA flip
# costs an HBM round-trip per q/k/v/out (fwd) and q/k/v/do/dq/dk/dv (bwd)
# — ~6 ms/step of copies at the 512^2 flagship — while an in-VMEM
# transpose rides on-chip bandwidth.  MEASURED DEAD END (kept off): the
# Mosaic sublane-dim transposes inside the kernel cost more than the HBM
# copies they replace — flagship train step 133.9 -> 109.7 img/s/chip with
# this on (2026-08-17, hardware-parity-verified path).  XLA's transposes
# are already near memory-bandwidth-optimal and overlap with adjacent
# compute; the kernel-internal shuffles serialize against the MXU work.
_VMEM_FLIP = False


def _tap_shift(x, dy: int, dx: int):
    """x shifted so result[y, x] = x[y + dy, x + dx], zero outside the
    window — the window-local zero padding of the reference's per-window
    ``get_v`` depthwise conv (train_cswinunet_segmentation.py:256-269)."""
    if dy == 1:
        x = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    elif dy == -1:
        x = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    if dx == 1:
        x = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    elif dx == -1:
        x = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    return x


def _taps(wh: int, ww: int):
    """Valid 3x3 taps for a (wh, ww) window: taps falling entirely outside a
    1-wide/1-tall window read only zero padding and contribute nothing."""
    return [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if not (wh == 1 and dy != 0) and not (ww == 1 and dx != 0)]


def _lepe_window(v_img, kernel, wh: int, ww: int):
    """Depthwise 3x3 conv of one (wh, ww, Cb) window with zero padding at the
    window edges.  kernel: (3, 3, Cb) f32; kernel tap w[dy+1, dx+1]
    multiplies the input at (y + dy, x + dx) — HWIO conv semantics."""
    out = None
    for dy, dx in _taps(wh, ww):
        term = _tap_shift(v_img, dy, dx) * kernel[dy + 1, dx + 1][None, None]
        out = term if out is None else out + term
    return out


def _lepe_window_transpose(g_img, kernel, wh: int, ww: int):
    """VJP of _lepe_window wrt its input: dv[y, x] = sum_taps w[tap] *
    g[y - dy, x - dx] (zero outside the window)."""
    out = None
    for dy, dx in _taps(wh, ww):
        term = _tap_shift(g_img, -dy, -dx) * kernel[dy + 1, dx + 1][None, None]
        out = term if out is None else out + term
    return out


def _window_slice(t: int, vertical: bool, wh: int, ww: int):
    if vertical:
        return (0, slice(None), slice(t * ww, (t + 1) * ww), slice(None))
    return (0, slice(t * wh, (t + 1) * wh), slice(None), slice(None))


def _dropout_mask(N: int, threshold: int):
    bits = pltpu.bitcast(pltpu.prng_random_bits((N, N)), jnp.uint32)
    return bits >= jnp.uint32(threshold)


def _seed_window(seed_ref, t: int, TW: int):
    """Re-seed the PRNG per (batch, global window, t) so the draw stream is
    independent of the tile width TW — forward and backward may tile
    differently yet must regenerate identical masks.  Mosaic accepts at most
    two seed values, so batch and window index are mixed into one."""
    widx = pl.program_id(1) * TW + t
    pltpu.prng_seed(seed_ref[0], pl.program_id(0) * 1_000_003 + widx)


def _attn_kernel(q_ref, k_ref, v_ref, w_ref, seed_ref, o_ref, *,
                 vertical: bool, vmem_flip: bool, TW: int, wh: int, ww: int,
                 heads: int, scale: float, drop_threshold: int,
                 inv_keep: float):
    """One image tile holding TW windows of shape (wh, ww).

    ``vmem_flip``: the block arrives as the *untransposed* vertical-stripe
    carving (1, H, TW*wsp, Cb); one in-VMEM transpose turns it into the
    horizontal-band layout ((TW*wh, ww, Cb) with wh=wsp, ww=H) that the
    window loop consumes, and the output is transposed back on store.
    """
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    N = wh * ww
    kern = w_ref[:, :, 0, :].astype(jnp.float32)  # (3, 3, Cb)

    # Matmuls run in the INPUT dtype with f32 accumulation (the MXU's
    # native bf16 x bf16 -> f32 path); softmax statistics stay f32.  An
    # all-f32 formulation forces fp32-contract matmuls (multi-pass on the
    # MXU) — measured ~2x slower kernels at the bf16 flagship config.
    work = q_ref.dtype
    kern_w = kern.astype(work)
    if vmem_flip:
        qb = q_ref[0].transpose(1, 0, 2)
        kb = k_ref[0].transpose(1, 0, 2)
        vb = v_ref[0].transpose(1, 0, 2)
    out_wins = []
    for t in range(TW):
        if vmem_flip:
            rs = slice(t * wh, (t + 1) * wh)
            qw, kw, vw = qb[rs], kb[rs], vb[rs]
        else:
            sl = _window_slice(t, vertical, wh, ww)
            qw = q_ref[sl]  # (wh, ww, Cb), input dtype
            kw = k_ref[sl]
            vw = v_ref[sl]
        lepe = _lepe_window(vw, kern_w, wh, ww)

        q2 = qw.reshape(N, Cb)
        k2 = kw.reshape(N, Cb)
        v2 = vw.reshape(N, Cb)
        le2 = lepe.reshape(N, Cb).astype(jnp.float32)

        if drop_threshold > 0:
            _seed_window(seed_ref, t, TW)

        outs = []
        for h in range(heads):
            cs = slice(h * dh, (h + 1) * dh)
            s = lax.dot_general(q2[:, cs] * jnp.asarray(scale, work),
                                k2[:, cs], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            if drop_threshold > 0:
                keep = _dropout_mask(N, drop_threshold)
                p = jnp.where(keep, p * inv_keep, 0.0)
            o_h = jnp.dot(p.astype(work), v2[:, cs],
                          preferred_element_type=jnp.float32)
            outs.append(o_h + le2[:, cs])
        o2 = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
        o_win = o2.reshape(wh, ww, Cb).astype(o_ref.dtype)
        if vmem_flip:
            out_wins.append(o_win)
        else:
            o_ref[sl] = o_win
    if vmem_flip:
        o_all = out_wins[0] if TW == 1 else jnp.concatenate(out_wins, axis=0)
        o_ref[0] = o_all.transpose(1, 0, 2)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, w_ref, seed_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dw_ref, *,
                     vertical: bool, vmem_flip: bool, TW: int, wh: int,
                     ww: int, heads: int,
                     scale: float, drop_threshold: int, inv_keep: float):
    """Fused backward for one image tile: recompute softmax (and the dropout
    mask, bitwise-identical via per-window re-seeding), then the softmax VJP
    and the LePE transpose; dw accumulates across the whole grid."""
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    N = wh * ww
    kern = w_ref[:, :, 0, :].astype(jnp.float32)  # (3, 3, Cb)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    # dtype policy mirrors the forward: matmul operands in the input dtype
    # (native MXU bf16 path), softmax/VJP statistics in f32
    work = q_ref.dtype
    kern_w = kern.astype(work)
    tap_acc = {tap: jnp.zeros((Cb,), jnp.float32)
               for tap in [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]}
    if vmem_flip:
        qb = q_ref[0].transpose(1, 0, 2)
        kb = k_ref[0].transpose(1, 0, 2)
        vb = v_ref[0].transpose(1, 0, 2)
        gb = do_ref[0].transpose(1, 0, 2)
    dq_wins, dk_wins, dv_wins = [], [], []
    for t in range(TW):
        if vmem_flip:
            rs = slice(t * wh, (t + 1) * wh)
            qw, kw, vw, gw = qb[rs], kb[rs], vb[rs], gb[rs]
        else:
            sl = _window_slice(t, vertical, wh, ww)
            qw = q_ref[sl]
            kw = k_ref[sl]
            vw = v_ref[sl]
            gw = do_ref[sl]

        q2 = qw.reshape(N, Cb)
        k2 = kw.reshape(N, Cb)
        v2 = vw.reshape(N, Cb)
        g2 = gw.reshape(N, Cb)

        if drop_threshold > 0:
            _seed_window(seed_ref, t, TW)

        dqs, dks, dvs = [], [], []
        for h in range(heads):
            cs = slice(h * dh, (h + 1) * dh)
            s = lax.dot_general(q2[:, cs] * jnp.asarray(scale, work),
                                k2[:, cs], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            g_h = g2[:, cs]
            if drop_threshold > 0:
                keep = _dropout_mask(N, drop_threshold)
                pd = jnp.where(keep, p * inv_keep, 0.0)
            else:
                pd = p
            # dV = Pd^T dO
            dv_h = lax.dot_general(pd.astype(work), g_h,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
            # dPd = dO V^T; dP = mask-scaled dPd; dS = P*(dP - rowsum(dP*P))
            dp = lax.dot_general(g_h, v2[:, cs], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            if drop_threshold > 0:
                dp = jnp.where(keep, dp * inv_keep, 0.0)
            ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                  ).astype(work)
            dq_h = jnp.dot(ds, k2[:, cs],
                           preferred_element_type=jnp.float32) * scale
            dk_h = lax.dot_general(ds, q2[:, cs], (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) * scale
            dqs.append(dq_h)
            dks.append(dk_h)
            dvs.append(dv_h)

        def cat(xs):
            return xs[0] if heads == 1 else jnp.concatenate(xs, axis=-1)

        dv2 = cat(dvs)
        # LePE enters additively per window: dv += conv-transpose taps of dO,
        # dw[tap] += sum_window dO * shift(v, tap) (f32 accumulation)
        dv_img = dv2.reshape(wh, ww, Cb) + _lepe_window_transpose(
            gw, kern_w, wh, ww).astype(jnp.float32)
        for tap in _taps(wh, ww):
            contrib = jnp.sum(gw * _tap_shift(vw, *tap), axis=(0, 1),
                              dtype=jnp.float32)
            tap_acc[tap] = tap_acc[tap] + contrib

        dq_win = cat(dqs).reshape(wh, ww, Cb).astype(dq_ref.dtype)
        dk_win = cat(dks).reshape(wh, ww, Cb).astype(dk_ref.dtype)
        dv_win = dv_img.astype(dv_ref.dtype)
        if vmem_flip:
            dq_wins.append(dq_win)
            dk_wins.append(dk_win)
            dv_wins.append(dv_win)
        else:
            dq_ref[sl] = dq_win
            dk_ref[sl] = dk_win
            dv_ref[sl] = dv_win

    if vmem_flip:
        def store(ref, wins):
            all_w = wins[0] if TW == 1 else jnp.concatenate(wins, axis=0)
            ref[0] = all_w.transpose(1, 0, 2)
        store(dq_ref, dq_wins)
        store(dk_ref, dk_wins)
        store(dv_ref, dv_wins)

    dw_tile = jnp.stack(
        [tap_acc[(dy, dx)] for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=0).reshape(3, 3, Cb)
    dw_ref[:, :, 0, :] += dw_tile


def _pick_tw(n_windows: int, N: int, ww: int, W: int,
             vertical: bool, target_tokens: int = 2048) -> int:
    """Windows per grid tile.  For vertical stripes the block's
    second-to-last dim is TW*ww, which Mosaic requires to be divisible by 8
    or equal to the full W — prefer the largest conforming divisor of
    n_windows near the token target, falling back to one full-width tile."""
    target = max(1, target_tokens // N)
    best = None
    for tw in range(min(target, n_windows), 0, -1):
        if n_windows % tw:
            continue
        if not vertical or (tw * ww) % 8 == 0 or tw * ww == W:
            return tw
        if best is None:
            best = tw
    if vertical:
        return n_windows  # full-width tile (block dim == array dim)
    return best or 1


def _geometry(q, H, W, hsp, wsp, target_tokens):
    B, L, Cb = q.shape
    vertical = hsp == H  # full-height vertical stripes (or global window)
    wh, ww = hsp, wsp
    N = wh * ww
    n_windows = (H // hsp) * (W // wsp)
    TW = _pick_tw(n_windows, N, wsp, W, vertical, target_tokens)
    if vertical:
        block = (1, H, TW * ww, Cb)
        imap = lambda b, i: (b, 0, i, 0)
    else:
        block = (1, TW * wh, W, Cb)
        imap = lambda b, i: (b, i, 0, 0)
    grid = (B, n_windows // TW)
    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    return vertical, wh, ww, N, TW, grid, spec


def _geometry_vmem_flip(q, H, W, wsp, target_tokens):
    """Vertical-stripe geometry carved UNTRANSPOSED (vmem_flip kernels).

    Window shape in the kernel's transposed space is (wh, ww) = (wsp, H);
    the HBM block is the untransposed (1, H, TW*wsp, Cb) column band, so
    the sublane-dim constraint applies to TW*wsp (same rule as the old
    vertical carving)."""
    B, L, Cb = q.shape
    wh, ww = wsp, H
    N = wh * ww
    n_windows = W // wsp
    TW = _pick_tw(n_windows, N, wsp, W, True, target_tokens)
    block = (1, H, TW * wsp, Cb)
    imap = lambda b, i: (b, 0, i, 0)
    grid = (B, n_windows // TW)
    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    return wh, ww, N, TW, grid, spec


_SEED_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)
_W_SPEC = lambda Cb: pl.BlockSpec((3, 3, 1, Cb), lambda b, i: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM)


def _drop_params(attn_drop: float):
    if attn_drop <= 0.0:
        return 0, 1.0
    threshold = min(int(round(attn_drop * 2.0 ** 32)), 2 ** 32 - 1)
    return threshold, 1.0 / (1.0 - attn_drop)


def _transpose_if_vertical(H, W, hsp, wsp):
    """Vertical stripes (full-height, width < W) are carved across the
    sublane dim — width-1/2 strided slices inside the kernel cost ~3x the
    horizontal case (measured: stage-1 bwd 1.82 ms vs 0.53 ms at 512^2).
    Transposing the image in XLA (~0.1 ms for the same tensor) turns them
    into horizontal stripes; the LePE 3x3 kernel transposes its taps to
    match.  Global windows (hsp==H and wsp==W) stay untransposed."""
    return hsp == H and wsp < W


def _branch_fwd_impl(q, k, v, lepe_kernel, seed, H, W, hsp, wsp, num_heads,
                     scale, attn_drop):
    B, L, Cb = q.shape
    flip = _transpose_if_vertical(H, W, hsp, wsp)
    vmem_flip = flip and _VMEM_FLIP
    if vmem_flip:
        lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
        Ht, Wt = H, W
        vertical = False
        wh, ww, N, TW, grid, spec = _geometry_vmem_flip(q, H, W, wsp,
                                                        _FWD_TOKENS)
        flip = False  # image stays untransposed in HBM
    else:
        if flip:
            Ht, Wt, hspt, wspt = W, H, wsp, hsp
            lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
        else:
            Ht, Wt, hspt, wspt = H, W, hsp, wsp
        vertical, wh, ww, N, TW, grid, spec = _geometry(q, Ht, Wt, hspt,
                                                        wspt, _FWD_TOKENS)
    threshold, inv_keep = _drop_params(attn_drop)

    def img(x):
        x = x.reshape(B, H, W, Cb)
        return x.transpose(0, 2, 1, 3) if flip else x

    kernel = functools.partial(
        _attn_kernel, vertical=vertical, vmem_flip=vmem_flip, TW=TW, wh=wh,
        ww=ww, heads=num_heads, scale=scale, drop_threshold=threshold,
        inv_keep=inv_keep)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, _W_SPEC(Cb), _SEED_SPEC],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, Ht, Wt, Cb), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * N * Cb + 18 * B * L * Cb,
            transcendentals=B * L * N,
            bytes_accessed=8 * B * L * Cb),
        interpret=_INTERPRET,
    )(img(q), img(k), img(v), lepe_kernel, seed)
    if flip:
        out = out.transpose(0, 2, 1, 3)
    return out.reshape(B, L, Cb)


def _branch_bwd_impl(q, k, v, lepe_kernel, seed, dout, H, W, hsp, wsp,
                     num_heads, scale, attn_drop):
    B, L, Cb = q.shape
    flip = _transpose_if_vertical(H, W, hsp, wsp)
    vmem_flip = flip and _VMEM_FLIP
    orig_dtype = lepe_kernel.dtype
    if vmem_flip:
        lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
        Ht, Wt = H, W
        vertical = False
        wh, ww, N, TW, grid, spec = _geometry_vmem_flip(q, H, W, wsp,
                                                        _BWD_TOKENS)
        flip = False  # image stays untransposed in HBM
    else:
        if flip:
            Ht, Wt, hspt, wspt = W, H, wsp, hsp
            lepe_kernel = lepe_kernel.transpose(1, 0, 2, 3)
        else:
            Ht, Wt, hspt, wspt = H, W, hsp, wsp
        vertical, wh, ww, N, TW, grid, spec = _geometry(q, Ht, Wt, hspt,
                                                        wspt, _BWD_TOKENS)
    threshold, inv_keep = _drop_params(attn_drop)

    def img(x):
        x = x.reshape(B, H, W, Cb)
        return x.transpose(0, 2, 1, 3) if flip else x

    kernel = functools.partial(
        _attn_bwd_kernel, vertical=vertical, vmem_flip=vmem_flip, TW=TW,
        wh=wh, ww=ww, heads=num_heads, scale=scale, drop_threshold=threshold,
        inv_keep=inv_keep)
    dq, dk, dv, dw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, _W_SPEC(Cb), _SEED_SPEC, spec],
        out_specs=[spec, spec, spec, _W_SPEC(Cb)],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ht, Wt, Cb), q.dtype),
            jax.ShapeDtypeStruct((B, Ht, Wt, Cb), q.dtype),
            jax.ShapeDtypeStruct((B, Ht, Wt, Cb), q.dtype),
            jax.ShapeDtypeStruct((3, 3, 1, Cb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * L * N * Cb + 40 * B * L * Cb,
            transcendentals=B * L * N,
            bytes_accessed=16 * B * L * Cb),
        interpret=_INTERPRET,
    )(img(q), img(k), img(v), lepe_kernel, seed, img(dout))
    if flip:
        dq, dk, dv = (x.transpose(0, 2, 1, 3) for x in (dq, dk, dv))
    if flip or vmem_flip:  # lepe kernel taps were transposed on the way in
        dw = dw.transpose(1, 0, 2, 3)
    return (dq.reshape(B, L, Cb), dk.reshape(B, L, Cb),
            dv.reshape(B, L, Cb), dw.astype(orig_dtype))


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
    """Drop-in stripe-attention with v2 fused kernels (image-layout carving,
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
