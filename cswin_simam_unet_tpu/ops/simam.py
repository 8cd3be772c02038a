"""SimAM: parameter-free energy-based 3-D attention (Yang et al., ICML 2021).

Absent from the reference snapshot despite the repo name (verified in
SURVEY.md), but required by BASELINE.json configs 2 and 4, so implemented
here as a first-class functional op.

For each channel of an NHWC map, with per-channel spatial mean mu and biased
variance var over the N = H*W - 1 "other" neurons, the inverse energy of
neuron t is

    1/E_t = ((t - mu)^2 + 2*sigma^2 + 2*lambda) / (4 * (sigma^2 + lambda))

and the output is ``x * sigmoid(1/E)``.

HBM-traffic note: both entry points compute the spatial variance from raw
moments (sum, sum of squares) gathered in ONE pass over x, then apply the
gate in a second pass that recomputes (x - mu)^2 on the fly.  The naive
centered form (mean pass -> centered-square pass -> gate pass) needs three
*sequential* full-size passes and materialises an f32 (x - mu)^2 buffer
(512 MB at 512^2 batch 8 pre-shuffle) — measured ~5 ms of the train step
before this rewrite.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import jax


def _gate(x: jnp.ndarray, mu: jnp.ndarray, v: jnp.ndarray,
          lam: float) -> jnp.ndarray:
    """x * sigmoid((x - mu)^2 / (4 (v + lam)) + 0.5), f32 math, x dtype out."""
    xf = x.astype(jnp.float32)
    e_inv = jnp.square(xf - mu) / (4.0 * (v + lam)) + 0.5
    return (xf * jax.nn.sigmoid(e_inv)).astype(x.dtype)


def simam(x: jnp.ndarray, lam: float = 1e-4) -> jnp.ndarray:
    """Apply SimAM attention over an NHWC feature map.

    Matches the canonical public implementation: per (batch, channel) plane,
    ``n = H*W - 1``; ``d = (x - mean)^2``; ``v = sum(d) / n``;
    ``E_inv = d / (4 * (v + lam)) + 0.5``; return ``x * sigmoid(E_inv)``
    (``sum(d) = sumsq - N*mean^2`` — same statistics from raw moments).
    """
    H, W = x.shape[-3], x.shape[-2]
    N = H * W
    n = max(N - 1, 1)  # degenerate 1x1 maps: v = 0, gate = sigmoid(0.5)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(-3, -2), keepdims=True)
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2), keepdims=True)
    mu = s1 / N
    v = (s2 - N * jnp.square(mu)) / n
    return _gate(x, mu, v, lam)


def _flat_stats(x_flat, groups: int):
    """Per-real-channel pooled moments of a flat (B, H, W, G*C) map:
    (mu, v) broadcast back to (B, 1, 1, G*C), plus the raw (B, C) stats."""
    B, H, W, GC = x_flat.shape
    C = GC // groups
    N = H * W * groups
    n = max(N - 1, 1)
    xf = x_flat.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))                 # (B, G*C), one read pass
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))     # fused into the same pass
    sum_c = jnp.sum(s1.reshape(B, groups, C), axis=1)    # (B, C)
    sumsq_c = jnp.sum(s2.reshape(B, groups, C), axis=1)  # (B, C)
    mu_c = sum_c / N
    v_c = (sumsq_c - N * jnp.square(mu_c)) / n
    mu = jnp.tile(mu_c, (1, groups))[:, None, None, :]   # (B, 1, 1, G*C)
    v = jnp.tile(v_c, (1, groups))[:, None, None, :]
    return mu, v, N, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def simam_flat(x_flat: jnp.ndarray, groups: int, lam: float = 1e-4) -> jnp.ndarray:
    """SimAM over a *pre-pixel-shuffle* map: x_flat (B, H, W, G*C) where lane
    slot g*C + c is sub-pixel g of real channel c.

    Mathematically identical to ``pixel_unshuffle(simam(pixel_shuffle(x)))``:
    per real channel c the statistics pool over (H, W, G) — computed here
    with tiny cross-slot reductions instead of a full-resolution transpose
    (the transpose costs ~7 ms at 512^2 batch 16; this costs microseconds).

    Hand-written VJP: XLA's autodiff of the gate materialised a full-size
    channel-major f32 intermediate plus a layout copy (~2.1 ms/step at the
    flagship geometry); the closed-form backward below is one reduction
    pass (A_c, B_c) and one elementwise pass, all row-major.
    """
    return _simam_flat_fwd(x_flat, groups, lam)[0]


def _simam_flat_fwd(x_flat, groups, lam):
    mu, v, _, _ = _flat_stats(x_flat, groups)
    # Save the (B,1,1,G*C) stats (a few KB) instead of recomputing them in
    # the backward: recomputation costs a full extra read pass over x_flat
    # (268 MB at the flagship flat-head geometry).
    return _gate(x_flat, mu, v, lam), (x_flat, mu, v)


def _simam_flat_bwd(groups, lam, residuals, dy):
    (x_flat, mu, v) = residuals
    B, H, W, GC = x_flat.shape
    C = GC // groups
    N = H * W * groups
    n = max(N - 1, 1)
    w = 1.0 / (4.0 * (v + lam))                   # (B, 1, 1, G*C)

    xf = x_flat.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xc = xf - mu

    def gate_terms(xc):
        e = jnp.square(xc) * w + 0.5
        g = jax.nn.sigmoid(e)
        return g, g * (1.0 - g)

    # pass 1: per-channel reductions of t*(x-mu) and t*(x-mu)^2,
    #   t = dy * x * g'(e)  — only (B, G*C) leaves this fusion
    g, gp = gate_terms(xc)
    t = dyf * xf * gp
    A = jnp.sum(t * xc, axis=(1, 2))              # (B, G*C)
    Bq = jnp.sum(t * jnp.square(xc), axis=(1, 2))
    A_c = jnp.sum(A.reshape(B, groups, C), axis=1)
    B_c = jnp.sum(Bq.reshape(B, groups, C), axis=1)
    A_ = jnp.tile(A_c, (1, groups))[:, None, None, :]
    B_ = jnp.tile(B_c, (1, groups))[:, None, None, :]

    # pass 2: dx = dy*g + 2w*t*(x-mu) - 2w*A/N - 8w^2*B*(x-mu)/n
    dx = (dyf * g + 2.0 * w * t * xc
          - (2.0 * w / N) * A_
          - (8.0 * jnp.square(w) / n) * B_ * xc)
    return (dx.astype(x_flat.dtype),)


simam_flat.defvjp(_simam_flat_fwd, _simam_flat_bwd)
