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
    n = N - 1
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(-3, -2), keepdims=True)
    s2 = jnp.sum(jnp.square(xf), axis=(-3, -2), keepdims=True)
    mu = s1 / N
    v = (s2 - N * jnp.square(mu)) / n
    return _gate(x, mu, v, lam)


def simam_flat(x_flat: jnp.ndarray, groups: int, lam: float = 1e-4) -> jnp.ndarray:
    """SimAM over a *pre-pixel-shuffle* map: x_flat (B, H, W, G*C) where lane
    slot g*C + c is sub-pixel g of real channel c.

    Mathematically identical to ``pixel_unshuffle(simam(pixel_shuffle(x)))``:
    per real channel c the statistics pool over (H, W, G) — computed here
    with tiny cross-slot reductions instead of a full-resolution transpose
    (the transpose costs ~7 ms at 512^2 batch 16; this costs microseconds).
    """
    B, H, W, GC = x_flat.shape
    C = GC // groups
    N = H * W * groups
    n = N - 1
    xf = x_flat.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))                 # (B, G*C), one read pass
    s2 = jnp.sum(jnp.square(xf), axis=(1, 2))     # fused into the same pass
    sum_c = jnp.sum(s1.reshape(B, groups, C), axis=1)    # (B, C)
    sumsq_c = jnp.sum(s2.reshape(B, groups, C), axis=1)  # (B, C)
    mu_c = sum_c / N
    v_c = (sumsq_c - N * jnp.square(mu_c)) / n
    mu = jnp.tile(mu_c, (1, groups))[:, None, None, :]   # (B, 1, 1, G*C)
    v = jnp.tile(v_c, (1, groups))[:, None, None, :]
    return _gate(x_flat, mu, v, lam)
