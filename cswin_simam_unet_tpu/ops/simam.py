"""SimAM: parameter-free energy-based 3-D attention (Yang et al., ICML 2021).

Absent from the reference snapshot despite the repo name (verified in
SURVEY.md), but required by BASELINE.json configs 2 and 4, so implemented
here as a first-class functional op.

For each channel of an NHWC map, with per-channel spatial mean mu and biased
variance var over the N = H*W - 1 "other" neurons, the inverse energy of
neuron t is

    1/E_t = ((t - mu)^2 + 2*sigma^2 + 2*lambda) / (4 * (sigma^2 + lambda))

and the output is ``x * sigmoid(1/E)``.  Everything is elementwise /
reduction work on the VPU; XLA fuses it into neighbouring convs.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def simam(x: jnp.ndarray, lam: float = 1e-4) -> jnp.ndarray:
    """Apply SimAM attention over an NHWC feature map.

    Follows the canonical public implementation: per (batch, channel) plane,
    ``n = H*W - 1``; ``d = (x - mean)^2``; ``v = sum(d) / n``;
    ``E_inv = d / (4 * (v + lam)) + 0.5``; return ``x * sigmoid(E_inv)``.
    """
    H, W = x.shape[-3], x.shape[-2]
    n = H * W - 1
    mu = jnp.mean(x, axis=(-3, -2), keepdims=True)
    d = jnp.square(x - mu)
    v = jnp.sum(d, axis=(-3, -2), keepdims=True) / n
    e_inv = d / (4.0 * (v + lam)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


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
    n = H * W * groups - 1
    sums = jnp.sum(x_flat.astype(jnp.float32), axis=(1, 2))      # (B, G*C)
    mu_c = jnp.mean(sums.reshape(B, groups, C), axis=1) / (H * W)  # (B, C)
    mu = jnp.tile(mu_c, (1, groups))[:, None, None, :]           # (B,1,1,G*C)
    d = jnp.square(x_flat.astype(jnp.float32) - mu)
    dsum = jnp.sum(d, axis=(1, 2))                                # (B, G*C)
    v_c = jnp.sum(dsum.reshape(B, groups, C), axis=1) / n         # (B, C)
    v = jnp.tile(v_c, (1, groups))[:, None, None, :]
    e_inv = d / (4.0 * (v + lam)) + 0.5
    return (x_flat.astype(jnp.float32) * jax.nn.sigmoid(e_inv)).astype(x_flat.dtype)
