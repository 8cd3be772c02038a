"""Bandwidth-lean inverted dropout for big activation tensors.

``jax.random.bernoulli`` (what ``flax.linen.Dropout`` uses) draws one u32
per element — at the 512^2 flagship the MLP hidden/output masks alone are
~0.6 GB of random bits per train step (rng-bit-generator + compare showed
up as ~2 ms/step in the op profile).  Bernoulli(rate) needs far fewer
bits: this draws u16 bits directly (XLA:TPU RngBitGenerator emits them
natively — verified for both rbg and threefry key impls), halving the HBM
traffic of the generator, with the keep test a 16-bit threshold compare
(keep-probability quantisation 2^-16 — for rate 0.3 the realised keep
probability is 0.6999969..., the same rounding class as the in-kernel u32
threshold used by the Pallas attention dropout).  The 1/(1-rate) rescale
uses the nominal rate, matching the attention kernel's convention.

A u32-pair->u16 bitcast+reshape variant was a measured dead end: the
minor-dim merge forced a layout copy per mask (~7 ms/step of copies at the
512^2 flagship across ~30 masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_dropout(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout with u16 threshold bits (see module docstring)."""
    if rate <= 0.0:
        return x
    bits = jax.random.bits(rng, x.shape, jnp.uint16)
    # keep iff bits >= round(rate * 2^16): P(keep) = 1 - thr/2^16
    thr = min(int(round(rate * 65536.0)), 65535)
    keep = bits >= jnp.uint16(thr)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
