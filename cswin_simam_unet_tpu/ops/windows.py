"""Window layout primitives for cross-shaped-window (CSWin) attention.

The reference expresses these as torch ``view``/``permute`` chains over NCHW
tensors (ref: train_cswinunet_segmentation.py:199-217).  Here they are pure
NHWC reshapes/transposes, which XLA lowers to layout ops that fuse into the
surrounding compute; nothing is materialised unless the consumer forces it.

Window-token ordering is kept identical to the reference (row-major within a
window, windows enumerated row-major over the grid) so imported PyTorch
weights produce bit-comparable activations.
"""

from __future__ import annotations

import jax.numpy as jnp


def stripe_geometry(resolution: int, split_size: int, idx: int) -> tuple[int, int]:
    """Window (H_sp, W_sp) for a stripe-attention branch.

    ``idx == -1`` — full-window global attention (last stage);
    ``idx == 0``  — full-height *vertical* stripes (H_sp = reso, W_sp = split);
    ``idx == 1``  — full-width *horizontal* stripes (H_sp = split, W_sp = reso).

    Mirrors the branch geometry selection of the reference
    (train_cswinunet_segmentation.py:232-240) but raises instead of calling
    ``exit(0)`` on a bad index.
    """
    if idx == -1:
        return resolution, resolution
    if idx == 0:
        return resolution, split_size
    if idx == 1:
        return split_size, resolution
    raise ValueError(f"invalid stripe-attention branch index: {idx}")


def tokens_to_nhwc(x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """(B, L, C) token sequence -> (B, H, W, C) feature map; L must equal H*W."""
    B, L, C = x.shape
    if L != H * W:
        raise ValueError(f"token count {L} != H*W = {H}*{W}")
    return x.reshape(B, H, W, C)


def nhwc_to_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) feature map -> (B, H*W, C) token sequence."""
    B, H, W, C = x.shape
    return x.reshape(B, H * W, C)


def pixel_shuffle(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """(B, H, W, S^2*C) -> (B, H*S, W*S, C); the s-major lane contract
    ``slot s*C + c`` with sub-pixel ``s = sy*S + sx`` (inverse of
    :func:`pixel_unshuffle`).  THE single definition of the flat-layout
    channel order — the CARAFE kernels, the model head, and the target
    unshuffle all route through this pair, so the contract cannot drift."""
    B, H, W, SC = x.shape
    C = SC // (S * S)
    out = x.reshape(B, H, W, S, S, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H * S, W * S, C)


def pixel_unshuffle(x: jnp.ndarray, S: int) -> jnp.ndarray:
    """(B, H*S, W*S, C) -> (B, H, W, S^2*C), lane slot ``s*C + c`` with
    s-major sub-pixel index ``s = sy*S + sx`` — the inverse of the CARAFE
    pixel-shuffle channel order (ref train_cswinunet_segmentation.py:410,432).

    Used by the flat-logits training path: BCE/dice/IoU are global means over
    pixels, so instead of unscrambling full-resolution logits every step the
    train step unshuffles the (tiny) targets once to match the model's
    pre-pixel-shuffle head layout."""
    B, HS, WS, C = x.shape
    H, W = HS // S, WS // S
    out = x.reshape(B, H, S, W, S, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, S * S * C)


def img2windows(x: jnp.ndarray, hsp: int, wsp: int) -> jnp.ndarray:
    """Partition an NHWC map into window token groups.

    (B, H, W, C) -> (B * nWin, hsp * wsp, C) with windows enumerated row-major
    and tokens row-major within each window — the exact ordering of the
    reference's ``img2windows`` (train_cswinunet_segmentation.py:199-206).
    """
    B, H, W, C = x.shape
    if H % hsp or W % wsp:
        raise ValueError(f"feature map {H}x{W} not divisible by window {hsp}x{wsp}")
    nh, nw = H // hsp, W // wsp
    x = x.reshape(B, nh, hsp, nw, wsp, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, nw, hsp, wsp, C)
    return x.reshape(B * nh * nw, hsp * wsp, C)


def windows2img(wins: jnp.ndarray, hsp: int, wsp: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`img2windows`.

    (B * nWin, hsp * wsp, C) -> (B, H, W, C)
    (ref: train_cswinunet_segmentation.py:209-217).
    """
    nh, nw = H // hsp, W // wsp
    Bw, N, C = wins.shape
    B = Bw // (nh * nw)
    x = wins.reshape(B, nh, nw, hsp, wsp, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, nh, hsp, nw, wsp, C)
    return x.reshape(B, H, W, C)
