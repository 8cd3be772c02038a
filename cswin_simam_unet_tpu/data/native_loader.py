"""ctypes bindings for the native C++ data loader (native/dataio.cpp).

Loads ``native/libcsu_dataio.so`` if present (build with
``native/build.sh``); all entry points degrade gracefully to the cv2/PIL
path when the library is absent.  ctypes calls release the GIL, so the
Python-side thread pool gets real decode parallelism even without the
batch API.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", "..", "native", "libcsu_dataio.so")
        path = os.path.normpath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.csu_decode_resize.restype = ctypes.c_int
                lib.csu_decode_resize.argtypes = [
                    ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
                lib.csu_load_batch.restype = ctypes.c_int
                lib.csu_load_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
                _LIB = lib
            except OSError:
                _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def decode_resize(data: bytes, size: Tuple[int, int],
                  gray: bool = False) -> Optional[np.ndarray]:
    """JPEG decode + bilinear resize via the native library.
    Returns uint8 (H, W, 3) RGB or (H, W) gray; None on failure (caller
    falls back to cv2/PIL — e.g. for PNG inputs libjpeg can't decode)."""
    lib = _lib()
    if lib is None:
        return None
    h, w = size
    ch = 1 if gray else 3
    out = np.empty((h, w, ch) if not gray else (h, w), dtype=np.uint8)
    rc = lib.csu_decode_resize(data, len(data), h, w, int(gray),
                               out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return out


def load_batch(img_paths: Sequence[str],
               mask_paths: Sequence[Optional[str]],
               size: Tuple[int, int], threads: int = 4):
    """Threaded native batch load.

    Returns (images (N,H,W,3) uint8, masks (N,H,W,1) uint8,
    status (N,) uint8: 0 ok / 1 bad image / 2 zero-filled mask),
    or None if the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return None
    n = len(img_paths)
    h, w = size
    images = np.empty((n, h, w, 3), dtype=np.uint8)
    masks = np.empty((n, h, w, 1), dtype=np.uint8)
    status = np.empty((n,), dtype=np.uint8)
    c_imgs = (ctypes.c_char_p * n)(*[p.encode() for p in img_paths])
    c_masks = (ctypes.c_char_p * n)(
        *[(p.encode() if p else None) for p in mask_paths])
    lib.csu_load_batch(
        c_imgs, c_masks, n, h, w, threads,
        images.ctypes.data_as(ctypes.c_void_p),
        masks.ctypes.data_as(ctypes.c_void_p),
        status.ctypes.data_as(ctypes.c_void_p))
    return images, masks, status
