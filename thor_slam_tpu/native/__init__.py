"""Native C++ host runtime (ctypes binding, graceful Python fallback).

Build with ``make native`` (or ``python setup_native.py build_ext``); the
package works without the extension — callers check :data:`AVAILABLE` or
just call the wrappers, which fall back to NumPy implementations.
"""

from __future__ import annotations

import ctypes
import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None


def _find_library():
    here = Path(__file__).parent
    for pattern in ("libframesync*.so", "framesync*.so"):
        for cand in list(here.glob(pattern)) + list(here.parent.parent.glob(pattern)):
            return cand
    return None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.stage_frames_u8_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int,
    ]
    _LIB = lib
    logger.info("Native framesync runtime loaded from %s", path)
    return lib


#: True when the compiled extension is present.
AVAILABLE = _find_library() is not None


def stage_frames(images: list[np.ndarray], num_threads: int = 4) -> np.ndarray:
    """Fuse N same-shape uint8 images into one float32 [N, H, W] in [0, 1]."""
    lib = _load()
    n = len(images)
    h, w = images[0].shape
    # The C loop reads h*w bytes from every raw pointer; a smaller frame
    # (e.g. a driver renegotiating resolution mid-run) would be a silent
    # out-of-bounds read where np.stack raises. Enforce the same contract.
    if any(im.shape != (h, w) for im in images):
        raise ValueError(
            f"stage_frames requires same-shape images; got {[im.shape for im in images]}"
        )
    if lib is None:
        return np.stack(images).astype(np.float32) / 255.0
    out = np.empty((n, h, w), np.float32)
    contig = [np.ascontiguousarray(im) for im in images]
    ptrs = (ctypes.c_void_p * n)(*[im.ctypes.data_as(ctypes.c_void_p) for im in contig])
    lib.stage_frames_u8_to_f32(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)), n, h, w,
        out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    return out
