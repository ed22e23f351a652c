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
    lib.sync_reference_timestamp.restype = ctypes.c_double
    lib.sync_reference_timestamp.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.sync_closest_indices.restype = ctypes.c_double
    lib.sync_closest_indices.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_double, ctypes.c_void_p,
    ]
    lib.sync_prune_counts.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_double, ctypes.c_void_p,
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


def _ragged(ts_per_stream: list[np.ndarray]):
    counts = np.asarray([len(t) for t in ts_per_stream], np.int64)
    offsets = np.zeros(len(ts_per_stream), np.int64)
    if len(counts) > 1:
        offsets[1:] = np.cumsum(counts)[:-1]
    flat = (
        np.concatenate([np.asarray(t, np.float64) for t in ts_per_stream])
        if ts_per_stream and sum(counts) else np.zeros(0, np.float64)
    )
    return flat, offsets, counts


def reference_timestamp(ts_per_stream: list[np.ndarray]) -> float | None:
    """min over streams of each stream's newest timestamp (or None)."""
    lib = _load()
    if lib is None:
        if any(len(t) == 0 for t in ts_per_stream):
            return None
        return min(float(t[-1]) for t in ts_per_stream)
    flat, offsets, counts = _ragged(ts_per_stream)
    ref = lib.sync_reference_timestamp(
        flat.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        len(ts_per_stream),
    )
    return None if np.isnan(ref) else float(ref)


def closest_indices(ts_per_stream: list[np.ndarray], target: float) -> tuple[np.ndarray, float]:
    """Per-stream index of the timestamp closest to target + max |dt|."""
    lib = _load()
    if lib is None:
        idx = np.asarray(
            [int(np.argmin(np.abs(np.asarray(t) - target))) if len(t) else -1 for t in ts_per_stream],
            np.int64,
        )
        max_dt = max(
            (abs(float(t[i]) - target) for t, i in zip(ts_per_stream, idx) if i >= 0),
            default=0.0,
        )
        return idx, max_dt
    flat, offsets, counts = _ragged(ts_per_stream)
    out = np.empty(len(ts_per_stream), np.int64)
    max_dt = lib.sync_closest_indices(
        flat.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p),
        len(ts_per_stream), target,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out, float(max_dt)
