"""ctypes bindings for the native host-side corpus operations.

Builds ``libcorpus_ops.so`` on first use (g++, no external deps); every entry
point has a pure-numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libcorpus_ops.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _HERE, "-s"], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            logger.info("native corpus_ops build unavailable (%s); "
                        "using numpy fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("could not load %s (%s); using numpy fallbacks",
                    _LIB_PATH, e)
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.init_boundaries_random.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, u8p,
    ]
    lib.segmented_embeds.argtypes = [
        u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p,
    ]
    lib.pack_dense.argtypes = [
        i64p, f64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, f64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def init_boundaries_random(lengths: np.ndarray, vec_ids: np.ndarray,
                           n_max: int, p_boundary_init: float,
                           n_slices_min: int, n_slices_max: int,
                           seed: int) -> Optional[np.ndarray]:
    """Native rejection-resampled random boundary init; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    lengths = np.ascontiguousarray(lengths, np.int64)
    vec_ids = np.ascontiguousarray(vec_ids, np.int64)
    n_utt = lengths.shape[0]
    out = np.zeros((n_utt, n_max), np.uint8)
    lib.init_boundaries_random(
        lengths, vec_ids, n_utt, n_max, float(p_boundary_init),
        int(n_slices_min), int(n_slices_max), int(seed) or 1, out,
    )
    return out.astype(bool)


def segmented_embeds(boundaries: np.ndarray, vec_ids: np.ndarray,
                     lengths: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    boundaries = np.ascontiguousarray(boundaries, np.uint8)
    vec_ids = np.ascontiguousarray(vec_ids, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n_utt, n_max = boundaries.shape
    out = np.empty((n_utt, n_max), np.int64)
    lib.segmented_embeds(boundaries, vec_ids, lengths, n_utt, n_max, out)
    return out


def pack_dense(vec_ids: np.ndarray, durations: np.ndarray,
               lengths: np.ndarray, n_max: int, W: int):
    lib = _load()
    if lib is None:
        return None
    vec_ids = np.ascontiguousarray(vec_ids, np.int64)
    durations = np.ascontiguousarray(durations, np.float64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    n_utt = lengths.shape[0]
    seg_ids = np.empty((n_utt, n_max, W), np.int64)
    seg_durs = np.empty((n_utt, n_max, W), np.float64)
    lib.pack_dense(vec_ids, durations, lengths, n_utt, n_max, W,
                   seg_ids, seg_durs)
    return seg_ids, seg_durs
