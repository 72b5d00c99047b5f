"""ctypes bindings for the native C++ negative sampler.

The reference generates negatives row-at-a-time in Python
(reference: deepfm/data/movielens.py:536, 575 — pandas iterrows, the
dominant data-pipeline cost). The vectorized NumPy path in movielens.py
fixes most of that; this native library replaces the remaining per-user
weighted-sampling loop (alias-method sampling + bitset membership test in
C++), keeping the host data pipeline off the critical path of TPU training.

Builds lazily with g++ on first use; every entry point has a NumPy fallback
so the framework never hard-depends on a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "sampler.cc"
_LIB = _HERE / "libdeepfm_sampler.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _build() -> bool:
    global _build_failed
    if _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", str(_SRC), "-o", str(_LIB),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        _build_failed = True
        return False


def _load() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed or not _SRC.exists():
            return None
        if not _build():
            return None
        lib = ctypes.CDLL(str(_LIB))
        lib.weighted_unseen_batch.restype = ctypes.c_longlong
        lib.weighted_unseen_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),  # seen (U*M row-major)
            ctypes.c_longlong,  # n_items
            ctypes.POINTER(ctypes.c_double),  # weights (M,)
            ctypes.POINTER(ctypes.c_longlong),  # uids (K,)
            ctypes.c_longlong,  # n_uids
            ctypes.c_longlong,  # num_neg
            ctypes.c_ulonglong,  # seed
            ctypes.POINTER(ctypes.c_longlong),  # out items (K*num_neg,)
            ctypes.POINTER(ctypes.c_longlong),  # out per-uid counts (K,)
        ]
        lib.uniform_unseen_batch.restype = ctypes.c_longlong
        lib.uniform_unseen_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_ulonglong,
            ctypes.POINTER(ctypes.c_longlong),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def weighted_unseen_batch(
    seen: np.ndarray,
    weights: np.ndarray,
    uids: np.ndarray,
    num_neg: int,
    seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-uid popularity-weighted with-replacement sampling of unseen items.

    Returns (flat_items, per_uid_counts); counts < num_neg only when a user
    has fewer unseen items than num_neg.
    """
    lib = _load()
    seen_u8 = np.ascontiguousarray(seen, dtype=np.uint8)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    u = np.ascontiguousarray(uids, dtype=np.int64)
    k = len(u)
    out = np.empty(k * num_neg, dtype=np.int64)
    counts = np.empty(k, dtype=np.int64)
    total = lib.weighted_unseen_batch(
        seen_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seen.shape[1],
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        k,
        num_neg,
        np.uint64(seed % (2**64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    return out[:total].copy(), counts


def uniform_unseen_batch(
    seen: np.ndarray, uids: np.ndarray, num_neg: int, seed: int
) -> np.ndarray:
    """(K, num_neg) uniform unseen items, without replacement per row."""
    lib = _load()
    seen_u8 = np.ascontiguousarray(seen, dtype=np.uint8)
    u = np.ascontiguousarray(uids, dtype=np.int64)
    k = len(u)
    out = np.empty(k * num_neg, dtype=np.int64)
    lib.uniform_unseen_batch(
        seen_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        seen.shape[1],
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        k,
        num_neg,
        np.uint64(seed % (2**64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
    )
    return out.reshape(k, num_neg)
