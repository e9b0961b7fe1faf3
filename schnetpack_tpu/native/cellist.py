"""ctypes binding for the native C++ linked-cell neighbor list.

Builds ``libcellist.so`` with g++ on first use (cached next to the source);
falls back to the NumPy brute-force implementation if compilation fails or
the geometry is unsupported (periodic cells smaller than 3 cutoffs).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cellist.cpp")
_SO = os.path.join(_HERE, "libcellist.so")
_LIB = None
_BUILD_FAILED = False

UNSUPPORTED = -1000000000


def _build() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    if _BUILD_FAILED:
        return None
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        from ..utils.locking import file_lock

        with file_lock(_SO + ".lock"):
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                try:
                    subprocess.run(
                        ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                         _SRC, "-o", _SO + ".tmp"],
                        check=True, capture_output=True, timeout=120,
                    )
                    os.replace(_SO + ".tmp", _SO)
                except Exception:
                    _BUILD_FAILED = True
                    return None
    try:
        return ctypes.CDLL(_SO)
    except OSError:
        _BUILD_FAILED = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        lib = _build()
        if lib is None:
            return None
        lib.cellist_neighbor_list.restype = ctypes.c_longlong
        lib.cellist_neighbor_list.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_double, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    return _LIB


def neighbor_list(
    positions: np.ndarray,
    cutoff: float,
    cell: Optional[np.ndarray] = None,
    pbc: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Full neighbor list (idx_i, idx_j, integer shifts), sorted by (i, j)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native cellist unavailable")

    R = np.ascontiguousarray(positions, dtype=np.float64)
    n = len(R)
    C = np.ascontiguousarray(cell, dtype=np.float64) if cell is not None else None
    P = (
        np.ascontiguousarray(np.asarray(pbc, dtype=np.uint8))
        if pbc is not None
        else None
    )
    if P is not None and not P.any():
        P = None
        C = None

    # guess ~ homogeneous density; retry on overflow with the exact count
    max_pairs = max(1024, n * 64)
    for _ in range(4):
        idx_i = np.empty(max_pairs, dtype=np.int32)
        idx_j = np.empty(max_pairs, dtype=np.int32)
        shifts = np.empty((max_pairs, 3), dtype=np.int32)
        rc = lib.cellist_neighbor_list(
            R.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            C.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if C is not None else None,
            P.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if P is not None else None,
            float(cutoff), max_pairs,
            idx_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            idx_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            shifts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == UNSUPPORTED:
            raise RuntimeError("geometry unsupported by cell list (cell < 3 cutoffs)")
        if rc >= 0:
            idx_i, idx_j, shifts = idx_i[:rc], idx_j[:rc], shifts[:rc]
            order = np.lexsort((shifts[:, 2], shifts[:, 1], shifts[:, 0], idx_j, idx_i))
            return (
                idx_i[order].astype(np.int64),
                idx_j[order].astype(np.int64),
                shifts[order].astype(np.int64),
            )
        max_pairs = int(-rc) + 1024
    raise RuntimeError("cellist retry limit exceeded")
