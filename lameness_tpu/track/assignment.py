"""Linear assignment: native C++ LAPJV with scipy fallback.

Replaces the reference's ``lap.lapjv(cost, extend_cost=True,
cost_limit=100000)`` call (``tracker/matching.py:91``).  The native solver
(``native/lapjv.cpp``) is compiled on first use with g++ and loaded through
ctypes; rectangular/limited problems are reduced to square LAPJV by
constant padding.  With tracker costs bounded by 2, the cost limit never
binds, so the scipy Hungarian fallback is bit-identical in cost.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _NATIVE_DIR / "lapjv.cpp"
_SO = _NATIVE_DIR / "build" / "liblapjv.so"

_lib: Optional[ctypes.CDLL] = None
_native_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _native_failed
    if _lib is not None or _native_failed:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _SO.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.lapjv.restype = ctypes.c_double
        lib.lapjv.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except Exception:
        _native_failed = True
        _lib = None
    return _lib


def lapjv_square(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    """Solve square LAP.  Returns (rowsol, colsol, total_cost)."""
    n = cost.shape[0]
    assert cost.shape == (n, n)
    lib = _load_native()
    if lib is not None:
        c = np.ascontiguousarray(cost, np.float64)
        rowsol = np.empty(n, np.int32)
        colsol = np.empty(n, np.int32)
        total = lib.lapjv(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            rowsol.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            colsol.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        return rowsol, colsol, float(total)
    from scipy.optimize import linear_sum_assignment
    rows, cols = linear_sum_assignment(cost)
    rowsol = np.empty(n, np.int32)
    colsol = np.empty(n, np.int32)
    rowsol[rows] = cols
    colsol[cols] = rows
    return rowsol, colsol, float(cost[rows, cols].sum())


def solve(cost: np.ndarray, cost_limit: float = 1e5
          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rectangular assignment with a cost cap, matching the reference's
    ``lap.lapjv(extend_cost=True, cost_limit=...)`` output convention.

    Returns (matched (K, 2) of (row, col), unmatched_rows, unmatched_cols).
    """
    if cost.size == 0:
        return (np.empty((0, 2), int), np.arange(cost.shape[0]),
                np.arange(cost.shape[1]))
    n, m = cost.shape
    k = max(n, m)
    pad_val = cost_limit + 1.0
    sq = np.full((k, k), pad_val, np.float64)
    sq[:n, :m] = cost
    rowsol, _, _ = lapjv_square(sq)
    matched, un_rows, un_cols = [], [], []
    used_cols = set()
    for i in range(n):
        j = int(rowsol[i])
        if j < m and cost[i, j] <= cost_limit:
            matched.append([i, j])
            used_cols.add(j)
        else:
            un_rows.append(i)
    for j in range(m):
        if j not in used_cols:
            un_cols.append(j)
    return (np.asarray(matched, int).reshape(-1, 2),
            np.asarray(un_rows, int), np.asarray(un_cols, int))


def using_native() -> bool:
    return _load_native() is not None
