"""ctypes binding for the C++ minimal-spread path solver (native/dp_solver.cc)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_so_path = os.path.join(os.path.dirname(__file__), "libdp_solver.so")
if not os.path.exists(_so_path):
    raise ImportError(f"native dp_solver not built (run native/build.sh): {_so_path}")

_lib = ctypes.CDLL(_so_path)
_lib.find_minimal_spread_and_path.restype = ctypes.c_double
_lib.find_minimal_spread_and_path.argtypes = [
    ctypes.c_int,
    ctypes.c_int,
    np.ctypeslib.ndpointer(dtype=np.float64, ndim=2, flags="C_CONTIGUOUS"),
    np.ctypeslib.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS"),
]


def find_minimal_spread_and_path(n: int, m: int, weights: np.ndarray):
    """Returns (best_spread, path[list of n node indices]) or raises ValueError."""
    w = np.ascontiguousarray(np.asarray(weights, np.float64))
    assert w.shape == (m, m)
    path = np.zeros(n, np.int32)
    d = _lib.find_minimal_spread_and_path(n, m, w, path)
    if d < 0:
        raise ValueError("no feasible path")
    return float(d), path.tolist()
