"""ctypes bindings for the native C++ host-runtime kernels.

The shared library is built lazily from ``csrc/topology.cpp`` with g++
the first time it is needed (cached next to the source); every consumer
falls back to the numpy implementation when the toolchain or binary is
unavailable, so the native path is a pure accelerator, never a hard
dependency.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "topology.cpp"
_SO = _SRC.parent / "libsella_native.so"


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists():
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.find_candidate_bonds.restype = ctypes.c_int64
    lib.find_candidate_bonds.argtypes = [
        f64p, f64p, i64p, f64p, i64p,
        ctypes.c_int64, ctypes.c_double, i64p, ctypes.c_int64,
    ]
    lib.flood_fill_fragments.restype = ctypes.c_int64
    lib.flood_fill_fragments.argtypes = [
        i64p, ctypes.c_int64, ctypes.c_int64, i64p,
    ]
    _LIB = lib
    return _LIB


def find_candidate_bonds_native(
    positions: np.ndarray,
    cell: np.ndarray,
    pbc: np.ndarray,
    rcov: np.ndarray,
    labels: np.ndarray,
    scale: float,
) -> Optional[List[Tuple[int, int, np.ndarray]]]:
    """Native candidate-bond search; None means 'use the numpy path'."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(positions)
    positions = np.ascontiguousarray(positions, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64)
    pbc64 = np.ascontiguousarray(pbc, dtype=np.int64)
    rcov = np.ascontiguousarray(rcov, dtype=np.float64)
    labels = np.ascontiguousarray(labels, dtype=np.int64)

    cap = max(64, 16 * n)
    while True:
        out = np.empty((cap, 5), dtype=np.int64)
        cnt = lib.find_candidate_bonds(
            positions, cell, pbc64, rcov, labels, n, scale,
            out.reshape(-1), cap,
        )
        if cnt <= cap:
            break
        cap = int(cnt) + 64
    out = out[: min(cnt, cap)]
    return [
        (int(i), int(j), np.array([tx, ty, tz], dtype=np.int64))
        for i, j, tx, ty, tz in out
    ]


def flood_fill_native(
    bonds: np.ndarray, n: int
) -> Optional[Tuple[np.ndarray, int]]:
    lib = get_lib()
    if lib is None:
        return None
    bonds = np.ascontiguousarray(bonds, dtype=np.int64).reshape(-1, 2)
    labels = np.empty(n, dtype=np.int64)
    nlab = lib.flood_fill_fragments(
        bonds.reshape(-1), len(bonds), n, labels
    )
    return labels, int(nlab)
