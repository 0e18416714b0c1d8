"""ASE geometry shim: ``complete_cell`` and ``minkowski_reduce``.

``minkowski_reduce`` delegates to sella_tpu's greedy basis reducer
(same (rcell, op) contract: ``rcell = op @ cell`` with integer
unimodular ``op``).
"""
from __future__ import annotations

import numpy as np

from sella_tpu.utils.lattice import reduce_cell_basis


def complete_cell(cell) -> np.ndarray:
    """Replace zero cell rows with unit vectors orthogonal to the
    non-zero ones (ASE semantics, sufficient for molecular/slab use)."""
    cell = np.asarray(cell, dtype=np.float64).copy()
    if cell.shape == (3,):
        cell = np.diag(cell)
    missing = [i for i in range(3) if np.linalg.norm(cell[i]) < 1e-12]
    present = [i for i in range(3) if i not in missing]
    if not missing:
        return cell
    if len(present) == 0:
        return np.eye(3)
    if len(present) == 1:
        v = cell[present[0]]
        # two unit vectors orthogonal to v
        a = np.eye(3)[np.argmin(np.abs(v))]
        u1 = np.cross(v, a)
        u1 /= np.linalg.norm(u1)
        u2 = np.cross(v, u1)
        u2 /= np.linalg.norm(u2)
        cell[missing[0]] = u1
        cell[missing[1]] = u2
        return cell
    # one missing row: unit normal of the two present rows
    u = np.cross(cell[present[0]], cell[present[1]])
    cell[missing[0]] = u / np.linalg.norm(u)
    return cell


def minkowski_reduce(cell, pbc=None):
    cell = np.asarray(cell, dtype=np.float64)
    rcell, op = reduce_cell_basis(cell, pbc=pbc)
    return rcell, op
