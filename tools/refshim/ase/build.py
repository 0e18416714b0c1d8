"""ASE build shim: ``niggli_reduce`` via sella_tpu's basis reducer.

Only reached when the reference runs with ``niggli=True`` cell
optimization; reduces the cell in place and remaps scaled positions.
"""
from __future__ import annotations

import numpy as np

from sella_tpu.utils.lattice import reduce_cell_basis


def niggli_reduce(atoms) -> None:
    """Real-ASE semantics: the reduced cell spans the SAME lattice
    (rcell = M @ cell, M unimodular), so physical positions are
    preserved modulo wrapping by whole lattice vectors — express the
    positions in the NEW basis and wrap (ADVICE r4 #1: realizing
    OLD-basis fractionals in the new cell displaced atoms by
    non-lattice vectors and distorted the structure mid-run)."""
    cell = atoms.get_cell().array
    rcell, _op = reduce_cell_basis(cell, pbc=atoms.pbc)
    scaled = atoms.positions @ np.linalg.inv(rcell)
    scaled -= np.floor(scaled) * atoms.pbc  # wrap periodic axes
    atoms.set_cell(rcell, scale_atoms=False)
    atoms.positions = scaled @ rcell
