"""Minimal trajectory writer (extended-XYZ), replacing ase.io.Trajectory.

The reference writes a frame per force call
(``/root/reference/sella/peswrapper.py:409-411``); this writer does the
same into an .xyz/.extxyz text file readable by ASE/OVITO. For the
batched ensemble path, checkpointing of the full state pytree is handled
by orbax instead (``sella_tpu.parallel.checkpoint``).
"""
from __future__ import annotations

import numpy as np

from .elements import chemical_symbols


class TrajectoryWriter:
    def __init__(self, filename: str, atoms, mode: str = "w") -> None:
        self.filename = filename
        self.atoms = atoms
        self._fh = open(filename, mode)

    def write(self, atoms=None) -> None:
        atoms = atoms if atoms is not None else self.atoms
        n = len(atoms)
        self._fh.write(f"{n}\n")
        cell = np.asarray(atoms.cell).ravel()
        lattice = " ".join(f"{c:.10f}" for c in cell)
        pbc_str = " ".join("T" if p else "F" for p in atoms.pbc)
        self._fh.write(
            f'Lattice="{lattice}" pbc="{pbc_str}" '
            f"Properties=species:S:1:pos:R:3\n"
        )
        for z, p in zip(atoms.numbers, atoms.positions):
            sym = chemical_symbols[z]
            self._fh.write(f"{sym} {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
