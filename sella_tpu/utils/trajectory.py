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


def write_ensemble_xyz(filename: str, numbers, x_batch,
                       cell=None, pbc=(False, False, False),
                       mask=None, energies=None, mode: str = "w"):
    """Dump batched ensemble geometries as extended-XYZ frames (one
    frame per lane; lanes selected by ``mask``). ``x_batch`` is the
    (B, 3n) position block of any tier's state (pass
    ``state.x[:, :3*natoms]`` / ``state.z[:, :3*natoms]``); per-lane
    ``energies`` land in the comment line. The batched analogue of the
    reference's per-force-call trajectory files — here the product is
    the harvest of an ensemble run, written host-side in one pass."""
    x_batch = np.asarray(x_batch)
    numbers = np.asarray(numbers)
    n = len(numbers)
    cellv = (np.zeros((3, 3)) if cell is None
             else np.asarray(cell)).ravel()
    lattice = " ".join(f"{c:.10f}" for c in cellv)
    pbc_str = " ".join("T" if p else "F" for p in pbc)
    sel = (range(x_batch.shape[0]) if mask is None
           else np.where(np.asarray(mask))[0])
    with open(filename, mode) as fh:
        for b in sel:
            fh.write(f"{n}\n")
            extra = ""
            if energies is not None:
                extra = f" energy={float(np.asarray(energies)[b]):.10f}"
            fh.write(
                f'Lattice="{lattice}" pbc="{pbc_str}" lane={b}{extra} '
                f"Properties=species:S:1:pos:R:3\n"
            )
            pos = x_batch[b][: 3 * n].reshape(n, 3)
            for z, p in zip(numbers, pos):
                sym = chemical_symbols[z]
                fh.write(
                    f"{sym} {p[0]:.10f} {p[1]:.10f} {p[2]:.10f}\n"
                )


def read_trajectory(filename: str):
    """Read all frames of an extended-XYZ trajectory written by
    :class:`TrajectoryWriter`. Returns a list of Atoms."""
    from ..atoms import Atoms
    from .elements import symbol_to_number

    frames = []
    with open(filename) as fh:
        while True:
            line = fh.readline()
            if not line.strip():
                break
            n = int(line)
            header = fh.readline()
            cell = np.zeros((3, 3))
            pbc = [False] * 3
            if 'Lattice="' in header:
                lat = header.split('Lattice="')[1].split('"')[0]
                cell = np.fromstring(lat, sep=" ").reshape(3, 3)
            if 'pbc="' in header:
                pbc = [
                    t == "T"
                    for t in header.split('pbc="')[1].split('"')[0].split()
                ]
            numbers = []
            positions = []
            for _ in range(n):
                parts = fh.readline().split()
                numbers.append(symbol_to_number[parts[0]])
                positions.append([float(x) for x in parts[1:4]])
            frames.append(
                Atoms(numbers, positions, cell=cell, pbc=pbc)
            )
    return frames
