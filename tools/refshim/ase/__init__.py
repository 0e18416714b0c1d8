"""Minimal ASE API shim (test-only; see tools/refshim/README.md).

Implements just enough of the ``ase`` surface for the reference package
at ``/root/reference/sella`` to import and run:
``Atom``, ``Atoms`` (positions/numbers/cell/pbc/masses/calc, arithmetic
concatenation for dummy atoms), and the ``units`` submodule. Element
tables come from ``sella_tpu.utils.elements`` so the shimmed reference
and the sella_tpu run share identical constants.
"""
from __future__ import annotations

import numpy as np

from sella_tpu.utils.elements import (
    atomic_masses,
    chemical_symbols,
    symbol_to_number,
)

from . import units  # noqa: F401  (``from ase import units``)
from .cell import Cell


class Atom:
    """Single atom: symbol/number + position (reference uses it only to
    append dummy atoms, ``/root/reference/sella/internal.py:3515``)."""

    def __init__(self, symbol="X", position=(0.0, 0.0, 0.0)):
        if isinstance(symbol, str):
            self.number = int(symbol_to_number[symbol])
        else:
            self.number = int(symbol)
        self.position = np.array(position, dtype=np.float64)

    @property
    def symbol(self) -> str:
        return chemical_symbols[self.number]


def _parse_symbols(symbols) -> np.ndarray:
    if symbols is None:
        return np.zeros(0, dtype=np.int64)
    if isinstance(symbols, str):
        # formula string like "Xe4" / "H2O"
        out = []
        i = 0
        while i < len(symbols):
            j = i + 1
            if j < len(symbols) and symbols[j].islower():
                j += 1
            sym = symbols[i:j]
            k = j
            while k < len(symbols) and symbols[k].isdigit():
                k += 1
            count = int(symbols[j:k]) if k > j else 1
            out.extend([symbol_to_number[sym]] * count)
            i = k
        return np.array(out, dtype=np.int64)
    nums = []
    for s in symbols:
        if isinstance(s, str):
            nums.append(symbol_to_number[s])
        elif isinstance(s, Atom):
            nums.append(s.number)
        else:
            nums.append(int(s))
    return np.array(nums, dtype=np.int64)


class Atoms:
    """Minimal ``ase.Atoms``: arrays dict, mutable positions, cell/pbc,
    attached calculator with ASE's call-through energy/forces protocol."""

    def __init__(
        self,
        symbols=None,
        positions=None,
        numbers=None,
        cell=None,
        pbc=None,
        masses=None,
        calculator=None,
    ):
        if numbers is None:
            numbers = _parse_symbols(symbols)
        else:
            numbers = np.asarray(numbers, dtype=np.int64)
        n = len(numbers)
        if positions is None:
            positions = np.zeros((n, 3), dtype=np.float64)
        positions = np.array(positions, dtype=np.float64).reshape(n, 3)
        self.arrays = {"numbers": numbers, "positions": positions}
        self._cell = Cell(np.zeros((3, 3)) if cell is None else cell)
        if pbc is None:
            pbc = np.zeros(3, dtype=bool)
        self.pbc = np.array(pbc, dtype=bool) * np.ones(3, dtype=bool)
        self._masses = (
            None if masses is None else np.asarray(masses, dtype=np.float64)
        )
        self.calc = calculator
        self.constraints = []

    # -- core arrays ---------------------------------------------------------
    @property
    def positions(self) -> np.ndarray:
        return self.arrays["positions"]

    @positions.setter
    def positions(self, value) -> None:
        self.arrays["positions"] = np.array(
            value, dtype=np.float64
        ).reshape(len(self), 3)

    @property
    def numbers(self) -> np.ndarray:
        return self.arrays["numbers"]

    def get_positions(self) -> np.ndarray:
        return self.positions.copy()

    def set_positions(self, value) -> None:
        self.positions = value

    def get_chemical_symbols(self):
        return [chemical_symbols[z] for z in self.numbers]

    def get_masses(self) -> np.ndarray:
        if self._masses is not None:
            return self._masses.copy()
        return atomic_masses[self.numbers].astype(np.float64)

    def set_masses(self, masses) -> None:
        if isinstance(masses, str):
            # ASE string modes (reference irc.py:50-60). This shim only
            # carries the standard-atomic-weight table ('defaults');
            # raising on 'most_common' reproduces the old-ASE fallback
            # path the reference handles with a warning.
            if masses == "defaults":
                self._masses = None
                return
            raise ValueError(f"unknown masses mode {masses!r}")
        self._masses = (
            None if masses is None else np.asarray(masses, dtype=np.float64)
        )

    # -- cell ------------------------------------------------------------------
    @property
    def cell(self) -> Cell:
        return self._cell

    @cell.setter
    def cell(self, value) -> None:
        self._cell = Cell(value)

    def get_cell(self) -> Cell:
        return Cell(self._cell.array.copy())

    def set_cell(self, cell, scale_atoms: bool = False) -> None:
        new = Cell(cell)
        if scale_atoms and len(self):
            old = self._cell.array
            M = np.linalg.solve(old, new.array)  # old @ M = new
            self.positions = self.positions @ M
        self._cell = new

    def get_volume(self) -> float:
        return float(abs(np.linalg.det(self._cell.array)))

    # -- calculator protocol -----------------------------------------------
    def get_potential_energy(self):
        return self.calc.get_potential_energy(self)

    def get_forces(self):
        return self.calc.get_forces(self)

    def get_stress(self, voigt: bool = True):
        return self.calc.get_stress(self, voigt=voigt)

    # -- container protocol ----------------------------------------------------
    def __len__(self) -> int:
        return len(self.arrays["numbers"])

    def copy(self) -> "Atoms":
        out = Atoms(
            numbers=self.numbers.copy(),
            positions=self.positions.copy(),
            cell=self._cell.array.copy(),
            pbc=self.pbc.copy(),
            masses=None if self._masses is None else self._masses.copy(),
        )
        return out

    def _concat(self, other) -> "Atoms":
        if isinstance(other, Atom):
            onum = np.array([other.number], dtype=np.int64)
            opos = other.position.reshape(1, 3)
        else:
            onum = other.numbers
            opos = other.positions
        return Atoms(
            numbers=np.concatenate([self.numbers, onum]),
            positions=np.concatenate([self.positions, opos]),
            cell=self._cell.array.copy(),
            pbc=self.pbc.copy(),
        )

    def __add__(self, other) -> "Atoms":
        return self._concat(other)

    def __iadd__(self, other) -> "Atoms":
        new = self._concat(other)
        self.arrays = new.arrays
        return self

    def __getitem__(self, idx):
        if np.isscalar(idx):
            return Atom(int(self.numbers[idx]), self.positions[idx])
        idx = np.asarray(idx)
        return Atoms(
            numbers=self.numbers[idx],
            positions=self.positions[idx],
            cell=self._cell.array.copy(),
            pbc=self.pbc.copy(),
        )
