"""Shim ASE-style calculators that wrap sella_tpu jax potentials.

Both the (shimmed) reference run and the sella_tpu run evaluate the
*same* jitted ``Potential.energy_and_grad``, so golden-fixture parity
isolates the optimizer algorithm from the PES. Results are cached by
positions/cell hash, mirroring ASE's calculator-side caching (one
"force call" per geometry even when energy and forces are requested
separately).
"""
from __future__ import annotations

import numpy as np


class PotentialCalculator:
    """Wraps a :class:`sella_tpu.potentials.base.Potential`."""

    def __init__(self, potential):
        self.potential = potential
        self.ncalls = 0
        self._key = None
        self._energy = None
        self._forces = None

    def _compute(self, atoms):
        cell = np.asarray(atoms.cell.array, dtype=np.float64)
        key = (atoms.positions.tobytes(), cell.tobytes())
        if key == self._key:
            return
        e, F = self.potential.energy_and_forces(atoms)
        self.ncalls += 1
        self._key = key
        self._energy = float(e)
        self._forces = np.asarray(F, dtype=np.float64)

    def get_potential_energy(self, atoms=None):
        self._compute(atoms)
        return self._energy

    def get_forces(self, atoms=None):
        self._compute(atoms)
        return self._forces.copy()

    def get_stress(self, atoms=None, voigt=True):
        e_s, stress = self.potential.energy_and_stress(atoms)
        if not voigt:
            v = stress
            return np.array([
                [v[0], v[5], v[4]],
                [v[5], v[1], v[3]],
                [v[4], v[3], v[2]],
            ])
        return np.asarray(stress, dtype=np.float64)
