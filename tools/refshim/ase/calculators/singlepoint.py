"""ASE SinglePointCalculator shim: frozen results container."""
from __future__ import annotations


class SinglePointCalculator:
    def __init__(self, atoms=None, **results):
        self.results = dict(results)

    def get_potential_energy(self, atoms=None):
        return self.results["energy"]

    def get_forces(self, atoms=None):
        return self.results["forces"]

    def get_stress(self, atoms=None, voigt=True):
        return self.results["stress"]
