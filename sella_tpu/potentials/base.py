"""Potential protocol: the device/host calculator boundary.

In the reference, every force evaluation crosses into an ASE calculator
(``/root/reference/sella/peswrapper.py:413-418``) — possibly an external
DFT process. Here there are two tiers:

* :class:`Potential` — a jax-native potential whose ``energy(x, cell)`` is
  a pure, jittable, vmappable function of the flat coordinate vector. This
  is what makes the Davidson hot loop (one gradient per matvec,
  ``/root/reference/sella/linalg.py:82-87``) fully TPU-resident, and what
  the batched-ensemble path vmaps over thousands of concurrent searches.
* host calculators — anything exposing ASE-style
  ``get_potential_energy(atoms)`` / ``get_forces(atoms)``. These stay on
  the host; the optimizer calls them through the same ``energy_and_grad``
  surface (one structure at a time).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import inv3


class Potential:
    """Base class for jax-native potentials.

    Subclasses implement :meth:`energy` as a pure function of the flat
    position vector ``x`` (shape ``(3n,)``) and the ``(3, 3)`` cell. All
    derivative plumbing (grad, value_and_grad, hessian-vector products) is
    derived here via jax transforms and cached per-instance.
    """

    #: whether minimum-image convention should be applied (set via pbc)
    pbc: bool = False

    def energy(self, x: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def validate_cell(self, cell) -> None:
        """Host-side sanity check of a concrete cell (e.g. minimum image
        shell validity). No-op by default; called once per force call
        from the PES wrappers with the current cell."""

    # -- derived, jitted entry points ---------------------------------------
    @partial(jax.jit, static_argnums=0)
    def energy_and_grad(
        self, x: jnp.ndarray, cell: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return jax.value_and_grad(self.energy)(x, cell)

    @partial(jax.jit, static_argnums=0)
    def grad(self, x: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
        return jax.grad(self.energy)(x, cell)

    @partial(jax.jit, static_argnums=0)
    def hvp(self, x: jnp.ndarray, v: jnp.ndarray, cell: jnp.ndarray):
        """Exact Hessian-vector product via forward-over-reverse."""
        g = lambda y: jax.grad(self.energy)(y, cell)
        return jax.jvp(g, (x,), (v,))[1]

    @partial(jax.jit, static_argnums=0)
    def hessian(self, x: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
        return jax.hessian(self.energy)(x, cell)

    @partial(jax.jit, static_argnums=0)
    def energy_and_strain_grad(
        self, x: jnp.ndarray, cell: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Energy and dE/d(strain): the AD route to the virial stress.

        Applies an infinitesimal affine deformation ``F = I + eps`` to
        positions AND cell and differentiates at ``eps = 0`` — the
        textbook definition ASE calculators realize analytically per
        potential. Stress = sym(dE/deps) / volume (ASE convention,
        eV/A^3); exact for any jax-native ``energy(x, cell)``."""
        def deformed(eps):
            F = jnp.eye(3, dtype=cell.dtype) + eps
            pos = x.reshape(-1, 3) @ F.T
            return self.energy(pos.ravel(), cell @ F.T)

        return jax.value_and_grad(deformed)(jnp.zeros((3, 3), cell.dtype))

    # -- host convenience (ASE-calculator-like surface) ---------------------
    def energy_and_forces(self, atoms) -> Tuple[float, np.ndarray]:
        x = jnp.asarray(atoms.positions.ravel())
        cell = jnp.asarray(atoms.cell)
        f, g = self.energy_and_grad(x, cell)
        return float(f), -np.asarray(g).reshape(-1, 3)

    def energy_and_stress(self, atoms) -> Tuple[float, np.ndarray]:
        """Voigt stress [xx, yy, zz, yz, xz, xy] in eV/A^3 — the
        host-facing surface the cell PES classes and the shim ASE
        calculator consume (reference analog:
        ``/root/reference/sella/peswrapper.py:2129``)."""
        x = jnp.asarray(atoms.positions.ravel())
        cell = np.asarray(atoms.cell, dtype=np.float64)
        vol = abs(np.linalg.det(cell))
        if vol <= 0.0:
            raise ValueError("stress requires a full-rank cell")
        e, d = self.energy_and_strain_grad(x, jnp.asarray(cell))
        d = np.asarray(d)
        sig = 0.5 * (d + d.T) / vol
        voigt = np.array([sig[0, 0], sig[1, 1], sig[2, 2],
                          sig[1, 2], sig[0, 2], sig[0, 1]])
        return float(e), voigt


def displacements(x: jnp.ndarray, cell: jnp.ndarray, pbc: bool):
    """All-pairs displacement matrix with (optional) minimum-image wrap.

    Returns ``dr[i, j] = r_j - r_i`` of shape ``(n, n, 3)``. The MIC wrap
    rounds fractional displacements; exact for cells that are not too
    skewed (Niggli-reduced), matching how the reference computes bonded
    displacements through explicit cell images
    (``/root/reference/sella/internal.py:2634-2691``).
    """
    pos = x.reshape(-1, 3)
    dr = pos[None, :, :] - pos[:, None, :]
    if pbc:
        inv = inv3(cell)
        frac = dr @ inv
        frac = frac - jnp.round(frac)
        dr = frac @ cell
    return dr


def pair_distances(x: jnp.ndarray, cell: jnp.ndarray, pbc: bool):
    """Pairwise distances with a safe diagonal (set to +inf)."""
    dr = displacements(x, cell, pbc)
    r2 = jnp.sum(dr * dr, axis=-1)
    n = r2.shape[0]
    eye = jnp.eye(n, dtype=bool)
    r2 = jnp.where(eye, jnp.inf, r2)
    return jnp.sqrt(r2)


class ASECalculatorWrapper:
    """Host-tier calculator: wraps an ase.Atoms with an attached calculator.

    This is the external-code boundary (DFT etc.). Evaluations happen on
    the host, one structure at a time, exactly like the reference's
    calculator calls (``/root/reference/sella/peswrapper.py:413-418``).
    """

    def __init__(self, ase_atoms) -> None:
        self._ase_atoms = ase_atoms

    def energy_and_forces(self, atoms) -> Tuple[float, np.ndarray]:
        self._ase_atoms.positions = np.asarray(atoms.positions)
        if np.asarray(atoms.cell).any():
            self._ase_atoms.cell = np.asarray(atoms.cell)
        e = self._ase_atoms.get_potential_energy()
        f = self._ase_atoms.get_forces()
        return float(e), np.asarray(f)

    def get_stress(self, atoms) -> np.ndarray:
        """Voigt stress from the wrapped ASE calculator (for cell
        optimization with host calculators)."""
        self._ase_atoms.positions = np.asarray(atoms.positions)
        self._ase_atoms.cell = np.asarray(atoms.cell)
        return np.asarray(self._ase_atoms.get_stress())


def get_potential(atoms) -> Optional[Potential]:
    """Return the jax-native Potential attached to atoms, or None."""
    calc = getattr(atoms, "calc", None)
    return calc if isinstance(calc, Potential) else None
