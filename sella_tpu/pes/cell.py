"""Coupled atom + cell optimization (layer 4, cell variants).

``CellCartesianPES`` mirrors ``/root/reference/sella/peswrapper.py:
2376-2933``: the DOF vector is [Cartesian positions, masked entries of
the scaled log-deformation L], where ``cell = expm(L / factor) @
orig_cell`` (ASE-FrechetCellFilter-style parameterization,
``peswrapper.py:2680-2710``), and the objective is the enthalpy
``E + P V``.

TPU-native delta: for jax potentials the whole stress pipeline —
virial conversion, ``dE/dC = C^-T (V sigma + r^T f)``, Daleckii–Krein
expm-Fréchet contraction (``peswrapper.py:2773-2819, 105-148``) —
collapses into ONE ``jax.grad`` through the differentiable ``expm``
(:func:`sella_tpu.ops.linalg.expm`). The same jitted scalar function
also yields exact cell-block HVPs for the Davidson diagonalization.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import expm, logm_host
from .cartesian import PES


class CellCartesianPES(PES):
    def __init__(
        self,
        atoms,
        *args,
        exp_cell_factor: Optional[float] = None,
        cell_mask: Optional[np.ndarray] = None,
        scalar_pressure: float = 0.0,
        refine_initial_hessian=False,
        hessian_delta: float = 1e-5,
        save_hessian: Optional[str] = None,
        H0: Optional[np.ndarray] = None,
        **kwargs,
    ) -> None:
        self.orig_cell = atoms.cell.copy()
        if exp_cell_factor is None:
            exp_cell_factor = float(len(atoms))
        self.exp_cell_factor = exp_cell_factor
        if cell_mask is None:
            cell_mask = np.ones((3, 3), dtype=bool)
        self.cell_mask = np.asarray(cell_mask, dtype=bool).reshape(3, 3)
        self.n_cell_dof = int(self.cell_mask.sum())
        self.scalar_pressure = scalar_pressure

        self._initializing = True
        PES.__init__(self, atoms, *args, H0=None, **kwargs)
        self.n_cart = self.dim
        self.dim = self.n_cart + self.n_cell_dof
        self._initializing = False

        if self._potential is None:
            raise NotImplementedError(
                "CellCartesianPES currently requires a jax-native "
                "Potential (host-calculator stress path not implemented)"
            )
        self._build_extended_energy()

        # block-diagonal initial Hessian (``peswrapper.py:2470-2509``)
        H0_full = np.zeros((self.dim, self.dim))
        if H0 is not None:
            H0_full[: self.n_cart, : self.n_cart] = np.asarray(H0)
        else:
            H0_full[: self.n_cart, : self.n_cart] = 70.0 * np.eye(
                self.n_cart
            )
        refine_level = int(refine_initial_hessian)
        if refine_level >= 1:
            cols = self._cell_hessian_columns()
            H0_full[: self.n_cart, self.n_cart:] = cols[: self.n_cart]
            H0_full[self.n_cart:, : self.n_cart] = cols[: self.n_cart].T
            cc = cols[self.n_cart:]
            H0_full[self.n_cart:, self.n_cart:] = 0.5 * (cc + cc.T)
        else:
            H0_full[self.n_cart:, self.n_cart:] = np.eye(self.n_cell_dof)
        if save_hessian is not None:
            np.save(save_hessian, H0_full)
        self.set_H(H0_full)

    # -- differentiable extended objective -----------------------------------
    def _build_extended_energy(self) -> None:
        pot = self._potential
        factor = self.exp_cell_factor
        pressure = self.scalar_pressure
        mask_flat = jnp.asarray(np.where(self.cell_mask.ravel())[0])

        def ext_energy(x_cart, s, L_base, cell0):
            L = L_base.ravel().at[mask_flat].set(s).reshape(3, 3)
            cell = expm(L / factor) @ cell0
            e = pot.energy(x_cart, cell)
            if pressure != 0.0:
                e = e + pressure * jnp.abs(jnp.linalg.det(cell))
            return e

        self._ext_energy = jax.jit(ext_energy)
        self._ext_grad = jax.jit(jax.value_and_grad(ext_energy, argnums=(0, 1)))

    # -- cell parameterization ------------------------------------------------
    # The scaled log-deformation L is explicit state (source of truth),
    # NOT recovered from the cell: the logm(expm(.)) roundtrip through a
    # near-defective eigendecomposition silently destroys small
    # off-diagonal perturbations (the reference's logm-based readback,
    # ``peswrapper.py:2684-2710``, has the same hazard).
    def _ensure_L(self) -> np.ndarray:
        if not hasattr(self, "_L") or self._L is None:
            F = self.atoms.cell @ np.linalg.inv(self.orig_cell)
            self._L = logm_host(F) * self.exp_cell_factor
        return self._L

    def _masked_cell_params(self) -> np.ndarray:
        return self._ensure_L()[self.cell_mask].copy()

    def _set_masked_cell_params(self, params: np.ndarray) -> None:
        L = self._ensure_L()
        L[self.cell_mask] = params
        cell = np.asarray(
            expm(jnp.asarray(L / self.exp_cell_factor))
        ) @ self.orig_cell
        self.atoms.cell = cell

    def _geom_signature(self) -> bytes:
        return (
            self.atoms.positions.tobytes() + self.atoms.cell.tobytes()
        )

    # -- coordinates --------------------------------------------------------------
    def get_x(self) -> np.ndarray:
        x_cart = self.atoms.positions.ravel().copy()
        if self._initializing:
            return x_cart
        return np.concatenate([x_cart, self._masked_cell_params()])

    def set_x(self, target: np.ndarray):
        """(``peswrapper.py:2712-2750``)"""
        x0 = self.get_x()
        dx_initial = np.asarray(target) - x0
        cell0 = self._masked_cell_params()
        self._set_masked_cell_params(target[self.n_cart:])
        diff_cart = target[: self.n_cart] - self.atoms.positions.ravel()
        self.atoms.positions = target[: self.n_cart].reshape(-1, 3)
        self._invalidate()
        dx_final = np.concatenate(
            [diff_cart, target[self.n_cart:] - cell0]
        )
        g_old = self.curr.get("g")
        g_par = g_old.copy() if g_old is not None else np.zeros(self.dim)
        return dx_initial, dx_final, g_par

    def save(self) -> None:
        super().save()
        self.savepoint["cell"] = self.atoms.cell.copy()
        self.savepoint["L"] = self._ensure_L().copy()

    def restore(self) -> None:
        cell = self.savepoint.get("cell")
        if cell is not None:
            self.atoms.cell = cell.copy()
        L = self.savepoint.get("L")
        if L is not None:
            self._L = L.copy()
        super().restore()

    # -- evaluation -----------------------------------------------------------------
    def eval(self) -> Tuple[float, np.ndarray]:
        self.neval += 1
        x = jnp.asarray(self.atoms.positions.ravel())
        s = jnp.asarray(self._masked_cell_params())
        L_base = jnp.asarray(self._ensure_L())
        cell0 = jnp.asarray(self.orig_cell)
        f, (g_cart, g_cell) = self._ext_grad(x, s, L_base, cell0)
        self.write_traj()
        return float(f), np.concatenate(
            [np.asarray(g_cart), np.asarray(g_cell)]
        )

    def _cell_hessian_columns(self, delta: float = 1e-5) -> np.ndarray:
        """FD refinement of the cell-related Hessian blocks (level 1,
        ``peswrapper.py:2602-2663``): 2 force calls per cell DOF."""
        cols = np.zeros((self.dim, self.n_cell_dof))
        x0 = self.get_x()
        for k in range(self.n_cell_dof):
            xp = x0.copy()
            xp[self.n_cart + k] += delta
            _, _, _ = self.set_x(xp)
            _, gp = self.eval()
            xm = x0.copy()
            xm[self.n_cart + k] -= delta
            self.set_x(xm)
            _, gm = self.eval()
            cols[:, k] = (gp - gm) / (2 * delta)
        self.set_x(x0)
        return cols

    # -- bases / convergence ----------------------------------------------------------
    def _calc_basis(self):
        """Cartesian constraint split extended by free cell DOF
        (``peswrapper.py:2821-2865``)."""
        if self._basis_valid and self._cached_basis is not None:
            return self._cached_basis
        from ..ops.linalg import split_cons_subspace_host

        drdx_cart = self.cons.jacobian()
        Ucons_c, Ufree_c = split_cons_subspace_host(drdx_cart)
        nc = self.n_cart
        nt = self.dim
        ncell = self.n_cell_dof

        drdx = np.zeros((drdx_cart.shape[0], nt))
        drdx[:, :nc] = drdx_cart
        Ucons = np.zeros((nt, Ucons_c.shape[1]))
        Ucons[:nc] = Ucons_c
        Unred = np.zeros((nt, nc + ncell))
        Unred[:nc, :nc] = np.eye(nc)
        Unred[nc:, nc:] = np.eye(ncell)
        Ufree = np.zeros((nt, Ufree_c.shape[1] + ncell))
        Ufree[:nc, : Ufree_c.shape[1]] = Ufree_c
        Ufree[nc:, Ufree_c.shape[1]:] = np.eye(ncell)
        self._cached_basis = (drdx, Ucons, Unred, Ufree)
        self._basis_valid = True
        return self._cached_basis

    def get_drdx(self) -> np.ndarray:
        drdx_cart = self.cons.jacobian()
        out = np.zeros((drdx_cart.shape[0], self.dim))
        out[:, : self.n_cart] = drdx_cart
        return out

    def get_Hc(self) -> np.ndarray:
        Hc = np.zeros((self.dim, self.dim))
        L = self.curr.get("L")
        if L is not None and L.size:
            Hc[: self.n_cart, : self.n_cart] = self.cons.hessian_ldot(L)
        return Hc

    def get_projected_forces(self) -> np.ndarray:
        g = self.get_g()[: self.n_cart]
        Ufree = self.get_Ufree()[: self.n_cart]
        return -(Ufree @ (Ufree.T @ g)).reshape(-1, 3)

    def converged(self, fmax: float, smax: Optional[float] = None,
                  cmax: float = 1e-5):
        """(``peswrapper.py:2867-2910``)"""
        if smax is None:
            smax = fmax
        g = self.get_g()
        fmax1 = np.linalg.norm(self.get_projected_forces(), axis=1).max()
        g_cell = g[self.n_cart:]
        smax1 = float(np.abs(g_cell).max()) if g_cell.size else 0.0
        res = self.get_res()
        cmax1 = np.linalg.norm(res) if res.size else 0.0
        conv = (fmax1 < fmax) and (smax1 < smax) and (cmax1 < cmax)
        return conv, fmax1, cmax1, smax1

    def maybe_niggli_reduce(self, angle_threshold: float = 30.0) -> bool:
        """Niggli reduction is a host-side repave event; implemented with
        the Hessian cell-block transform in a later stage."""
        return False
