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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import expm, inv3, logm_host
from .cartesian import PES


def voigt_6_to_full_3x3_stress(sv: np.ndarray) -> np.ndarray:
    """ASE Voigt order [xx, yy, zz, yz, xz, xy] -> full 3x3
    (``peswrapper.py:1295-1317``)."""
    xx, yy, zz, yz, xz, xy = sv
    return np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])


def full_3x3_to_voigt_6_stress(s: np.ndarray) -> np.ndarray:
    return np.array(
        [s[0, 0], s[1, 1], s[2, 2], s[1, 2], s[0, 2], s[0, 1]]
    )


from ..utils.lattice import reduce_cell_basis  # noqa: F401  (re-export;
#   the implementation moved to utils.lattice so topology discovery can
#   share it without a coords -> pes dependency)


def _cell_param_jacobian(L: np.ndarray, cell0: np.ndarray,
                         factor: float) -> np.ndarray:
    """J[ab, ij] = d(cell_ab)/d(L_ij) at L, via autodiff through expm
    (replaces the reference's explicit expm-Fréchet loop,
    ``peswrapper.py:180-200``)."""
    L = jnp.asarray(L)
    cell0 = jnp.asarray(cell0)

    def cell_of(Lflat):
        return (expm(Lflat.reshape(3, 3) / factor) @ cell0).ravel()

    J = jax.jacfwd(cell_of)(L.ravel())
    return np.asarray(J)


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

        if self._potential is not None:
            self._build_extended_energy()
        else:
            # host-calculator path: cell gradient from the virial stress
            # (requires calc.get_stress); the chain rule through the
            # cell(s) parameterization is a single vjp (below)
            self._build_param_vjp()

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
        # initialized flag kept for signature parity with the reference
        # (``peswrapper.py:2509``): in BOTH implementations set_B with a
        # dense target forces initialized=True (reference
        # ``linalg.py:247``, ours ``ops/operators.py:178``), so the
        # "bootstrap only the Cartesian block" branch of update()
        # (``linalg.py:280-289``) never runs for a dense H0 — the
        # refined blocks are preserved simply because the first update
        # is a regular TS-BFGS absorb of the full matrix.
        self.set_H(H0_full, initialized=(refine_level == 0))

    # -- differentiable extended objective -----------------------------------
    def _build_extended_energy(self) -> None:
        pot = self._potential
        if not getattr(pot, "has_stress", True):
            raise ValueError(
                "this host-batched potential has no stress source: "
                "cell DOF derivatives would be silently wrong. Pass "
                "stress_func=... to HostBatchedCalculator."
            )
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

    def _build_param_vjp(self) -> None:
        factor = self.exp_cell_factor
        mask_flat = jnp.asarray(np.where(self.cell_mask.ravel())[0])

        def cell_of(s, L_base, cell0):
            L = L_base.ravel().at[mask_flat].set(s).reshape(3, 3)
            return expm(L / factor) @ cell0

        @jax.jit
        def pullback(s, L_base, cell0, dEdC):
            _, vjp = jax.vjp(lambda ss: cell_of(ss, L_base, cell0), s)
            return vjp(dEdC)[0]

        self._param_vjp = pullback

    def _stress_to_cell_gradient(self, stress_voigt: np.ndarray,
                                 forces: np.ndarray) -> np.ndarray:
        """Virial stress -> gradient w.r.t. the masked log-deformation
        parameters (fixed-Cartesian convention, ``peswrapper.py:
        2773-2819``); the expm-Frechet contraction is one jax vjp."""
        C = self.atoms.cell
        volume = abs(np.linalg.det(C))
        sigma = voigt_6_to_full_3x3_stress(np.asarray(stress_voigt))
        if self.scalar_pressure != 0.0:
            sigma = sigma + self.scalar_pressure * np.eye(3)
        dEdC = np.linalg.inv(C.T) @ (
            volume * sigma + self.atoms.positions.T @ np.asarray(forces)
        )
        g = self._param_vjp(
            jnp.asarray(self._masked_cell_params()),
            jnp.asarray(self._ensure_L()),
            jnp.asarray(self.orig_cell),
            jnp.asarray(dEdC),
        )
        return np.asarray(g)

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
        if self._potential is not None:
            x = jnp.asarray(self.atoms.positions.ravel())
            s = jnp.asarray(self._masked_cell_params())
            L_base = jnp.asarray(self._ensure_L())
            cell0 = jnp.asarray(self.orig_cell)
            f, (g_cart, g_cell) = self._ext_grad(x, s, L_base, cell0)
            self.write_traj()
            return float(f), np.concatenate(
                [np.asarray(g_cart), np.asarray(g_cell)]
            )
        # host-calculator path (``peswrapper.py:2752-2771``)
        f = self.atoms.get_potential_energy()
        if self.scalar_pressure != 0.0:
            f = f + self.scalar_pressure * abs(
                np.linalg.det(self.atoms.cell)
            )
        forces = self.atoms.get_forces()
        g_cart = -forces.ravel()
        calc = self.atoms.calc
        if not hasattr(calc, "get_stress"):
            raise RuntimeError(
                "Cell optimization with a host calculator requires "
                "calc.get_stress(atoms) (Voigt, eV/A^3)."
            )
        stress = np.asarray(calc.get_stress(self.atoms))
        g_cell = self._stress_to_cell_gradient(stress, forces)
        self.write_traj()
        return float(f), np.concatenate([g_cart, g_cell])

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
        """Rebase onto a compact reduced cell when angles skew too far
        from 90 deg (``peswrapper.py:2511-2555``): atoms wrap into the
        new cell, the log-deformation reference resets, and the Hessian
        cell blocks transform by ``T = J_old^{-1} J_new`` (Jacobians of
        the cell(L) map by autodiff, replacing the reference's
        ``_niggli_hessian_transform``, ``peswrapper.py:151-211``)."""
        cell = self.atoms.cell
        def angle(u, v):
            c = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
            return np.degrees(np.arccos(np.clip(c, -1, 1)))

        devs = [
            abs(angle(cell[i], cell[j]) - 90.0)
            for i, j in ((0, 1), (0, 2), (1, 2))
        ]
        if max(devs) <= angle_threshold:
            return False

        # old parameterization Jacobian at the current L
        J_old = _cell_param_jacobian(
            self._ensure_L() / 1.0, self.orig_cell, self.exp_cell_factor
        )

        new_cell, M = reduce_cell_basis(cell)
        # Real ASE ``niggli_reduce`` (called by the reference at
        # ``peswrapper.py:195``) preserves PHYSICAL positions modulo
        # lattice wrapping: the new cell spans the same lattice
        # (new_cell = M @ cell, M unimodular), so atoms only wrap by
        # whole lattice vectors — no energy discontinuity. Express the
        # current positions in the NEW basis and wrap. (A round-4
        # regression realized OLD-basis fractionals in the new cell,
        # displacing atoms by non-lattice vectors — advisor finding,
        # ADVICE r4 #1; the batched tier always had these semantics.)
        frac = self.atoms.positions @ np.linalg.inv(np.asarray(new_cell))
        frac -= np.floor(frac)
        self.atoms.positions = frac @ new_cell
        self.atoms.cell = new_cell

        # new parameterization Jacobian at L = 0 about the new cell.
        # Same-lattice perturbations of the two representations relate
        # by dC_old = M^{-1} dC_new (new_cell = M @ cell, unimodular),
        # hence the (M^{-1} ⊗ I) factor. The reference
        # (``peswrapper.py:151-211``) drops that factor — an O(1)
        # transform error whenever the reduction is nontrivial
        # (deliberate fix; exact chain rule pinned to 1e-14 in
        # tests/test_cell_niggli_batched.py).
        J_new = _cell_param_jacobian(
            np.zeros((3, 3)), new_cell, self.exp_cell_factor
        )
        K = np.kron(np.linalg.inv(M), np.eye(3))
        T_full = np.linalg.solve(J_old, K @ J_new)
        midx = np.where(self.cell_mask.ravel())[0]
        T = T_full[np.ix_(midx, midx)]

        H = self.H.asarray().copy()
        n = self.n_cart
        H[n:, n:] = T.T @ H[n:, n:] @ T
        H[:n, n:] = H[:n, n:] @ T
        H[n:, :n] = T.T @ H[n:, :n]

        self.orig_cell = new_cell.copy()
        self._L = np.zeros((3, 3))
        self.set_H(H)
        self.curr = dict(x=None, f=None, g=None)
        self.last = dict(self.curr)
        self._invalidate()
        return True


class CellInternalPES:
    """Internal coordinates + cell DOF (``peswrapper.py:1320-2373``).

    Composed from :class:`~sella_tpu.pes.internal.InternalPES` for the
    atomic part and the log-deformation machinery above for the cell
    part. DOF vector = [q (redundant internals), masked scaled
    log-deformation]. A cell change scales atoms affinely (fixed
    fractional coordinates, ``peswrapper.py:1864-1878``); the optimizer's
    internal step then applies on top via the geodesic move. The cell
    gradient is ``jax.grad`` of the fixed-fractional enthalpy — the
    reference's virial + expm-Fréchet pipeline is unnecessary.

    Rigid-fragment transport (``rigid_fragments=True``: CoM/rotation
    remap under cell deformation, ``peswrapper.py:1947-2010``) and
    Niggli cell rebase (:meth:`maybe_niggli_reduce`,
    ``peswrapper.py:1521-1567``) are both implemented below.
    """

    n_cell_dof: int

    def __init__(
        self,
        atoms,
        internals,
        *args,
        exp_cell_factor: Optional[float] = None,
        cell_mask: Optional[np.ndarray] = None,
        scalar_pressure: float = 0.0,
        rigid_fragments: Optional[bool] = None,
        refine_initial_hessian=False,
        hessian_delta: float = 1e-5,
        save_hessian: Optional[str] = None,
        H0: Optional[np.ndarray] = None,
        **kwargs,
    ) -> None:
        from .internal import InternalPES

        # atomic part is a full InternalPES; we wrap rather than subclass
        # so every internal-only code path stays untouched
        self._ipes = InternalPES(atoms, internals, *args, **kwargs)
        if rigid_fragments is None:
            # reference auto-detection (``peswrapper.py:1431-1434``):
            # fragment TRIC translations present => the system is a
            # molecular crystal whose fragments ride the cell as rigid
            # bodies rather than deforming with it
            rigid_fragments = bool(getattr(self._ipes.int, "trans", []))
        self.rigid_fragments = bool(rigid_fragments)
        rigid_fragments = self.rigid_fragments
        self.atoms = self._ipes.atoms
        self.int = self._ipes.int
        self.cons = self._ipes.cons

        self.orig_cell = atoms.cell.copy()
        self.exp_cell_factor = (
            float(len(atoms)) if exp_cell_factor is None else exp_cell_factor
        )
        if cell_mask is None:
            cell_mask = np.ones((3, 3), dtype=bool)
        self.cell_mask = np.asarray(cell_mask, dtype=bool).reshape(3, 3)
        self.n_cell_dof = int(self.cell_mask.sum())
        self.scalar_pressure = scalar_pressure
        self._L = np.zeros((3, 3))

        self.n_internal = self._ipes.dim
        self.dim = self.n_internal + self.n_cell_dof
        self.eta = self._ipes.eta
        self.hessian_function = self._ipes.hessian_function
        self.traj = self._ipes.traj
        self.first_diag = True
        self.v0 = self._ipes.v0
        self.eigensolver = self._ipes.eigensolver

        pot = self._ipes._potential
        factor = self.exp_cell_factor
        pressure = self.scalar_pressure
        mask_flat = jnp.asarray(np.where(self.cell_mask.ravel())[0])

        def cell_of(s, L_base, cell0):
            L = L_base.ravel().at[mask_flat].set(s).reshape(3, 3)
            return expm(L / factor) @ cell0

        transport = None
        if rigid_fragments:
            # rigid transport map: the fixed-fractional convention is
            # WRONG under rigid transport (fragments do not deform with
            # the cell), so the atom motion is the exact transport map —
            # CoM affine + polar-rotation orientation (the reference's
            # rotation correction, ``peswrapper.py:2135-2208`` + tests
            # ``test_cell_optimization.py:1189-1607``). The polar factor
            # is computed by a fixed-count Newton iteration
            # R <- (R + R^-T)/2 (quadratically convergent near identity,
            # differentiable — SVD gradients NaN at the F = I evaluation
            # point where all singular values coincide).
            groups = [np.asarray(gr) for gr in
                      (self.int.fragment_atom_groups or [])]
            moved = np.zeros(len(atoms), dtype=bool)
            for gr in groups:
                moved[gr] = True
            lone_idx = jnp.asarray(np.where(~moved)[0])
            groups_j = [jnp.asarray(gr) for gr in groups]

            def _polar_rotation(F):
                R = F
                for _ in range(8):
                    R = 0.5 * (R + inv3(R).T)
                return R

            def transport(pos, s, L_base, cell_ref, cell0):
                cell_new = cell_of(s, L_base, cell0)
                inv_ref = inv3(cell_ref)
                A = inv_ref @ cell_new           # row-vector affine map
                R = _polar_rotation(cell_new @ inv_ref)
                new_pos = pos
                if lone_idx.shape[0]:
                    new_pos = new_pos.at[lone_idx].set(
                        pos[lone_idx] @ A
                    )
                for gr in groups_j:
                    com = jnp.mean(pos[gr], axis=0)
                    delta = pos[gr] - com
                    new_pos = new_pos.at[gr].set(
                        com @ A + delta @ R.T
                    )
                return new_pos, cell_new

        if pot is not None and not getattr(pot, "has_stress", True):
            raise ValueError(
                "this host-batched potential has no stress source: "
                "cell DOF derivatives would be silently wrong. Pass "
                "stress_func=... to HostBatchedCalculator."
            )
        if pot is not None:
            def cell_enthalpy(frac, s, L_base, cell0):
                cell = cell_of(s, L_base, cell0)
                pos = frac @ cell
                e = pot.energy(pos.ravel(), cell)
                if pressure != 0.0:
                    e = e + pressure * jnp.abs(jnp.linalg.det(cell))
                return e

            self._cell_grad = jax.jit(jax.grad(cell_enthalpy, argnums=1))

            if rigid_fragments:
                def cell_enthalpy_rigid(pos, s, L_base, cell_ref, cell0):
                    new_pos, cell_new = transport(
                        pos, s, L_base, cell_ref, cell0
                    )
                    e = pot.energy(new_pos.ravel(), cell_new)
                    if pressure != 0.0:
                        e = e + pressure * jnp.abs(
                            jnp.linalg.det(cell_new)
                        )
                    return e

                self._cell_grad_rigid = jax.jit(
                    jax.grad(cell_enthalpy_rigid, argnums=1)
                )
        else:
            # host-calculator path (the reference's primary production
            # use: external DFT supplying forces + virial stress,
            # ``peswrapper.py:2113-2208``). The cell gradient is
            # assembled on the host from calc.get_stress; only the
            # pure-geometry chain rule through the log-deformation map
            # (and, for rigid fragments, the transport map) runs as a
            # jax vjp — no potential evaluation inside jax.
            @jax.jit
            def param_vjp(s, L_base, cell0, dEdC):
                _, vjp = jax.vjp(
                    lambda ss: cell_of(ss, L_base, cell0), s
                )
                return vjp(dEdC)[0]

            self._param_vjp = param_vjp

            if rigid_fragments:
                @jax.jit
                def transport_vjp(pos, s, L_base, cell_ref, cell0,
                                  dEdpos, dEdC):
                    _, vjp = jax.vjp(
                        lambda ss: transport(
                            pos, ss, L_base, cell_ref, cell0
                        ), s,
                    )
                    return vjp((dEdpos, dEdC))[0]

                self._transport_vjp = transport_vjp

        # own state dict — the inner InternalPES keeps internal-dim
        # quantities (its geodesic reads curr['g'] of length n_internal),
        # the wrapper keeps the extended [internal, cell] vectors
        self.curr: dict = dict(x=None, f=None, g=None)
        self.last: dict = dict(self.curr)

        # Hessian: internal block from the InternalPES guess + unit cell
        # block (``peswrapper.py:1471-1519`` refine levels via FD)
        H0_full = np.zeros((self.dim, self.dim))
        H0_full[: self.n_internal, : self.n_internal] = (
            self._ipes.H.asarray()
        )
        H0_full[self.n_internal:, self.n_internal:] = np.eye(
            self.n_cell_dof
        )
        self._H_obj = None
        self.set_H(H0_full)
        refine_level = int(refine_initial_hessian)
        if refine_level >= 1:
            # level 1: FD of the cell-cell block only (2 * n_cell_dof
            # force calls, ``peswrapper.py:1471-1519``). Cell parameters
            # displace exactly, so the block is well-defined; the
            # coupling blocks are left to quasi-Newton learning (naive
            # FD columns are inconsistent in redundant coordinates).
            self._refine_cell_block(hessian_delta)
        if refine_level >= 2:
            # levels 2/3: absorb internal-DOF probes as multi-secants
            # (TRICs for molecular crystals, ``peswrapper.py:1627-1825``;
            # level 3 = the full internal block, expensive)
            if refine_level >= 3:
                idx = list(range(self.n_internal))
            else:
                nt = self.int.ntrans
                nr = self.int.nrotations
                idx = list(range(nt)) + list(
                    range(self.n_internal - nr, self.n_internal)
                )
            self._refine_by_secants(idx, hessian_delta)
        if refine_level >= 1:
            # signature parity with the reference
            # (``peswrapper.py:1513-1520``): initialized=False is a
            # no-op for a dense target in BOTH implementations (set_B
            # forces initialized=True — reference ``linalg.py:247``,
            # ours ``ops/operators.py:178``), so the refined cell block
            # rides into the first TS-BFGS absorb unmodified rather
            # than via the never-taken bootstrap branch
            self.set_H(self.H.asarray(), initialized=False)
        if save_hessian is not None:
            np.save(save_hessian, self.H.asarray())


    # -- plumbing shared with PES API -------------------------------------------
    @property
    def neval(self):
        return self._ipes.neval

    @property
    def H(self):
        return self._H_obj

    def set_H(self, target, **kwargs) -> None:
        from ..ops.operators import ApproximateHessian

        self._H_obj = ApproximateHessian(self.dim, self.n_internal, target,
                                         **kwargs)

    def get_H(self):
        return self._H_obj

    def save(self) -> None:
        self._ipes.save()
        self._ipes.savepoint["cell"] = self.atoms.cell.copy()
        self._ipes.savepoint["L"] = self._L.copy()

    def restore(self) -> None:
        sp = self._ipes.savepoint
        if sp.get("cell") is not None:
            self.atoms.cell = sp["cell"].copy()
        if sp.get("L") is not None:
            self._L = sp["L"].copy()
        self._ipes.restore()

    # -- cell parameterization ---------------------------------------------------
    def _masked_cell_params(self) -> np.ndarray:
        return self._L[self.cell_mask].copy()

    def _set_masked_cell_params(self, params: np.ndarray) -> None:
        self._L[self.cell_mask] = params
        cell = np.asarray(
            expm(jnp.asarray(self._L / self.exp_cell_factor))
        ) @ self.orig_cell
        if self.rigid_fragments:
            # rigid transport (``peswrapper.py:1986-2010``): each
            # fragment keeps its internal geometry; its centroid follows
            # the cell affinely and its orientation rotates by the polar
            # factor of the incremental deformation.
            import scipy.linalg as sla

            cell_before = self.atoms.cell.copy()
            pos_before = self.atoms.positions.copy()
            inv_before = np.linalg.inv(cell_before)
            F_inc = cell @ inv_before
            R_inc, _ = sla.polar(F_inc)
            self.atoms.cell = cell
            groups = self.int.fragment_atom_groups or []
            moved = np.zeros(len(self.atoms), dtype=bool)
            for group in groups:
                com_old = pos_before[group].mean(axis=0)
                com_new = (com_old @ inv_before) @ cell
                delta = pos_before[group] - com_old
                self.atoms.positions[group] = com_new + delta @ R_inc.T
                moved[group] = True
            # lone atoms follow the cell affinely
            lone = ~moved
            if np.any(lone):
                self.atoms.positions[lone] = (
                    pos_before[lone] @ inv_before
                ) @ cell
        else:
            # affine scaling: fixed fractional coordinates
            frac = self.atoms.positions @ np.linalg.inv(self.atoms.cell)
            self.atoms.cell = cell
            self.atoms.positions = frac @ cell
        self._ipes._invalidate()

    # -- coordinates ----------------------------------------------------------------
    def get_x(self) -> np.ndarray:
        return np.concatenate(
            [self._ipes.get_x(), self._masked_cell_params()]
        )

    def wrap_dx(self, dx: np.ndarray) -> np.ndarray:
        out = np.asarray(dx, dtype=np.float64).copy()
        out[: self.n_internal] = self._ipes.wrap_dx(out[: self.n_internal])
        return out

    def set_x(self, target: np.ndarray):
        """Cell first (affine), then the internal step via the geodesic
        machinery (``peswrapper.py:1947-2111``)."""
        ni = self.n_internal
        q_before = self._ipes.get_x()
        s_before = self._masked_cell_params()
        dq = self._ipes.wrap_dx(np.asarray(target[:ni]) - q_before)

        # keep the inner PES's state consistent (internal-dim slices)
        g_ext = self.curr.get("g")
        self._ipes.curr["x"] = q_before
        self._ipes.curr["g"] = (
            None if g_ext is None else np.asarray(g_ext[:ni])
        )

        self._set_masked_cell_params(np.asarray(target[ni:]))
        q_after_cell = self._ipes.get_x()
        dxi, dxf, gpar = self._ipes.set_x(q_after_cell + dq)

        ds = np.asarray(target[ni:]) - s_before
        dx_initial = np.concatenate([dq, ds])
        dx_final = np.concatenate([dxf, ds])
        g_old = self.curr.get("g")
        if g_old is not None and len(g_old) == self.dim:
            g_par = np.concatenate([gpar, g_old[ni:]])
        else:
            g_par = np.concatenate([gpar, np.zeros(self.n_cell_dof)])
        return dx_initial, dx_final, g_par

    # -- evaluation --------------------------------------------------------------------
    def eval(self):
        f, g_int = self._ipes.eval()
        if self.scalar_pressure != 0.0:
            f = f + self.scalar_pressure * abs(
                np.linalg.det(self.atoms.cell)
            )
        if self._ipes._potential is None:
            g_cell = self._host_cell_gradient()
        elif self.rigid_fragments:
            g_cell = np.asarray(
                self._cell_grad_rigid(
                    jnp.asarray(self.atoms.positions),
                    jnp.asarray(self._masked_cell_params()),
                    jnp.asarray(self._L),
                    jnp.asarray(np.asarray(self.atoms.cell)),
                    jnp.asarray(self.orig_cell),
                )
            )
        else:
            frac = self.atoms.positions @ np.linalg.inv(self.atoms.cell)
            g_cell = np.asarray(
                self._cell_grad(
                    jnp.asarray(frac),
                    jnp.asarray(self._masked_cell_params()),
                    jnp.asarray(self._L),
                    jnp.asarray(self.orig_cell),
                )
            )
        return f, np.concatenate([g_int, g_cell])

    def _host_cell_gradient(self) -> np.ndarray:
        """Cell gradient from the calculator's virial stress.

        Non-rigid (fixed-fractional) convention: atoms ride affinely
        with the cell, so ``dE/dC|frac = C^-T V sigma`` — exactly the
        definition of the virial stress (reference
        ``peswrapper.py:2135-2208``). With rigid fragments the atom
        motion is the transport map instead, so the fixed-Cartesian
        cell derivative ``dE/dC|pos = C^-T (V sigma + P^T F)`` and the
        position derivative ``dE/dpos = -F`` are pulled back jointly
        through the transport map's vjp. The pressure term enters as
        ``sigma + P*I`` in both conventions (PV depends on the cell
        only).
        """
        calc = self.atoms.calc
        if not hasattr(calc, "get_stress"):
            raise RuntimeError(
                "Cell optimization with a host calculator requires "
                "calc.get_stress(atoms) (Voigt, eV/A^3)."
            )
        stress = np.asarray(calc.get_stress(self.atoms))
        C = self.atoms.cell
        volume = abs(np.linalg.det(C))
        sigma = voigt_6_to_full_3x3_stress(stress)
        if self.scalar_pressure != 0.0:
            sigma = sigma + self.scalar_pressure * np.eye(3)
        s = jnp.asarray(self._masked_cell_params())
        L_base = jnp.asarray(self._L)
        cell0 = jnp.asarray(self.orig_cell)
        if self.rigid_fragments:
            # Cartesian gradient stashed by the inner PES.eval — no
            # second force call
            gcart = getattr(self._ipes, "_last_gcart", None)
            if gcart is None:
                gcart = -self.atoms.get_forces().ravel()
            forces = -np.asarray(gcart).reshape(-1, 3)
            dEdC = np.linalg.inv(C.T) @ (
                volume * sigma + self.atoms.positions.T @ forces
            )
            g = self._transport_vjp(
                jnp.asarray(self.atoms.positions), s, L_base,
                jnp.asarray(np.asarray(C)), cell0,
                jnp.asarray(-forces), jnp.asarray(dEdC),
            )
        else:
            dEdC = volume * np.linalg.inv(C.T) @ sigma
            g = self._param_vjp(s, L_base, cell0, jnp.asarray(dEdC))
        return np.asarray(g)

    def _refine_cell_block(self, delta: float = 1e-5) -> None:
        """Central-difference cell-cell Hessian block."""
        nc = self.n_cell_dof
        ni = self.n_internal
        x0 = self.get_x()
        blk = np.zeros((nc, nc))
        for k in range(nc):
            xp = x0.copy()
            xp[ni + k] += delta
            self.set_x(xp)
            _, gp = self.eval()
            xm = x0.copy()
            xm[ni + k] -= delta
            self.set_x(xm)
            _, gm = self.eval()
            blk[:, k] = (gp[ni:] - gm[ni:]) / (2 * delta)
        self.set_x(x0)
        H = self.H.asarray().copy()
        H[ni:, ni:] = 0.5 * (blk + blk.T)
        self.set_H(H)

    def _refine_by_secants(self, indices, delta: float = 1e-5) -> None:
        """FD Hessian refinement as multi-secant absorption.

        With redundant internal coordinates a requested unit
        displacement is never realized exactly (set_x moves along the
        constraint manifold), so naive FD columns are inconsistent.
        Instead every +/-delta probe records the REALIZED coordinate
        displacement and the gradient change, and the pairs are absorbed
        through the same multi-secant TS-BFGS machinery the Davidson
        probes use — exact curvature along the probed directions, no
        basis inconsistency. Cost: 2 force calls per refined DOF, same
        as the reference's column FD (``peswrapper.py:1471-1519``).
        """
        indices = list(indices)
        if not indices:
            return
        x0 = self.get_x()
        _, g0 = self.eval()
        S_cols, Y_cols = [], []
        for k in indices:
            xp = x0.copy()
            xp[k] += delta
            self.set_x(xp)
            xp_real = self.get_x()
            _, gp = self.eval()
            self.set_x(x0)
            dx = self.wrap_dx(xp_real - x0)
            if np.linalg.norm(dx) > 1e-10:
                S_cols.append(dx)
                Y_cols.append(gp - g0)
            xm = x0.copy()
            xm[k] -= delta
            self.set_x(xm)
            xm_real = self.get_x()
            _, gm = self.eval()
            self.set_x(x0)
            dx = self.wrap_dx(xm_real - x0)
            if np.linalg.norm(dx) > 1e-10:
                S_cols.append(dx)
                Y_cols.append(gm - g0)
        if S_cols:
            self.H.update(
                np.stack(S_cols, axis=1), np.stack(Y_cols, axis=1)
            )

    # -- state / bases ------------------------------------------------------------------
    def _update(self, feval: bool = True) -> bool:
        sig = self._ipes._geom_signature() + self.atoms.cell.tobytes()
        same = self.curr.get("x") is not None and self.curr.get(
            "sig_cell"
        ) == sig
        if same and not (feval and self.curr.get("f") is None):
            return False
        if feval:
            f, g = self.eval()
        else:
            f, g = None, None
        # ``last`` only advances on a NEW geometry — filling in (f, g)
        # at an unchanged point must not clobber it with a g=None
        # snapshot, or the first quasi-Newton secant is silently
        # dropped (reference ``peswrapper.py:300-320`` ``new_point``)
        if self.curr.get("x") is not None and not same:
            self.last = dict(self.curr)
        self.curr["x"] = self.get_x()
        self.curr["sig_cell"] = sig
        self.curr["f"] = f
        self.curr["g"] = g
        self._update_basis()
        return True

    def _update_basis(self, basis=None) -> None:
        drdx, Ucons, Unred, Ufree = (
            basis if basis is not None else self._calc_basis()
        )
        self.curr.update(
            drdx=drdx, Ucons=Ucons, Unred=Unred, Ufree=Ufree
        )
        g = self.curr.get("g")
        if g is None:
            self.curr["L"] = None
        elif drdx.shape[0] == 0:
            self.curr["L"] = np.zeros(0)
        else:
            row_norms = np.linalg.norm(drdx, axis=1)
            active = row_norms > 1e-10
            L = np.zeros(drdx.shape[0])
            if np.any(active):
                L[active] = np.linalg.lstsq(
                    drdx[active].T, g, rcond=None
                )[0]
            self.curr["L"] = L
        # propagate multipliers to the inner PES for its Hc
        self._ipes.curr["L"] = (
            None if self.curr["L"] is None
            else self.curr["L"]
        )

    def _calc_basis(self):
        drdx_i, Ucons_i, Unred_i, Ufree_i = self._ipes._calc_basis()
        ni, nc = self.n_internal, self.n_cell_dof
        nt = self.dim
        drdx = np.zeros((drdx_i.shape[0], nt))
        drdx[:, :ni] = drdx_i
        Ucons = np.zeros((nt, Ucons_i.shape[1]))
        Ucons[:ni] = Ucons_i
        Unred = np.zeros((nt, Unred_i.shape[1] + nc))
        Unred[:ni, : Unred_i.shape[1]] = Unred_i
        Unred[ni:, Unred_i.shape[1]:] = np.eye(nc)
        Ufree = np.zeros((nt, Ufree_i.shape[1] + nc))
        Ufree[:ni, : Ufree_i.shape[1]] = Ufree_i
        Ufree[ni:, Ufree_i.shape[1]:] = np.eye(nc)
        return drdx, Ucons, Unred, Ufree

    def get_f(self):
        self._update()
        return self.curr["f"]

    def get_g(self):
        self._update()
        return self.curr["g"].copy()

    def get_Unred(self):
        self._update(False)
        return self.curr["Unred"]

    def get_Ufree(self):
        self._update(False)
        return self.curr["Ufree"]

    def get_Ucons(self):
        self._update(False)
        return self.curr["Ucons"]

    def get_res(self):
        return self._ipes.get_res()

    def get_drdx(self):
        drdx_i = self._ipes.get_drdx()
        out = np.zeros((drdx_i.shape[0], self.dim))
        out[:, : self.n_internal] = drdx_i
        return out

    def get_scons(self):
        Ucons = self.get_Ucons()
        if Ucons.shape[1] == 0:
            return np.zeros(self.dim)
        rhs = self.get_drdx() @ Ucons
        sol = np.linalg.lstsq(rhs, self.get_res(), rcond=None)[0]
        return -Ucons @ sol

    def get_Hc(self):
        Hc = np.zeros((self.dim, self.dim))
        L = self.curr.get("L")
        if L is not None and L.size:
            Hc[: self.n_internal, : self.n_internal] = self._ipes.get_Hc()
        return Hc

    def get_HL(self):
        return self.H.asarray() - self.get_Hc()

    def get_HL_projected(self, U):
        from ..ops.operators import ApproximateHessian

        B = self.H.B
        if B is None:
            Bp = None
        else:
            Bp = U.T @ B @ U
            L = self.curr.get("L")
            if L is not None and L.size:
                Bp = Bp - U.T @ self.get_Hc() @ U
        return ApproximateHessian(U.shape[1], 0, Bp,
                                  self.H.update_method, self.H.symm)

    def get_df_pred(self, dx, g, H):
        if H is None:
            return None
        Unred = self.get_Unred()
        dx_r = dx @ Unred
        g_r = g @ Unred
        H_r = Unred.T @ H @ Unred
        return float(g_r.T @ dx_r + (dx_r.T @ H_r @ dx_r) / 2.0)

    def _update_H(self, dx, dg):
        if self.last.get("x") is None or self.last.get("g") is None:
            return
        self.H.update(dx, dg)

    # the generic kick / diag / converged machinery matches PES
    kick = PES.kick
    diag = PES.diag
    _calc_eg = PES._calc_eg
    write_traj = PES.write_traj
    calculate_hessian = PES.calculate_hessian

    def get_projected_forces(self):
        g = self.get_g()[: self.n_internal]
        Ufree = self.get_Ufree()[: self.n_internal,
                                 : -self.n_cell_dof or None]
        B = self.int.jacobian()
        return -((Ufree @ (Ufree.T @ g)) @ B).reshape(-1, 3)

    def converged(self, fmax, smax=None, cmax: float = 1e-5):
        if smax is None:
            smax = fmax
        g = self.get_g()
        fmax1 = np.linalg.norm(
            self.get_projected_forces(), axis=1
        ).max()
        g_cell = g[self.n_internal:]
        smax1 = float(np.abs(g_cell).max()) if g_cell.size else 0.0
        res = self.get_res()
        cmax1 = np.linalg.norm(res) if res.size else 0.0
        return (
            (fmax1 < fmax) and (smax1 < smax) and (cmax1 < cmax),
            fmax1, cmax1, smax1,
        )

    def maybe_niggli_reduce(self, angle_threshold: float = 30.0) -> bool:
        """Rebase onto a compact reduced cell when angles skew too far
        from 90 deg (reference ``peswrapper.py:1521-1567``).

        Atom positions are left untouched and every internal's integer
        image vector is remapped ``n -> n @ M^{-1}``
        (:meth:`Internals.rebase_cell`), so all internal values /
        Jacobians — and therefore the internal Hessian block — are
        preserved exactly; only the cell-parameter blocks transform, by
        ``T = J_old^{-1} J_new`` of the log-deformation map."""
        cell = self.atoms.cell

        def angle(u, v):
            c = u @ v / (np.linalg.norm(u) * np.linalg.norm(v))
            return np.degrees(np.arccos(np.clip(c, -1, 1)))

        devs = [
            abs(angle(cell[i], cell[j]) - 90.0)
            for i, j in ((0, 1), (0, 2), (1, 2))
        ]
        if max(devs) <= angle_threshold:
            return False

        J_old = _cell_param_jacobian(
            self._L, self.orig_cell, self.exp_cell_factor
        )

        new_cell, M = reduce_cell_basis(cell)
        Minv = np.rint(np.linalg.inv(M)).astype(np.int64)
        self.atoms.cell = new_cell
        self.int.rebase_cell(Minv)

        # (M^{-1} ⊗ I) factor: see CellCartesianPES.maybe_niggli_reduce
        J_new = _cell_param_jacobian(
            np.zeros((3, 3)), new_cell, self.exp_cell_factor
        )
        K = np.kron(np.linalg.inv(M), np.eye(3))
        T_full = np.linalg.solve(J_old, K @ J_new)
        midx = np.where(self.cell_mask.ravel())[0]
        T = T_full[np.ix_(midx, midx)]

        H = self.H.asarray().copy()
        n = self.n_internal
        H[n:, n:] = T.T @ H[n:, n:] @ T
        H[:n, n:] = H[:n, n:] @ T
        H[n:, :n] = T.T @ H[n:, :n]

        self.orig_cell = new_cell.copy()
        self._L = np.zeros((3, 3))
        self.set_H(H)
        self.curr = dict(x=None, f=None, g=None)
        self.last = dict(self.curr)
        self._ipes.curr = dict(x=None, f=None, g=None)
        self._ipes.last = dict(self._ipes.curr)
        self._ipes._invalidate()
        return True
