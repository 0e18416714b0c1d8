"""Cartesian PES wrapper (layer 4) — sequential API.

Stateful counterpart of the reference ``PES``
(``/root/reference/sella/peswrapper.py:214-606``): owns the geometry,
gradient cache, constraint bases (Ucons/Ufree/Unred), Lagrange
multipliers, the Davidson diagonalization driver and the trust-ratio
``kick``. The math all lives in pure ops (``sella_tpu.ops``); this class
is the mutable-state shell the object API needs. The batched TPU path
(``sella_tpu.parallel.ensemble``) carries the same quantities in a
``SearchState`` pytree instead.

Design deltas vs the reference:
* no ``_LRU2`` state-hash caches — each quantity is computed once per
  geometry change and invalidated explicitly;
* the GPU offload shim (``sella/_gpu.py``) dissolves: for jax-native
  potentials, gradients and FD matvecs are jitted XLA calls already.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from ..atoms import Atoms, as_atoms
from ..coords.constraints import Constraints, DuplicateConstraintError
from ..ops.eigensolver import rayleigh_ritz, symmetrize_Y_np
from ..ops.linalg import split_cons_subspace_host
from ..ops.operators import ApproximateHessian, NumericalHessian
from ..potentials.base import get_potential


class PES:
    n_cell_dof = 0

    def __init__(
        self,
        atoms: Atoms,
        H0: Optional[np.ndarray] = None,
        constraints: Optional[Constraints] = None,
        eigensolver: str = "jd0",
        trajectory=None,
        eta: float = 1e-4,
        v0: Optional[np.ndarray] = None,
        proj_trans: Optional[bool] = None,
        proj_rot: Optional[bool] = None,
        hessian_function: Optional[Callable] = None,
    ) -> None:
        atoms = as_atoms(atoms)
        self.atoms = atoms
        if constraints is None:
            constraints = Constraints(atoms)

        # default projection behavior (``peswrapper.py:234-252``)
        if proj_trans is None:
            proj_trans = not constraints.records["translations"]
        if proj_trans:
            try:
                constraints.fix_translation()
            except DuplicateConstraintError:
                pass
        if proj_rot is None:
            proj_rot = not bool(np.any(atoms.pbc))
        if proj_rot:
            try:
                constraints.fix_rotation()
            except DuplicateConstraintError:
                pass

        self.cons = constraints
        self.eigensolver = eigensolver
        self.eta = eta
        self.v0 = v0
        self.hessian_function = hessian_function

        if trajectory is not None and isinstance(trajectory, str):
            from ..utils.trajectory import TrajectoryWriter

            trajectory = TrajectoryWriter(trajectory, atoms)
        self.traj = trajectory

        self.neval = 0
        self.nmatvec = 0  # Davidson matvecs (FD probes), for cross-tier
        #                   accounting against the batched tier's nmatvec
        self.curr = dict(x=None, f=None, g=None)
        self.last = self.curr.copy()

        self.int = None  # set by InternalPES
        self.dummies = None

        self.dim = 3 * len(atoms)
        self.ncart = self.dim
        if H0 is None:
            self.set_H(None, initialized=False)
        else:
            self.set_H(H0, initialized=True)

        self.savepoint = dict(apos=None, dpos=None)
        self.first_diag = True

        self._potential = get_potential(atoms)
        self._basis_valid = False
        self._cached_basis = None

    # -- geometry state ------------------------------------------------------
    apos = property(lambda self: self.atoms.positions.copy())
    dpos = property(lambda self: None)

    def save(self) -> None:
        self.savepoint = dict(apos=self.apos, dpos=self.dpos)

    def restore(self) -> None:
        assert self.savepoint["apos"] is not None
        self.atoms.positions = self.savepoint["apos"].copy()
        self._invalidate()

    def _invalidate(self) -> None:
        self._basis_valid = False

    def set_x(self, target: np.ndarray):
        """Move to target coordinates; returns (dx_initial, dx_final, g_parallel)
        like the reference (``peswrapper.py:332-335``)."""
        diff = np.asarray(target) - self.get_x()
        self.atoms.positions = np.asarray(target).reshape(-1, 3)
        self._invalidate()
        g = self.curr.get("g")
        return diff, diff, (np.zeros_like(diff) if g is None else g)

    def get_x(self) -> np.ndarray:
        return self.apos.ravel()

    # -- Hessian state -------------------------------------------------------
    def get_H(self) -> ApproximateHessian:
        return self.H

    def set_H(self, target, initialized: bool = True, **kwargs) -> None:
        self.H = ApproximateHessian(
            self.dim, self.ncart, target, initialized=initialized, **kwargs
        )

    def get_Hc(self) -> np.ndarray:
        L = self.curr.get("L")
        if L is None:
            raise RuntimeError("get_Hc() requires Lagrange multipliers")
        return self.cons.hessian_ldot(L)

    def get_HL(self) -> np.ndarray:
        return self.H.asarray() - self.get_Hc()

    def get_HL_projected(self, U: np.ndarray) -> ApproximateHessian:
        """``ApproximateHessian(U^T (H - Hc) U)`` without materializing HL
        (``peswrapper.py:363-386``)."""
        B = self.H.B
        if B is None:
            Bproj = None
        else:
            Bproj = U.T @ B @ U
            L = self.curr.get("L")
            if L is not None and L.size > 0:
                Bproj = Bproj - U.T @ self.get_Hc() @ U
        return ApproximateHessian(
            U.shape[1], 0, Bproj, self.H.update_method, self.H.symm
        )

    # -- constraints ---------------------------------------------------------
    def get_res(self) -> np.ndarray:
        return self.cons.residual()

    def get_drdx(self) -> np.ndarray:
        return self.cons.jacobian()

    def _calc_basis(self):
        # Cache per geometry: the basis is pure in the positions (the
        # reference uses a 2-entry state-hash LRU for the same reason,
        # ``peswrapper.py:24-48,395-407``). Invalidated by set_x/restore.
        if self._basis_valid and self._cached_basis is not None:
            return self._cached_basis
        drdx = self.get_drdx()
        Ucons, Ufree = split_cons_subspace_host(drdx)
        Unred = np.eye(self.dim)
        self._cached_basis = (drdx, Ucons, Unred, Ufree)
        self._basis_valid = True
        return self._cached_basis

    def get_scons(self) -> np.ndarray:
        """First-order constraint-restoring displacement
        (``peswrapper.py:429-438``)."""
        Ucons = self.get_Ucons()
        if Ucons.shape[1] == 0:
            return np.zeros(self.dim)
        rhs = self.get_drdx() @ Ucons
        sol = np.linalg.lstsq(rhs, self.get_res(), rcond=None)[0]
        return -Ucons @ sol

    # -- energy/gradient evaluation -------------------------------------------
    def eval(self) -> Tuple[float, np.ndarray]:
        self.neval += 1
        if self._potential is not None:
            import jax.numpy as jnp

            # NB: always the Cartesian geometry — get_x() is overridden
            # to internal coordinates in InternalPES
            self._potential.validate_cell(self.atoms.cell)
            f, g = self._potential.energy_and_grad(
                jnp.asarray(self.atoms.positions.ravel()),
                jnp.asarray(self.atoms.cell),
            )
            f, g = float(f), np.asarray(g, dtype=np.float64)
        else:
            f = self.atoms.get_potential_energy()
            g = -self.atoms.get_forces().ravel()
        # stash the raw Cartesian gradient: cell PES wrappers need the
        # forces for the virial chain rule without a second force call
        self._last_gcart = g
        self.write_traj()
        return f, g

    def write_traj(self) -> None:
        if self.traj is not None:
            self.traj.write()

    def _calc_eg(self, x: np.ndarray) -> Tuple[float, np.ndarray]:
        """Evaluate energy+gradient at x without disturbing state
        (``peswrapper.py:420-427``); this is the Davidson matvec hot path.

        The direct-potential fast path only applies when x IS the
        Cartesian geometry (plain PES); coordinate-transformed
        subclasses must run the full set_x/eval/restore dance.
        """
        if self._potential is not None and type(self) is PES:
            import jax.numpy as jnp

            self.neval += 1
            f, g = self._potential.energy_and_grad(
                jnp.asarray(x), jnp.asarray(self.atoms.cell)
            )
            return float(f), np.asarray(g, dtype=np.float64)
        self.save()
        self.set_x(np.asarray(x))
        f, g = self.eval()
        self.restore()
        return f, g

    def _geom_signature(self) -> bytes:
        """Geometry identity for caching (positions; cell added by cell
        PES classes). Internal PES coordinates are non-unique, so caches
        key on the Cartesian geometry like the reference's state hash
        (``peswrapper.py:297-303``)."""
        return self.atoms.positions.tobytes()

    # -- state update ----------------------------------------------------------
    def _update(self, feval: bool = True) -> bool:
        sig = self._geom_signature()
        x = self.get_x()
        same = (
            self.curr["x"] is not None
            and self.curr.get("sig") == sig
        )
        if same:
            if not (feval and self.curr["f"] is None):
                return False
            new_point = False
        else:
            new_point = True

        if feval:
            f, g = self.eval()
        else:
            f, g = None, None

        if new_point:
            self.last = self.curr.copy()

        self.curr["x"] = x
        self.curr["sig"] = sig
        self.curr["f"] = f
        self.curr["g"] = g
        self._update_basis()
        return True

    def _update_basis(self, basis=None) -> None:
        if basis is None:
            basis = self._calc_basis()
        drdx, Ucons, Unred, Ufree = basis
        self.curr["drdx"] = drdx
        self.curr["Ucons"] = Ucons
        self.curr["Unred"] = Unred
        self.curr["Ufree"] = Ufree
        g = self.curr.get("g")
        if g is None:
            L = None
        elif drdx.shape[0] == 0:
            L = np.zeros(0)
        else:
            # Rigid-motion constraints have identically-zero rows in
            # internal-coordinate space; a plain lstsq then returns
            # garbage ~1/eps multipliers that poison Hc. Rows below an
            # absolute norm threshold carry no force and get L = 0.
            row_norms = np.linalg.norm(drdx, axis=1)
            active = row_norms > 1e-10
            L = np.zeros(drdx.shape[0])
            if np.any(active):
                L[active] = np.linalg.lstsq(
                    drdx[active].T, g, rcond=None
                )[0]
        self.curr["L"] = L

    def _update_H(self, dx: np.ndarray, dg: np.ndarray) -> None:
        if self.last["x"] is None or self.last["g"] is None:
            return
        self.H.update(dx, dg)

    def get_f(self) -> float:
        self._update()
        return self.curr["f"]

    def get_g(self) -> np.ndarray:
        self._update()
        return self.curr["g"].copy()

    def get_Unred(self) -> np.ndarray:
        self._update(False)
        return self.curr["Unred"]

    def get_Ufree(self) -> np.ndarray:
        self._update(False)
        return self.curr["Ufree"]

    def get_Ucons(self) -> np.ndarray:
        self._update(False)
        return self.curr["Ucons"]

    # -- diagonalization --------------------------------------------------------
    def diag(self, gamma: float = 0.1, threepoint: bool = False,
             maxiter: Optional[int] = None) -> None:
        """Davidson partial diagonalization; every FD probe is then
        absorbed into the quasi-Newton Hessian — "full exploitation of
        partial diagonalization" (``peswrapper.py:508-556``)."""
        if self.curr["f"] is None:
            self._update(feval=True)

        Ufree = self.get_Ufree()
        nfree = Ufree.shape[1]
        if nfree == 0:
            return

        P = self.get_HL_projected(Ufree)
        P_is_none = P.B is None

        if P_is_none or self.first_diag:
            v0 = self.v0 if self.v0 is not None else self.get_g() @ Ufree
            if v0 is not None and np.linalg.norm(v0) < 1e-12:
                v0 = None
        else:
            v0 = None

        Pmat = np.eye(nfree) if P_is_none else P.asarray()

        Hproj = NumericalHessian(
            self._calc_eg, self.get_x(), self.get_g(), self.eta,
            threepoint, Ufree,
        )
        Hc = self.get_Hc()
        op = Hproj + (-(Ufree.T @ Hc @ Ufree))
        rayleigh_ritz(
            op, gamma, Pmat, v0=v0, method=self.eigensolver, maxiter=maxiter
        )

        # Recover full-space probes and absorb all of them
        Vs = Hproj.Vs
        AVs = Hproj.AVs
        Atilde = Vs.T @ symmetrize_Y_np(Vs, AVs, 2) - Vs.T @ Hc @ Vs
        _, X = np.linalg.eigh(0.5 * (Atilde + Atilde.T))
        Vs = Vs @ X
        AVs = AVs @ X
        self.H.update(Vs, AVs)
        self.nmatvec += Hproj.calls
        self.first_diag = False

    def calculate_hessian(self) -> None:
        assert self.hessian_function is not None
        self.H.set_B(np.asarray(self.hessian_function(self.atoms)))

    # -- stepping -----------------------------------------------------------------
    def wrap_dx(self, dx: np.ndarray) -> np.ndarray:
        return dx

    def get_df_pred(self, dx, g, H) -> Optional[float]:
        if H is None:
            return None
        return float(g.T @ dx + (dx.T @ H @ dx) / 2.0)

    def kick(self, dx, diag: bool = False, **diag_kwargs) -> Optional[float]:
        """Take the step, measure predicted-vs-actual energy change, update
        the Hessian, optionally re-diagonalize (``peswrapper.py:578-602``)."""
        x0 = self.get_x()
        f0 = self.get_f()
        g0 = self.get_g()
        B0 = self.H.asarray() if self.H.B is not None else None

        dx_initial, dx_final, g_par = self.set_x(x0 + dx)

        df_pred = self.get_df_pred(dx_initial, g0, B0)
        dg_actual = self.get_g() - g_par
        df_actual = self.get_f() - f0
        if df_pred is None or abs(df_pred) < 1e-14:
            ratio = None
        else:
            ratio = df_actual / df_pred

        self._update_H(dx_final, dg_actual)

        if diag:
            if self.hessian_function is not None:
                self.calculate_hessian()
            else:
                self.diag(**diag_kwargs)
        return ratio

    # -- convergence -------------------------------------------------------------
    def get_projected_forces(self) -> np.ndarray:
        g = self.get_g()
        Ufree = self.get_Ufree()
        return -(Ufree @ (Ufree.T @ g)).reshape(-1, 3)

    def converged(self, fmax: float, cmax: float = 1e-5):
        fmax1 = np.linalg.norm(self.get_projected_forces(), axis=1).max()
        res = self.get_res()
        cmax1 = np.linalg.norm(res) if res.size else 0.0
        return (fmax1 < fmax) and (cmax1 < cmax), fmax1, cmax1
