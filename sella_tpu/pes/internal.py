"""Internal-coordinate PES wrapper (layer 4).

Sequential-API counterpart of the reference ``InternalPES``
(``/root/reference/sella/peswrapper.py:609-1288``): the optimizer state
vector is the redundant internal-coordinate vector q; moves are executed
by integrating the geodesic equation ``xdd = -B+ (dB/dx . xd) xd`` in
Cartesian space; the gradient is parallel-transported along the move.

Design deltas vs the reference:
* the LSODA adaptive integrator becomes a fixed-substep RK4 with the
  step count chosen from the move size — deterministic, jit-compatible
  control flow (the adaptive fallback chain collapses to: Newton fast
  path -> RK4 geodesic);
* QR/pinv caching keys on the geometry signature with a 2-slot memo,
  equivalent to the reference's ``_LRU2`` (``peswrapper.py:24-48``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.linalg as sla

from ..coords.internals import Internals
from ..ops.linalg import split_cons_subspace_host
from .cartesian import PES


def _range_space_projector(B: np.ndarray) -> np.ndarray:
    """Orthogonal projector onto range(B) (``peswrapper.py:72-82``)."""
    Q, R, _ = sla.qr(B, mode="full", pivoting=True, check_finite=False)
    rdiag = np.abs(np.diag(R))
    rcond = max(B.shape) * np.finfo(B.dtype).eps
    nkeep = (
        int(np.sum(rdiag > rcond * rdiag[0]))
        if rdiag.size and rdiag[0] > 0 else 0
    )
    Qr = Q[:, :nkeep]
    return Qr @ Qr.T


class InternalPES(PES):
    def __init__(
        self,
        atoms,
        internals: Internals,
        *args,
        H0: Optional[np.ndarray] = None,
        auto_find_internals: bool = True,
        iterative_stepper: int = 0,
        exact_geodesic: bool = True,
        geodesic_integrator: str = "lsoda",
        newton_tol: float = 1e-8,
        **kwargs,
    ) -> None:
        self.int_orig = internals
        new_int = internals.copy()
        if auto_find_internals:
            new_int.find_all_bonds()
            new_int.find_all_angles()
            new_int.find_all_dihedrals()
        new_int.validate_basis()

        PES.__init__(
            self, atoms, *args, constraints=new_int.cons, H0=None,
            proj_trans=False, proj_rot=False, **kwargs
        )

        self.int = new_int
        self.dim = new_int.nint
        self.ncart = new_int.ndof
        if H0 is None:
            B = self.int.jacobian()
            P = _range_space_projector(B)
            self.set_H(P @ self.int.guess_hessian() @ P)
        else:
            self.set_H(H0)

        self.bad_int = None
        # 0 (reference default, ``peswrapper.py:616``): always the
        # geodesic ODE; 1: Newton fast path with ODE fallback.
        self.iterative_stepper = iterative_stepper
        self.geodesic_integrator = geodesic_integrator
        # Newton fast-path stopping tolerance on the rms internal
        # residual (the reference hardcodes 1e-8, ``peswrapper.py:770``;
        # kept settable so cross-tier parity tests can tighten both
        # tiers below the trajectory-match bar).
        self.newton_tol = newton_tol
        # Recompute B+ at every geodesic substep (True) or freeze the
        # step-start B+ for the whole integration (False) — the
        # reference's ``exact_geodesic`` toggle (``peswrapper.py:657,
        # 1215``; frozen ``_ode_Binv`` set at ``peswrapper.py:850``).
        self.exact_geodesic = exact_geodesic
        self._jac_memo: dict = {}

    # -- extended (atoms + dummies) flat positions ----------------------------
    def _get_flat_pos(self) -> np.ndarray:
        return self.int.all_positions().ravel().copy()

    def _set_flat_pos(self, x: np.ndarray) -> None:
        na = 3 * len(self.atoms)
        self.atoms.positions = np.asarray(x[:na]).reshape(-1, 3)
        if self.int.ndummies:
            self.int.dummies.positions = np.asarray(x[na:]).reshape(-1, 3)
        self._invalidate()

    def _geom_signature(self) -> bytes:
        sig = self.atoms.positions.tobytes()
        if self.int.ndummies:
            sig += self.int.dummies.positions.tobytes()
        return sig

    def save(self) -> None:
        super().save()
        self.savepoint["dpos"] = (
            self.int.dummies.positions.copy() if self.int.ndummies else None
        )

    def restore(self) -> None:
        dpos = self.savepoint.get("dpos")
        if dpos is not None:
            self.int.dummies.positions = dpos.copy()
        super().restore()

    # -- Jacobian / pseudo-inverse with 2-slot memo -----------------------------
    def _jac_factors(self):
        """(B, Unred, Binv) at the current geometry; QR-based with SVD
        fallback for rank deficiency (``peswrapper.py:674-736``)."""
        sig = self._geom_signature()
        hit = self._jac_memo.get(sig)
        if hit is not None:
            return hit
        B = self.int.jacobian()
        nint, ncart = B.shape
        if nint >= ncart:
            # tall/square: QR of B, Binv = R^-1 Q^T (full column rank)
            Q, R = np.linalg.qr(B)
            rdiag = np.abs(np.diag(R))
            ok = rdiag.size and rdiag.min() >= 1e-6 * rdiag.max()
            if ok:
                Binv = sla.solve_triangular(R, Q.T, check_finite=False)
        else:
            # wide (fewer internals than Cartesians, e.g. a diatomic's
            # single bond): QR of B^T; full row rank makes range(B) all
            # of q-space, so Unred is the identity
            Qt, Rt = np.linalg.qr(B.T)
            rdiag = np.abs(np.diag(Rt))
            ok = rdiag.size and rdiag.min() >= 1e-6 * rdiag.max()
            if ok:
                Q = np.eye(nint)
                Binv = sla.solve_triangular(
                    Rt, Qt.T, check_finite=False
                ).T
        if not ok:
            U, S, VT = np.linalg.svd(B, full_matrices=False)
            nnred = int(np.sum(S > 1e-6))
            Q = U[:, :nnred]
            Binv = VT[:nnred].T @ np.diag(1.0 / S[:nnred]) @ U[:, :nnred].T
        out = (B, Q, Binv)
        if len(self._jac_memo) >= 2:
            self._jac_memo.pop(next(iter(self._jac_memo)))
        self._jac_memo[sig] = out
        return out

    def _get_Binv(self) -> np.ndarray:
        return self._jac_factors()[2]

    # -- coordinates -------------------------------------------------------------
    def get_x(self) -> np.ndarray:
        """Internal coordinates, dihedrals unwrapped to stay continuous
        relative to the last evaluated point (``peswrapper.py:996-1008``)."""
        q = self.int.calc()
        prev = self.curr.get("x")
        if prev is not None:
            d0 = self.int.ntrans + self.int.nbonds + self.int.nangles
            d1 = d0 + self.int.ndihedrals
            if d1 > d0:
                dq = q[d0:d1] - prev[d0:d1]
                q[d0:d1] = prev[d0:d1] + (dq + np.pi) % (2 * np.pi) - np.pi
        return q

    def wrap_dx(self, dx: np.ndarray) -> np.ndarray:
        return self.int.wrap(dx)

    # -- geometry moves ------------------------------------------------------------
    def _set_x_newton(self, target, max_iter: int = 20):
        """Newton fast path: solve q(x) = target by lstsq iterations
        (``peswrapper.py:749-839``). Returns None on failure."""
        pos0 = self._get_flat_pos()
        x0 = self.get_x()
        # NOT wrapped — matches the reference (``peswrapper.py:758``),
        # whose predicted-step bookkeeping uses the raw difference
        dx_initial = target - x0
        g_int = self.curr.get("g")
        if g_int is None:
            g_int = np.zeros_like(dx_initial)
        g0_cart = self._get_Binv() @ g_int

        rms_prev = np.inf
        initial_rms = None
        stagnation = 0
        for it in range(max_iter):
            residual = self.wrap_dx(target - self.get_x())
            rms = np.linalg.norm(residual) / np.sqrt(max(len(residual), 1))
            if initial_rms is None:
                initial_rms = rms
            if rms < self.newton_tol:
                break
            if rms > initial_rms * 2.0:
                self._set_flat_pos(pos0)
                return None
            if it > 3:
                if rms > rms_prev * 0.95:
                    stagnation += 1
                    if stagnation >= 3:
                        if rms > initial_rms * 0.5:
                            self._set_flat_pos(pos0)
                            return None
                        break
                else:
                    stagnation = 0
            rms_prev = rms
            step = np.linalg.lstsq(
                self.int.jacobian(), residual, rcond=None
            )[0]
            self._set_flat_pos(self._get_flat_pos() + step)
            if self.int.check_for_bad_internals() is not None:
                self._set_flat_pos(pos0)
                return None

        final = self.wrap_dx(target - self.get_x())
        if np.linalg.norm(final) / np.sqrt(max(len(final), 1)) > 1e-6:
            self._set_flat_pos(pos0)
            return None

        dx_final = self.get_x() - x0
        g_final = self.int.jacobian() @ g0_cart
        return dx_initial, dx_final, g_final

    def _set_x_ode(self, target):
        """Geodesic move via adaptive LSODA — the reference's default
        stepper (``peswrapper.py:841-880``): same state layout
        ``y = (x, B+dq, B+g)``, same ``atol=1e-6``/default rtol, same
        nfev cap, same return contract, so the sequential tier's step
        realization matches the reference's bit-for-bit stepping."""
        from scipy.integrate import LSODA

        dq = self.wrap_dx(target - self.get_x())
        Binv0 = self._get_Binv()
        self._ode_Binv = Binv0
        g_int = self.curr.get("g")
        if g_int is None:
            g_int = np.zeros_like(dq)
        x0 = self._get_flat_pos()
        y0 = np.hstack((x0, Binv0 @ dq, Binv0 @ g_int))
        n = len(x0)

        def rhs(t, y):
            x_, xd_, gt_ = y.reshape(3, n)
            self._set_flat_pos(x_.copy())
            D_rdot = self.int.hessian_rdot(xd_)
            Binv = self._get_Binv() if self.exact_geodesic else Binv0
            out = -Binv @ (D_rdot @ np.column_stack((xd_, gt_)))
            return np.concatenate((xd_, out[:, 0], out[:, 1]))

        ode = LSODA(rhs, 0.0, y0, t_bound=1.0, atol=1e-6)
        t0 = 0.0
        y = y0
        while ode.status == "running":
            ode.step()
            y = ode.y
            t0 = ode.t
            self.bad_int = self.int.check_for_bad_internals()
            if self.bad_int is not None:
                break
            if ode.nfev > 1000:
                raise RuntimeError(
                    "Geometry update ODE is taking too long to converge!"
                )
        if ode.status == "failed":
            raise RuntimeError("Geometry update ODE failed to converge!")

        x_, xd_, gt_ = y.reshape(3, n)
        self._set_flat_pos(x_.copy())
        B = self.int.jacobian()
        dx_final = t0 * (B @ xd_)
        g_final = B @ gt_
        return t0 * dq, dx_final, g_final

    def _set_x_geodesic(self, target):
        """Geodesic move: integrate ``xdd = -B+ (dB/dx . xd) xd`` with the
        gradient parallel-transported alongside (``peswrapper.py:841-880``,
        RHS at ``peswrapper.py:1200-1221``). Fixed-substep RK4 replaces
        LSODA: the step count scales with the move size, giving
        deterministic control flow."""
        dq = self.wrap_dx(target - self.get_x())
        Binv0 = self._get_Binv()
        x = self._get_flat_pos()
        xd = Binv0 @ dq
        g_int = self.curr.get("g")
        if g_int is None:
            g_int = np.zeros_like(dq)
        gt = Binv0 @ g_int

        nsub = int(np.clip(np.ceil(np.linalg.norm(dq) / 0.05), 8, 64))

        def rhs(state):
            x_, xd_, gt_ = state
            self._set_flat_pos(x_)
            D_rdot = self.int.hessian_rdot(xd_)
            # exact_geodesic=False freezes the step-start B+ for the
            # whole integration (reference ``peswrapper.py:1215``) —
            # cheaper per substep, inexact on strongly curved moves.
            Binv = self._get_Binv() if self.exact_geodesic else Binv0
            both = Binv @ (D_rdot @ np.column_stack((xd_, gt_)))
            return (xd_, -both[:, 0], -both[:, 1])

        def integrate(nsub_):
            h = 1.0 / nsub_
            st = (x, xd, gt)
            for _ in range(nsub_):
                k1 = rhs(st)
                k2 = rhs(tuple(s + 0.5 * h * k for s, k in zip(st, k1)))
                k3 = rhs(tuple(s + 0.5 * h * k for s, k in zip(st, k2)))
                k4 = rhs(tuple(s + h * k for s, k in zip(st, k3)))
                st = tuple(
                    s + (h / 6.0) * (a + 2 * b + 2 * c + d)
                    for s, a, b, c, d in zip(st, k1, k2, k3, k4)
                )
                self._set_flat_pos(st[0])
                self.bad_int = self.int.check_for_bad_internals()
                if self.bad_int is not None:
                    return st  # partial; caller rebuilds topology
            return st

        # Divergence control replacing LSODA's adaptivity
        # (``peswrapper.py:841-880``): step-doubling — accept when the
        # nsub and 2*nsub endpoints agree, otherwise refine (cap 256).
        state = integrate(nsub)
        while self.bad_int is None and nsub < 256:
            fine = integrate(2 * nsub)
            err = float(np.linalg.norm(state[0] - fine[0], ord=np.inf))
            state = fine
            nsub *= 2
            if self.bad_int is not None:
                break
            if err < 1e-8 * max(1.0, float(np.linalg.norm(dq))):
                break

        x_, xd_, gt_ = state
        self._set_flat_pos(x_)
        B = self.int.jacobian()
        dx_final = B @ xd_
        g_final = B @ gt_
        return dq, dx_final, g_final

    def set_x(self, target):
        """Move to target internal coordinates: optional Newton fast
        path, then the geodesic integrator (LSODA by default — the
        reference's stepper — or fixed-substep RK4 via
        ``geodesic_integrator="rk4"``), then constraint-manifold
        projection (``peswrapper.py:883-903``)."""
        res = None
        if self.iterative_stepper:
            res = self._set_x_newton(target)
        if res is None:
            if getattr(self, "geodesic_integrator", "lsoda") == "rk4":
                res = self._set_x_geodesic(target)
            else:
                pos0 = self._get_flat_pos()
                try:
                    res = self._set_x_ode(target)
                except RuntimeError:
                    # recovery chain (SURVEY §5 A2): LSODA blew its
                    # nfev cap (stiff realization of a hard move) —
                    # restart the whole move on the fixed-substep RK4
                    # geodesic instead of dying. The reference raises
                    # here (``peswrapper.py:864-869``); the fallback
                    # only runs where the reference would abort, so
                    # decision-parity on surviving runs is unaffected.
                    self._set_flat_pos(pos0)
                    res = self._set_x_geodesic(target)
        q_after = self.int.calc().copy()
        moved = self._project_to_constraints()
        dx_initial, dx_final, g_final = res
        if moved:
            delta = self.int.wrap(self.int.calc() - q_after)
            dx_final = dx_final + delta
        return dx_initial, dx_final, g_final

    def _project_to_constraints(self, target_tol: float = 1e-7,
                                max_iter: int = 8,
                                safety_limit: float = 0.05) -> bool:
        """Newton projection onto the constraint manifold, correcting
        only within the constrained IC subspace (``peswrapper.py:928-994``)."""
        if self.cons.ncons == 0:
            return False
        moved = False
        for _ in range(max_iter):
            r = self.cons.residual()
            if r.size == 0 or np.linalg.norm(r, ord=np.inf) < target_tol:
                return moved
            drdx, Ucons, _, _ = self._calc_basis()
            if Ucons.shape[1] == 0:
                return moved
            s = np.linalg.lstsq(drdx @ Ucons, -r, rcond=None)[0]
            dq = Ucons @ s
            dx = self._get_Binv() @ dq
            if np.linalg.norm(dx, ord=np.inf) > safety_limit:
                return moved
            self._set_flat_pos(self._get_flat_pos() + dx)
            moved = True
        return moved

    # -- evaluation / bases ----------------------------------------------------------
    def eval(self) -> Tuple[float, np.ndarray]:
        f, g_cart = PES.eval(self)
        Binv = self._get_Binv()
        return f, g_cart @ Binv[: len(g_cart)]

    def _calc_basis(self):
        if self._basis_valid and self._cached_basis is not None:
            return self._cached_basis
        B, Unred, Binv = self._jac_factors()
        n_int = Unred.shape[0]
        cons_jac = self.cons.jacobian()
        if cons_jac.shape[0] == 0:
            drdx = np.zeros((0, n_int))
            Ucons = np.zeros((n_int, 0))
            Ufree = Unred
        else:
            drdxnred = cons_jac @ (Binv @ Unred)
            drdx = drdxnred @ Unred.T
            Vcons, Vfree = split_cons_subspace_host(drdxnred)
            Ucons = Unred @ Vcons
            Ufree = Unred @ Vfree
        self._cached_basis = (drdx, Ucons, Unred, Ufree)
        self._basis_valid = True
        return self._cached_basis

    def get_drdx(self) -> np.ndarray:
        return self.cons.jacobian() @ self._get_Binv()

    def get_Hc(self) -> np.ndarray:
        """Constraint curvature in IC space (``peswrapper.py:1011-1031``)."""
        L = self.curr.get("L")
        if L is None:
            raise RuntimeError("get_Hc() requires Lagrange multipliers")
        Binv = self._get_Binv()
        n = Binv.shape[1]
        if L.size == 0:
            return np.zeros((n, n))
        D_cons = self.cons.hessian_ldot(L)
        B_cons = self.cons.jacobian()
        L_int = L @ B_cons @ Binv
        D_int = self.int.hessian_ldot(L_int)
        return Binv.T @ (D_cons - D_int) @ Binv

    def get_df_pred(self, dx, g, H) -> Optional[float]:
        """Quadratic model restricted to the non-redundant subspace
        (``peswrapper.py:1176-1183``)."""
        if H is None:
            return None
        Unred = self.get_Unred()
        dx_r = dx @ Unred
        g_r = g @ Unred
        H_r = Unred.T @ H @ Unred
        return float(g_r.T @ dx_r + (dx_r.T @ H_r @ dx_r) / 2.0)

    def get_projected_forces(self) -> np.ndarray:
        """Projected forces on the REAL atoms (dummy rows dropped)."""
        g = self.get_g()
        Ufree = self.get_Ufree()
        B = self.int.jacobian()
        fx = -((Ufree @ (Ufree.T @ g)) @ B)
        return fx[: 3 * len(self.atoms)].reshape(-1, 3)

    # -- topology rebuild --------------------------------------------------------------
    def update_internals(self, dx=None) -> None:
        """Rebuild internals after a bad-coordinate event, transferring
        the Hessian through Cartesian space (``peswrapper.py:1129-1174``)."""
        self._update(True)

        new_int = self.int_orig.copy()
        new_int.find_all_bonds()
        new_int.find_all_angles()
        new_int.find_all_dihedrals()
        new_int.validate_basis()

        Blast = self.int.jacobian()
        B = new_int.jacobian()
        Binv = np.linalg.pinv(B)

        x = new_int.calc()
        g_cart = self.curr["g"] @ Blast  # back to Cartesian
        g = g_cart @ Binv

        H = self.H.asarray()
        Hcart = Blast.T @ H @ Blast + self.int.hessian_ldot(self.curr["g"])
        Hnew = Binv.T @ (Hcart - new_int.hessian_ldot(g)) @ Binv

        self.int = new_int
        self.cons = new_int.cons
        self.dim = len(x)
        self.set_H(Hnew)
        self._jac_memo.clear()
        self._invalidate()
        self.curr.update(x=x, g=g)
        self._update_basis()

    def calculate_hessian(self) -> None:
        assert self.hessian_function is not None
        Hcart = np.asarray(self.hessian_function(self.atoms))
        ncart = 3 * len(self.atoms)
        B = self.int.jacobian()[:, :ncart]
        U, S, VT = np.linalg.svd(B, full_matrices=True)
        nnred = int(np.sum(S > 1e-6))
        Unred = U[:, :nnred]
        Ured = U[:, nnred:]
        Bnred_inv = VT[:nnred].T @ np.diag(1.0 / S[:nnred])
        # subtract the curvature coupling sum_k g_k Hess(q_k)
        # (``peswrapper.py:1263-1265``; g is the internal gradient)
        Hcorr = Hcart - self.int.hessian_ldot(self.get_g())[:ncart, :ncart]
        Hnred = Bnred_inv.T @ Hcorr @ Bnred_inv
        lnred = np.linalg.eigvalsh(Hnred)
        lmean = np.exp(np.log(np.abs(lnred)).mean())
        Hint = Unred @ Hnred @ Unred.T + lmean * Ured @ Ured.T
        self.H.set_B(Hint)
