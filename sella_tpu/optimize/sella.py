"""Sella saddle-point / minimum optimizer driver (layer 1).

Sequential-API equivalent of the reference driver
(``/root/reference/sella/optimize/optimize.py:42-502``): default
hyperparameter sets per order, per-step predict -> diag-schedule ->
``pes.kick`` -> trust-radius ratio update, inequality-constraint retry
loop, and the same convergence/logging surface. PES construction
dispatches over the four PES classes (Cartesian, internal, and the two
cell variants), mirroring ``optimize.py:218-315``.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from ..atoms import Atoms, as_atoms
from ..coords.constraints import Constraints
from ..pes.cartesian import PES
from .driver import Optimizer
from .restricted_step import MaxInternalStep, get_restricted_step

_default_kwargs = dict(
    minimum=dict(
        delta0=1e-1,
        sigma_inc=1.15,
        sigma_dec=0.90,
        rho_inc=1.035,
        rho_dec=100,
        method="qn",
        eig=False,
    ),
    saddle=dict(
        delta0=0.1,
        sigma_inc=1.15,
        sigma_dec=0.65,
        rho_inc=1.035,
        rho_dec=5.0,
        method="prfo",
        eig=True,
    ),
)


class Sella(Optimizer):
    def __init__(
        self,
        atoms: Atoms,
        restart: Optional[str] = None,
        logfile: str = "-",
        trajectory=None,
        master: Optional[bool] = None,
        append_trajectory: bool = False,
        delta0: Optional[float] = None,
        sigma_inc: Optional[float] = None,
        sigma_dec: Optional[float] = None,
        rho_dec: Optional[float] = None,
        rho_inc: Optional[float] = None,
        order: int = 1,
        eig: Optional[bool] = None,
        eta: float = 1e-4,
        method: Optional[str] = None,
        gamma: float = 0.1,
        threepoint: bool = False,
        constraints: Optional[Constraints] = None,
        constraints_tol: float = 1e-5,
        v0: Optional[np.ndarray] = None,
        internal: bool = False,
        rs: Optional[str] = None,
        nsteps_per_diag: int = 3,
        diag_every_n: Optional[int] = None,
        hessian_function: Optional[Callable] = None,
        optimize_cell: bool = False,
        allow_fragments: bool = False,
        rigid_fragments: Optional[bool] = None,
        cell_mask: Optional[np.ndarray] = None,
        exp_cell_factor: Optional[float] = None,
        scalar_pressure: float = 0.0,
        smax: Optional[float] = None,
        niggli: bool = False,
        refine_initial_hessian=False,
        save_hessian: Optional[str] = None,
        exact_geodesic: Optional[bool] = None,
        **kwargs,
    ) -> None:
        atoms = as_atoms(atoms)
        default = _default_kwargs["minimum" if order == 0 else "saddle"]

        # ``master=False`` silences file output (the reference forwards
        # this to ASE for non-master MPI ranks, ``optimize.py:49,148``).
        if master is False:
            logfile = None
            trajectory = None
        if isinstance(trajectory, str):
            from ..utils.trajectory import TrajectoryWriter

            mode = "a" if append_trajectory else "w"
            trajectory = TrajectoryWriter(trajectory, atoms, mode=mode)
        self.restart = restart

        # cell-optimization validation (``optimize.py:127-142``)
        self.optimize_cell = optimize_cell
        self.allow_fragments = allow_fragments
        self.smax = smax
        self.niggli = niggli
        if optimize_cell:
            if order != 0:
                raise ValueError(
                    "Cell optimization is only supported for minima "
                    f"(order=0), got order={order}."
                )
            if not np.any(atoms.pbc):
                raise ValueError(
                    "Cell optimization requires periodic boundary "
                    "conditions."
                )

        self.user_internal = internal
        # Geodesic-integration exactness toggle (reference
        # ``optimize.py:79,125,281``): only meaningful with internals.
        self.exact_geodesic = (
            exact_geodesic if exact_geodesic is not None else True
        )
        if internal:
            kwargs.setdefault("exact_geodesic", self.exact_geodesic)
        self.peskwargs = dict(kwargs)
        self.initialize_pes(
            atoms, trajectory, order, eta, constraints, v0, internal,
            hessian_function, optimize_cell=optimize_cell,
            allow_fragments=allow_fragments,
            rigid_fragments=rigid_fragments,
            cell_mask=cell_mask, exp_cell_factor=exp_cell_factor,
            scalar_pressure=scalar_pressure,
            refine_initial_hessian=refine_initial_hessian,
            save_hessian=save_hessian, **kwargs
        )

        if rs is None:
            rs = "mis" if internal else "ras"
        self.rs = get_restricted_step(rs)
        Optimizer.__init__(self, atoms, logfile=logfile)

        if delta0 is None:
            delta0 = default["delta0"]
        if rs in ("mis", "ras"):
            self.delta = delta0
        else:
            self.delta = delta0 * self.pes.get_Ufree().shape[1]
        # Cell DOF get their own trust radius, coupled into the MIS norm
        # via wc = delta/delta_cell (reference ``optimize.py:187,333-337``)
        self.delta_cell = delta0

        self.sigma_inc = sigma_inc if sigma_inc is not None else default["sigma_inc"]
        self.sigma_dec = sigma_dec if sigma_dec is not None else default["sigma_dec"]
        self.rho_inc = rho_inc if rho_inc is not None else default["rho_inc"]
        self.rho_dec = rho_dec if rho_dec is not None else default["rho_dec"]
        self.method = method if method is not None else default["method"]
        self.eig = eig if eig is not None else default["eig"]

        self.ord = order
        self.eta = eta
        self.delta_min = self.eta
        self.constraints_tol = constraints_tol
        self.diagkwargs = dict(gamma=gamma, threepoint=threepoint)
        self.rho = 1.0

        if self.ord != 0 and not self.eig:
            import warnings

            warnings.warn(
                "Saddle point optimizations with eig=False will "
                "most likely fail!"
            )

        self.initialized = False
        self.nsteps_per_diag = nsteps_per_diag
        self.nsteps_since_diag = 0
        self.diag_every_n = np.inf if diag_every_n is None else diag_every_n
        self._last_converged = None
        if self.restart is not None:
            self._load_restart()

    def initialize_pes(
        self,
        atoms,
        trajectory=None,
        order: int = 1,
        eta: float = 1e-4,
        constraints=None,
        v0=None,
        internal: bool = False,
        hessian_function=None,
        optimize_cell: bool = False,
        allow_fragments: bool = False,
        rigid_fragments: Optional[bool] = None,
        cell_mask=None,
        exp_cell_factor=None,
        scalar_pressure: float = 0.0,
        refine_initial_hessian=False,
        save_hessian=None,
        **kwargs,
    ) -> None:
        if optimize_cell and not internal:
            from ..pes.cell import CellCartesianPES

            self.internal = None
            if constraints is None:
                constraints = Constraints(atoms)
            self.constraints = constraints
            self.pes = CellCartesianPES(
                atoms, constraints=constraints, trajectory=trajectory,
                eta=eta, v0=v0, hessian_function=hessian_function,
                cell_mask=cell_mask, exp_cell_factor=exp_cell_factor,
                scalar_pressure=scalar_pressure,
                refine_initial_hessian=refine_initial_hessian,
                save_hessian=save_hessian, **kwargs
            )
            return
        if optimize_cell and internal:
            from ..pes.cell import CellInternalPES
            from ..coords.internals import Internals

            if isinstance(internal, Internals):
                if constraints is not None:
                    raise ValueError(
                        "Pass Constraints to the Internals constructor "
                        "when supplying explicit Internals."
                    )
                internals = internal
                auto = False
            else:
                internals = Internals(
                    atoms, cons=constraints,
                    allow_fragments=allow_fragments,
                )
                auto = True
            self.internal = internals
            self.constraints = None
            self.pes = CellInternalPES(
                atoms, internals, trajectory=trajectory, eta=eta, v0=v0,
                auto_find_internals=auto,
                hessian_function=hessian_function,
                rigid_fragments=rigid_fragments,
                cell_mask=cell_mask, exp_cell_factor=exp_cell_factor,
                scalar_pressure=scalar_pressure,
                refine_initial_hessian=refine_initial_hessian,
                save_hessian=save_hessian, **kwargs
            )
            return
        if internal:
            from ..pes.internal import InternalPES
            from ..coords.internals import Internals

            if isinstance(internal, Internals):
                if constraints is not None:
                    raise ValueError(
                        "Pass Constraints to the Internals constructor, "
                        "not to Sella, when supplying explicit Internals."
                    )
                internals = internal
                auto = False
            else:
                internals = Internals(
                    atoms, cons=constraints,
                    allow_fragments=allow_fragments,
                )
                auto = True
            self.internal = internals
            self.constraints = None
            self.pes = InternalPES(
                atoms, internals=internals, trajectory=trajectory, eta=eta,
                v0=v0, auto_find_internals=auto,
                hessian_function=hessian_function, **kwargs
            )
        else:
            self.internal = None
            if constraints is None:
                constraints = Constraints(atoms)
            self.constraints = constraints
            self.pes = PES(
                atoms, constraints=constraints, trajectory=trajectory,
                eta=eta, v0=v0, hessian_function=hessian_function, **kwargs
            )

    # -- stepping -------------------------------------------------------------
    def _predict_step(self):
        """(``optimize.py:317-357``)"""
        if not self.initialized:
            self.pes.get_g()
            if self.eig:
                if self.pes.hessian_function is not None:
                    self.pes.calculate_hessian()
                else:
                    self.pes.diag(**self.diagkwargs)
                self.nsteps_since_diag = -1
            self.initialized = True

        self.pes.cons.disable_satisfied_inequalities()
        self.pes._update_basis()
        self.pes.save()
        x0 = self.pes.get_x()

        rs_kwargs = {}
        if self.optimize_cell and isinstance(self.rs, type) and issubclass(
            self.rs, MaxInternalStep
        ):
            rs_kwargs["wc"] = self.delta / self.delta_cell

        if self.pes.cons.has_inequalities():
            all_valid = False
            while not all_valid:
                s, smag = self.rs(
                    self.pes, self.ord, self.delta, method=self.method,
                    **rs_kwargs
                ).get_s()
                self.pes.set_x(x0 + s)
                all_valid = self.pes.cons.validate_inequalities()
                self.pes._update_basis()
                self.pes.restore()
            self.pes._update_basis()
        else:
            s, smag = self.rs(
                self.pes, self.ord, self.delta, method=self.method,
                **rs_kwargs
            ).get_s()
        return s, smag

    def step(self) -> None:
        """(``optimize.py:359-440``)"""
        s, smag = self._predict_step()

        # Diagonalization schedule: every diag_every_n, or when the
        # leftmost projected eigenvalues have the wrong inertia
        if self.nsteps_since_diag >= self.diag_every_n:
            ev = True
        elif self.eig and self.nsteps_since_diag >= self.nsteps_per_diag:
            if self.pes.H.evals is None:
                ev = True
            else:
                Unred = self.pes.get_Unred()
                evals = self.pes.get_HL_projected(Unred).evals
                # wrong inertia: a leading eigenvalue turned positive
                # (``optimize.py:369-371``)
                ev = bool((evals[: self.ord] > 0).any())
        else:
            ev = False

        if ev:
            self.nsteps_since_diag = 0
        else:
            self.nsteps_since_diag += 1

        rho = self.pes.kick(s, ev, **self.diagkwargs)

        # Bad internals: rebuild the PES, skip the trust update.
        # All cell-path kwargs must survive the rebuild or a
        # CellInternalPES would silently degrade to a plain InternalPES
        # (reference ``optimize.py:384-410``).
        if self.internal is not None and self.pes.int is not None:
            if self.pes.int.check_for_bad_internals():
                cell_kwargs = {}
                if self.optimize_cell:
                    cell_kwargs = dict(
                        cell_mask=self.pes.cell_mask,
                        exp_cell_factor=self.pes.exp_cell_factor,
                        scalar_pressure=self.pes.scalar_pressure,
                        rigid_fragments=getattr(
                            self.pes, "rigid_fragments", False
                        ),
                    )
                self.initialize_pes(
                    atoms=self.pes.atoms,
                    trajectory=self.pes.traj,
                    order=self.ord,
                    eta=self.pes.eta,
                    constraints=self.constraints,
                    v0=None,
                    internal=self.user_internal,
                    hessian_function=self.pes.hessian_function,
                    optimize_cell=self.optimize_cell,
                    allow_fragments=self.allow_fragments,
                    **cell_kwargs,
                    **self.peskwargs,
                )
                self.initialized = False
                self.rho = 1.0
                self._dump_restart()
                return

        # Trust-radius update from the prediction ratio; cell DOF use
        # their own radius (reference ``optimize.py:412-431``)
        if rho is not None:
            n_int = getattr(self.pes, "n_internal", None)
            if self.optimize_cell and n_int is not None:
                smag_int = float(np.max(np.abs(s[:n_int]))) if n_int else 0.0
                smag_cell = (
                    float(np.max(np.abs(s[n_int:]))) if len(s) > n_int
                    else 0.0
                )
            else:
                smag_int = smag
                smag_cell = 0.0

            if rho < 1.0 / self.rho_dec or rho > self.rho_dec:
                self.delta = max(smag_int * self.sigma_dec, self.delta_min)
                if smag_cell > 0:
                    self.delta_cell = max(
                        self.delta_cell * self.sigma_dec, self.delta_min
                    )
            elif 1.0 / self.rho_inc < rho < self.rho_inc:
                self.delta = max(self.sigma_inc * smag_int, self.delta)
                if smag_cell > 0:
                    self.delta_cell = max(
                        self.sigma_inc * smag_cell, self.delta_cell
                    )
            self.rho = rho
        else:
            self.rho = 1.0

        # Niggli-style cell rebase when the cell skews (``optimize.py:
        # 437-440``)
        if self.optimize_cell and self.niggli and (
            self.pes.maybe_niggli_reduce()
        ):
            self.initialized = False
            self.rho = 1.0

        self._dump_restart()

    # -- restart payload ------------------------------------------------------
    # The reference forwards ``restart`` to the ASE Optimizer base
    # (pickle of optimizer internals, ``optimize.py:45,177``) but
    # defines no custom payload. Here the payload is explicit: the
    # quantities that are expensive to regenerate (the quasi-Newton
    # Hessian) plus the trust/diag-schedule state.
    def _dump_restart(self) -> None:
        if self.restart is None:
            return
        payload = dict(
            delta=self.delta,
            delta_cell=self.delta_cell,
            rho=self.rho,
            nsteps_since_diag=self.nsteps_since_diag,
            positions=np.asarray(self.pes.atoms.positions),
        )
        H = getattr(self.pes, "H", None)
        if H is not None and getattr(H, "B", None) is not None:
            payload["B"] = np.asarray(H.B)
        tmp = self.restart + ".tmp"
        with open(tmp, "wb") as fh:  # np.savez(str) would append .npz
            np.savez(fh, **payload)
        import os

        os.replace(tmp, self.restart)

    def _load_restart(self) -> None:
        import os

        if not os.path.exists(self.restart):
            return
        with np.load(self.restart) as data:
            self.delta = float(data["delta"])
            self.delta_cell = float(data["delta_cell"])
            self.rho = float(data["rho"])
            self.nsteps_since_diag = int(data["nsteps_since_diag"])
            if "B" in data:
                self.pes.H.set_B(data["B"])
                # the restored Hessian replaces the initial diag
                self.initialized = True

    def converged(self, forces=None) -> bool:
        fmax = self.fmax if self.fmax is not None else 0.05
        if self.optimize_cell:
            smax = self.smax if self.smax is not None else fmax
            result = self.pes.converged(fmax, smax=smax)
        else:
            result = self.pes.converged(fmax)
        self._last_converged = result
        return result[0]

    def log(self, forces=None) -> None:
        if self.logfile is None:
            return
        result = self._last_converged
        if result is None:
            if self.optimize_cell:
                result = self.pes.converged(
                    self.fmax or 0.05,
                    smax=self.smax if self.smax is not None else (self.fmax or 0.05),
                )
            else:
                result = self.pes.converged(self.fmax or 0.05)
        _, fmax, cmax = result[:3]
        e = self.pes.get_f()
        T = time.strftime("%H:%M:%S")
        name = self.__class__.__name__
        if self.nsteps == 0:
            self.logfile.write(
                " " * len(name)
                + "{:>4s} {:>8s} {:>15s} {:>12s} {:>12s} {:>12s} {:>12s}\n".format(
                    "Step", "Time", "Energy", "fmax", "cmax", "rtrust", "rho"
                )
            )
        self.logfile.write(
            "{} {:>3d} {:>8s} {:>15.6f} {:>12.4f} {:>12.4f} {:>12.4f} "
            "{:>12.4f}\n".format(
                name, self.nsteps, T, e, fmax, cmax, self.delta, self.rho
            )
        )
        try:
            self.logfile.flush()
        except (AttributeError, TypeError):
            pass
