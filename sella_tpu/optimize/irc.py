"""Intrinsic reaction coordinate (IRC) follower.

Sequential-API equivalent of ``/root/reference/sella/optimize/irc.py``:
initial full diagonalization at the TS gives the mass-weighted imaginary
mode; each outer step displaces along the path and runs an inner loop of
mass-weighted trust-region corrector steps; forward/reverse runs restore
the stored TS state; convergence additionally requires a positive
leftmost eigenvalue.
"""
from __future__ import annotations

import warnings
from typing import Optional

import numpy as np

from ..atoms import Atoms, as_atoms
from ..pes.cartesian import PES
from .driver import Optimizer
from .restricted_step import IRCTrustRegion


class IRCInnerLoopConvergenceFailure(RuntimeError):
    pass


class IRC(Optimizer):
    def __init__(
        self,
        atoms: Atoms,
        logfile: str = "-",
        trajectory=None,
        master: Optional[bool] = None,
        ninner_iter: int = 10,
        irctol: float = 1e-2,
        dx: float = 0.1,
        eta: float = 1e-4,
        gamma: float = 0.1,
        peskwargs: Optional[dict] = None,
        keep_going: bool = False,
        **kwargs,
    ) -> None:
        atoms = as_atoms(atoms)
        Optimizer.__init__(self, atoms, logfile=logfile)
        self.ninner_iter = ninner_iter
        self.irctol = irctol
        self.dx = dx
        self.peskwargs = peskwargs if peskwargs is not None else dict(
            gamma=gamma
        )

        self.sqrtm = np.repeat(np.sqrt(atoms.get_masses()), 3)

        # No rigid-mode projection: the IRC path moves through
        # translation-free mass-weighted space explicitly
        # (``irc.py:62-63``).
        self.pes = PES(
            atoms, eta=eta, proj_trans=False, proj_rot=False,
            trajectory=trajectory, **kwargs
        )

        self.x0 = self.pes.get_x().copy()
        self.v0ts: Optional[np.ndarray] = None
        self.H0: Optional[np.ndarray] = None
        self.pescurr = None
        self.peslast = None
        self.first = True
        self.keep_going = keep_going
        self.fmax_inner = 0.01
        self.d1: Optional[np.ndarray] = None

    def irun(self, fmax: float = 0.05, fmax_inner: float = 0.01,
             steps: Optional[int] = None, direction: str = "forward"):
        if direction not in ("forward", "reverse"):
            raise ValueError('direction must be "forward" or "reverse"')

        if self.v0ts is None:
            # Initial full diagonalization at the TS (``irc.py:85-99``)
            self.pes.kick(np.zeros(self.pes.dim), True, **self.peskwargs)
            self.H0 = self.pes.H.asarray().copy()
            Hw = self.H0 / np.outer(self.sqrtm, self.sqrtm)
            _, vecs = np.linalg.eigh(Hw)
            self.v0ts = self.dx * vecs[:, 0] / self.sqrtm
            # canonical sign: first nonzero component positive
            nz = np.nonzero(self.v0ts)[0]
            if nz.size and self.v0ts[nz[0]] < 0:
                self.v0ts *= -1
            self.pescurr = self.pes.curr.copy()
            self.peslast = self.pes.last.copy()
        else:
            # restore the TS state for the other direction
            # (``irc.py:100-105``)
            self.pes.set_x(self.x0)
            self.pes.curr = self.pescurr.copy()
            self.pes.last = self.peslast.copy()
            self.pes.set_H(self.H0.copy(), initialized=True)

        self.d1 = self.v0ts.copy() if direction == "forward" else (
            -self.v0ts.copy()
        )
        self.first = True
        self.fmax_inner = min(fmax, fmax_inner)
        return Optimizer.irun(self, fmax, steps)

    def run(self, *args, **kwargs):
        converged = False
        for converged in self.irun(*args, **kwargs):
            pass
        return converged

    def step(self) -> None:
        """(``irc.py:121-165``)"""
        if self.first:
            self.pes.kick(self.d1)
            self.first = False
        for _ in range(self.ninner_iter):
            s, smag = IRCTrustRegion(
                self.pes, 0, self.dx, method="qn_irc",
                sqrtm=self.sqrtm, d1=self.d1, W=self.get_W(),
            ).get_s()

            bound_clip = abs(smag - self.dx) < 1e-8
            self.d1 += s
            self.pes.kick(s)
            g1 = self.pes.get_g()

            d1m = self.d1 * self.sqrtm
            d1m /= np.linalg.norm(d1m)
            g1m = g1 / self.sqrtm
            g1m_proj = g1m - d1m * (d1m @ g1m)
            fmax = np.linalg.norm(
                (g1m_proj * self.sqrtm).reshape(-1, 3), axis=1
            ).max()

            if bound_clip and fmax < self.fmax_inner:
                break
            elif self.converged():
                break
        else:
            if self.keep_going:
                warnings.warn(
                    "IRC inner loop failed to converge! The trajectory "
                    "is no longer a trustworthy IRC."
                )
            else:
                raise IRCInnerLoopConvergenceFailure

        self.d1 *= 0.0

    def converged(self, forces=None) -> bool:
        """Converged when the projected forces vanish AND the leftmost
        eigenvalue of H is positive.

        Deviation from the reference (``irc.py:167-172``): the inertia
        test there uses the raw unprojected H, whose rigid
        translation/rotation modes hover around 0 (slightly negative
        from update noise) for free clusters, making the criterion
        unreachable; here the rigid modes are projected out first, which
        matches the criterion's intent ("the endpoint is a minimum").
        """
        if self.first or self.pes.H.B is None:
            return False
        if not self.pes.converged(self.fmax or 0.05)[0]:
            return False
        import jax.numpy as jnp

        from ..parallel.ensemble import free_basis

        U = np.asarray(free_basis(jnp.asarray(self.pes.get_x()), 6))
        evals = np.linalg.eigvalsh(U.T @ self.pes.H.asarray() @ U)
        return bool(evals[0] > 0)

    def get_W(self) -> np.ndarray:
        return np.diag(1.0 / self.sqrtm)
