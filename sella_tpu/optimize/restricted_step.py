"""PES-coupled restricted-step solvers (layer 2, sequential API).

Mirrors ``/root/reference/sella/optimize/restricted_step.py``: maps a
trust radius to a concrete step by root-finding the stepper's alpha,
including the constraint-correction pre-step ``scons`` and the
NaiveStepper shortcut when the correction alone exceeds the radius.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.restricted_step import (
    cons_ras,
    cons_tr,
    make_cons_irc,
    make_cons_mis,
    root_find_alpha,
)
from ..ops.stepper import HostStepper, NaiveStepper, resolve_stepper


class BaseRestrictedStep:
    synonyms: list = []
    cons = None  # overridden per subclass

    def __init__(
        self,
        pes,
        order: int,
        delta: float,
        method: str = "qn",
        tol: Optional[float] = None,
        maxiter: int = 1000,
        d1: Optional[np.ndarray] = None,
        W: Optional[np.ndarray] = None,
    ) -> None:
        self.pes = pes
        self.delta = delta
        self.d1 = d1
        g0 = pes.get_g()

        self.scons = pes.get_scons()
        g = g0 + pes.get_H().dot(self.scons)

        kind = method if method in ("qn", "rfo", "prfo", "qn_irc") else (
            resolve_stepper(method)
        )

        # Constraint-correction shortcut: if restoring the constraints
        # alone exceeds the trust radius, just walk toward feasibility
        # (``restricted_step.py:44-48``).
        if self.cons_fn(self.scons) - self.delta > 1e-8:
            self.P = pes.get_Unred().T
            dx = self.P @ self.scons
            self.stepper = NaiveStepper(dx)
            self.scons = np.zeros_like(self.scons)
        else:
            if W is None:
                self.P = pes.get_Ufree().T
            else:
                self.P = pes.get_Ufree().T @ W
            d1p = self.d1
            if d1p is not None:
                d1p = np.linalg.lstsq(self.P.T, d1p, rcond=None)[0]
            self.stepper = HostStepper(
                kind,
                self.P @ g,
                pes.get_HL_projected(self.P.T),
                order,
                d1=d1p,
            )

        if tol is None:
            tol = 1e-10 if self.stepper.meta.newton_safe else 1e-15
        self.tol = tol
        self.maxiter = maxiter

    def cons_fn(self, s, dsda=None):
        raise NotImplementedError

    def eval(self, alpha: float):
        s, dsda = self.stepper.get_s(alpha)
        stot = self.P.T @ s + self.scons
        val, dval = self.cons_fn(stot, self.P.T @ dsda)
        return stot, val, dval

    def get_s(self):
        meta = self.stepper.meta
        return root_find_alpha(
            self.eval, meta.alpha0, meta.alphamin, meta.alphamax,
            meta.slope, meta.newton_safe, self.delta, self.tol,
            self.maxiter,
        )

    @classmethod
    def match(cls, name: str) -> bool:
        return name in cls.synonyms


class TrustRegion(BaseRestrictedStep):
    synonyms = ["tr", "trust region", "trust-region", "trust radius",
                "trust-radius"]

    def cons_fn(self, s, dsda=None):
        return cons_tr(s, dsda)


class IRCTrustRegion(TrustRegion):
    synonyms: list = []

    def __init__(self, *args, sqrtm=None, **kwargs):
        assert sqrtm is not None
        self.sqrtm = sqrtm
        super().__init__(*args, **kwargs)
        assert self.d1 is not None
        self._irc_cons = make_cons_irc(self.sqrtm, self.d1)

    def cons_fn(self, s, dsda=None):
        # During __init__ d1 isn't bound yet; fall back to plain TR norm
        irc = getattr(self, "_irc_cons", None)
        if irc is None:
            if self.d1 is None:
                return cons_tr(s, dsda)
            irc = make_cons_irc(self.sqrtm, self.d1)
        return irc(s, dsda)


class RestrictedAtomicStep(BaseRestrictedStep):
    synonyms = ["ras", "restricted atomic step"]

    def __init__(self, pes, *args, **kwargs):
        if pes.int is not None:
            raise ValueError(
                "Internal coordinates are incompatible with "
                "RestrictedAtomicStep"
            )
        super().__init__(pes, *args, **kwargs)

    def cons_fn(self, s, dsda=None):
        return cons_ras(s, dsda)


class MaxInternalStep(BaseRestrictedStep):
    synonyms = ["mis", "max internal step"]

    def __init__(self, pes, *args, wx=1.0, wb=1.0, wa=1.0, wd=1.0, wo=1.0,
                 wc=1.0, **kwargs):
        if pes.int is None:
            raise ValueError(
                "Internal coordinates are required for MaxInternalStep"
            )
        w = np.concatenate([
            np.full(pes.int.ntrans, wx),
            np.full(pes.int.nbonds, wb),
            np.full(pes.int.nangles, wa),
            np.full(pes.int.ndihedrals, wd),
            np.full(pes.int.nother, wo),
            np.full(pes.int.nrotations, wx),
        ])
        if pes.n_cell_dof > 0:
            w = np.concatenate([w, np.full(pes.n_cell_dof, wc)])
        self._mis = make_cons_mis(w)
        super().__init__(pes, *args, **kwargs)

    def cons_fn(self, s, dsda=None):
        return self._mis(s, dsda)


_ALL = [TrustRegion, RestrictedAtomicStep, MaxInternalStep]


def get_restricted_step(name: str):
    for rs in _ALL:
        if rs.match(name):
            return rs
    raise ValueError(f"Unknown restricted step name: {name}")
