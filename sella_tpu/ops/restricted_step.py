"""Restricted-step machinery (layer 2): map trust radius -> step.

The core is a 1-D root-find on the step-length-vs-alpha curve
``||s(alpha)|| = delta`` using safeguarded Newton + bisection
(``/root/reference/sella/optimize/restricted_step.py:78-120``). The
norm ("cons") definitions:

* ``tr``   — Euclidean norm (TrustRegion)
* ``ras``  — max per-atom displacement (RestrictedAtomicStep)
* ``mis``  — weighted max per-DOF displacement (MaxInternalStep)
* ``irc``  — mass-weighted norm of (s + d1) (IRCTrustRegion)

These are pure functions ``cons(s, dsda) -> (val, dval)``; the host
root-find below is plain Python, and the batched path re-expresses the
same loop as ``lax.while_loop`` (``sella_tpu.parallel.ensemble``).
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def cons_tr(s: np.ndarray, dsda: Optional[np.ndarray] = None):
    val = np.linalg.norm(s)
    if dsda is None:
        return val
    return val, dsda @ s / max(val, 1e-12)


def cons_ras(s: np.ndarray, dsda: Optional[np.ndarray] = None):
    s_mat = s.reshape(-1, 3)
    norms = np.linalg.norm(s_mat, axis=1)
    idx = int(np.argmax(norms))
    val = norms[idx]
    if dsda is None:
        return val
    dval = dsda.reshape(-1, 3)[idx] @ s_mat[idx] / max(val, 1e-12)
    return val, dval


def make_cons_mis(w: np.ndarray):
    def cons_mis(s, dsda=None):
        sw = np.abs(s * w)
        idx = int(np.argmax(sw))
        val = sw[idx]
        if dsda is None:
            return val
        return val, np.sign(s[idx]) * dsda[idx] * w[idx]

    return cons_mis


def make_cons_irc(sqrtm: np.ndarray, d1: np.ndarray):
    """Mass-weighted trust norm of the cumulative IRC displacement
    (``restricted_step.py:145-158``)."""

    def cons_irc(s, dsda=None):
        sm = (s + d1) * sqrtm
        if dsda is None:
            return cons_tr(sm)
        return cons_tr(sm, dsda * sqrtm)

    return cons_irc


def root_find_alpha(
    eval_fn: Callable[[float], Tuple[np.ndarray, float, float]],
    alpha0: float,
    alphamin: float,
    alphamax: float,
    slope: float,
    newton_safe: bool,
    delta: float,
    tol: float,
    maxiter: int = 1000,
) -> Tuple[np.ndarray, float]:
    """Safeguarded Newton/bisection on ``val(alpha) = delta``.

    ``eval_fn(alpha) -> (s, val, dval)``. Returns ``(s, smag)``; an
    interior first iterate (val < delta) is returned immediately
    (``restricted_step.py:78-120``).
    """
    alpha = alpha0
    s, val, dval = eval_fn(alpha)
    if val < delta:
        assert val > 0.0
        return s, val
    err = val - delta

    lower, upper = alphamin, alphamax
    for niter in range(maxiter):
        if abs(err) <= tol:
            return s, delta
        if np.nextafter(lower, upper) >= upper:
            return s, delta
        if err * slope > 0:
            upper = alpha
        else:
            lower = alpha

        a1 = alpha - err / dval if dval != 0 else np.nan
        if (
            np.isnan(a1)
            or a1 <= lower
            or a1 >= upper
            or (niter > 4 and not newton_safe)
        ):
            a2 = (lower + upper) / 2.0
            if np.isinf(a2):
                alpha = alpha + max(1.0, 0.5 * alpha) * np.sign(a2)
            else:
                alpha = a2
        else:
            alpha = a1

        s, val, dval = eval_fn(alpha)
        err = val - delta
    raise RuntimeError("Restricted step failed to converge!")
