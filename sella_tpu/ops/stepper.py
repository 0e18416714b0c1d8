"""Trust-subproblem steppers (layer 3): QN/MMF, RFO, P-RFO, IRC variant.

Each stepper is an alpha-parameterized family of steps with an analytic
derivative ``ds/dalpha``, consumed by the restricted-step root-find
(``sella_tpu.ops.restricted_step``). Functional redesign of
``/root/reference/sella/optimize/stepper.py``: a stepper is a
``(params-pytree, get_s)`` pair of pure functions, so the same code runs
eagerly in the sequential driver and inside the jitted batched step
(shapes are static; the RFO eigh per alpha-eval is a tiny dense eigh that
XLA batches beautifully under vmap).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class StepperMeta(NamedTuple):
    alpha0: float
    alphamin: float
    alphamax: float
    slope: float          # sign of d||s||/dalpha
    newton_safe: bool     # whether the alpha curve is smooth enough for Newton


QN_META = StepperMeta(0.0, 0.0, np.inf, -1.0, True)
RFO_META = StepperMeta(1.0, 0.0, 1.0, 1.0, False)
NAIVE_META = StepperMeta(0.5, 0.0, 1.0, 1.0, True)


# ---------------------------------------------------------------------------
# Quasi-Newton / minimum-mode following (``stepper.py:58-96``)
# ---------------------------------------------------------------------------
class QNParams(NamedTuple):
    V: jnp.ndarray      # (m, m) eigenvectors of H
    L: jnp.ndarray      # (m,) |evals| with the first `order` kept negative
    Vg: jnp.ndarray     # (m,) eigenbasis gradient
    ones: jnp.ndarray   # (m,) +1 / -1 pattern (first `order` are -1)


def qn_prepare(g: jnp.ndarray, evals: jnp.ndarray, evecs: jnp.ndarray,
               order: int) -> QNParams:
    m = evals.shape[0]
    idx = jnp.arange(m)
    sign = jnp.where(idx < order, -1.0, 1.0).astype(g.dtype)
    L = jnp.abs(evals) * sign
    return QNParams(evecs, L, evecs.T @ g, sign)


def qn_get_s(p: QNParams, alpha) -> Tuple[jnp.ndarray, jnp.ndarray]:
    denom = p.L + alpha * p.ones
    sproj = p.Vg / denom
    s = -p.V @ sproj
    # d s / d alpha = V (Vg * ones / denom^2). The reference omits the
    # `ones` factor (``stepper.py:91-96``), giving a wrong-signed
    # derivative on the uphill modes; its root-find still converges via
    # the bisection safeguard, and the converged step is identical —
    # here the exact derivative just makes Newton faster.
    dsda = p.V @ (sproj * p.ones / denom)
    return s, dsda


# ---------------------------------------------------------------------------
# IRC quasi-Newton (``stepper.py:99-111``)
# ---------------------------------------------------------------------------
class QNIRCParams(NamedTuple):
    V: jnp.ndarray
    L: jnp.ndarray
    Vg: jnp.ndarray
    Vd1: jnp.ndarray


def qn_irc_prepare(g, evals, evecs, order, d1) -> QNIRCParams:
    p = qn_prepare(g, evals, evecs, order)
    return QNIRCParams(p.V, p.L, p.Vg, evecs.T @ d1)


def qn_irc_get_s(p: QNIRCParams, alpha):
    denom = jnp.abs(p.L) + alpha
    sproj = -(p.Vg + alpha * p.Vd1) / denom
    s = p.V @ sproj
    dsda = -p.V @ ((sproj + p.Vd1) / denom)
    return s, dsda


# ---------------------------------------------------------------------------
# Rational function optimization (``stepper.py:114-157``)
# ---------------------------------------------------------------------------
class RFOParams(NamedTuple):
    A: jnp.ndarray   # (m+1, m+1) augmented matrix [[H, g], [g^T, 0]]
    order: int


def rfo_prepare(g: jnp.ndarray, H: jnp.ndarray, order: int) -> RFOParams:
    m = g.shape[0]
    A = jnp.zeros((m + 1, m + 1), dtype=g.dtype)
    A = A.at[:m, :m].set(H)
    A = A.at[:m, m].set(g)
    A = A.at[m, :m].set(g)
    return RFOParams(A, order)


def rfo_get_s(p: RFOParams, alpha) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RFO step via the alpha-scaled augmented eigenproblem.

    The step follows eigenvector ``order`` of ``[[a^2 H, a g],[a g^T, 0]]``;
    its alpha-derivative uses first-order eigenvector perturbation theory
    with regularized denominators (``stepper.py:128-157``).
    """
    A = p.A * alpha
    m = A.shape[0] - 1
    A = A.at[:m, :m].multiply(alpha)
    L, V = jnp.linalg.eigh(A)

    vk = V[:, p.order]
    denom = vk[-1]
    denom = jnp.where(
        jnp.abs(denom) < 1e-12,
        jnp.where(denom != 0, jnp.sign(denom) * 1e-12, 1e-12),
        denom,
    )
    s = vk[:-1] * alpha / denom

    dAda = p.A.at[:m, :m].multiply(2 * alpha)

    # eigenvector derivative: dV_k = sum_{j != k} V_j (V_j^T dA V_k)/(L_k - L_j).
    # (The reference uses the sign-flipped denominator L_j - L_k,
    # ``stepper.py:146-152`` — recovered there by the bisection safeguard
    # since RFO is marked not newton_safe; the correct sign makes the
    # root-find's Newton iterations actually converge.)
    Ldiff = L[p.order] - L
    Ldiff_reg = jnp.where(
        Ldiff >= 0, jnp.maximum(Ldiff, 1e-12), jnp.minimum(Ldiff, -1e-12)
    )
    coef = (V.T @ (dAda @ vk)) / Ldiff_reg
    coef = coef.at[p.order].set(0.0)  # exclude the k-th mode
    dVda = V @ coef

    dsda = (
        vk[:-1] / denom
        + (alpha / denom) * dVda[:-1]
        - (vk[:-1] * alpha / denom**2) * dVda[-1]
    )
    return s, dsda


# ---------------------------------------------------------------------------
# Partitioned RFO (``stepper.py:160-185``)
# ---------------------------------------------------------------------------
class PRFOParams(NamedTuple):
    Vmax: jnp.ndarray   # (m, order) uphill subspace
    Vmin: jnp.ndarray   # (m, m-order) downhill subspace
    pmax: RFOParams
    pmin: RFOParams


def prfo_prepare(g: jnp.ndarray, evals: jnp.ndarray, evecs: jnp.ndarray,
                 order: int) -> PRFOParams:
    Vmax = evecs[:, :order]
    Vmin = evecs[:, order:]
    pmax = rfo_prepare(Vmax.T @ g, jnp.diag(evals[:order]), order)
    pmin = rfo_prepare(Vmin.T @ g, jnp.diag(evals[order:]), 0)
    return PRFOParams(Vmax, Vmin, pmax, pmin)


def prfo_get_s(p: PRFOParams, alpha) -> Tuple[jnp.ndarray, jnp.ndarray]:
    smax, dsmaxda = rfo_get_s(p.pmax, alpha)
    smin, dsminda = rfo_get_s(p.pmin, alpha)
    s = p.Vmax @ smax + p.Vmin @ smin
    dsda = p.Vmax @ dsmaxda + p.Vmin @ dsminda
    return s, dsda


# ---------------------------------------------------------------------------
# Registry (sequential API; mirrors ``stepper.py:188-199``)
# ---------------------------------------------------------------------------
_SYNONYMS = {
    "qn": "qn", "quasi-newton": "qn", "quasi newton": "qn", "newton": "qn",
    "mmf": "qn", "minimum mode following": "qn",
    "minimum-mode following": "qn", "dimer": "qn",
    "rfo": "rfo", "rational function optimization": "rfo",
    "prfo": "prfo", "p-rfo": "prfo",
    "partitioned rational function optimization": "prfo",
}


def resolve_stepper(name: str) -> str:
    key = _SYNONYMS.get(name.lower())
    if key is None:
        raise ValueError(f"Unknown stepper name: {name}")
    return key


class HostStepper:
    """Stateful wrapper pairing prepare/get_s for the sequential driver.

    `H` must expose `.evals`/`.evecs`/`.asarray()` (an ApproximateHessian).
    P-RFO on an uninitialized Hessian degrades to RFO on identity like the
    reference (identity has no negative modes).
    """

    def __init__(self, kind: str, g: np.ndarray, H, order: int = 0,
                 d1: Optional[np.ndarray] = None) -> None:
        self.kind = kind
        g = jnp.asarray(g)
        if kind == "qn":
            evals, evecs = _eig_of(H)
            self.params = qn_prepare(g, evals, evecs, order)
            self.get_s_fn = qn_get_s
            self.meta = QN_META
        elif kind == "qn_irc":
            evals, evecs = _eig_of(H)
            self.params = qn_irc_prepare(g, evals, evecs, order, jnp.asarray(d1))
            self.get_s_fn = qn_irc_get_s
            self.meta = QN_META
        elif kind == "rfo":
            self.params = rfo_prepare(g, jnp.asarray(H.asarray()), order)
            self.get_s_fn = rfo_get_s
            self.meta = RFO_META
        elif kind == "prfo":
            evals, evecs = _eig_of(H)
            self.params = prfo_prepare(g, evals, evecs, order)
            self.get_s_fn = prfo_get_s
            self.meta = RFO_META
        else:
            raise ValueError(kind)

    def get_s(self, alpha: float):
        s, dsda = self.get_s_fn(self.params, alpha)
        return np.asarray(s), np.asarray(dsda)


class NaiveStepper:
    """Linear ramp toward a fixed displacement — used for the
    constraint-correction shortcut (``stepper.py:44-55``)."""

    meta = NAIVE_META

    def __init__(self, dx: np.ndarray) -> None:
        self.dx = np.asarray(dx)

    def get_s(self, alpha: float):
        return alpha * self.dx, self.dx


def _eig_of(H):
    if H.evals is None:
        B = np.asarray(H.asarray())
        evals, evecs = np.linalg.eigh(B)
        H.evals, H.evecs = evals, evecs
    return jnp.asarray(H.evals), jnp.asarray(H.evecs)
