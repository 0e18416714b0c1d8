"""Iterative partial Hessian diagonalization (curvature layer, C8).

Two tiers:

* :func:`rayleigh_ritz` — host-driven Davidson/Jacobi–Davidson with
  dynamic subspace growth, for the sequential API. Faithful to the
  reference algorithm (``/root/reference/sella/eigensolvers.py:31-153``):
  Galerkin projection with on-the-fly Y-symmetrization, convergence test
  ``||r_i|| < gamma |theta_i|`` on the negative-most Ritz pairs, jd0
  expansion via an augmented solve, Lanczos and random-restart fallbacks.
  Each ``A.dot`` triggers one gradient evaluation (through
  :class:`sella_tpu.ops.operators.NumericalHessian`), which for jax
  potentials is a single jitted call — the loop itself is tiny host
  algebra on an (n, m<<n) subspace.
* ``_davidson_loop`` (in ``sella_tpu.parallel.ensemble``) — the
  fixed-shape masked variant used inside the jitted batched step.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.linalg as sla

from .hessian_update import symmetrize_Y
from .linalg import modified_gram_schmidt


def exact(A, gamma=None, P=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense eigendecomposition fallback; densifies operators by probing
    (``/root/reference/sella/eigensolvers.py:9-28``)."""
    if isinstance(A, np.ndarray):
        lams, vecs = np.linalg.eigh(A)
    else:
        n = A.shape[0]
        if P is None:
            vecs_P = np.eye(n)
        else:
            _, vecs_P, _ = exact(P)
        B = np.zeros((n, n))
        for i in range(n):
            v = vecs_P[i]
            B += np.outer(v, A.dot(v))
        B = 0.5 * (B + B.T)
        lams, vecs = np.linalg.eigh(B)
    return lams, vecs, lams[None, :] * vecs


def expand(
    V: np.ndarray,
    Y: np.ndarray,
    P: np.ndarray,
    B: np.ndarray,
    lams: np.ndarray,
    vecs: np.ndarray,
    shift: float,
    method: str = "jd0",
    seeking: int = 0,
) -> np.ndarray:
    """Subspace-expansion preconditioners (6 schemes,
    ``/root/reference/sella/eigensolvers.py:115-153``)."""
    d, n = V.shape
    R = Y @ vecs - B @ V @ vecs * lams[None, :]
    Pshift = P - shift * B
    r = R[:, seeking]
    if method == "lanczos":
        return r
    elif method == "gd":
        return np.linalg.solve(Pshift, r)
    elif method == "jd0_alt":
        vi = V @ vecs[:, seeking]
        Pprojr = sla.solve(Pshift, r)
        Pprojv = sla.solve(Pshift, vi)
        denom = vi.T @ Pprojv
        if abs(denom) < 1e-12:
            return Pprojr
        alpha = vi.T @ Pprojr / denom
        return Pprojv * alpha - Pprojr
    elif method == "jd0":
        vi = V @ vecs[:, seeking]
        Aaug = np.block([[Pshift, vi[:, None]], [vi[None, :], np.zeros((1, 1))]])
        raug = np.zeros(d + 1)
        raug[:d] = r
        z = sla.solve(Aaug, -raug)
        return z[:d]
    elif method == "mjd0_alt":
        Vrot = V @ vecs
        Pprojr = sla.solve(Pshift, r)
        PprojV = sla.solve(Pshift, Vrot)
        alpha = sla.solve(Vrot.T @ PprojV, Vrot.T @ Pprojr)
        return sla.solve(Pshift, Vrot @ alpha - r)
    elif method == "mjd0":
        Vrot = V @ vecs
        Aaug = np.block([[Pshift, Vrot], [Vrot.T, np.zeros((n, n))]])
        raug = np.zeros(d + n)
        raug[:d] = r
        z = sla.solve(Aaug, -raug)
        return z[:d]
    raise ValueError(f"Unknown diagonalization method {method}")


def rayleigh_ritz(
    A,
    gamma: float,
    P: np.ndarray,
    B: Optional[np.ndarray] = None,
    v0: Optional[np.ndarray] = None,
    vref: Optional[np.ndarray] = None,
    vreftol: float = 0.99,
    method: str = "jd0",
    maxiter: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Davidson-type partial diagonalization of operator A.

    Converges the negative-most Ritz pairs to relative residual ``gamma``
    (``/root/reference/sella/eigensolvers.py:31-112``); ``gamma <= 0``
    falls through to :func:`exact`. Returns ``(lams, V, AV)`` with the
    subspace rotated A-diagonal. ``A`` may be a dense array or any object
    with ``.dot`` / ``.shape`` (e.g. :class:`NumericalHessian`, whose
    probe recording the caller then feeds to the TS-BFGS update,
    ``/root/reference/sella/peswrapper.py:541-554``).
    """
    n = A.shape[0]
    if B is None:
        B = np.eye(n)
    if maxiter is None:
        maxiter = 2 * n + 1
    if gamma is None or gamma <= 0:
        return exact(A, gamma, P)
    if rng is None:
        rng = np.random.default_rng(0)

    if v0 is not None:
        V = modified_gram_schmidt(np.asarray(v0).reshape(-1, 1))
    else:
        P_lams, P_vecs, _ = exact(P, 0)
        nneg = max(1, int(np.sum(P_lams < 0)))
        V = modified_gram_schmidt(P_vecs[:, :nneg])

    AV = A.dot(V)

    symm = 2
    while True:
        Atilde = V.T @ symmetrize_Y_np(V, AV, symm)
        lams, vecs = sla.eigh(Atilde, V.T @ B @ V)
        nneg = max(1, int(np.sum(lams < 0)))
        # Rotate the subspace A-diagonal (simplifies residuals below)
        AV = AV @ vecs
        V = V @ vecs
        vecs = np.eye(V.shape[1])
        if V.shape[1] >= min(n, maxiter):
            return lams, V, AV

        Ytilde = symmetrize_Y_np(V, AV, symm)
        R = Ytilde[:, :nneg] - B @ V[:, :nneg] * lams[None, :nneg]
        Rnorm = np.linalg.norm(R, axis=0)

        # optbench.org early-exit hook (``eigensolvers.py:73-77``)
        if vref is not None:
            x0 = V[:, 0]
            if np.abs(x0 @ vref) > vreftol:
                return lams, V, AV

        # First unconverged Ritz pair of interest extends the subspace
        for seeking in range(nneg):
            if V.shape[1] == 1 or Rnorm[seeking] >= gamma * abs(lams[seeking]):
                ri = R[:, seeking]
                thetai = lams[seeking]
                break
        else:
            return lams, V, AV

        t = expand(V, Ytilde, P, B, lams, vecs, thetai, method, seeking)
        tnorm = np.linalg.norm(t)
        if tnorm < 1e-300 or not np.all(np.isfinite(t)):
            t = ri.copy()
            tnorm = np.linalg.norm(t)
        t = t / tnorm
        if np.linalg.norm(t - V @ (V.T @ t)) < 1e-2:
            # Expansion degenerated into the subspace: Lanczos step instead
            t = ri / np.linalg.norm(ri)

        t = modified_gram_schmidt(t[:, None], V)

        if t.shape[1] == 0:
            # Davidson failed to find a new direction: residuals, then random
            full_R = Ytilde - B @ V * lams[None, :]
            for j in range(full_R.shape[1]):
                t = modified_gram_schmidt(full_R[:, j][:, None], V)
                if t.shape[1] == 1:
                    break
            else:
                t = modified_gram_schmidt(rng.normal(size=(n, 1)), V)
                if t.shape[1] == 0:
                    return lams, V, AV

        V = np.hstack([V, t])
        AV = np.hstack([AV, A.dot(t).reshape(n, -1)])


def symmetrize_Y_np(S: np.ndarray, Y: np.ndarray, symm: Optional[int]):
    """Host wrapper around the jnp symmetrize_Y (returns numpy)."""
    return np.asarray(symmetrize_Y(S, Y, symm))
