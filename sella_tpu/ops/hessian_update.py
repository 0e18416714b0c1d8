"""Multi-secant quasi-Newton Hessian updates (curvature layer, C6).

Pure-jnp reimplementation of ``/root/reference/sella/hessian_update.py``:
TS-BFGS (default), BFGS, BFGS_auto, PSB, DFP, SR1, Greenstadt, plus the
three Y-symmetrization schemes enforcing the multi-secant consistency
condition ``S^T Ytilde = Ytilde^T S``. Everything here is a pure function
of ``(B, S, Y)`` so the same code runs eagerly in the sequential driver,
under ``jit`` in the batched ensemble step, and under ``vmap`` across
thousands of concurrent searches.

The number of secant columns is a static (trace-time) shape, so the
sequential column loop in :func:`symmetrize_Y2` unrolls at trace time —
the reference's dynamic loop (``hessian_update.py:12-24``) poses no
jit problem because ``nvecs`` is never data-dependent.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .linalg import eigh_gen, lstsq, sym


def symmetrize_Y2(S: jnp.ndarray, Y: jnp.ndarray) -> jnp.ndarray:
    """Projected iterative symmetrization (scheme 2, the default).

    Column i of the correction dY is chosen in span(S[:, :i]) such that
    the symmetry residual against all previous columns vanishes
    (``/root/reference/sella/hessian_update.py:12-24``).
    """
    _, nvecs = S.shape
    dY = jnp.zeros_like(Y)
    YTS = Y.T @ S
    dYTS = jnp.zeros_like(YTS)
    STS = S.T @ S
    for i in range(1, nvecs):
        rhs = YTS[i, :i].T - YTS[:i, i] - dYTS[:i, i]
        coef = lstsq(STS[:i, :i], rhs)
        dY = dY.at[:, i].set(-S[:, :i] @ coef)
        dYTS = dYTS.at[i, :].set(-STS[:, :i] @ coef)
    return dY


def symmetrize_Y(
    S: jnp.ndarray, Y: jnp.ndarray, symm: Optional[int]
) -> jnp.ndarray:
    """Return Ytilde with ``S^T Ytilde`` symmetric (3 schemes + passthrough).

    Scheme 0 corrects within span(S), scheme 1 within span(Y), scheme 2 is
    the iterative projected scheme (``hessian_update.py:27-37``).
    """
    if symm is None or S.shape[1] == 1:
        return Y
    asym = jnp.tril(S.T @ Y - Y.T @ S, -1).T
    if symm == 0:
        return Y + S @ lstsq(S.T @ S, asym)
    elif symm == 1:
        return Y + Y @ lstsq(S.T @ Y, asym)
    elif symm == 2:
        return Y + symmetrize_Y2(S, Y)
    raise ValueError(f"Unknown symmetrization method {symm}")


def bootstrap_scaled_identity(
    S: jnp.ndarray, Ytilde: jnp.ndarray, dim: int
) -> jnp.ndarray:
    """Initial B as a scaled identity from the geometric-mean Ritz value.

    (``/root/reference/sella/hessian_update.py:59-67``.)
    """
    thetas = jnp.linalg.eigvalsh(sym(S.T @ Ytilde))
    thetas_abs = jnp.maximum(jnp.abs(thetas), 1e-12)
    lam0 = jnp.exp(jnp.mean(jnp.log(thetas_abs)))
    return lam0 * jnp.eye(dim, dtype=S.dtype)


# -- individual multi-secant update deltas (each returns Bplus - B) ---------
# All K x K subproblem solves go through the SVD-based ``lstsq`` rather
# than ``jnp.linalg.solve``: XLA lowers the latter to an LU
# decomposition that TPU implements only for f32/c64, so LU would pin
# the eager update family to the host. lstsq is TPU-resident for f64
# and additionally tolerates rank-deficient secant sets.
def _ms_bfgs(B, S, Y):
    return Y @ lstsq(Y.T @ S, Y.T) - B @ S @ lstsq(S.T @ B @ S, S.T @ B)


def _ms_ts_bfgs(B, S, Y, lams, vecs):
    """TS-BFGS: metric blends Y-overlap with |B|-weighted S-overlap
    (``hessian_update.py:118-125``)."""
    J = Y - B @ S
    X1 = S.T @ Y @ Y.T
    absBS = vecs @ (jnp.abs(lams)[:, None] * (vecs.T @ S))
    X2 = S.T @ absBS @ absBS.T
    XS = X1 + X2
    U = lstsq(XS @ S, XS).T
    UJT = U @ J.T
    return (UJT + UJT.T) - U @ (J.T @ S) @ U.T


def _ms_psb(B, S, Y):
    J = Y - B @ S
    U = lstsq(S.T @ S, S.T).T
    UJT = U @ J.T
    return (UJT + UJT.T) - U @ (J.T @ S) @ U.T


def _ms_dfp(B, S, Y):
    J = Y - B @ S
    U = lstsq(S.T @ Y, Y.T).T
    UJT = U @ J.T
    return (UJT + UJT.T) - U @ (J.T @ S) @ U.T


def _ms_sr1(B, S, Y):
    YBS = Y - B @ S
    return YBS @ lstsq(YBS.T @ S, YBS.T)


def _ms_greenstadt(B, S, Y):
    J = Y - B @ S
    MS = B @ S
    U = lstsq(S.T @ MS, MS.T).T
    UJT = U @ J.T
    return (UJT + UJT.T) - U @ (J.T @ S) @ U.T


UPDATE_METHODS = ("TS-BFGS", "BFGS", "BFGS_auto", "PSB", "DFP", "SR1",
                  "Greenstadt")


def update_H(
    B: Optional[jnp.ndarray],
    S: jnp.ndarray,
    Y: jnp.ndarray,
    method: str = "TS-BFGS",
    symm: Optional[int] = 2,
    lams: Optional[jnp.ndarray] = None,
    vecs: Optional[jnp.ndarray] = None,
    dim: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-secant quasi-Newton update of B with secants (S, Y).

    Functional equivalent of the reference ``update_H``
    (``/root/reference/sella/hessian_update.py:40-111``); ``B=None``
    bootstraps a scaled identity. The tiny-step no-op guard (skip when
    ``||S|| < 1e-8`` for a single secant) is the caller's responsibility
    in jit contexts (use ``jnp.where`` on the result); eager callers get
    it here when S is 1-D.
    """
    if S.ndim == 1:
        if float(jnp.linalg.norm(S)) < 1e-8 and B is not None:
            return B
        S = S[:, None]
    if Y.ndim == 1:
        Y = Y[:, None]

    Ytilde = symmetrize_Y(S, Y, symm)

    if B is None:
        d = S.shape[0] if dim is None else dim
        B = bootstrap_scaled_identity(S, Ytilde, d)

    if method == "BFGS_auto":
        # Use BFGS only when both B and S^T Ytilde are positive definite
        # (``hessian_update.py:80-87``). The decision is data-dependent,
        # so it is implemented as a traceable select — both deltas are
        # computed and ``jnp.where`` picks — making the reference's
        # recommended minimization default usable under jit/vmap (the
        # reference's Python branch is eager-only). The matrices are
        # tiny (nsecant ≤ subspace size), so the double compute is
        # noise next to one batched eigh.
        if lams is None or vecs is None:
            lams, vecs = jnp.linalg.eigh(B)
        lams_sty, _ = eigh_gen(sym(S.T @ Ytilde), sym(S.T @ S))
        use_bfgs = jnp.all(lams > 0) & jnp.all(lams_sty > 0)
        d_ts = _ms_ts_bfgs(B, S, Ytilde, lams, vecs)
        d_bfgs = _ms_bfgs(B, S, Ytilde)
        # NaNs/infs from the (unselected) BFGS solve on an indefinite
        # system must not leak through the select
        d_bfgs = jnp.where(jnp.isfinite(d_bfgs), d_bfgs, 0.0)
        return sym(B + jnp.where(use_bfgs, d_bfgs, d_ts))

    if method == "TS-BFGS":
        if lams is None or vecs is None:
            lams, vecs = jnp.linalg.eigh(B)
        delta = _ms_ts_bfgs(B, S, Ytilde, lams, vecs)
    elif method == "BFGS":
        delta = _ms_bfgs(B, S, Ytilde)
    elif method == "PSB":
        delta = _ms_psb(B, S, Ytilde)
    elif method == "DFP":
        delta = _ms_dfp(B, S, Ytilde)
    elif method == "SR1":
        delta = _ms_sr1(B, S, Ytilde)
    elif method == "Greenstadt":
        delta = _ms_greenstadt(B, S, Ytilde)
    else:
        raise ValueError(f"Unknown update method {method}")

    return sym(B + delta)
