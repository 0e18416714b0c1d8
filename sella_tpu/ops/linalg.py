"""Dense linear-algebra substrate (layer-7 equivalent).

TPU-native replacements for the reference's Cython kernels
(``/root/reference/sella/utilities/math.pyx``) and scipy helpers:

* :func:`modified_gram_schmidt` — iterated MGS with rank detection
  (semantics of ``math.pyx:74-140``), host-side with column dropping.
* :func:`mgs_masked` — fixed-shape, jittable/vmappable variant where rank
  decisions become column masks instead of shape changes.
* :func:`pseudo_inverse` — SVD Moore-Penrose pinv + nullspace
  (``math.pyx:162-236``) via ``jnp.linalg.svd``.
* :func:`eigh_gen` — generalized symmetric eigenproblem via Cholesky
  reduction (replaces ``scipy.linalg.eigh(A, B)``).
* :func:`expm` — differentiable matrix exponential (scaling & squaring +
  Taylor); its jax derivatives replace ``scipy.linalg.expm_frechet`` and
  the closed-form Daleckii–Krein contraction
  (``/root/reference/sella/peswrapper.py:105-148``) — no custom closed
  form needed because jvp/vjp of the series *is* the Fréchet derivative.
* :func:`logm_psd_3x3` / :func:`logm_host` — matrix logarithm for the cell
  log-deformation parameterization (``peswrapper.py:85-102``).

All functions are pure; everything except the explicitly host-tagged
helpers works under ``jit``/``vmap``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Gram-Schmidt
# ---------------------------------------------------------------------------
def modified_gram_schmidt(
    X: np.ndarray,
    Y: Optional[np.ndarray] = None,
    eps1: float = 1e-15,
    eps2: float = 1e-6,
    maxiter: int = 100,
) -> np.ndarray:
    """Orthonormalize columns of X against Y and themselves, dropping
    linearly-dependent columns (host-side; returns a narrower matrix).

    Mirrors the reference kernel's semantics
    (``/root/reference/sella/utilities/math.pyx:74-140``): each candidate
    column is repeatedly orthogonalized until its norm is stable
    (re-orthogonalization), and dropped when the cumulative norm product
    falls below ``eps2``.
    """
    X = np.array(X, dtype=np.float64, copy=True)
    if X.ndim != 2:
        raise ValueError("X must be 2D")
    if X.shape[1] == 0:
        return X

    if Y is not None:
        Y = modified_gram_schmidt(Y, eps1=eps1, eps2=eps2, maxiter=maxiter)

    out = []
    for i in range(X.shape[1]):
        v = X[:, i].copy()
        norm = np.linalg.norm(v)
        if norm < eps2:
            continue
        v /= norm
        accepted = False
        for _ in range(maxiter):
            normtot = 1.0
            dead = False
            basis = ([] if Y is None else [Y[:, j] for j in range(Y.shape[1])])
            basis += out
            for u in basis:
                v -= u * (u @ v)
                norm = np.linalg.norm(v)
                normtot *= norm
                if normtot < eps2:
                    dead = True
                    break
                v /= norm
            if dead:
                break
            if 0.0 <= 1.0 - normtot <= eps1:
                accepted = True
                break
        if accepted:
            out.append(v)
    if not out:
        return np.empty((X.shape[0], 0))
    return np.stack(out, axis=1)


def mgs_masked(
    X: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    Y: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape masked Gram-Schmidt: jittable rank handling.

    Columns of ``X`` (shape ``(n, k)``) are orthonormalized sequentially
    against masked columns of ``Y`` and previously accepted columns of
    ``X``. Instead of dropping columns (data-dependent shapes don't jit),
    rejected columns are zeroed and flagged in the returned mask. Two
    orthogonalization passes per column give CGS2-level stability, which
    matches the reference's re-orthogonalized MGS for the conditioning
    seen in Davidson subspaces.
    """
    n, k = X.shape
    dtype = X.dtype
    if x_mask is None:
        x_mask = jnp.ones((k,), dtype=bool)
    if Y is None:
        Y = jnp.zeros((n, 0), dtype=dtype)
        y_mask = jnp.zeros((0,), dtype=bool)
    elif y_mask is None:
        y_mask = jnp.ones((Y.shape[1],), dtype=bool)

    Ym = Y * y_mask[None, :].astype(dtype)

    def body(i, carry):
        Q, mask = carry
        v = X[:, i]
        norm0 = jnp.linalg.norm(v)
        ok = x_mask[i] & (norm0 > eps)
        v = jnp.where(ok, v / jnp.where(norm0 > 0, norm0, 1.0), 0.0)
        for _ in range(2):  # two passes = re-orthogonalization
            v = v - Ym @ (Ym.T @ v)
            Qm = Q * mask[None, :].astype(dtype)
            v = v - Qm @ (Qm.T @ v)
        norm = jnp.linalg.norm(v)
        ok = ok & (norm > eps)
        v = jnp.where(ok, v / jnp.where(norm > 0, norm, 1.0), 0.0)
        Q = Q.at[:, i].set(v)
        mask = mask.at[i].set(ok)
        return Q, mask

    Q0 = jnp.zeros_like(X)
    m0 = jnp.zeros((k,), dtype=bool)
    Q, mask = jax.lax.fori_loop(0, k, body, (Q0, m0))
    return Q, mask


# ---------------------------------------------------------------------------
# SVD pseudo-inverse (math.pyx:162-236 equivalent)
# ---------------------------------------------------------------------------
def pseudo_inverse(A: jnp.ndarray, eps: float = 1e-6):
    """Moore-Penrose pseudo-inverse plus null-space basis.

    Returns ``(U, s, VT, Ainv, nsing)`` like the reference's
    ``pseudo_inverse`` (``math.pyx:219-236``): ``Ainv`` has the small
    singular values zeroed, and ``VT[: m - nsing]``'s rows transposed give
    the null space. ``nsing`` is a traced integer under jit.
    """
    U, s, VT = jnp.linalg.svd(A, full_matrices=True)
    keep = jnp.abs(s) > eps
    sinv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    m = A.shape[1]
    n = A.shape[0]
    k = min(n, m)
    Ainv = (VT[:k].T * sinv[None, :]) @ U[:, :k].T
    nsing = jnp.sum(keep)
    return U, s, VT, Ainv, nsing


def nullspace_host(A: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """Orthonormal basis of the null space of A (host, shape-dynamic)."""
    if A.size == 0:
        n = A.shape[1] if A.ndim == 2 else 0
        return np.eye(n)
    _, s, VT = np.linalg.svd(np.asarray(A), full_matrices=True)
    nsing = int(np.sum(np.abs(s) > eps))
    return VT[nsing:].T


def split_cons_subspace_host(
    drdx: np.ndarray, tol_factor: float = 1e-6, tol_abs: float = 1e-10
) -> Tuple[np.ndarray, np.ndarray]:
    """Split R^n into (row-space of drdx, complement) = (Ucons, Ufree).

    Host-side rank-revealing split matching the reference's pivoted-QR
    ``_split_cons_subspace`` (``/root/reference/sella/peswrapper.py:
    51-69``), plus an ABSOLUTE cutoff: rigid-motion constraints mapped
    into internal-coordinate space have identically-zero rows (internals
    are rigid-invariant), and a purely relative threshold would promote
    their 1e-14 roundoff into phantom constrained directions, emptying
    the free subspace.
    """
    import scipy.linalg as sla

    n = drdx.shape[1]
    if drdx.shape[0] == 0:
        return np.empty((n, 0)), np.eye(n)
    Q, R, _ = sla.qr(drdx.T, mode="full", pivoting=True, check_finite=False)
    diag = np.abs(np.diag(R))
    if diag.size and diag[0] > 0:
        thr = max(tol_factor * diag[0], tol_abs)
        ncons = int(np.sum(diag > thr))
    else:
        ncons = 0
    return Q[:, :ncons], Q[:, ncons:]


# ---------------------------------------------------------------------------
# Generalized symmetric eigenproblem
# ---------------------------------------------------------------------------
def eigh_gen(A: jnp.ndarray, B: jnp.ndarray):
    """Solve ``A v = lam B v`` for symmetric A, SPD B via Cholesky.

    Replaces ``scipy.linalg.eigh(A, B)`` used in the Davidson Galerkin
    solve (``/root/reference/sella/eigensolvers.py:58``) and the
    BFGS_auto test (``hessian_update.py:85``). Jittable; B must be
    positive definite (true for overlap matrices of masked-orthonormal
    bases after regularization).
    """
    L = jnp.linalg.cholesky(B)
    Linv = jax.scipy.linalg.solve_triangular(L, jnp.eye(A.shape[0], dtype=A.dtype), lower=True)
    C = Linv @ A @ Linv.T
    C = 0.5 * (C + C.T)
    lams, W = jnp.linalg.eigh(C)
    V = Linv.T @ W
    return lams, V


# ---------------------------------------------------------------------------
# Matrix exponential / logarithm (cell parameterization substrate)
# ---------------------------------------------------------------------------
def expm(A: jnp.ndarray, order: int = 12, squarings: int = 8) -> jnp.ndarray:
    """Differentiable matrix exponential: scaling & squaring + Taylor.

    Fixed iteration counts (jit-friendly). For the 3x3 log-deformation
    matrices of the cell path (``/root/reference/sella/peswrapper.py:
    1855-1889``) with ``order=12, squarings=8`` this is accurate to
    ~1e-15 for ``||A|| <~ 10``. Because it is plain jnp, ``jax.jvp``
    through it *is* the Fréchet derivative — replacing both
    ``scipy.linalg.expm_frechet`` and the reference's Daleckii–Krein
    closed form (``peswrapper.py:105-148``).
    """
    n = A.shape[-1]
    scale = 2.0 ** (-squarings)
    X = A * scale
    eye = jnp.eye(n, dtype=A.dtype)
    term = eye
    out = eye
    for k in range(1, order + 1):
        term = term @ X / k
        out = out + term
    for _ in range(squarings):
        out = out @ out
    return out


def expm_frechet(A: jnp.ndarray, E: jnp.ndarray) -> jnp.ndarray:
    """Directional (Fréchet) derivative of expm at A along E, via jvp."""
    return jax.jvp(expm, (A,), (E,))[1]


def logm_host(F: np.ndarray) -> np.ndarray:
    """Real matrix logarithm of a well-conditioned 3x3 (host-side).

    Uses the eigendecomposition closed form like the reference's
    ``_logm_3x3`` (``/root/reference/sella/peswrapper.py:85-102``) with a
    scipy fallback for defective inputs. Host-only (nonsymmetric eig is
    unsupported on TPU); the cell path only needs logm at
    (re-)initialization events, which are host-side anyway.
    """
    import scipy.linalg as sla

    F = np.asarray(F, dtype=np.float64)
    lam, V = np.linalg.eig(F)
    if np.linalg.cond(V) > 1e10:
        return np.real(sla.logm(F))
    return np.real(V @ np.diag(np.log(lam)) @ np.linalg.inv(V))


# ---------------------------------------------------------------------------
# Robust batched symmetric eigh (TPU f64-emulation workaround + fast path)
# ---------------------------------------------------------------------------
def eigh_refined(A: jnp.ndarray, sweeps: int = 2,
                 cluster_tol: float = 1e-5):
    """Batched symmetric eigh: f32 factorization + f64 Ogita–Aishima
    refinement.

    Motivation (measured on the v5e target): ``jnp.linalg.eigh`` in the
    emulated-f64 path returns NaN eigenpairs for some finite singular
    matrices with degenerate eigenvalue clusters (e.g. the Gram matrix
    ``B B^T`` of a redundant internal-coordinate Jacobian, whose zero
    eigenvalue has multiplicity nint - (3n-6)).  The native f32 eigh is
    robust; this routine factors in f32 and recovers near-f64 accuracy
    with ``sweeps`` Newton-type refinement sweeps of pure batched
    matmuls (MXU-friendly — also several times faster than the emulated
    f64 eigh, which profiling shows dominates the batched step cost).

    One sweep: with ``C = I - V^T V`` (orthogonality defect) and
    ``S = V^T A V`` (near-diagonal),

    * eigenvalues  ``lam_i = S_ii / (1 - C_ii)``  (Rayleigh quotient),
    * correction   ``E_ij = (S_ij + lam_j C_ij) / (lam_j - lam_i)`` for
      separated pairs, ``E_ij = C_ij / 2`` inside a cluster (pairs with
      ``|lam_i - lam_j| <= cluster_tol * max|lam|`` — only the invariant
      subspace is well defined there, and the symmetric split
      orthonormalizes without chasing an arbitrary in-cluster rotation),
    * update       ``V <- V (I + E)``.

    Error contracts quadratically for separated eigenvalues; clustered
    blocks converge as an invariant subspace.  Eigenvalues are re-sorted
    ascending after refinement (callers index top/bottom blocks).

    Returns ``(lams, V)`` shaped like ``jnp.linalg.eigh``.  Works for
    single matrices or any number of leading batch dims.
    """
    dtype = A.dtype
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    _, V32 = jnp.linalg.eigh(A.astype(jnp.float32))
    V = V32.astype(dtype)
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=dtype)

    for _ in range(sweeps):
        VT = jnp.swapaxes(V, -1, -2)
        C = eye - VT @ V
        S = VT @ (A @ V)
        S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
        diagC = jnp.diagonal(C, axis1=-2, axis2=-1)
        lams = jnp.diagonal(S, axis1=-2, axis2=-1) / (1.0 - diagC)
        scale = jnp.max(jnp.abs(lams), axis=-1, keepdims=True)
        sep = cluster_tol * jnp.maximum(scale, 1e-300)
        dl = lams[..., None, :] - lams[..., :, None]      # lam_j - lam_i
        separated = jnp.abs(dl) > sep[..., None]
        E_sep = (S + lams[..., None, :] * C) / jnp.where(separated, dl, 1.0)
        E = jnp.where(separated, E_sep, 0.5 * C)
        E = jnp.where(jnp.broadcast_to(eye, E.shape) > 0.5, 0.5 * C, E)
        V = V + V @ E

    VT = jnp.swapaxes(V, -1, -2)
    diagG = jnp.diagonal(VT @ V, axis1=-2, axis2=-1)
    lams = jnp.einsum("...ij,...jk,...ki->...i", VT, A, V) / diagG
    V = V / jnp.sqrt(diagG)[..., None, :]
    order = jnp.argsort(lams, axis=-1)
    lams = jnp.take_along_axis(lams, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return lams, V


def _interleave_perm(n: int):
    """Static permutation machinery for the adjacent-pair parallel
    Jacobi: with the basis kept in the round-robin "tournament"
    interleaved layout, every round rotates pairs (0,1), (2,3), ... and
    then re-pairs by applying ONE fixed permutation. Returns
    (idx0, perm): ``idx0`` maps original -> initial interleaved layout,
    ``perm`` is the between-rounds relabeling. Host-side, static."""
    import numpy as _np

    def interleaved(players):
        half = len(players) // 2
        top = players[:half]
        bot = players[:half - 1:-1]          # reversed back half
        out = []
        for a, b in zip(top, bot):
            out += [a, b]
        return out

    players = list(range(n))
    L0 = interleaved(players)
    rotated = [players[0], players[-1]] + players[1:-1]
    L1 = interleaved(rotated)
    pos = {pl: i for i, pl in enumerate(L0)}
    perm = _np.asarray([pos[pl] for pl in L1], _np.int32)
    return _np.asarray(L0, _np.int32), perm


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 8):
    """Batched symmetric eigh via parallel-order cyclic Jacobi with an
    interleaved pair layout — pure reshape/elementwise/static-permute
    XLA, no eigh custom call, no scatters.

    Why: XLA's batched ``eigh`` on TPU costs ~0.9 s for (4096, 72, 72)
    in f32 (measured v5e) and dominates the ensemble step; a first
    gather/scatter Jacobi attempt was no faster (TPU scatters are
    slow). This version keeps the matrix in the round-robin tournament
    ordering so the n/2 simultaneous Givens rotations always act on
    ADJACENT index pairs: the row and column updates are reshapes +
    elementwise arithmetic, and moving to the next round's pairing is
    one static-index ``take`` (a layout copy XLA handles at HBM
    bandwidth). One identical ``fori_loop`` body covers all
    sweeps*(n-1) rounds.

    Fixed ``sweeps`` (quadratic convergence; 8 reaches the f32
    off-diagonal floor for n <= 128 from cold starts). Computes in f32
    — the accuracy class of the ``eigh_f32`` fast path it replaces —
    and returns eigenvalues ascending with matching eigenvector
    columns, in A's dtype."""
    dt = A.dtype
    n = A.shape[-1]
    if n % 2:
        # pad with one decoupled huge diagonal entry; it stays an exact
        # eigenpair, sorts last (ascending), and is sliced off below
        pad = jnp.zeros(A.shape[:-2] + (n + 1, n + 1), A.dtype)
        pad = pad.at[..., :n, :n].set(A)
        pad = pad.at[..., n, n].set(1e30)
        lams, V = jacobi_eigh(pad, sweeps)
        return lams[..., :n], V[..., :n, :n]
    idx0, perm = _interleave_perm(n)
    half = n // 2
    batch = A.shape[:-2]
    Af = A.astype(jnp.float32)
    # rebase into the interleaved tournament layout
    Af = jnp.take(jnp.take(Af, idx0, axis=-2), idx0, axis=-1)
    V0 = jnp.broadcast_to(
        jnp.eye(n, dtype=jnp.float32)[idx0].T, batch + (n, n)
    )

    def one_round(_, carry):
        Ak, Vk = carry
        diag = jnp.diagonal(Ak, axis1=-2, axis2=-1)
        app = diag[..., 0::2]                    # (..., n/2)
        aqq = diag[..., 1::2]
        apq = jnp.diagonal(Ak, offset=1, axis1=-2, axis2=-1)[..., 0::2]
        # classical Jacobi angle: tan(2t) = 2 a_pq / (a_qq - a_pp)
        tau = (aqq - app) / jnp.where(apq == 0, 1.0, 2.0 * apq)
        t = jnp.where(
            tau == 0,
            1.0,  # a_pp == a_qq with a_pq != 0: rotate 45 degrees
            jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
        )
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # left rotation on row pairs: reshape, no indexing
        Ar = Ak.reshape(batch + (half, 2, n))
        r0, r1 = Ar[..., 0, :], Ar[..., 1, :]
        Ak = jnp.stack(
            [c[..., None] * r0 - s[..., None] * r1,
             s[..., None] * r0 + c[..., None] * r1], axis=-2
        ).reshape(batch + (n, n))
        # right rotation on column pairs
        Ac = Ak.reshape(batch + (n, half, 2))
        c0, c1 = Ac[..., 0], Ac[..., 1]
        Ak = jnp.stack(
            [c[..., None, :] * c0 - s[..., None, :] * c1,
             s[..., None, :] * c0 + c[..., None, :] * c1], axis=-1
        ).reshape(batch + (n, n))
        # eigenvector columns follow the right rotation
        Vc = Vk.reshape(batch + (n, half, 2))
        v0, v1 = Vc[..., 0], Vc[..., 1]
        Vk = jnp.stack(
            [c[..., None, :] * v0 - s[..., None, :] * v1,
             s[..., None, :] * v0 + c[..., None, :] * v1], axis=-1
        ).reshape(batch + (n, n))
        # advance to the next round-robin pairing (static relabel)
        Ak = jnp.take(jnp.take(Ak, perm, axis=-2), perm, axis=-1)
        Vk = jnp.take(Vk, perm, axis=-1)
        return (Ak, Vk)

    Af, V = jax.lax.fori_loop(0, sweeps * (n - 1), one_round, (Af, V0))
    lams = jnp.diagonal(Af, axis1=-2, axis2=-1)
    order = jnp.argsort(lams, axis=-1)
    lams = jnp.take_along_axis(lams, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return lams.astype(dt), V.astype(dt)


def _default_eigh_mode() -> str:
    """Resolve the session-wide batched-eigh mode.

    ``SELLA_TPU_EIGH`` overrides; otherwise native ``f64`` everywhere.
    Whole-run benches on v5e showed the refined path as a *default*
    costs real step time (LJ4 4096-lane 84.4 -> 34.5 searches/s; EMT
    32.3 -> 27.5) while the emulated-f64 NaN failure is confined to
    structurally degenerate spectra — those call sites (the internal
    tiers' singular Gram ``B B^T``, zero eigenvalue of multiplicity
    nint - nred) call :func:`eigh_refined` directly instead."""
    import os

    mode = os.environ.get("SELLA_TPU_EIGH", "").strip().lower()
    if mode in ("f64", "f32", "refined"):
        return mode
    return "f64"


def batched_eigh(A: jnp.ndarray, mode: Optional[str] = None):
    """Single chokepoint for every batched symmetric eigh in the
    ensemble tiers. ``mode``: ``f64`` (native), ``f32`` (factor in f32,
    cast back — the opt-in ``eigh_f32`` fast path), ``refined``
    (f32 factor + f64 refinement sweeps), ``robust`` (native f64 on
    CPU where LAPACK handles degenerate clusters and is bit-stable for
    the test suite; refined on accelerator backends whose emulated-f64
    eigh NaNs there), or None → session default."""
    if mode is None:
        mode = _default_eigh_mode()
    if mode == "robust":
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        mode = "f64" if backend == "cpu" else "refined"
    if mode == "f64" or A.dtype != jnp.float64:
        return jnp.linalg.eigh(A)
    if mode == "f32":
        lams, V = jnp.linalg.eigh(A.astype(jnp.float32))
        return lams.astype(A.dtype), V.astype(A.dtype)
    return eigh_refined(A)


# ---------------------------------------------------------------------------
# Misc small helpers
# ---------------------------------------------------------------------------
def sym(M: jnp.ndarray) -> jnp.ndarray:
    """Symmetrize (roundoff cleanup), as in ``hessian_update.py:104-109``."""
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / determinant).

    Every traced cell inversion goes through here instead of
    ``jnp.linalg.inv``: the closed form is differentiable, avoids the
    LU custom call (which some AOT compile paths cannot lower for f64),
    and is faster for the 3x3 cells that dominate this codebase — the
    same motivation as the reference's closed-form ``_logm_3x3``
    (``peswrapper.py:85-102``)."""
    r0, r1, r2 = A[0], A[1], A[2]
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    det = jnp.dot(r0, c0)
    return jnp.stack([c0, c1, c2], axis=1) / det


def lstsq(A: jnp.ndarray, b: jnp.ndarray, rcond: float = 1e-12) -> jnp.ndarray:
    """Minimum-norm least-squares solve via SVD (jittable).

    ``jnp.linalg.lstsq`` equivalent that's robust for rank-deficient A
    (the Lagrange-multiplier solve ``lstsq(drdx.T, g)`` at
    ``/root/reference/sella/peswrapper.py:476-481`` needs this).
    """
    U, s, VT = jnp.linalg.svd(A, full_matrices=False)
    cutoff = rcond * jnp.max(s, initial=0.0)
    keep = s > cutoff
    sinv = jnp.where(keep, 1.0 / jnp.where(keep, s, 1.0), 0.0)
    return VT.T @ (sinv * (U.T @ b).T).T if b.ndim > 1 else VT.T @ (sinv * (U.T @ b))
