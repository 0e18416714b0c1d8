"""Standalone numpy transcription of the reference's Cython
``sella.utilities.math`` (``/root/reference/sella/utilities/math.pyx``).

This module is deliberately INDEPENDENT of ``sella_tpu`` — it shares no
code with the repo's own MGS/pinv kernels (``sella_tpu/ops/linalg.py``),
so the golden-fixture parity experiment has no common kernel on its two
sides: a rank-decision bug in the repo's MGS cannot cancel out against
the same bug here.

Transcription notes (vs ``math.pyx:74-140`` ``mgs`` and ``:162-236``
``mppi``):

* control flow is copied statement-for-statement: per-column slot
  compaction, the ``maxiter`` re-orthogonalization loop with a
  ``normtot`` product restarted each pass, the Y-then-X projection
  order, the ``normtot < eps2`` column drop, the
  ``0 <= 1 - normtot <= eps1`` acceptance, and the ``-2`` (→
  ``RuntimeError``) exhaustion path;
* BLAS level-1 calls map to their numpy equivalents: ``ddot``/``daxpy``
  become ``v -= u * (u @ v)`` (bitwise identical to the
  negate-dot-then-axpy form, since IEEE negation is exact) and
  ``dnrm2`` becomes ``sqrt(v @ v)``.  dnrm2's overflow-safe scaled
  accumulation can differ from ``sqrt(dot)`` in the last ulp for
  pathological magnitudes; for the unit-scale Davidson/basis columns
  this kernel sees, both round identically (and the committed fixtures
  regenerate bit-identically under this transcription — verified in
  round 3).
"""
from __future__ import annotations

import numpy as np


def _mgs(X: np.ndarray, Y: np.ndarray | None = None, eps1: float = 1e-15,
         eps2: float = 1e-6, maxiter: int = 100) -> int:
    """In-place MGS of the columns of ``X`` against ``Y`` and earlier
    accepted columns of ``X``; returns the accepted rank ``m`` (columns
    ``X[:, :m]``), or raises on re-orthogonalization failure —
    ``math.pyx:74-140``."""
    nx = X.shape[1]
    ny = 0 if Y is None else Y.shape[1]

    m = 0
    for i in range(nx):
        if i != m:
            X[:, m] = X[:, i]
        v = X[:, m]
        v /= np.sqrt(v @ v)
        for _niter in range(maxiter):
            normtot = 1.0
            for j in range(ny):
                v -= Y[:, j] * (Y[:, j] @ v)
                norm = np.sqrt(v @ v)
                normtot *= norm
                if normtot < eps2:
                    break
                v /= norm
            if normtot < eps2:
                break
            for j in range(m):
                v -= X[:, j] * (X[:, j] @ v)
                norm = np.sqrt(v @ v)
                normtot *= norm
                if normtot < eps2:
                    break
                v /= norm
            if normtot < eps2:
                break
            elif 0.0 <= 1.0 - normtot <= eps1:
                m += 1
                break
        else:
            return -2

    X[:, m:] = 0.0
    return m


def modified_gram_schmidt(Xin, Yin=None, eps1=1.0e-15, eps2=1.0e-6,
                          maxiter=100):
    """``math.pyx:143-159``: orthonormalize a copy of ``Yin`` first,
    then orthonormalize a copy of ``Xin`` against it; return the
    accepted columns."""
    Xin = np.asarray(Xin, dtype=np.float64)
    if Xin.shape[1] == 0:
        return Xin

    if Yin is not None:
        Yout = np.array(Yin, dtype=np.float64, copy=True, order="C")
        ny = _mgs(Yout, None, eps1=eps1, eps2=eps2, maxiter=maxiter)
        if ny < 0:
            raise RuntimeError("MGS failed.")
        Yout = Yout[:, :ny]
    else:
        Yout = None

    Xout = np.array(Xin, dtype=np.float64, copy=True, order="C")
    nx = _mgs(Xout, Yout, eps1=eps1, eps2=eps2, maxiter=maxiter)
    if nx < 0:
        raise RuntimeError("MGS failed.")
    return Xout[:, :nx]


def pseudo_inverse(A, eps=1e-6):
    """``math.pyx:162-236`` ``mppi``/``pseudo_inverse``: SVD
    Moore-Penrose pseudo-inverse with the reference's return contract —
    ``(U, s, VT, Ainv, nsing)`` where, after the call, the leading
    ``m - nsing`` COLUMNS of the returned ``VT`` slot hold the nullspace
    basis of ``A`` (the reference writes VT's trailing rows, as columns,
    back into the first slots — ``math.pyx:212-217``)."""
    A = np.asarray(A, dtype=np.float64)
    n, m = A.shape
    minnm = min(n, m)

    U, s, VT = np.linalg.svd(A, full_matrices=True)

    Ainv = np.zeros((m, n), dtype=np.float64)
    nsing = 0
    for i in range(minnm):
        if abs(s[i]) < eps:
            continue
        nsing += 1
        Ainv += np.outer(VT[i], U[:, i]) / s[i]

    # math.pyx:210-217 — A's storage is recycled to hold VT^T, and VT's
    # leading columns are overwritten with the nullspace basis.
    VTout = np.zeros((m, m), dtype=np.float64)
    null = VT[nsing:].T  # (m, m - nsing)
    VTout[:, : null.shape[1]] = null
    return U, s, VTout, Ainv, nsing
