"""numpy stand-in for the reference's Cython ``sella.utilities.math``.

Delegates to sella_tpu's host kernels, which implement the same
algorithms (iterated MGS with re-orthogonalization + rank drop; SVD
Moore-Penrose pseudo-inverse returning the nullspace split) —
``sella_tpu/ops/linalg.py`` vs ``/root/reference/sella/utilities/math.pyx``.
Only ``modified_gram_schmidt`` is consumed by the reference's live code
(``eigensolvers.py:5``, ``peswrapper.py:14``).
"""
from __future__ import annotations

import numpy as np

from sella_tpu.ops.linalg import modified_gram_schmidt as _mgs


def modified_gram_schmidt(Xin, Yin=None, eps1=1.0e-15, eps2=1.0e-6,
                          maxiter=100):
    Xin = np.asarray(Xin, dtype=np.float64)
    if Xin.shape[1] == 0:
        return Xin
    Y = None if Yin is None else np.asarray(Yin, dtype=np.float64)
    return _mgs(Xin, Y, eps1=eps1, eps2=eps2, maxiter=maxiter)


def pseudo_inverse(A, eps=1e-6):
    """SVD pinv with the reference's (U, s, VT, Ainv, nsing) return
    contract (``math.pyx:219-236``): VT's leading columns hold the
    nullspace basis of A. Unused by the reference's live code; provided
    for import completeness only."""
    A = np.asarray(A, dtype=np.float64)
    n, m = A.shape
    U, s, VT = np.linalg.svd(A, full_matrices=True)
    nsing = int(np.sum(np.abs(s) > eps))
    Ainv = (VT[:nsing].T / s[:nsing]) @ U[:, :nsing].T
    null = VT[nsing:].T  # (m, m - nsing)
    VTout = np.zeros((m, m))
    VTout[:, : null.shape[1]] = null
    return U, s, VTout, Ainv, nsing
