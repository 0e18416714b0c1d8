"""Matrix-free and approximate-Hessian operators (curvature layer, C7).

* :class:`NumericalHessian` — finite-difference Hessian action that
  records every probe pair ``(v, Av)`` for later absorption into the
  quasi-Newton Hessian. This recording is the reference's key trick
  ("full exploitation of partial Hessian diagonalization",
  ``/root/reference/sella/linalg.py:14-101``): no gradient call is ever
  wasted — every Davidson matvec doubles as a TS-BFGS secant.
* :class:`ApproximateHessian` — dense quasi-Newton Hessian with lazy
  eigendecomposition (``linalg.py:143-353``). The reference's torch-CUDA
  mirror dissolves here: arrays are XLA buffers and live in HBM already.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from .hessian_update import update_H


class NumericalHessian:
    """Matrix-free FD Hessian ``Av ≈ (g(x0 + eta v/|v|) - g0) |v| / eta``.

    The displacement sign is canonicalized exactly like the reference
    (``/root/reference/sella/linalg.py:50-87``): displace along descent if
    v has a gradient component, else toward the origin along v, else so
    the first significant component of v is positive — pure
    reproducibility conventions.

    ``func(x) -> (f, g)`` is the calculator boundary; for jax-native
    potentials it is a jitted gradient so the Davidson loop stays
    on-device.
    """

    def __init__(
        self,
        func: Callable[[np.ndarray], Tuple[float, np.ndarray]],
        x0: np.ndarray,
        g0: np.ndarray,
        eta: float,
        threepoint: bool = False,
        Uproj: Optional[np.ndarray] = None,
    ) -> None:
        self.func = func
        self.x0 = np.asarray(x0, dtype=np.float64).copy()
        self.g0 = np.asarray(g0, dtype=np.float64).copy()
        self.eta = eta
        self.threepoint = threepoint
        self.calls = 0
        self.Uproj = None if Uproj is None else np.asarray(Uproj)
        self.ntrue = len(self.x0)
        n = self.ntrue if self.Uproj is None else self.Uproj.shape[1]
        self.shape = (n, n)
        self.Vs = np.empty((self.ntrue, 0))
        self.AVs = np.empty((self.ntrue, 0))

    @staticmethod
    def _canonical_sign(v: np.ndarray, g0: np.ndarray, x0: np.ndarray) -> float:
        vdotg = v @ g0
        vdotx = v @ x0
        if abs(vdotg) > 1e-4:
            return 2.0 * (vdotg < 0) - 1.0
        if abs(vdotx) > 1e-4:
            return 2.0 * (vdotx < 0) - 1.0
        for vi in v:
            if vi > 1e-4:
                return 1.0
            if vi < -1e-4:
                return -1.0
        return 1.0

    def matvec(self, v: np.ndarray) -> np.ndarray:
        self.calls += 1
        v = np.asarray(v, dtype=np.float64).ravel()
        if self.Uproj is not None:
            v = self.Uproj @ v

        vnorm = np.linalg.norm(v)
        if vnorm < 1e-12:
            return np.zeros(self.shape[1])
        vnorm *= self._canonical_sign(v, self.g0, self.x0)

        _, gplus = self.func(self.x0 + self.eta * v / vnorm)
        if self.threepoint:
            _, gminus = self.func(self.x0 - self.eta * v / vnorm)
            Av = vnorm * (np.asarray(gplus) - np.asarray(gminus)) / (2 * self.eta)
        else:
            Av = vnorm * (np.asarray(gplus) - self.g0) / self.eta

        self.Vs = np.hstack((self.Vs, v.reshape(self.ntrue, 1)))
        self.AVs = np.hstack((self.AVs, Av.reshape(self.ntrue, 1)))

        if self.Uproj is not None:
            Av = self.Uproj.T @ Av
        return Av

    def dot(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X)
        if X.ndim == 1:
            return self.matvec(X)
        return np.stack([self.matvec(X[:, i]) for i in range(X.shape[1])], axis=1)

    def __add__(self, other):
        return MatrixSum(self, other)


class MatrixSum:
    """Deferred sum of operators / arrays (``linalg.py:104-140``)."""

    def __init__(self, *matrices) -> None:
        self.shape = matrices[0].shape
        dense = None
        self.matrices = []
        for m in matrices:
            if isinstance(m, np.ndarray):
                dense = m if dense is None else dense + m
            else:
                self.matrices.append(m)
        if dense is not None:
            self.matrices.append(dense)

    def matvec(self, v: np.ndarray) -> np.ndarray:
        out = np.zeros_like(np.asarray(v, dtype=np.float64))
        for m in self.matrices:
            out = out + (m @ v if isinstance(m, np.ndarray) else m.matvec(v))
        return out

    def dot(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X)
        if X.ndim == 1:
            return self.matvec(X)
        return np.stack([self.matvec(X[:, i]) for i in range(X.shape[1])], axis=1)

    def __add__(self, other):
        return MatrixSum(*self.matrices, other)


class ApproximateHessian:
    """Dense quasi-Newton Hessian with lazy eigendecomposition.

    Sequential-API counterpart of ``/root/reference/sella/linalg.py:
    143-353``. ``B is None`` means "uninitialized" and acts as identity.
    The batched path carries B directly in the SearchState pytree and
    calls :func:`sella_tpu.ops.hessian_update.update_H` — this class is
    the stateful convenience wrapper.
    """

    def __init__(
        self,
        dim: int,
        ncart: int = 0,
        B0: Optional[np.ndarray] = None,
        update_method: str = "TS-BFGS",
        symm: int = 2,
        initialized: bool = False,
    ) -> None:
        self.dim = dim
        self.ncart = ncart
        self.shape = (dim, dim)
        self.update_method = update_method
        self.symm = symm
        self.initialized = initialized
        self._evals = None
        self._evecs = None
        self.set_B(B0)

    def set_B(self, target) -> None:
        if target is None:
            self.B = None
            self.initialized = False
        elif np.isscalar(target):
            self.B = float(target) * np.eye(self.dim)
        else:
            target = np.asarray(target, dtype=np.float64)
            assert target.shape == self.shape
            self.B = target
            self.initialized = True
        self._evals = None
        self._evecs = None

    def _compute_eigen(self) -> None:
        if self._evals is None and self.B is not None:
            self._evals, self._evecs = np.linalg.eigh(self.B)

    @property
    def evals(self):
        self._compute_eigen()
        return self._evals

    @evals.setter
    def evals(self, value):
        self._evals = value

    @property
    def evecs(self):
        self._compute_eigen()
        return self._evecs

    @evecs.setter
    def evecs(self, value):
        self._evecs = value

    def update(self, dx: np.ndarray, dg: np.ndarray) -> None:
        """Absorb secants; bootstraps the Cartesian block when fresh
        (``linalg.py:274-304``)."""
        if not self.initialized:
            dx = np.atleast_2d(np.asarray(dx).T).T
            dg = np.atleast_2d(np.asarray(dg).T).T
            B = np.zeros(self.shape) if self.B is None else self.B.copy()
            blk = update_H(
                None,
                dx[: self.ncart or self.dim],
                dg[: self.ncart or self.dim],
                method=self.update_method,
                symm=self.symm,
            )
            nc = self.ncart or self.dim
            B[:nc, :nc] = np.asarray(blk)
            self.set_B(B)
            return
        lams, vecs = self.evals, self.evecs
        result = update_H(
            self.B, np.asarray(dx), np.asarray(dg),
            method=self.update_method, symm=self.symm,
            lams=None if lams is None else lams,
            vecs=None if vecs is None else vecs,
        )
        self.set_B(np.asarray(result))

    def project(self, U: np.ndarray) -> "ApproximateHessian":
        Bproj = None if self.B is None else U.T @ self.B @ U
        return ApproximateHessian(
            U.shape[1], 0, Bproj, self.update_method, self.symm
        )

    def asarray(self) -> np.ndarray:
        return np.eye(self.dim) if self.B is None else self.B

    def matvec(self, v):
        return v if self.B is None else self.B @ v

    def dot(self, X):
        return X if self.B is None else self.B @ X

    def __matmul__(self, other):
        return self.dot(other)

    def __add__(self, other):
        initialized = self.initialized
        if isinstance(other, ApproximateHessian):
            initialized = initialized and other.initialized
            other = other.B
        if not self.initialized or other is None:
            tot = None
            initialized = False
        else:
            tot = self.B + other
        return ApproximateHessian(
            self.dim, self.ncart, tot, self.update_method, self.symm,
            initialized=initialized,
        )
