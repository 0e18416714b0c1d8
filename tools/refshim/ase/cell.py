"""Minimal ``ase.cell.Cell``: a (3, 3) array with ``.array`` and
``angles()`` (the two entry points the reference touches,
``/root/reference/sella/peswrapper.py:1541,1857``)."""
from __future__ import annotations

import numpy as np


class Cell:
    def __init__(self, array=None):
        if array is None:
            array = np.zeros((3, 3))
        if isinstance(array, Cell):
            array = array.array
        arr = np.asarray(array, dtype=np.float64)
        if arr.shape == (3,):
            arr = np.diag(arr)
        if arr.shape != (3, 3):
            raise ValueError(f"bad cell shape {arr.shape}")
        self.array = arr

    def __array__(self, dtype=None, copy=None):
        a = self.array
        if dtype is not None:
            a = a.astype(dtype)
        return np.array(a) if copy else a

    def angles(self) -> np.ndarray:
        """Cell angles alpha, beta, gamma in degrees."""
        a, b, c = self.array
        lengths = np.array(
            [np.linalg.norm(a), np.linalg.norm(b), np.linalg.norm(c)]
        )
        pairs = [(b, c), (a, c), (a, b)]
        out = []
        for i, (u, v) in enumerate(pairs):
            nu = lengths[(i + 1) % 3] * lengths[(i + 2) % 3]
            cosang = float(u @ v) / nu if nu > 0 else 0.0
            out.append(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
        return np.array(out)

    def lengths(self) -> np.ndarray:
        return np.linalg.norm(self.array, axis=1)

    def reciprocal(self) -> "Cell":
        """Reciprocal lattice rows (no 2*pi factor), ASE convention."""
        return Cell(np.linalg.pinv(self.array).transpose())

    def any(self, *args, **kwargs):
        return self.array.any(*args, **kwargs)

    def all(self, *args, **kwargs):
        return self.array.all(*args, **kwargs)

    @property
    def flat(self):
        return self.array.flat

    def ravel(self):
        return self.array.ravel()

    def tobytes(self):
        return self.array.tobytes()

    def __getitem__(self, idx):
        return self.array[idx]

    def __matmul__(self, other):
        return self.array @ np.asarray(other)

    def __rmatmul__(self, other):
        return np.asarray(other) @ self.array

    @property
    def T(self):
        return self.array.T

    def copy(self) -> "Cell":
        return Cell(self.array.copy())
