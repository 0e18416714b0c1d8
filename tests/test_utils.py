"""Shared test factories (cf. /root/reference/tests/test_utils/)."""
import numpy as np


def get_matrix(n, m, pd=False, symm=False, rng=None):
    """Random test matrix; optionally symmetric / positive definite."""
    if rng is None:
        rng = np.random.RandomState(2)
    A = rng.normal(size=(n, m))
    if pd:
        assert n == m
        A = A @ A.T + n * np.eye(n)
        symm = True
    if symm:
        assert n == m
        A = 0.5 * (A + A.T)
    return A


class Polynomial:
    """Random multivariate quadratic-plus-quartic with analytic
    derivatives (cf. reference poly_factory.py): used to test FD Hessians
    against a known analytic Hessian."""

    def __init__(self, d, rng=None):
        if rng is None:
            rng = np.random.RandomState(3)
        self.d = d
        self.A = get_matrix(d, d, symm=True, rng=rng)
        self.b = rng.normal(size=d)
        self.c4 = 0.1 * rng.normal(size=d)

    def f(self, x):
        return (
            0.5 * x @ self.A @ x + self.b @ x + np.sum(self.c4 * x**4)
        )

    def g(self, x):
        return self.A @ x + self.b + 4 * self.c4 * x**3

    def h(self, x):
        return self.A + np.diag(12 * self.c4 * x**2)

    def fg(self, x):
        return self.f(x), self.g(x)


def test_write_ensemble_xyz(tmp_path):
    import numpy as np

    from sella_tpu.utils.trajectory import (
        read_trajectory,
        write_ensemble_xyz,
    )

    path = str(tmp_path / "ens.xyz")
    x = np.arange(2 * 9, dtype=float).reshape(2, 9)
    write_ensemble_xyz(path, [18, 18, 18], x,
                       mask=[True, True], energies=[-1.5, -2.5])
    frames = read_trajectory(path)
    assert len(frames) == 2
    np.testing.assert_allclose(frames[1].positions.ravel(), x[1])
