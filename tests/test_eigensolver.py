"""Davidson eigensolver tests
(mirrors /root/reference/tests/test_eigensolvers.py)."""
import numpy as np
import pytest

from test_utils import Polynomial, get_matrix

from sella_tpu.ops.eigensolver import exact, rayleigh_ritz
from sella_tpu.ops.operators import NumericalHessian


def test_exact_dense():
    A = get_matrix(10, 10, symm=True)
    lams, vecs, AV = exact(A)
    lams_ref, vecs_ref = np.linalg.eigh(A)
    np.testing.assert_allclose(lams, lams_ref, atol=1e-12)
    np.testing.assert_allclose(AV, vecs * lams[None, :], atol=1e-12)


def test_exact_operator():
    d = 8
    poly = Polynomial(d)
    rng = np.random.RandomState(1)
    x0 = rng.normal(size=d)
    op = NumericalHessian(poly.fg, x0, poly.g(x0), 1e-6, True)
    lams, vecs, _ = exact(op)
    lams_ref = np.linalg.eigvalsh(poly.h(x0))
    np.testing.assert_allclose(lams, lams_ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "method", ["jd0", "lanczos", "gd", "jd0_alt", "mjd0", "mjd0_alt"]
)
@pytest.mark.parametrize("gamma", [0.1, 0.4])
def test_rayleigh_ritz_converges_leftmost(method, gamma):
    """The Ritz leftmost eigenvalue converges to relative residual gamma,
    and the subspace satisfies the Ritz property (AV = A V exactly)."""
    d = 12
    poly = Polynomial(d)
    rng = np.random.RandomState(2)
    x0 = rng.normal(size=d)
    H = poly.h(x0)
    # shift to guarantee a negative mode (saddle-like)
    lam_ref, v_ref = np.linalg.eigh(H)
    shift = lam_ref[0] - 1.0
    Hs = H - (lam_ref[0] - (-1.0)) * np.outer(v_ref[:, 0], v_ref[:, 0])
    P = Hs + 0.1 * get_matrix(d, d, symm=True, rng=rng)

    lams, V, AV = rayleigh_ritz(Hs, gamma, P, method=method)

    # Ritz consistency: columns of V orthonormal, AV == Hs @ V
    np.testing.assert_allclose(V.T @ V, np.eye(V.shape[1]), atol=1e-8)
    np.testing.assert_allclose(AV, Hs @ V, atol=1e-8)

    # convergence criterion on the leftmost Ritz pair
    lam_true = np.linalg.eigvalsh(Hs)[0]
    r = Hs @ V[:, 0] - lams[0] * V[:, 0]
    # after the final rotation there may be one extra expansion vector;
    # accept either the gamma test or near-exactness
    assert (
        np.linalg.norm(r) <= 2 * gamma * abs(lams[0])
        or abs(lams[0] - lam_true) < 1e-8
    )


def test_rayleigh_ritz_exact_fallback():
    A = get_matrix(9, 9, symm=True)
    lams, vecs, AV = rayleigh_ritz(A, 0.0, np.eye(9))
    np.testing.assert_allclose(lams, np.linalg.eigvalsh(A), atol=1e-12)


def test_rayleigh_ritz_maxiter():
    A = get_matrix(20, 20, symm=True)
    P = np.eye(20)
    lams, V, AV = rayleigh_ritz(A, 1e-12, P, maxiter=5)
    assert V.shape[1] <= 5


def test_rayleigh_ritz_matvec_counts():
    """Each Davidson iteration costs exactly one matvec (gradient call)."""
    d = 10
    poly = Polynomial(d)
    rng = np.random.RandomState(3)
    x0 = rng.normal(size=d)
    op = NumericalHessian(poly.fg, x0, poly.g(x0), 1e-6, False)
    P = poly.h(x0) + 0.5 * get_matrix(d, d, symm=True, rng=rng)
    lams, V, AV = rayleigh_ritz(op, 0.1, P, method="jd0")
    assert op.calls == V.shape[1]
    assert op.Vs.shape[1] == op.calls
