"""Tests for the linear-algebra substrate and matrix-free operators
(mirrors /root/reference/tests/test_linalg.py and tests/utilities/test_math.py)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from test_utils import Polynomial, get_matrix

from sella_tpu.ops.linalg import (
    eigh_gen,
    expm,
    expm_frechet,
    lstsq,
    mgs_masked,
    modified_gram_schmidt,
    pseudo_inverse,
    split_cons_subspace_host,
)
from sella_tpu.ops.operators import MatrixSum, NumericalHessian


def test_mgs_host_orthonormal():
    rng = np.random.RandomState(0)
    X = rng.normal(size=(20, 6))
    Q = modified_gram_schmidt(X)
    assert Q.shape == (20, 6)
    np.testing.assert_allclose(Q.T @ Q, np.eye(6), atol=1e-12)
    # span preserved
    P = Q @ Q.T
    np.testing.assert_allclose(P @ X, X, atol=1e-8)


def test_mgs_host_rank_drop():
    rng = np.random.RandomState(1)
    X = rng.normal(size=(10, 3))
    X = np.hstack([X, X[:, :1] + 1e-18 * rng.normal(size=(10, 1))])
    Q = modified_gram_schmidt(X)
    assert Q.shape[1] == 3


def test_mgs_host_against():
    rng = np.random.RandomState(2)
    Y = modified_gram_schmidt(rng.normal(size=(15, 4)))
    X = rng.normal(size=(15, 3))
    Q = modified_gram_schmidt(X, Y)
    np.testing.assert_allclose(Y.T @ Q, 0, atol=1e-12)
    np.testing.assert_allclose(Q.T @ Q, np.eye(3), atol=1e-12)


def test_mgs_masked_matches_host():
    rng = np.random.RandomState(3)
    X = rng.normal(size=(12, 5))
    Q, mask = mgs_masked(jnp.asarray(X))
    Qh = modified_gram_schmidt(X)
    assert int(mask.sum()) == Qh.shape[1]
    Qa = np.asarray(Q)[:, np.asarray(mask)]
    # same span
    np.testing.assert_allclose(Qa.T @ Qa, np.eye(Qa.shape[1]), atol=1e-12)
    np.testing.assert_allclose(
        Qa @ (Qa.T @ Qh), Qh, atol=1e-8
    )


def test_mgs_masked_dependent_cols():
    rng = np.random.RandomState(4)
    X = rng.normal(size=(8, 3))
    X = np.hstack([X, X @ rng.normal(size=(3, 2))])  # 2 dependent cols
    Q, mask = mgs_masked(jnp.asarray(X))
    assert int(mask.sum()) == 3


def test_pseudo_inverse():
    rng = np.random.RandomState(5)
    A = rng.normal(size=(4, 7))
    U, s, VT, Ainv, nsing = pseudo_inverse(jnp.asarray(A))
    np.testing.assert_allclose(
        np.asarray(Ainv), np.linalg.pinv(A), atol=1e-10
    )
    assert int(nsing) == 4


def test_eigh_gen():
    rng = np.random.RandomState(6)
    A = get_matrix(8, 8, symm=True, rng=rng)
    B = get_matrix(8, 8, pd=True, rng=rng)
    lams, V = eigh_gen(jnp.asarray(A), jnp.asarray(B))
    lams_ref, V_ref = sla.eigh(A, B)
    np.testing.assert_allclose(np.asarray(lams), lams_ref, atol=1e-9)
    # eigenvectors satisfy A v = lam B v
    np.testing.assert_allclose(
        A @ np.asarray(V), B @ np.asarray(V) * np.asarray(lams)[None, :],
        atol=1e-8,
    )


def test_expm_vs_scipy():
    rng = np.random.RandomState(7)
    for scale in (0.01, 0.5, 2.0):
        A = scale * rng.normal(size=(3, 3))
        np.testing.assert_allclose(
            np.asarray(expm(jnp.asarray(A))), sla.expm(A), atol=1e-12
        )


def test_expm_frechet_vs_scipy():
    rng = np.random.RandomState(8)
    A = 0.3 * rng.normal(size=(3, 3))
    E = rng.normal(size=(3, 3))
    ref = sla.expm_frechet(A, E, compute_expm=False)
    np.testing.assert_allclose(
        np.asarray(expm_frechet(jnp.asarray(A), jnp.asarray(E))),
        ref, atol=1e-10,
    )


def test_split_cons_subspace():
    rng = np.random.RandomState(9)
    drdx = rng.normal(size=(4, 12))
    Ucons, Ufree = split_cons_subspace_host(drdx)
    assert Ucons.shape == (12, 4)
    assert Ufree.shape == (12, 8)
    np.testing.assert_allclose(drdx @ Ufree, 0, atol=1e-10)
    Q = np.hstack([Ucons, Ufree])
    np.testing.assert_allclose(Q.T @ Q, np.eye(12), atol=1e-12)


def test_lstsq_rank_deficient():
    rng = np.random.RandomState(10)
    A = rng.normal(size=(6, 3)) @ rng.normal(size=(3, 6))  # rank 3
    b = rng.normal(size=6)
    x = np.asarray(lstsq(jnp.asarray(A), jnp.asarray(b)))
    x_ref = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(x, x_ref, atol=1e-8)


@pytest.mark.parametrize("threepoint", [False, True])
def test_numerical_hessian(threepoint):
    """FD Hessian operator vs analytic polynomial Hessian
    (cf. /root/reference/tests/test_linalg.py:43-58)."""
    d = 9
    poly = Polynomial(d)
    rng = np.random.RandomState(11)
    x0 = rng.normal(size=d)
    H_analytic = poly.h(x0)
    op = NumericalHessian(poly.fg, x0, poly.g(x0), 1e-6, threepoint)
    for _ in range(4):
        v = rng.normal(size=d)
        np.testing.assert_allclose(
            op.matvec(v), H_analytic @ v, rtol=1e-4, atol=1e-4
        )
    assert op.calls == 4
    assert op.Vs.shape == (d, 4)
    # recorded pairs satisfy AV ~= H V
    np.testing.assert_allclose(
        op.AVs, H_analytic @ op.Vs, rtol=1e-4, atol=1e-4
    )


def test_numerical_hessian_projected():
    d = 9
    poly = Polynomial(d)
    rng = np.random.RandomState(12)
    x0 = rng.normal(size=d)
    U = np.linalg.qr(rng.normal(size=(d, 4)))[0]
    op = NumericalHessian(poly.fg, x0, poly.g(x0), 1e-6, False, Uproj=U)
    v = rng.normal(size=4)
    np.testing.assert_allclose(
        op.matvec(v), U.T @ poly.h(x0) @ U @ v, rtol=1e-4, atol=1e-4
    )


def test_matrix_sum():
    d = 6
    poly = Polynomial(d)
    rng = np.random.RandomState(13)
    x0 = rng.normal(size=d)
    op = NumericalHessian(poly.fg, x0, poly.g(x0), 1e-6, False)
    extra = get_matrix(d, d, symm=True, rng=rng)
    tot = op + extra
    v = rng.normal(size=d)
    np.testing.assert_allclose(
        tot.matvec(v), poly.h(x0) @ v + extra @ v, rtol=1e-4, atol=1e-4
    )
