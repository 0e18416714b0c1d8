"""Multi-secant property tests for the Hessian-update family
(mirrors /root/reference/tests/test_hessian_update.py)."""
import numpy as np
import pytest

from test_utils import get_matrix

from sella_tpu.ops.hessian_update import symmetrize_Y, update_H


@pytest.mark.parametrize(
    "dim,subdim,method,symm,pd",
    [
        (10, 1, "TS-BFGS", 2, False),
        (10, 2, "TS-BFGS", 0, False),
        (10, 2, "TS-BFGS", 1, False),
        (10, 2, "TS-BFGS", 2, False),
        (10, 2, "BFGS", 2, False),
        (10, 2, "PSB", 2, False),
        (10, 2, "DFP", 2, False),
        (10, 2, "SR1", 2, False),
        (10, 2, "Greenstadt", 2, False),
        (10, 2, "BFGS_auto", 2, False),
        (10, 2, "BFGS_auto", 2, True),
    ],
)
def test_update_H(dim, subdim, method, symm, pd):
    rng = np.random.RandomState(1)
    tol = dict(atol=1e-6, rtol=1e-6)

    B = get_matrix(dim, dim, pd, True, rng=rng)
    H = get_matrix(dim, dim, pd, True, rng=rng)
    S = get_matrix(dim, subdim, rng=rng)
    Y = H @ S

    # bootstrap (B=None) and regular updates both satisfy B+ S = Y
    B1 = np.asarray(update_H(None, S, Y, method=method, symm=symm))
    np.testing.assert_allclose(B1 @ S, Y, **tol)
    np.testing.assert_allclose(B1, B1.T, atol=1e-10)

    B2 = np.asarray(update_H(B, S, Y, method=method, symm=symm))
    np.testing.assert_allclose(B2 @ S, Y, **tol)
    np.testing.assert_allclose(B2, B2.T, atol=1e-10)

    if subdim == 1:
        B3 = np.asarray(
            update_H(B, S.ravel(), Y.ravel(), method=method, symm=symm)
        )
        np.testing.assert_allclose(B2, B3, **tol)

        # tiny steps are a no-op
        B4 = update_H(
            B, S.ravel() / 1e12, Y.ravel() / 1e12, method=method, symm=symm
        )
        np.testing.assert_allclose(B, np.asarray(B4), atol=0, rtol=0)


@pytest.mark.parametrize("symm", [0, 1, 2])
def test_symmetrize_Y(symm):
    """After symmetrization, S^T Ytilde must be symmetric."""
    rng = np.random.RandomState(7)
    S = get_matrix(12, 4, rng=rng)
    Y = get_matrix(12, 4, rng=rng)
    Yt = np.asarray(symmetrize_Y(S, Y, symm))
    M = S.T @ Yt
    np.testing.assert_allclose(M, M.T, atol=1e-8)
    # correction lives outside the secant condition only minimally:
    # symmetrize_Y must be a no-op when S^T Y is already symmetric
    H = get_matrix(12, 12, symm=True, rng=rng)
    Ysym = H @ S
    np.testing.assert_allclose(
        np.asarray(symmetrize_Y(S, Ysym, symm)), Ysym, atol=1e-8
    )
