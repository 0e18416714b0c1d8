"""Stepper tests: analytic dalpha derivatives vs finite differences,
and limiting behavior (alpha=0 QN == Newton step)."""
import jax.numpy as jnp
import numpy as np
import pytest

from test_utils import get_matrix

from sella_tpu.ops.stepper import (
    prfo_get_s,
    prfo_prepare,
    qn_get_s,
    qn_irc_get_s,
    qn_irc_prepare,
    qn_prepare,
    rfo_get_s,
    rfo_prepare,
)


def _fd_check(get_s, params, alpha, h=1e-6, rtol=1e-4, atol=1e-7):
    s, dsda = get_s(params, alpha)
    sp, _ = get_s(params, alpha + h)
    sm, _ = get_s(params, alpha - h)
    fd = (np.asarray(sp) - np.asarray(sm)) / (2 * h)
    np.testing.assert_allclose(np.asarray(dsda), fd, rtol=rtol, atol=atol)


@pytest.mark.parametrize("order", [0, 1, 2])
def test_qn_derivative(order):
    rng = np.random.RandomState(0)
    H = get_matrix(8, 8, symm=True, rng=rng)
    g = rng.normal(size=8)
    evals, evecs = np.linalg.eigh(H)
    p = qn_prepare(jnp.asarray(g), jnp.asarray(evals), jnp.asarray(evecs),
                   order)
    for alpha in (0.5, 2.0, 10.0):
        _fd_check(qn_get_s, p, alpha)


def test_qn_alpha0_is_newton():
    """At alpha=0 with order=0 and PD Hessian, QN gives -H^{-1} g."""
    rng = np.random.RandomState(1)
    H = get_matrix(6, 6, pd=True, rng=rng)
    g = rng.normal(size=6)
    evals, evecs = np.linalg.eigh(H)
    p = qn_prepare(jnp.asarray(g), jnp.asarray(evals), jnp.asarray(evecs), 0)
    s, _ = qn_get_s(p, 0.0)
    np.testing.assert_allclose(
        np.asarray(s), -np.linalg.solve(H, g), atol=1e-10
    )


def test_qn_order1_uphill():
    """With order=1, the step goes uphill along the lowest mode."""
    rng = np.random.RandomState(2)
    H = get_matrix(6, 6, pd=True, rng=rng)
    g = rng.normal(size=6)
    evals, evecs = np.linalg.eigh(H)
    p = qn_prepare(jnp.asarray(g), jnp.asarray(evals), jnp.asarray(evecs), 1)
    s, _ = qn_get_s(p, 0.0)
    # expected: flip sign of lowest eigenvalue
    L = evals.copy()
    L[0] *= -1
    s_ref = -evecs @ ((evecs.T @ g) / L)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-10)


@pytest.mark.parametrize("order", [0, 1])
def test_rfo_derivative(order):
    rng = np.random.RandomState(3)
    H = get_matrix(7, 7, symm=True, rng=rng)
    g = rng.normal(size=7)
    p = rfo_prepare(jnp.asarray(g), jnp.asarray(H), order)
    for alpha in (0.2, 0.6, 0.95):
        _fd_check(rfo_get_s, p, alpha, rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("order", [1, 2])
def test_prfo_derivative(order):
    rng = np.random.RandomState(4)
    H = get_matrix(8, 8, symm=True, rng=rng)
    g = rng.normal(size=8)
    evals, evecs = np.linalg.eigh(H)
    p = prfo_prepare(jnp.asarray(g), jnp.asarray(evals), jnp.asarray(evecs),
                     order)
    for alpha in (0.3, 0.8):
        _fd_check(prfo_get_s, p, alpha, rtol=1e-3, atol=1e-6)


def test_prfo_step_shrinks_with_alpha():
    """||s(alpha)|| increases with alpha on (0,1] (slope=+1 family)."""
    rng = np.random.RandomState(5)
    H = get_matrix(8, 8, symm=True, rng=rng)
    g = rng.normal(size=8)
    evals, evecs = np.linalg.eigh(H)
    p = prfo_prepare(jnp.asarray(g), jnp.asarray(evals), jnp.asarray(evecs), 1)
    norms = [
        float(jnp.linalg.norm(prfo_get_s(p, a)[0]))
        for a in (0.05, 0.3, 0.7, 1.0)
    ]
    assert all(n1 <= n2 + 1e-12 for n1, n2 in zip(norms, norms[1:]))


def test_qn_irc_derivative():
    rng = np.random.RandomState(6)
    H = get_matrix(6, 6, symm=True, rng=rng)
    g = rng.normal(size=6)
    d1 = rng.normal(size=6)
    evals, evecs = np.linalg.eigh(H)
    p = qn_irc_prepare(jnp.asarray(g), jnp.asarray(evals),
                       jnp.asarray(evecs), 0, jnp.asarray(d1))
    for alpha in (0.5, 3.0):
        _fd_check(qn_irc_get_s, p, alpha)
