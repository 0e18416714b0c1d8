"""Tests for the robust batched eigh (f32 factor + f64 refinement).

``eigh_refined`` exists because the TPU emulated-f64
``jnp.linalg.eigh`` returns NaN eigenpairs for some finite singular
matrices with degenerate eigenvalue clusters — observed on the Gram
matrix ``B B^T`` of a redundant internal-coordinate Jacobian (zero
eigenvalue of multiplicity nint - nred). These tests pin its accuracy
contract on CPU, where numpy's LAPACK eigh is the trusted reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sella_tpu.ops.linalg import batched_eigh, eigh_refined


def _check(A, lam_tol=1e-11, resid_tol=1e-11, orth_tol=1e-13, sweeps=2):
    A = jnp.asarray(A)
    lams, V = eigh_refined(A, sweeps=sweeps)
    lams, V = np.asarray(lams), np.asarray(V)
    An = np.asarray(A)
    ln = np.linalg.eigh(An)[0]
    scale = max(np.max(np.abs(ln)), 1e-300)
    assert np.all(np.isfinite(lams)) and np.all(np.isfinite(V))
    assert np.max(np.abs(lams - ln)) / scale < lam_tol
    resid = np.einsum("...ij,...jk->...ik", An, V) - lams[..., None, :] * V
    assert np.max(np.abs(resid)) / scale < resid_tol
    gram = np.einsum("...ji,...jk->...ik", V, V)
    eye = np.eye(A.shape[-1])
    assert np.max(np.abs(gram - eye)) < orth_tol
    # ascending order (callers index top/bottom blocks)
    assert np.all(np.diff(lams, axis=-1) >= -1e-12 * scale)


def test_random_batch():
    rng = np.random.RandomState(0)
    A = rng.normal(size=(8, 20, 20))
    _check(A + np.swapaxes(A, -1, -2))


def test_degenerate_clusters():
    """Multiplicity-4 zero cluster + repeated positive eigenvalues —
    the exact shape that NaNs the TPU f64 eigh."""
    rng = np.random.RandomState(1)
    Q = np.linalg.qr(rng.normal(size=(16, 16)))[0]
    d = np.array([0, 0, 0, 0, 1, 1, 1, 2, 3.5, 3.5, 7, 9, 11, 13, 17, 100.0])
    _check(Q @ np.diag(d) @ Q.T)


def test_small_gap_separated():
    rng = np.random.RandomState(2)
    Q = np.linalg.qr(rng.normal(size=(5, 5)))[0]
    d = np.array([0.0, 1e-4, 1.0, 2.0, 3.0])
    _check(Q @ np.diag(d) @ Q.T, lam_tol=1e-13, resid_tol=1e-12)


def test_scale_invariance():
    rng = np.random.RandomState(3)
    Q = np.linalg.qr(rng.normal(size=(10, 10)))[0]
    d = np.array([0, 0, 0, 1, 2, 3, 5, 8, 13, 21.0])
    for s in (1e-8, 1.0, 1e8):
        _check(s * (Q @ np.diag(d) @ Q.T))


def test_redundant_internal_gram():
    """Gram matrix of a redundant internal Jacobian: rank 3n-6 with a
    high-multiplicity zero cluster (the motivating TPU failure)."""
    from sella_tpu.atoms import Atoms
    from sella_tpu.coords.internals import Internals

    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    ints = Internals(Atoms(["Xe"] * 4, pos0))
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    eng = ints._get_engine()
    cell = jnp.zeros((3, 3))
    x = jnp.asarray(
        (pos0[None] + 0.3 * rng.normal(size=(6, 4, 3))).reshape(6, 12)
    )
    Bm = jax.vmap(lambda xx: eng._jac_impl(xx.reshape(4, 3), cell))(x)
    G = np.asarray(jnp.einsum("bik,bjk->bij", Bm, Bm))
    _check(G, lam_tol=1e-12, resid_tol=1e-12)


def test_single_matrix_no_batch():
    rng = np.random.RandomState(5)
    A = rng.normal(size=(7, 7))
    _check(A + A.T)


def test_batched_eigh_modes():
    rng = np.random.RandomState(6)
    A = rng.normal(size=(3, 9, 9))
    A = jnp.asarray(A + np.swapaxes(A, -1, -2))
    l64, _ = batched_eigh(A, "f64")
    lref, _ = batched_eigh(A, "refined")
    l32, _ = batched_eigh(A, "f32")
    np.testing.assert_allclose(np.asarray(lref), np.asarray(l64),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(l32), np.asarray(l64),
                               rtol=0, atol=1e-5)
    assert l32.dtype == A.dtype


def test_env_override(monkeypatch):
    from sella_tpu.ops import linalg

    monkeypatch.setenv("SELLA_TPU_EIGH", "refined")
    assert linalg._default_eigh_mode() == "refined"
    monkeypatch.setenv("SELLA_TPU_EIGH", "f64")
    assert linalg._default_eigh_mode() == "f64"
    monkeypatch.delenv("SELLA_TPU_EIGH")
    # session default on the CPU test backend is native f64
    assert linalg._default_eigh_mode() == "f64"
