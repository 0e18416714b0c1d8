"""Tests for the TPU kernel substrate added for the hot batched eighs:

* the Newton-Schulz |B| metric (``ensemble._abs_ns``) — matmul-only
  replacement for the TS-BFGS absolute-value eigh;
* the XLA parallel-order Jacobi eigh (``ops.linalg.jacobi_eigh``);
* the Pallas parallel-Jacobi kernel (``ops.pallas_eigh``), exercised in
  interpreter mode on CPU (the compiled path needs a real TPU and is
  covered by the bench).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu.ops.linalg import jacobi_eigh
from sella_tpu.parallel.ensemble import _abs_ns, _abs_psd


def _rand_sym(B, n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.normal(size=(B, n, n))
    return A + np.swapaxes(A, 1, 2)


def _spread_spectrum(seed=0, d=75, neg=5):
    """Symmetric matrix with eigenvalues spanning 1e-4..30, mixed sign
    — the conditioning regime of a quasi-Newton Hessian."""
    rng = np.random.RandomState(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    lam = np.concatenate([
        -(10.0 ** rng.uniform(-4, 1.5, neg)),
        10.0 ** rng.uniform(-4, 1.5, d - neg),
    ])
    return (Q * lam) @ Q.T


def test_abs_ns_matches_eigh_metric():
    A = jnp.asarray(np.stack([_spread_spectrum(s) for s in range(4)]))
    exact = np.asarray(_abs_psd(A))
    ns = np.asarray(_abs_ns(A))
    err = np.linalg.norm(ns - exact, axis=(1, 2)) / np.linalg.norm(
        exact, axis=(1, 2)
    )
    # metric-quality agreement (f32 + finite iterations); the TS-BFGS
    # update only needs |B| as a weighting, not eigh-exact eigenvalues
    assert err.max() < 5e-3, err
    # |B| must stay symmetric PSD-ish: no negative eigenvalue beyond
    # the approximation error scale
    for b in range(ns.shape[0]):
        evs = np.linalg.eigvalsh(ns[b])
        assert evs.min() > -5e-3 * np.abs(evs).max(), evs.min()


def test_abs_psd_dispatch():
    A = jnp.asarray(_rand_sym(3, 10))
    assert np.allclose(
        np.asarray(_abs_psd(A, method="eigh")),
        np.asarray(_abs_psd(A)),
    )
    ns = np.asarray(_abs_psd(A, method="ns"))
    exact = np.asarray(_abs_psd(A))
    assert np.linalg.norm(ns - exact) / np.linalg.norm(exact) < 5e-3


@pytest.mark.parametrize("n", [6, 20, 71, 72])
def test_jacobi_eigh_xla(n):
    A = _rand_sym(8, n, seed=1)
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    w = np.asarray(w)
    V = np.asarray(V)
    w_ref = np.linalg.eigvalsh(A)
    scale = np.abs(w_ref).max()
    assert np.abs(w - w_ref).max() / scale < 5e-5
    # eigenpair residual + orthonormality at the f32 floor
    res = np.linalg.norm(A @ V - V * w[:, None, :], axis=(1, 2))
    assert (res / np.linalg.norm(A, axis=(1, 2))).max() < 5e-4
    assert np.abs(
        np.swapaxes(V, 1, 2) @ V - np.eye(n)
    ).max() < 5e-4


def test_jacobi_eigh_hard_spectrum():
    A = np.stack([_spread_spectrum(s, d=72, neg=3) for s in range(3)])
    w, V = jax.jit(jacobi_eigh)(jnp.asarray(A))
    w_ref = np.linalg.eigvalsh(A)
    assert np.abs(np.asarray(w) - w_ref).max() / np.abs(w_ref).max() < 5e-5
    # the saddle-order decision (count of negatives) must be exact
    assert (np.sum(np.asarray(w) < 0, axis=1) == 3).all()


def test_pallas_jacobi_interpret():
    """The Pallas kernel agrees with numpy in interpreter mode
    (semantics check; performance is TPU-only)."""
    from sella_tpu.ops.pallas_eigh import jacobi_eigh_tpu

    A = _rand_sym(10, 20, seed=2)
    w, V = jacobi_eigh_tpu(jnp.asarray(A), tile=2, interpret=True)
    w = np.asarray(w)
    V = np.asarray(V)
    w_ref = np.linalg.eigvalsh(A)
    assert np.abs(w - w_ref).max() / np.abs(w_ref).max() < 1e-4
    res = np.linalg.norm(A @ V - V * w[:, None, :], axis=(1, 2))
    assert (res / np.linalg.norm(A, axis=(1, 2))).max() < 1e-3
    # odd-n pad path
    A3 = _rand_sym(4, 9, seed=3)
    w3, _ = jacobi_eigh_tpu(jnp.asarray(A3), tile=2, interpret=True)
    assert np.abs(
        np.asarray(w3) - np.linalg.eigvalsh(A3)
    ).max() < 1e-4


def test_ensemble_ns_metric_converges():
    """absb='ns' reaches the same saddles as absb='eigh' on a small
    LJ4 ensemble (metric change must not alter convergence quality)."""
    from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
    from sella_tpu.potentials import LennardJones

    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(
        (tet[None] + 0.08 * rng.normal(size=(8, 4, 3))).reshape(8, 12)
    )
    pot = LennardJones()
    # conv_inertia: without the gate, one seed-dependent lane can
    # "converge" on a flat dissociated plateau (fmax-only criterion);
    # the gate blocks that and the home-anchored restart rescues it
    st = run_ensemble(
        pot, x0,
        EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                       restart_after=50, absb="ns", conv_inertia=True),
        max_steps=300,
    )
    conv = np.asarray(st.converged)
    assert conv.sum() >= 7, conv
    cell = jnp.zeros((3, 3))
    from sella_tpu.parallel.ensemble import free_basis

    for b in range(8):
        if not conv[b]:
            continue
        H = np.asarray(pot.hessian(st.x[b], cell))
        U = np.asarray(free_basis(st.x[b], 6))
        evals = np.linalg.eigvalsh(U.T @ H @ U)
        assert np.sum(evals < -1e-6) == 1, (b, evals)
