"""Matrix-free large-system path: L-BFGS minimization and minimum-mode
following without a dense Hessian (BASELINE config 5 machinery)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu.parallel.largescale import (
    lbfgs_apply,
    lbfgs_init,
    lbfgs_push,
    leftmost_mode,
    run_mmf,
)
from sella_tpu.potentials import LennardJones
from sella_tpu.potentials.emt import EMT, fcc111_slab


def test_lbfgs_solves_quadratic():
    """On a quadratic, L-BFGS with enough memory reproduces Newton."""
    rng = np.random.RandomState(0)
    d = 12
    A = rng.normal(size=(d, d))
    A = A @ A.T + d * np.eye(d)
    b = rng.normal(size=d)
    x = jnp.zeros(d)
    mem = lbfgs_init(d, 20)
    for _ in range(30):
        g = jnp.asarray(A) @ x - jnp.asarray(b)
        p = lbfgs_apply(mem, g)
        x_new = x - p
        g_new = jnp.asarray(A) @ x_new - jnp.asarray(b)
        mem = lbfgs_push(mem, x_new - x, g_new - g)
        x = x_new
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(A, b), atol=1e-6
    )


def test_leftmost_mode():
    rng = np.random.RandomState(1)
    d = 30
    A = rng.normal(size=(d, d))
    A = 0.5 * (A + A.T)
    lam_ref, v_ref = np.linalg.eigh(A)

    hvp = lambda v: jnp.asarray(A) @ v
    v0 = jnp.asarray(v_ref[:, 0] + 0.3 * rng.normal(size=d))
    lam, v, nmv = leftmost_mode(hvp, v0, n_iter=200, tol=1e-8)
    np.testing.assert_allclose(float(lam), lam_ref[0], atol=1e-4)
    assert abs(float(jnp.asarray(v_ref[:, 0]) @ v)) > 0.999


def test_mmf_minimization_slab():
    """Matrix-free minimization of a rattled Cu(111) slab (no dense
    Hessian anywhere)."""
    slab = fcc111_slab("Cu", 3.59, size=(3, 4, 3))
    rng = np.random.RandomState(2)
    slab.positions = slab.positions + 0.05 * rng.normal(
        size=slab.positions.shape
    )
    pot = slab.calc
    state = run_mmf(
        pot, slab.positions.ravel(), cell=jnp.asarray(slab.cell),
        order=0, fmax=5e-3, max_steps=500, max_move=0.2,
    )
    assert bool(state.converged), int(state.nsteps)


def test_mmf_saddle_lj():
    """Minimum-mode following finds a first-order saddle of LJ7 from a
    perturbed minimum, using only HVPs (counted)."""
    # LJ7 global minimum (pentagonal bipyramid), slightly perturbed
    # toward a migration saddle
    pos = np.array([
        [0.0, 0.0, 1.1], [0.0, 0.0, -1.1],
        [1.12, 0.0, 0.0],
        [1.12 * np.cos(2 * np.pi / 5), 1.12 * np.sin(2 * np.pi / 5), 0],
        [1.12 * np.cos(4 * np.pi / 5), 1.12 * np.sin(4 * np.pi / 5), 0],
        [1.12 * np.cos(6 * np.pi / 5), 1.12 * np.sin(6 * np.pi / 5), 0],
        [1.12 * np.cos(8 * np.pi / 5), 1.12 * np.sin(8 * np.pi / 5), 0],
    ]) * 0.9
    rng = np.random.RandomState(5)
    pos = pos + 0.15 * rng.normal(size=pos.shape)
    pot = LennardJones()
    state = run_mmf(
        pot, pos.ravel(), order=1, fmax=1e-3, max_steps=800,
        max_move=0.1,
    )
    assert bool(state.converged), (int(state.nsteps), float(state.lam))
    assert float(state.lam) < 0
    # exact inertia check
    from sella_tpu.parallel.ensemble import free_basis

    H = np.asarray(pot.hessian(state.x, jnp.zeros((3, 3))))
    U = np.asarray(free_basis(state.x, 6))
    evals = np.linalg.eigvalsh(U.T @ H @ U)
    assert np.sum(evals < -1e-6) == 1, evals
