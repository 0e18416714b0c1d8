"""Force-match initial Hessian: the fitted FF must reproduce the
observed gradient, and its Hessian must approximate the true one for a
system that lives inside the basis (LJ)."""
import jax.numpy as jnp
import numpy as np

from sella_tpu import Atoms
from sella_tpu.ops.force_match import force_match_hessian
from sella_tpu.potentials import LennardJones


def test_force_match_recovers_lj():
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.2
    rng = np.random.RandomState(0)
    atoms = Atoms(
        ["Ar"] * 4, tet + 0.05 * rng.normal(size=(4, 3)),
        calculator=LennardJones(),
    )
    pot = atoms.calc
    x = jnp.asarray(atoms.positions.ravel())
    cell = jnp.zeros((3, 3))
    g_obs = np.asarray(pot.grad(x, cell))

    H0, coeffs = force_match_hessian(atoms, g_obs)
    # LJ is exactly in the basis: coefficients ~ (4, 4) for eps=sigma=1
    np.testing.assert_allclose(coeffs[0, 0], 4.0, rtol=1e-3)
    np.testing.assert_allclose(coeffs[0, 1], 4.0, rtol=1e-3)
    # Hessian matches the true LJ Hessian
    H_true = np.asarray(pot.hessian(x, cell))
    np.testing.assert_allclose(H0, H_true, rtol=1e-2, atol=1e-3)
