"""Stillinger-Weber potential: lattice constants, derivatives, batching."""
import numpy as np
import jax
import jax.numpy as jnp

from sella_tpu.potentials.sw import StillingerWeber, si_diamond


def test_diamond_cohesive_energy():
    """Ideal diamond Si at a0 = 5.431 A sits at E/atom ~ -2 eps =
    -4.3366 eV (perfect tetrahedral angles kill the 3-body term; each
    atom owns 2 of its 4 bonds at the f2 minimum)."""
    atoms = si_diamond()
    pot = atoms.calc
    x = jnp.asarray(atoms.positions.reshape(-1))
    cell = jnp.asarray(atoms.cell)
    e_per_atom = float(pot.energy(x, cell)) / len(atoms.positions)
    assert abs(e_per_atom - (-4.3366)) < 5e-3, e_per_atom


def test_diamond_is_lattice_minimum():
    es = {}
    for a0 in (5.30, 5.431, 5.56):
        atoms = si_diamond(a0)
        x = jnp.asarray(atoms.positions.reshape(-1))
        es[a0] = float(atoms.calc.energy(x, jnp.asarray(atoms.cell)))
    assert es[5.431] < es[5.30] and es[5.431] < es[5.56], es


def test_gradient_fd():
    """Analytic (autodiff) forces vs central finite differences on a
    rattled periodic supercell (MIC-valid: L/2 > rc)."""
    atoms = si_diamond(reps=(2, 2, 2))
    rng = np.random.RandomState(0)
    pos = atoms.positions + 0.08 * rng.normal(size=atoms.positions.shape)
    x = jnp.asarray(pos.reshape(-1))
    cell = jnp.asarray(atoms.cell)
    pot = atoms.calc
    g = np.asarray(jax.grad(pot.energy)(x, cell))
    h = 1e-5
    for idx in rng.choice(x.shape[0], size=6, replace=False):
        xp = np.asarray(x).copy()
        xm = np.asarray(x).copy()
        xp[idx] += h
        xm[idx] -= h
        fd = (float(pot.energy(jnp.asarray(xp), cell))
              - float(pot.energy(jnp.asarray(xm), cell))) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-6, atol=1e-8)


def test_three_body_penalizes_bond_bending():
    """Bending an isolated trimer away from the tetrahedral angle
    raises the energy through the 3-body term."""
    pot = StillingerWeber()
    r = 2.35
    cell = jnp.zeros((3, 3))

    def trimer(theta):
        pos = np.array([
            [0, 0, 0],
            [r, 0, 0],
            [r * np.cos(theta), r * np.sin(theta), 0],
        ])
        return float(pot.energy(jnp.asarray(pos.reshape(-1)), cell))

    th_tet = np.arccos(-1.0 / 3.0)
    assert trimer(th_tet) < trimer(th_tet - 0.3)
    assert trimer(th_tet) < trimer(th_tet + 0.3)


def test_ensemble_minimization_smoke():
    """Batched order-0 ensemble on rattled Si5 clusters converges."""
    from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble

    pot = StillingerWeber()
    # tetrahedron + center, roughly bonded
    base = np.array([
        [0, 0, 0],
        [1.36, 1.36, 1.36], [-1.36, -1.36, 1.36],
        [-1.36, 1.36, -1.36], [1.36, -1.36, -1.36],
    ])
    rng = np.random.RandomState(1)
    Bsz = 4
    x0 = jnp.asarray(
        (base[None] + 0.1 * rng.normal(size=(Bsz, 5, 3)))
        .reshape(Bsz, 15)
    )
    cfg = EnsembleConfig(natoms=5, order=0, fmax=1e-3, gamma=1e-3)
    st = run_ensemble(pot, x0, cfg, max_steps=200)
    conv = np.asarray(st.converged)
    assert conv.sum() >= Bsz - 1, (conv, np.asarray(st.nsteps))
    assert np.all(np.asarray(st.f)[conv] < 0.0)
