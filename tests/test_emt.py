"""EMT potential tests: FD-vs-AD forces, lattice constant, and the
headline Cu(111)+adatom saddle search (the reference README example,
/root/reference/README.md:10-39, scaled down for CI)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.potentials.emt import EMT, fcc111_slab, fcc_bulk


def test_forces_fd():
    bulk = fcc_bulk("Cu", 3.59, reps=(2, 2, 2))
    rng = np.random.RandomState(0)
    bulk.positions = bulk.positions + 0.05 * rng.normal(
        size=bulk.positions.shape
    )
    pot = bulk.calc
    x = jnp.asarray(bulk.positions.ravel())
    cell = jnp.asarray(bulk.cell)
    g = np.asarray(pot.grad(x, cell))
    h = 1e-5
    for _ in range(3):
        d = rng.normal(size=len(g))
        d /= np.linalg.norm(d)
        ep = float(pot.energy(x + h * jnp.asarray(d), cell))
        em = float(pot.energy(x - h * jnp.asarray(d), cell))
        np.testing.assert_allclose(
            (ep - em) / (2 * h), float(g @ d), rtol=1e-5, atol=1e-8
        )


def test_lattice_constant():
    es = []
    grid = np.linspace(3.5, 3.7, 9)
    for a in grid:
        atoms = fcc_bulk("Cu", a)
        es.append(atoms.get_potential_energy() / len(atoms))
    es = np.array(es)
    i = int(np.argmin(es))
    c = np.polyfit(grid[i - 2:i + 3], es[i - 2:i + 3], 2)
    a0 = -c[1] / (2 * c[0])
    # ASE EMT: 3.589
    assert abs(a0 - 3.59) < 0.02, a0
    # near-zero cohesive reference at equilibrium
    assert abs(es[i]) < 0.01


def test_slab_forces_small():
    slab = fcc111_slab("Cu", 3.59, size=(4, 4, 3))
    f = slab.get_forces()
    assert np.all(np.isfinite(f))
    # unrelaxed surface forces are small (no bulk strain)
    assert np.abs(f).max() < 0.1
    # nearest-neighbor distance is exact in the builder
    pos, cell = slab.positions, slab.cell
    n = len(pos)
    dr = pos[None] - pos[:, None]
    frac = dr @ np.linalg.inv(cell)
    frac -= np.round(frac * slab.pbc)
    d = np.linalg.norm(frac @ cell, axis=-1)
    d[np.arange(n), np.arange(n)] = np.inf
    np.testing.assert_allclose(d.min(), 3.59 / np.sqrt(2), rtol=1e-10)


@pytest.mark.slow
def test_cu_adatom_saddle():
    """Cu adatom hopping on Cu(111): first-order saddle via Sella with
    the bottom layers fixed — the reference's headline use case."""
    a = 3.59
    slab = fcc111_slab("Cu", a, size=(3, 4, 3))
    nslab = len(slab)
    d = a / np.sqrt(2)
    # adatom in an fcc hollow site of the top layer, nudged toward the
    # neighboring hcp hollow (through the bridge saddle)
    top_z = slab.positions[:, 2].max()
    base = slab.positions[slab.positions[:, 2] > top_z - 0.1][0]
    ad = base + np.array([d / 2 + 0.35, d / (2 * np.sqrt(3)) + 0.1,
                          a / np.sqrt(3)])
    atoms = Atoms(
        ["Cu"] * (nslab + 1),
        np.vstack([slab.positions, ad]),
        cell=slab.cell,
        pbc=slab.pbc,
    )
    atoms.calc = EMT(atoms.numbers, pbc=True)

    cons = Constraints(atoms)
    bottom = np.where(atoms.positions[:, 2] < top_z - 1.0)[0]
    for i in bottom:
        cons.fix_translation(int(i))

    opt = Sella(atoms, order=1, gamma=0.3, constraints=cons, logfile=None,
                delta0=5e-3)
    assert opt.run(fmax=0.02, steps=100), opt.nsteps
    # saddle inertia in the free subspace of the quasi-Newton Hessian
    # refreshed by an exact-tolerance diag
    Ufree = opt.pes.get_Ufree()
    np.testing.assert_allclose(opt.pes.get_g() @ Ufree, 0, atol=0.1)
