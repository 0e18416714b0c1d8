"""Batched atom+cell tier: coupled relaxation recovers the lattice
constant, cell masks constrain the deformation exactly, the Davidson
path absorbs exact extended-objective curvature, and the step shards
over a device mesh (reference ``peswrapper.py:2376-2933`` batched)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sella_tpu.parallel.ensemble_cell import (
    CellEnsembleConfig,
    cells_of,
    init_cell_state,
    run_cell_ensemble,
)
from sella_tpu.potentials import LennardJones
from sella_tpu.potentials.emt import EMT, fcc_bulk


def _lj_setup(Bsz=4, a0=1.55, scale=0.02, seed=0):
    atoms = fcc_bulk("Cu", a0, reps=(2, 2, 2))
    pot = LennardJones(pbc=True)
    rng = np.random.RandomState(seed)
    x0 = jnp.asarray(np.stack([
        (atoms.positions
         + scale * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(Bsz)
    ]))
    return pot, atoms, x0


def test_cell_ensemble_bulk_cu_emt():
    """Batched EMT bulk-Cu atom+cell relaxation from 3% over-expanded,
    strained, rattled starts: every lane recovers the EMT equilibrium
    lattice constant (~3.593 A) with near-zero stress."""
    a0 = 3.59
    atoms = fcc_bulk("Cu", a0 * 1.03, reps=(2, 2, 2))
    nat = len(atoms)
    pot = EMT(np.array([29] * nat), pbc=True)
    Bsz = 3
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.stack([
        (atoms.positions
         + 0.05 * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(Bsz)
    ]))
    s0 = jnp.asarray(0.02 * rng.normal(size=(Bsz, 9)))

    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0, fmax=5e-3,
                             delta0=0.1)
    st = run_cell_ensemble(pot, x0, cfg, jnp.asarray(atoms.cell),
                           s0=s0, max_steps=150, steps_per_call=5)
    assert bool(st.converged.all()), np.asarray(st.nsteps)

    cells = np.asarray(cells_of(st, cfg, jnp.asarray(atoms.cell)))
    for C in cells:
        lat = np.linalg.norm(C, axis=1) / 2.0     # 2x2x2 supercell
        np.testing.assert_allclose(lat, 3.593, atol=0.01)
        ortho = C @ C.T
        off = np.abs(ortho - np.diag(np.diag(ortho))).max()
        assert off < 0.05, C


@pytest.mark.slow
def test_cell_ensemble_mask_and_davidson():
    """A diagonal cell_mask keeps off-diagonal deformation EXACTLY zero
    (``peswrapper.py:2442-2468`` mask semantics), and forcing the
    Davidson path (diag_every_n) absorbs exact curvature — converging
    in fewer steps with nonzero matvec counts."""
    pot, atoms, x0 = _lj_setup()
    nat = len(atoms)
    mask = np.eye(3, dtype=bool)
    cell0 = jnp.asarray(atoms.cell)

    cfg = CellEnsembleConfig(natoms=nat, ncell=3, order=0, fmax=1e-3,
                             delta0=0.1)
    st = run_cell_ensemble(pot, x0, cfg, cell0, cell_mask=mask,
                           max_steps=200, steps_per_call=5)
    assert bool(st.converged.all()), np.asarray(st.nsteps)
    assert int(np.asarray(st.nmatvec).sum()) == 0

    cells = np.asarray(cells_of(st, cfg, cell0, cell_mask=mask))
    for C in cells:
        off = np.abs(C - np.diag(np.diag(C))).max()
        assert off == 0.0
        np.testing.assert_allclose(np.diag(C) / 2.0, 1.571, atol=0.01)

    cfg2 = cfg._replace(diag_every_n=3, davidson_max=12)
    st2 = run_cell_ensemble(pot, x0, cfg2, cell0, cell_mask=mask,
                            max_steps=200, steps_per_call=5)
    assert bool(st2.converged.all())
    assert int(np.asarray(st2.nmatvec).min()) > 0
    assert (np.asarray(st2.nsteps).mean()
            < np.asarray(st.nsteps).mean()), (st2.nsteps, st.nsteps)


def test_cell_ensemble_sharded():
    """The batched atom+cell step compiles and runs under an 8-device
    mesh (ensemble axis sharded)."""
    from jax.sharding import Mesh

    pot, atoms, x0 = _lj_setup(Bsz=8)
    nat = len(atoms)
    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0, fmax=1e-3,
                             delta0=0.1)
    st = run_cell_ensemble(pot, x0, cfg, jnp.asarray(atoms.cell),
                           max_steps=40, steps_per_call=5, mesh=mesh)
    assert int(np.asarray(st.nsteps).min()) >= 1
    # monotone progress: energies dropped from the rattled starts
    st0 = init_cell_state(pot, x0, cfg, jnp.asarray(atoms.cell))
    assert bool(jnp.all(st.f < st0.f))


def test_cell_ensemble_pressure():
    """scalar_pressure shifts the equilibrium volume down (enthalpy
    E + PV, ``peswrapper.py:2419-2440``)."""
    pot, atoms, x0 = _lj_setup(Bsz=2)
    nat = len(atoms)
    cell0 = jnp.asarray(atoms.cell)
    mask = np.eye(3, dtype=bool)

    cfg0 = CellEnsembleConfig(natoms=nat, ncell=3, order=0, fmax=1e-3,
                              delta0=0.1)
    cfgP = cfg0._replace(scalar_pressure=0.5)
    st0 = run_cell_ensemble(pot, x0, cfg0, cell0, cell_mask=mask,
                            max_steps=200, steps_per_call=5)
    stP = run_cell_ensemble(pot, x0, cfgP, cell0, cell_mask=mask,
                            max_steps=200, steps_per_call=5)
    assert bool(st0.converged.all()) and bool(stP.converged.all())
    v0 = np.abs(np.linalg.det(
        np.asarray(cells_of(st0, cfg0, cell0, cell_mask=mask))
    ))
    vP = np.abs(np.linalg.det(
        np.asarray(cells_of(stP, cfgP, cell0, cell_mask=mask))
    ))
    # LJ fcc is stiff: P=0.5 compresses ~0.85% (measured 31.00->30.73)
    assert np.all(vP < v0 - 0.1), (v0, vP)


def test_cell_ensemble_queue():
    """Work-queue compaction for the atom+cell tier: 7 strained bulk
    relaxations through a 3-lane batch; every input converges to the
    same equilibrium lattice constant."""
    from sella_tpu.parallel.ensemble_cell import run_cell_ensemble_queue

    a0 = 1.55
    atoms = fcc_bulk("Cu", a0, reps=(2, 2, 2))
    nat = len(atoms)
    pot = LennardJones(pbc=True)
    rng = np.random.RandomState(0)
    total = 7
    x0_all = jnp.asarray(np.stack([
        (atoms.positions
         + 0.02 * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(total)
    ]))
    s0_all = jnp.asarray(0.02 * rng.normal(size=(total, 9)))
    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0, fmax=5e-3,
                             delta0=0.1)
    out = run_cell_ensemble_queue(
        pot, x0_all, cfg, jnp.asarray(atoms.cell), batch=3,
        s0_all=s0_all, max_steps_per_search=200, refill_every=10,
    )
    assert len(out) == total
    assert all(r["converged"] for r in out), [r["nsteps"] for r in out]
    fvals = [r["f"] for r in out]
    assert np.std(fvals) < 1e-4 * abs(np.mean(fvals)) + 1e-8, fvals
