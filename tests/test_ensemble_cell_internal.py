"""Batched internal+cell tier: the CellInternalPES batched analog
(reference ``peswrapper.py:1320-2373``) — coupled internal-coordinate +
log-deformation cell relaxation inside one jitted step, with fixed
internal coordinates held through the Newton back-transform."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sella_tpu.coords.internals import Internals
from sella_tpu.parallel.ensemble_cell_internal import (
    CellInternalEnsembleConfig,
    _cell_map,
    make_cell_internal_step_fn,
    run_cell_internal_ensemble,
)
from sella_tpu.potentials import LennardJones
from sella_tpu.potentials.emt import fcc_bulk


def _bulk_setup(Bsz=2, a0=1.55, seed=0):
    atoms = fcc_bulk("Cu", a0, reps=(2, 2, 2))
    ints = Internals(atoms)
    # LJ crystal: the covalent-radius default would pull in thousands
    # of image bonds; restrict to the nearest-neighbor shell
    ints.find_all_bonds(scale=0.43)
    rng = np.random.RandomState(seed)
    x0 = jnp.asarray(np.stack([
        (atoms.positions
         + 0.02 * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(Bsz)
    ]))
    s0 = jnp.asarray(0.02 * rng.normal(size=(Bsz, 9)))
    return atoms, ints, x0, s0


def test_cell_internal_bulk_lj():
    """Strained + rattled LJ fcc lanes recover the equilibrium lattice
    constant with near-zero stress, stepping in bond coordinates +
    masked log-deformation cell parameters."""
    atoms, ints, x0, s0 = _bulk_setup()
    nat = len(atoms)
    cfg = CellInternalEnsembleConfig(
        natoms=nat, nint=ints.nint, ncell=9, order=0, fmax=5e-3,
        delta0=0.1, h0_cell=10.0,
    )
    st = run_cell_internal_ensemble(
        LennardJones(pbc=True), ints, x0, cfg, jnp.asarray(atoms.cell),
        s0=s0, max_steps=200, steps_per_call=5,
    )
    assert bool(st.converged.all()), np.asarray(st.nsteps)
    assert float(jnp.max(jnp.abs(st.gs))) < 5e-3

    cell_of, _ = _cell_map(cfg, jnp.asarray(atoms.cell), None)
    cells = np.asarray(jax.vmap(cell_of)(st.s))
    for C in cells:
        lat = np.linalg.norm(C, axis=1) / 2.0       # 2x2x2 supercell
        # LJ fcc equilibrium lattice constant ~ 1.5496 sigma (finite-rc
        # shifted LJ lands slightly above)
        np.testing.assert_allclose(lat, lat[0], atol=5e-3)
        assert 1.53 < lat[0] < 1.60, lat
        # cube stays a cube (no spurious shear)
        ortho = C @ C.T
        off = ortho - np.diag(np.diag(ortho))
        assert np.abs(off).max() < 5e-3 * np.abs(np.diag(ortho)).max()


def test_cell_internal_hydrostatic_mask():
    """A diagonal-only cell mask confines the deformation: off-diagonal
    cell entries stay exactly at their reference values."""
    atoms, ints, x0, _ = _bulk_setup()
    nat = len(atoms)
    mask = np.eye(3, dtype=bool)
    cfg = CellInternalEnsembleConfig(
        natoms=nat, nint=ints.nint, ncell=3, order=0, fmax=5e-3,
        delta0=0.1, h0_cell=10.0,
    )
    s0 = jnp.asarray(0.03 * np.random.RandomState(1).normal(size=(2, 3)))
    st = run_cell_internal_ensemble(
        LennardJones(pbc=True), ints, x0, cfg, jnp.asarray(atoms.cell),
        cell_mask=mask, s0=s0, max_steps=200, steps_per_call=5,
    )
    assert bool(st.converged.all()), np.asarray(st.nsteps)
    cell_of, _ = _cell_map(cfg, jnp.asarray(atoms.cell), mask)
    cells = np.asarray(jax.vmap(cell_of)(st.s))
    ref = np.asarray(atoms.cell)
    for C in cells:
        # diagonal mask on a diagonal reference cell: off-diagonals
        # remain exactly zero
        off = C - np.diag(np.diag(C))
        np.testing.assert_allclose(off, np.zeros((3, 3)), atol=1e-12)
        assert not np.allclose(np.diag(C), np.diag(ref))


def test_cell_internal_rejects_dummies():
    """Linear-center dummy atoms are a sequential-tier feature."""
    atoms, ints, _, _ = _bulk_setup()
    ints.dummies.append(np.zeros(3))
    cfg = CellInternalEnsembleConfig(
        natoms=len(atoms), nint=ints.nint, ncell=9,
    )
    with pytest.raises(ValueError, match="dummy"):
        make_cell_internal_step_fn(
            LennardJones(pbc=True), ints, cfg, jnp.asarray(atoms.cell)
        )


def test_cell_internal_sharded():
    """The internal+cell step compiles and runs under an 8-device mesh
    (ensemble axis sharded)."""
    from jax.sharding import Mesh

    atoms, ints, x0, s0 = _bulk_setup(Bsz=8)
    nat = len(atoms)
    mesh = Mesh(np.array(jax.devices()[:8]), ("batch",))
    cfg = CellInternalEnsembleConfig(
        natoms=nat, nint=ints.nint, ncell=9, order=0, fmax=5e-3,
        delta0=0.1, h0_cell=10.0,
    )
    st = run_cell_internal_ensemble(
        LennardJones(pbc=True), ints, x0, cfg, jnp.asarray(atoms.cell),
        s0=jnp.tile(s0[:1], (8, 1)) * jnp.linspace(
            0.5, 1.5, 8
        )[:, None],
        max_steps=200, mesh=mesh, steps_per_call=5,
    )
    assert int(st.converged.sum()) >= 6, np.asarray(st.nsteps)


def test_cell_internal_queue():
    """Work-queue compaction for the internal+cell tier: 5 strained
    bulk inputs through a 2-lane batch, all converged."""
    from sella_tpu.parallel.ensemble_cell_internal import (
        run_cell_internal_ensemble_queue,
    )

    atoms, ints, _, _ = _bulk_setup()
    nat = len(atoms)
    rng = np.random.RandomState(3)
    total = 5
    x0_all = jnp.asarray(np.stack([
        (atoms.positions
         + 0.02 * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(total)
    ]))
    s0_all = jnp.asarray(0.02 * rng.normal(size=(total, 9)))
    cfg = CellInternalEnsembleConfig(
        natoms=nat, nint=ints.nint, ncell=9, order=0, fmax=5e-3,
        delta0=0.1, h0_cell=10.0,
    )
    out = run_cell_internal_ensemble_queue(
        LennardJones(pbc=True), ints, x0_all, cfg,
        jnp.asarray(atoms.cell), batch=2, s0_all=s0_all,
        max_steps_per_search=250, refill_every=25,
    )
    assert len(out) == total
    assert all(r["converged"] for r in out), [r["nsteps"] for r in out]
    fvals = [r["f"] for r in out]
    assert np.std(fvals) < 1e-4 * abs(np.mean(fvals)) + 1e-8, fvals
