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
    realized_cells,
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

    cells = np.asarray(realized_cells(st, cfg))
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
    cells = np.asarray(realized_cells(st, cfg, mask))
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _dimer_box(Bsz=1):
    """Two Ar2 dimers in a 12 A box (the sequential rigid-fragment FD
    fixture, tests/test_cell_optimization.py): fragment TRICs + intra
    bonds, all separations away from half-box MIC kinks."""
    from sella_tpu import Atoms

    pos = np.array([
        [2.0, 2.0, 2.0], [2.0, 2.0, 4.0],
        [7.0, 5.5, 3.0], [7.0, 7.5, 3.0],
    ])
    atoms = Atoms(["Ar"] * 4, pos, cell=np.eye(3) * 12.0, pbc=True)
    ints = Internals(atoms, allow_fragments=True)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    x0 = jnp.asarray(np.stack([pos.ravel()] * Bsz))
    pot = LennardJones(epsilon=0.0104, sigma=3.4, pbc=True)
    return atoms, ints, pot, x0


def test_rigid_transport_preserves_fragments():
    """The batched rigid transport keeps intra-fragment distances
    bitwise-rigid under an arbitrary cell change and maps fragment
    centroids affinely (reference ``peswrapper.py:1986-2010``)."""
    from sella_tpu.parallel.ensemble_cell_internal import _rigid_maps

    atoms, ints, pot, x0 = _dimer_box()
    assert len(ints.fragment_atom_groups) == 2
    cfg = CellInternalEnsembleConfig(
        natoms=4, nint=ints.nint, ncell=9, rigid_fragments=True,
    )
    cell_of, _ = _cell_map(cfg, None)
    transport, _ = _rigid_maps(ints, cfg, cell_of)

    cell0 = jnp.asarray(atoms.cell)
    rng = np.random.RandomState(3)
    s_old = jnp.asarray(0.05 * rng.normal(size=9))
    s_new = jnp.asarray(s_old + 0.3 * rng.normal(size=9))
    c_old, c_new = cell_of(s_old, cell0), cell_of(s_new, cell0)
    xT = np.asarray(transport(x0[0], c_old, c_new)).reshape(4, 3)
    p0 = np.asarray(x0[0]).reshape(4, 3)
    for group in ints.fragment_atom_groups:
        d0 = np.linalg.norm(p0[group[0]] - p0[group[1]])
        dT = np.linalg.norm(xT[group[0]] - xT[group[1]])
        np.testing.assert_allclose(dT, d0, rtol=1e-12)
        com0 = p0[group].mean(axis=0)
        comT = xT[group].mean(axis=0)
        expect = (com0 @ np.linalg.inv(np.asarray(c_old))
                  ) @ np.asarray(c_new)
        np.testing.assert_allclose(comT, expect, atol=1e-10)


def test_rigid_cell_gradient_fd_batched():
    """The corrected cell gradient (closed-form transport
    linearization) must match central finite differences of the
    enthalpy along the TRANSPORTED path — the batched analog of the
    sequential rigid-fragment FD test."""
    from sella_tpu.parallel.ensemble_cell_internal import _rigid_maps

    atoms, ints, pot, x0 = _dimer_box()
    cfg = CellInternalEnsembleConfig(
        natoms=4, nint=ints.nint, ncell=9, rigid_fragments=True,
    )
    cell0 = jnp.asarray(atoms.cell)
    cell_of, make_enthalpy = _cell_map(cfg, None)
    enthalpy = make_enthalpy(pot)
    transport, gs_corr = _rigid_maps(ints, cfg, cell_of)

    rng = np.random.RandomState(5)
    s = jnp.asarray(0.03 * rng.normal(size=9))
    x = x0[0]
    g = jax.grad(enthalpy, argnums=0)(x, s, cell0)
    gs_part = jax.grad(enthalpy, argnums=1)(x, s, cell0)
    gs_tot = np.asarray(gs_part + gs_corr(g, x, s, cell0))

    h = 1e-6
    c_here = cell_of(s, cell0)
    for k in range(9):
        sp = s.at[k].add(h)
        sm = s.at[k].add(-h)
        fp = enthalpy(transport(x, c_here, cell_of(sp, cell0)), sp,
                      cell0)
        fm = enthalpy(transport(x, c_here, cell_of(sm, cell0)), sm,
                      cell0)
        fd = float((fp - fm) / (2 * h))
        # atol = central-FD noise floor on this meV-scale enthalpy; the
        # dominant components agree to ~5 digits
        np.testing.assert_allclose(gs_tot[k], fd, rtol=1e-3, atol=5e-7)


def test_cell_internal_rigid_singleton_consistency():
    """With every atom its own fragment the rigid transport degenerates
    to the affine map, so a rigid_fragments=True bulk run must recover
    the same equilibrium lattice as the standard run."""
    atoms, ints, x0, s0 = _bulk_setup()
    nat = len(atoms)
    cfg = CellInternalEnsembleConfig(
        natoms=nat, nint=ints.nint, ncell=9, order=0, fmax=5e-3,
        delta0=0.1, h0_cell=10.0, rigid_fragments=True,
    )
    st = run_cell_internal_ensemble(
        LennardJones(pbc=True), ints, x0, cfg, jnp.asarray(atoms.cell),
        s0=s0, max_steps=200, steps_per_call=5,
    )
    assert bool(st.converged.all()), np.asarray(st.nsteps)
    cells = np.asarray(realized_cells(st, cfg))
    for C in cells:
        lat = np.linalg.norm(C, axis=1) / 2.0
        assert 1.53 < lat[0] < 1.60, lat
