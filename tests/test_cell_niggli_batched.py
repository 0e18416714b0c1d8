"""Per-lane Niggli/cell rebase for the batched atom+cell tier.

The sequential cell classes rebase onto a reduced lattice basis when
the cell skews (``pes/cell.py maybe_niggli_reduce``; reference
``optimize.py:437-440``, ``peswrapper.py:151-211, 2511-2555``). The
batched tier's analogue (:func:`sella_tpu.parallel.ensemble_cell.
niggli_rebase_cell_lanes`) rebases individual lanes between jitted
chunks — possible because the base cell is per-lane state
(``CellSearchState.cell0``), so no recompilation happens.
"""
import numpy as np

import jax.numpy as jnp

from sella_tpu.parallel.ensemble_cell import (
    CellEnsembleConfig,
    cells_of,
    init_cell_state,
    niggli_rebase_cell_lanes,
    run_cell_ensemble,
)
from sella_tpu.potentials import LennardJones
from sella_tpu.potentials.emt import fcc_bulk

SKEW = np.array([[1, 0, 0], [1, 1, 0], [0, 0, 1]], dtype=float)


def _angle_dev(cell):
    devs = []
    for i, j in ((0, 1), (0, 2), (1, 2)):
        c = cell[i] @ cell[j] / (
            np.linalg.norm(cell[i]) * np.linalg.norm(cell[j])
        )
        devs.append(abs(np.degrees(np.arccos(np.clip(c, -1, 1))) - 90.0))
    return max(devs)


def _setup(Bsz=2, reps=3, a0=1.55, rc=1.4, seed=0):
    """Same LATTICE in two representations: lane 0 pristine cubic,
    lane 1 sheared by a unimodular integer matrix (45 deg skew). rc is
    under half the skewed cell's minimum plane spacing, so the naive
    MIC is exact for BOTH representations and physics must agree."""
    atoms = fcc_bulk("Cu", a0, reps=(reps, reps, reps))
    pot = LennardJones(pbc=True, rc=rc)
    cell = np.asarray(atoms.cell)
    skewed = SKEW @ cell
    assert _angle_dev(skewed) > 40.0
    rng = np.random.RandomState(seed)
    x0 = jnp.asarray(np.stack([
        (atoms.positions
         + 0.01 * rng.normal(size=atoms.positions.shape)).ravel()
        for _ in range(Bsz)
    ]))
    cell0 = jnp.asarray(np.stack(
        [cell] + [skewed] * (Bsz - 1)
    ))
    return pot, atoms, x0, cell0


def test_rebase_event_mechanics():
    """The skewed lane rebases in-place: base cell de-skews, cell
    params zero, energy/gradient unchanged at the same physical point,
    pristine lane untouched."""
    pot, atoms, x0, cell0 = _setup()
    nat = len(atoms)
    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0, fmax=5e-3)
    st = init_cell_state(pot, x0, cfg, cell0)
    f_before = np.asarray(st.f).copy()
    g_before = np.asarray(st.g).copy()
    z_before = np.asarray(st.z).copy()

    st2, hit = niggli_rebase_cell_lanes(st, cfg, potential=pot)
    assert list(hit) == [False, True]
    # pristine lane bitwise untouched
    np.testing.assert_array_equal(np.asarray(st2.z)[0], z_before[0])
    np.testing.assert_array_equal(np.asarray(st2.cell0)[0],
                                  np.asarray(cell0)[0])
    # skewed lane: base de-skewed, params zeroed, POSITIONS untouched
    # (no wrap — the chart change stays exact; see production note)
    c0_new = np.asarray(st2.cell0)[1]
    assert _angle_dev(c0_new) < 5.0, c0_new
    np.testing.assert_array_equal(np.asarray(st2.z)[1, 3 * nat:], 0.0)
    np.testing.assert_array_equal(
        np.asarray(st2.z)[1, : 3 * nat], z_before[1, : 3 * nat]
    )
    # same physical point: energy and atom-block gradient identical
    np.testing.assert_allclose(np.asarray(st2.f)[1], f_before[1],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(st2.g)[1, : 3 * nat], g_before[1, : 3 * nat],
        atol=1e-8,
    )
    # transferred Hessian stays symmetric and finite
    H1 = np.asarray(st2.H)[1]
    assert np.isfinite(H1).all()
    np.testing.assert_allclose(H1, H1.T, atol=1e-10)
    # idempotent: nothing left to rebase
    _, hit2 = niggli_rebase_cell_lanes(st2, cfg, potential=pot)
    assert not hit2.any()


def test_rebase_gradient_parameterization():
    """The cell-block gradient after the rebase equals the chain-rule
    transform of the old one: g_new = T^T g_old with
    T = J_old^{-1} (M^{-1} ⊗ I) J_new — same-lattice perturbations of
    the two representations relate by dC_old = M^{-1} dC_new. NOTE the
    reference's transform (``peswrapper.py:151-211``) drops the M^{-1}
    factor; without it this pin fails with O(1) error (verified), so
    the fix is deliberate divergence, not a port artifact."""
    from sella_tpu.pes.cell import _cell_param_jacobian
    from sella_tpu.utils.lattice import reduce_cell_basis

    pot, atoms, x0, cell0 = _setup()
    nat = len(atoms)
    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0)
    st = init_cell_state(pot, x0, cfg, cell0)
    g_cell_old = np.asarray(st.g)[1, 3 * nat:]

    st2, hit = niggli_rebase_cell_lanes(st, cfg, potential=pot)
    assert hit[1]
    _, M = reduce_cell_basis(np.asarray(cell0)[1])
    np.testing.assert_array_equal(
        M @ np.asarray(cell0)[1], np.asarray(st2.cell0)[1]
    )
    factor = float(nat)
    J_old = _cell_param_jacobian(
        np.zeros((3, 3)), np.asarray(cell0)[1], factor
    )
    J_new = _cell_param_jacobian(
        np.zeros((3, 3)), np.asarray(st2.cell0)[1], factor
    )
    K = np.kron(np.linalg.inv(M), np.eye(3))
    T = np.linalg.solve(J_old, K @ J_new)
    g_cell_new = np.asarray(st2.g)[1, 3 * nat:]
    np.testing.assert_allclose(g_cell_new, T.T @ g_cell_old,
                               rtol=1e-6, atol=1e-9)


def test_run_with_niggli_converges_to_same_minimum():
    """End-to-end: a lane whose base cell is a 45-deg-skewed
    representation of the same lattice is rebased mid-run
    (run_cell_ensemble(niggli=True)) and converges to the same energy
    as the pristine lane — with a de-skewed base cell."""
    pot, atoms, x0, cell0 = _setup()
    nat = len(atoms)
    cfg = CellEnsembleConfig(natoms=nat, ncell=9, order=0, fmax=5e-3,
                             delta0=0.1)
    st = run_cell_ensemble(pot, x0, cfg, cell0, max_steps=150,
                           steps_per_call=5, niggli=True)
    assert bool(st.converged.all()), np.asarray(st.nsteps)
    f = np.asarray(st.f)
    np.testing.assert_allclose(f[1], f[0], rtol=1e-6)
    # the skewed lane's base cell was actually rebased
    assert _angle_dev(np.asarray(st.cell0)[1]) < 5.0
    # realized cells of both lanes describe equivalent lattices
    cells = np.asarray(cells_of(st, cfg))
    v0, v1 = (abs(np.linalg.det(C)) for C in cells)
    np.testing.assert_allclose(v1, v0, rtol=1e-4)
