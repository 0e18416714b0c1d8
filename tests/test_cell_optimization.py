"""Cell optimization tests (cf. /root/reference/tests/test_cell_optimization.py,
scaled down): full cell+atom relaxation, cell-gradient FD check, masks,
external pressure."""
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu import Sella
from sella_tpu.pes.cell import CellCartesianPES
from sella_tpu.potentials.emt import EMT, fcc_bulk


def _strained_bulk(a=3.45, shear=0.03, noise=0.03, seed=0):
    atoms = fcc_bulk("Cu", a, reps=(2, 2, 2))
    S = np.eye(3)
    S[0, 1] = shear
    atoms.cell = atoms.cell @ S.T
    atoms.positions = atoms.positions @ S.T
    rng = np.random.RandomState(seed)
    atoms.positions = atoms.positions + noise * rng.normal(
        size=atoms.positions.shape
    )
    return atoms


def test_cell_gradient_fd():
    """The autodiff cell gradient must match FD in the masked
    log-deformation parameters (replaces the reference's
    stress->gradient FD checks, test_cell_optimization.py:41-186)."""
    atoms = _strained_bulk()
    pes = CellCartesianPES(atoms)
    g = pes.get_g()
    x0 = pes.get_x()
    h = 1e-6
    for k in range(pes.n_cart, pes.dim):
        xp = x0.copy()
        xp[k] += h
        pes.set_x(xp)
        fp = pes.get_f()
        xm = x0.copy()
        xm[k] -= h
        pes.set_x(xm)
        fm = pes.get_f()
        pes.set_x(x0)
        np.testing.assert_allclose(
            (fp - fm) / (2 * h), g[k], rtol=1e-4, atol=1e-8
        )


def test_full_cell_relaxation():
    atoms = _strained_bulk()
    opt = Sella(atoms, order=0, optimize_cell=True, logfile=None)
    assert opt.run(fmax=5e-3, steps=300)
    a_eff = np.linalg.det(atoms.cell) ** (1 / 3) / 2
    assert abs(a_eff - 3.594) < 0.01, a_eff
    # shear removed
    c = atoms.cell
    for i, j in ((0, 1), (0, 2), (1, 2)):
        cosang = c[i] @ c[j] / (
            np.linalg.norm(c[i]) * np.linalg.norm(c[j])
        )
        assert abs(cosang) < 1e-3
    conv = opt.pes.converged(5e-3, smax=5e-3)
    assert conv[0]


def test_hydrostatic_mask():
    """Diagonal-only mask: shear stays, volume relaxes."""
    atoms = _strained_bulk(a=3.45, shear=0.02, noise=0.0)
    cell_before = atoms.cell.copy()
    mask = np.eye(3, dtype=bool)
    opt = Sella(
        atoms, order=0, optimize_cell=True, cell_mask=mask, logfile=None
    )
    opt.run(fmax=5e-3, steps=200)
    # off-diagonal deformation ratio preserved (shear not relaxed)
    F = atoms.cell @ np.linalg.inv(cell_before)
    assert abs(np.linalg.det(atoms.cell)) > abs(
        np.linalg.det(cell_before)
    )  # expanded from compression
    # shear angle unchanged within tolerance
    c = atoms.cell
    cos01 = c[0] @ c[1] / (np.linalg.norm(c[0]) * np.linalg.norm(c[1]))
    assert abs(cos01) > 1e-3  # shear persists


def test_cell_internal_tric():
    """CellInternalPES: fcc Ar (LJ) with per-atom TRIC translations +
    cell DOF relaxes compressed lattice to the LJ equilibrium (cf. the
    reference's molecular-crystal cell tests)."""
    from sella_tpu import Atoms
    from sella_tpu.potentials import LennardJones

    a = 5.0
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    reps = 2
    pos = np.vstack([
        (base + [ix, iy, iz]) * a
        for ix in range(reps) for iy in range(reps) for iz in range(reps)
    ])
    atoms = Atoms(["Ar"] * len(pos), pos, cell=np.diag([a * reps] * 3),
                  pbc=True)
    atoms.calc = LennardJones(epsilon=0.0104, sigma=3.4, pbc=True)
    rng = np.random.RandomState(0)
    atoms.positions = atoms.positions + 0.05 * rng.normal(
        size=atoms.positions.shape
    )
    opt = Sella(atoms, order=0, optimize_cell=True, internal=True,
                allow_fragments=True, logfile=None)
    assert opt.pes.n_internal == 3 * len(pos)  # pure TRIC translations
    assert opt.run(fmax=2e-3, steps=200)
    a_eff = np.linalg.det(atoms.cell) ** (1 / 3) / reps
    assert abs(a_eff - 5.33) < 0.05, a_eff


def test_scalar_pressure():
    """External pressure shrinks the equilibrium volume."""
    a0 = 3.594
    atoms1 = fcc_bulk("Cu", a0, reps=(2, 2, 2))
    opt = Sella(
        atoms1, order=0, optimize_cell=True, scalar_pressure=0.06,
        logfile=None,
    )
    opt.run(fmax=5e-3, steps=200)
    v_p = np.linalg.det(atoms1.cell)
    v_0 = (2 * a0) ** 3
    assert v_p < 0.99 * v_0, (v_p, v_0)


def test_niggli_reduction():
    """A heavily sheared cell triggers the rebase; optimization still
    converges to the equilibrium lattice with near-orthogonal cell."""
    atoms = fcc_bulk("Cu", 3.55, reps=(2, 2, 2))
    S = np.eye(3)
    S[0, 1] = 0.8  # ~ 39 deg skew
    atoms.cell = atoms.cell @ S.T
    atoms.positions = atoms.positions @ S.T
    opt = Sella(atoms, order=0, optimize_cell=True, niggli=True,
                logfile=None)
    # the skew exceeds the 30-deg threshold: first reduce event fires
    assert opt.run(fmax=5e-3, steps=300)
    c = atoms.cell
    for i, j in ((0, 1), (0, 2), (1, 2)):
        cosang = abs(
            c[i] @ c[j] / (np.linalg.norm(c[i]) * np.linalg.norm(c[j]))
        )
        assert cosang < 0.35, cosang  # compact cell, no extreme skew
    a_eff = abs(np.linalg.det(atoms.cell)) ** (1 / 3) / 2
    assert abs(a_eff - 3.594) < 0.02, a_eff
