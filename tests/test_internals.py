"""Internal-coordinate engine tests: topology discovery, FD checks of
the B matrix and curvature contractions (mirrors
/root/reference/tests/internal/test_get_internal.py:26-55)."""
import numpy as np
import pytest

from sella_tpu import Atoms
from sella_tpu.coords.internals import Internals


def water():
    r, ang = 0.9575, np.radians(104.51)
    return Atoms(
        "OH2",
        [[0, 0, 0],
         [r, 0, 0],
         [r * np.cos(ang), r * np.sin(ang), 0]],
    )


def ethane():
    # staggered ethane, approximate geometry
    cc = 1.54
    ch = 1.09
    a = np.radians(111.2)
    pos = [[0, 0, 0], [0, 0, cc]]
    # three H on each carbon
    for k in range(3):
        phi = 2 * np.pi * k / 3
        pos.append([
            ch * np.sin(a) * np.cos(phi),
            ch * np.sin(a) * np.sin(phi),
            -ch * np.cos(a) + 0.0,
        ])
    for k in range(3):
        phi = 2 * np.pi * k / 3 + np.pi / 3
        pos.append([
            ch * np.sin(a) * np.cos(phi),
            ch * np.sin(a) * np.sin(phi),
            cc + ch * np.cos(a),
        ])
    return Atoms("C2H6", pos)


def test_topology_water():
    ints = Internals(water())
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.nbonds == 2
    assert ints.nangles == 1
    assert ints.ndihedrals == 0
    ints.validate_basis()  # 3 coords == 3*3-6 DOF


def test_topology_ethane():
    ints = Internals(ethane())
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.nbonds == 7
    # 6 HCC + 2x3 HCH angles
    assert ints.nangles == 12
    assert ints.ndihedrals == 9
    # redundant set must span 3*8-6 = 18 DOF
    jac = ints.jacobian()
    s = np.linalg.svd(jac, compute_uv=False)
    assert int(np.sum(s > 1e-8)) == 18


def _fd_jacobian(ints, h=1e-6):
    pos0 = ints.atoms.positions.copy()
    n = len(ints.atoms)
    q0 = ints.calc()
    J = np.zeros((len(q0), 3 * n))
    for d in range(3 * n):
        ints.atoms.positions = pos0.copy()
        ints.atoms.positions.ravel()[d] += h
        qp = ints.calc()
        ints.atoms.positions = pos0.copy()
        ints.atoms.positions.ravel()[d] -= h
        qm = ints.calc()
        J[:, d] = ints.wrap(qp - qm) / (2 * h)
    ints.atoms.positions = pos0
    return J


@pytest.mark.parametrize("factory", [water, ethane])
def test_jacobian_fd(factory):
    ints = Internals(factory())
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    J = ints.jacobian()
    J_fd = _fd_jacobian(ints)
    np.testing.assert_allclose(J, J_fd, rtol=1e-6, atol=1e-7)


def test_hessian_rdot_fd():
    ints = Internals(water())
    ints.find_all_bonds()
    ints.find_all_angles()
    rng = np.random.RandomState(0)
    v = rng.normal(size=3 * len(ints.atoms))
    D = ints.hessian_rdot(v)
    # FD: (J(x + hv) - J(x - hv)) / 2h
    h = 1e-6
    pos0 = ints.atoms.positions.copy()
    ints.atoms.positions = pos0 + h * v.reshape(-1, 3)
    Jp = ints.jacobian()
    ints.atoms.positions = pos0 - h * v.reshape(-1, 3)
    Jm = ints.jacobian()
    ints.atoms.positions = pos0
    np.testing.assert_allclose(D, (Jp - Jm) / (2 * h), rtol=1e-5, atol=1e-6)


def test_hessian_ldot_fd():
    ints = Internals(ethane())
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    rng = np.random.RandomState(1)
    w = rng.normal(size=ints.nint)
    Hl = ints.hessian_ldot(w)
    # FD of grad of (w . q)
    h = 1e-6
    pos0 = ints.atoms.positions.copy()
    n3 = 3 * len(ints.atoms)
    H_fd = np.zeros((n3, n3))
    for d in range(n3):
        ints.atoms.positions = pos0.copy()
        ints.atoms.positions.ravel()[d] += h
        gp = w @ ints.jacobian()
        ints.atoms.positions = pos0.copy()
        ints.atoms.positions.ravel()[d] -= h
        gm = w @ ints.jacobian()
        H_fd[d] = (gp - gm) / (2 * h)
    ints.atoms.positions = pos0
    np.testing.assert_allclose(Hl, H_fd, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Hl, Hl.T, atol=1e-10)


def test_guess_hessian_positive():
    ints = Internals(ethane())
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    h0 = ints.guess_hessian()
    assert h0.shape == (ints.nint, ints.nint)
    assert np.all(np.diag(h0) > 0)


def test_tric_fragments():
    """Two separated waters with allow_fragments: per-fragment
    translations + rotations (TRICs), spanning all 3N DOF."""
    w1 = water()
    w2 = water()
    w2.positions = w2.positions + np.array([6.0, 0.2, 0.1])
    atoms = Atoms(
        ["O", "H", "H", "O", "H", "H"],
        np.vstack([w1.positions, w2.positions]),
    )
    ints = Internals(atoms, allow_fragments=True)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.ntrans == 6      # 3 per fragment
    assert ints.nrotations == 6  # 3 per fragment
    jac = ints.jacobian()
    s = np.linalg.svd(jac, compute_uv=False)
    assert int(np.sum(s > 1e-8)) == 18  # full 3N


def test_user_coordinate_and_displacement():
    """User-defined coordinates (make_internal equivalent) and the
    Displacement coordinate participate in q/B/ldot like built-ins."""
    import jax.numpy as jnp

    ints = Internals(water())
    ints.find_all_bonds()
    ints.find_all_angles()
    # custom coordinate: distance between the two hydrogens
    ints.add_user_coordinate(
        lambda p: jnp.linalg.norm(p[1] - p[0]), np.array([1, 2])
    )
    ints.add_displacement()
    assert ints.nother == 2
    q = ints.calc()
    assert q.shape == (ints.nint,)
    # H-H distance value
    hh = np.linalg.norm(
        ints.atoms.positions[2] - ints.atoms.positions[1]
    )
    np.testing.assert_allclose(q[3], hh, atol=1e-12)
    np.testing.assert_allclose(q[4], 0.0, atol=1e-12)  # displacement at ref
    # FD check of the full Jacobian including the custom rows
    J = ints.jacobian()
    J_fd = _fd_jacobian(ints)
    np.testing.assert_allclose(J, J_fd, rtol=1e-6, atol=1e-7)
    # ldot with weight only on the custom coordinate
    w = np.zeros(ints.nint)
    w[3] = 1.0
    Hl = ints.hessian_ldot(w)
    np.testing.assert_allclose(Hl, Hl.T, atol=1e-10)
    assert np.abs(Hl).max() > 0


def test_cell_jacobian_fd():
    """dq/dcell of periodic-image bonds vs finite differences
    (cf. the reference's cell-derivative closures, internal.py:148-185
    and the periodic-image cell checks in test_cell_optimization.py)."""
    atoms = Atoms("CuCu", [[0.1, 0, 0], [1.9, 0.1, 0.2]],
                  cell=np.diag([3.4, 3.6, 3.8]), pbc=True)
    ints = Internals(atoms)
    ints.add_bond((0, 1), ncvec=(1, 0, 0))   # periodic-image bond
    ints.add_bond((0, 1))
    J = ints.cell_jacobian()
    assert J.shape == (2, 3, 3)
    h = 1e-6
    cell0 = atoms.cell.copy()
    J_fd = np.zeros_like(J)
    for a in range(3):
        for b in range(3):
            atoms.cell = cell0.copy()
            atoms.cell[a, b] += h
            qp = ints.calc()
            atoms.cell = cell0.copy()
            atoms.cell[a, b] -= h
            qm = ints.calc()
            J_fd[:, a, b] = (qp - qm) / (2 * h)
    atoms.cell = cell0
    np.testing.assert_allclose(J, J_fd, rtol=1e-6, atol=1e-8)
    # the non-periodic bond is cell-independent
    np.testing.assert_allclose(J[1], 0.0, atol=1e-12)


def test_tric_cell_jacobian_rows_zero():
    """TRIC translations/rotations and non-image bonds are
    cell-independent: their dq/dcell rows vanish identically
    (reference TestTRICsCellDerivatives,
    test_cell_optimization.py:831-923)."""
    pos = np.array([
        [2.0, 2.0, 2.0], [2.0, 2.0, 4.0],
        [7.0, 5.5, 3.0], [7.0, 7.5, 3.0],
    ])
    atoms = Atoms(["Ar"] * 4, pos, cell=np.eye(3) * 12.0, pbc=True)
    ints = Internals(atoms, allow_fragments=True)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.ntrans > 0 and ints.nrotations > 0

    J = ints.cell_jacobian()        # (nint, 3, 3)
    # translations first in the coordinate ordering; rotations last
    np.testing.assert_allclose(J[: ints.ntrans], 0.0, atol=1e-14)
    if ints.nrotations:
        np.testing.assert_allclose(
            J[ints.nint - ints.nrotations:], 0.0, atol=1e-14
        )
    # in-cell (ncvec = 0) bonds are cell-independent too
    for m, (i, j, ncvec) in enumerate(ints.bonds):
        if not np.any(np.asarray(ncvec)):
            np.testing.assert_allclose(
                J[ints.ntrans + m], 0.0, atol=1e-14
            )


def test_self_check_methods():
    """User-facing FD self-checks (reference Coordinate.check_gradient /
    check_hessian, internal.py:289-328) pass on a TRIC water dimer and
    fail loudly on an inconsistent geometry scale."""
    pos = np.array([
        [0.0, 0.0, 0.0], [0.96, 0.0, 0.0], [-0.24, 0.93, 0.0],
        [3.0, 3.0, 3.0], [3.96, 3.0, 3.0], [2.76, 3.93, 3.0],
    ])
    atoms = Atoms(["O", "H", "H"] * 2, pos)
    ints = Internals(atoms, allow_fragments=True)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.check_gradient() < 1e-5
    assert ints.check_hessian() < 1e-3
