"""FD-vs-AD derivative checks for coordinate primitives
(cf. /root/reference/tests/internal/test_get_internal.py:26-55 and the
Coordinate.check_gradient/check_hessian self-checks, internal.py:289-328)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu.coords import primitives as prim
from sella_tpu.coords.constraints import Constraints
from sella_tpu.atoms import Atoms


def _fd_grad(fn, pos, h=1e-5):
    pos = np.asarray(pos, dtype=float)
    g = np.zeros_like(pos)
    for i in range(pos.shape[0]):
        for j in range(3):
            pp = pos.copy()
            pp[i, j] += h
            pm = pos.copy()
            pm[i, j] -= h
            g[i, j] = (float(fn(jnp.asarray(pp))) - float(fn(jnp.asarray(pm)))) / (2 * h)
    return g


@pytest.mark.parametrize("kind,k", [("bond", 2), ("angle", 3), ("dihedral", 4)])
def test_primitive_gradients(kind, k):
    rng = np.random.RandomState(0)
    pos = rng.normal(size=(k, 3)) * 1.5
    tvec = jnp.zeros((k - 1, 3))
    val_fn = {"bond": prim.bond_value, "angle": prim.angle_value,
              "dihedral": prim.dihedral_value}[kind]
    grad_fn = {"bond": prim.bond_grad, "angle": prim.angle_grad,
               "dihedral": prim.dihedral_grad}[kind]
    g = np.asarray(grad_fn(jnp.asarray(pos), tvec))
    g_fd = _fd_grad(lambda p: val_fn(p, tvec), pos)
    np.testing.assert_allclose(g, g_fd, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("kind,k", [("bond", 2), ("angle", 3), ("dihedral", 4)])
def test_primitive_hessians(kind, k):
    rng = np.random.RandomState(1)
    pos = rng.normal(size=(k, 3)) * 1.5
    tvec = jnp.zeros((k - 1, 3))
    grad_fn = {"bond": prim.bond_grad, "angle": prim.angle_grad,
               "dihedral": prim.dihedral_grad}[kind]
    hess_fn = {"bond": prim.bond_hess, "angle": prim.angle_hess,
               "dihedral": prim.dihedral_hess}[kind]
    H = np.asarray(hess_fn(jnp.asarray(pos), tvec)).reshape(3 * k, 3 * k)
    # FD of the gradient
    h = 1e-5
    H_fd = np.zeros((3 * k, 3 * k))
    for i in range(k):
        for j in range(3):
            pp = pos.copy()
            pp[i, j] += h
            pm = pos.copy()
            pm[i, j] -= h
            H_fd[3 * i + j] = (
                (np.asarray(grad_fn(jnp.asarray(pp), tvec))
                 - np.asarray(grad_fn(jnp.asarray(pm), tvec))) / (2 * h)
            ).ravel()
    np.testing.assert_allclose(H, H_fd, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(H, H.T, atol=1e-10)


def test_rotation_value_identity():
    rng = np.random.RandomState(2)
    pos = rng.normal(size=(5, 3))
    v = prim.rotation_value(jnp.asarray(pos), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-12)


def test_rotation_value_known_rotation():
    """Rotating a fragment about z by theta gives rotation vector ~ theta*ez."""
    rng = np.random.RandomState(3)
    ref = rng.normal(size=(6, 3))
    theta = 0.3
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    com = ref.mean(axis=0)
    pos = (ref - com) @ R.T + com
    v = np.asarray(prim.rotation_value(jnp.asarray(pos), jnp.asarray(ref)))
    np.testing.assert_allclose(v, [0, 0, theta], atol=1e-10)


def test_rotation_jacobian_fd():
    rng = np.random.RandomState(4)
    ref = rng.normal(size=(5, 3))
    # evaluate away from identity to test the generic branch
    pos = ref + 0.1 * rng.normal(size=(5, 3))
    J = np.asarray(prim.rotation_jac(jnp.asarray(pos), jnp.asarray(ref)))
    h = 1e-6
    for axis in range(3):
        fd = _fd_grad(
            lambda p: prim.rotation_value(p, jnp.asarray(ref))[axis], pos, h
        )
        np.testing.assert_allclose(J[axis], fd, rtol=1e-5, atol=1e-7)


def test_rotation_jacobian_at_identity():
    """At the reference geometry the Jacobian must be finite (the NaN trap
    the reference works around, internal.py:496-505)."""
    rng = np.random.RandomState(5)
    ref = rng.normal(size=(5, 3))
    J = np.asarray(prim.rotation_jac(jnp.asarray(ref), jnp.asarray(ref)))
    assert np.all(np.isfinite(J))
    fd = np.stack([
        _fd_grad(lambda p: prim.rotation_value(p, jnp.asarray(ref))[a], ref)
        for a in range(3)
    ])
    np.testing.assert_allclose(J, fd, rtol=1e-5, atol=1e-6)


def test_rotation_hessian_fd():
    rng = np.random.RandomState(6)
    ref = rng.normal(size=(4, 3))
    pos = ref + 0.05 * rng.normal(size=(4, 3))
    Hs = np.asarray(prim.rotation_hess(jnp.asarray(pos), jnp.asarray(ref)))
    assert np.all(np.isfinite(Hs))
    h = 1e-5
    for axis in range(3):
        H_fd = np.zeros((4, 3, 4, 3))
        for i in range(4):
            for j in range(3):
                pp = pos.copy(); pp[i, j] += h
                pm = pos.copy(); pm[i, j] -= h
                Jp = np.asarray(prim.rotation_jac(jnp.asarray(pp), jnp.asarray(ref)))[axis]
                Jm = np.asarray(prim.rotation_jac(jnp.asarray(pm), jnp.asarray(ref)))[axis]
                H_fd[i, j] = (Jp - Jm) / (2 * h)
        np.testing.assert_allclose(
            Hs[axis], H_fd.transpose(0, 1, 2, 3).reshape(4, 3, 4, 3),
            rtol=1e-4, atol=1e-5,
        )


def test_constraints_basic():
    rng = np.random.RandomState(7)
    atoms = Atoms("Xe4", positions=rng.normal(size=(4, 3)) * 2)
    cons = Constraints(atoms)
    cons.fix_translation()
    cons.fix_rotation()
    assert cons.ncons == 6
    res = cons.residual()
    np.testing.assert_allclose(res, 0.0, atol=1e-12)
    drdx = cons.jacobian()
    assert drdx.shape == (6, 12)
    # translation rows: uniform 1/n
    np.testing.assert_allclose(drdx[0].reshape(4, 3)[:, 0], 0.25)
    # rows are linearly independent for a generic cluster
    s = np.linalg.svd(drdx, compute_uv=False)
    assert s.min() > 1e-6


def test_constraints_jacobian_fd():
    rng = np.random.RandomState(8)
    atoms = Atoms("Xe4", positions=rng.normal(size=(4, 3)) * 2)
    cons = Constraints(atoms)
    cons.fix_bond((0, 1))
    cons.fix_angle((0, 1, 2))
    cons.fix_dihedral((0, 1, 2, 3))
    drdx = cons.jacobian()
    h = 1e-6
    pos0 = atoms.positions.copy()
    fd = np.zeros_like(drdx)
    for d in range(12):
        atoms.positions = pos0.ravel().copy().reshape(4, 3)
        atoms.positions.ravel()[d] += h
        atoms.positions = atoms.positions  # no-op, keep explicit
        cp = cons.calc()
        atoms.positions = pos0.copy()
        atoms.positions.ravel()[d] -= h
        cm = cons.calc()
        fd[:, d] = (cp - cm) / (2 * h)
        atoms.positions = pos0.copy()
    np.testing.assert_allclose(drdx, fd, rtol=1e-5, atol=1e-7)


def test_constraints_inequality():
    rng = np.random.RandomState(9)
    atoms = Atoms("Xe2", positions=[[0, 0, 0], [2.0, 0, 0]])
    cons = Constraints(atoms)
    cons.fix_bond((0, 1), target=3.0, comparator="lt")
    assert cons.has_inequalities()
    cons.disable_satisfied_inequalities()
    assert cons.ncons == 0  # satisfied: 2.0 < 3.0
    atoms.positions[1, 0] = 4.0
    assert not cons.validate_inequalities()
    assert cons.ncons == 1


def test_merge_ase_constraint_ducktyped():
    """ASE-constraint ingestion mapped by class name (ASE optional)."""

    class FixAtoms:
        def __init__(self, index):
            self.index = index

    class FixBondLengths:
        def __init__(self, pairs, bondlengths=None):
            self.pairs = pairs
            self.bondlengths = bondlengths

    class Unknown:
        pass

    rng = np.random.RandomState(11)
    atoms = Atoms("Xe4", positions=rng.normal(size=(4, 3)) * 3)
    cons = Constraints(atoms)
    cons.merge_ase_constraint(FixAtoms(index=[0, 2]))
    assert len(cons.records["translations"]) == 6  # 3 per fixed atom
    cons.merge_ase_constraint(FixBondLengths(pairs=[(1, 3)]))
    assert len(cons.records["bonds"]) == 1
    with pytest.raises(RuntimeError):
        cons.merge_ase_constraint(Unknown())


def test_rotation_hessian_degenerate_spectrum():
    """Closed-form rotation second derivatives (primitives._dq_jvp,
    reference internal.py:706-798) must be finite and FD-exact on
    symmetric fragments whose Kearsley spectrum is degenerate — the
    square and the identity-aligned tetrahedron NaN'd under plain
    eigh-AD."""
    import jax.numpy as jnp

    from sella_tpu.coords import primitives as prim

    def fd_hess(pos, ref, h=1e-6):
        n = pos.shape[0]
        H = np.zeros((3, n, 3, n, 3))
        for a in range(n):
            for c in range(3):
                pp = pos.copy(); pp[a, c] += h
                pm = pos.copy(); pm[a, c] -= h
                Jp = np.asarray(prim.rotation_jac(jnp.asarray(pp),
                                                  jnp.asarray(ref)))
                Jm = np.asarray(prim.rotation_jac(jnp.asarray(pm),
                                                  jnp.asarray(ref)))
                H[:, :, :, a, c] = (Jp - Jm) / (2 * h)
        return H

    cases = {}
    # square, rotated 0.3 rad in-plane
    ref = np.array([[1.0, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0]])
    th = 0.3
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    cases["square"] = (ref @ R.T, ref)
    # tetrahedron at the identity rotation
    tet = np.array([[1.0, 1, 1], [1, -1, -1], [-1, 1, -1],
                    [-1, -1, 1]]) / np.sqrt(3)
    cases["tetrahedron"] = (tet.copy(), tet)

    for name, (pos, ref) in cases.items():
        H = np.asarray(prim.rotation_hess(jnp.asarray(pos),
                                          jnp.asarray(ref)))
        assert np.all(np.isfinite(H)), name
        np.testing.assert_allclose(H, fd_hess(pos, ref), atol=5e-9,
                                   err_msg=name)


def test_constraint_hessian_ldot_symmetric_fragment():
    """hessian_ldot with a non-zero rotation multiplier on a symmetric
    (square) fragment: previously skipped via an |L| threshold, now
    evaluated exactly. FD of L^T jacobian(x) is the ground truth."""
    from sella_tpu.atoms import Atoms
    from sella_tpu.coords.constraints import Constraints

    pos = np.array([
        [1.0, 0, 0], [0, 1, 0], [-1, 0, 0], [0, -1, 0],   # square
        [2.5, 0.3, 0.7],                                   # spectator
    ])
    atoms = Atoms(["C"] * 5, pos)
    cons = Constraints(atoms)
    cons.fix_rotation(indices=[0, 1, 2, 3])
    L = np.array([0.7, -0.3, 1.1])  # deliberately non-zero multipliers

    Hc = cons.hessian_ldot(L)
    assert np.all(np.isfinite(Hc))

    h = 1e-6
    n = len(atoms)
    Hfd = np.zeros((3 * n, 3 * n))
    for a in range(3 * n):
        pp = pos.copy().ravel(); pp[a] += h
        pm = pos.copy().ravel(); pm[a] -= h
        atoms.positions = pp.reshape(-1, 3)
        gp = L @ cons.jacobian()
        atoms.positions = pm.reshape(-1, 3)
        gm = L @ cons.jacobian()
        Hfd[:, a] = (gp - gm) / (2 * h)
    atoms.positions = pos
    np.testing.assert_allclose(Hc, Hfd, atol=5e-9)


def test_fix_other_custom_coordinate():
    """fix_other (reference internal.py:2955-2979): residual, AD
    Jacobian, and AD curvature of a user-defined scalar coordinate."""
    rng = np.random.RandomState(3)
    pos = rng.normal(size=(4, 3)) * 1.5
    atoms = Atoms(["H"] * 4, pos.copy())
    cons = Constraints(atoms)

    def rsq(p):  # sum of squared distances from atom 0 to atoms 1,2
        return jnp.sum((p[1:] - p[0]) ** 2)

    cons.fix_other(rsq, [0, 1, 2], target=2.5)
    assert cons.ncons == 1
    np.testing.assert_allclose(cons.targets, [2.5])

    # residual matches direct evaluation
    want = float(rsq(jnp.asarray(pos[[0, 1, 2]]))) - 2.5
    np.testing.assert_allclose(cons.residual(), [want], rtol=1e-12)

    # Jacobian vs FD through the public residual()
    drdx = cons.jacobian()
    assert drdx.shape == (1, 12)
    h = 1e-6
    for a in range(12):
        pp = pos.ravel().copy(); pp[a] += h
        pm = pos.ravel().copy(); pm[a] -= h
        atoms.positions = pp.reshape(-1, 3)
        rp = cons.residual()[0]
        atoms.positions = pm.reshape(-1, 3)
        rm = cons.residual()[0]
        np.testing.assert_allclose(drdx[0, a], (rp - rm) / (2 * h),
                                   atol=1e-7)
    atoms.positions = pos.copy()

    # hessian_ldot vs FD of L^T jacobian
    L = np.array([0.8])
    Hc = cons.hessian_ldot(L)
    Hfd = np.zeros((12, 12))
    for a in range(12):
        pp = pos.ravel().copy(); pp[a] += h
        pm = pos.ravel().copy(); pm[a] -= h
        atoms.positions = pp.reshape(-1, 3)
        gp = L @ cons.jacobian()
        atoms.positions = pm.reshape(-1, 3)
        gm = L @ cons.jacobian()
        Hfd[:, a] = (gp - gm) / (2 * h)
    atoms.positions = pos.copy()
    np.testing.assert_allclose(Hc, Hfd, atol=1e-6)


def test_fix_other_inequality_and_distinct_fns():
    rng = np.random.RandomState(4)
    pos = rng.normal(size=(3, 3))
    atoms = Atoms(["H"] * 3, pos.copy())
    cons = Constraints(atoms)

    def coord_a(p):
        return jnp.sum(p ** 2)

    def coord_b(p):
        return jnp.sum(p[:, 0])

    val_a = float(coord_a(jnp.asarray(pos)))
    # satisfied "lt" inequality deactivates; violated re-activates
    cons.fix_other(coord_a, [0, 1, 2], target=val_a + 1.0, comparator="lt")
    # a DIFFERENT fn on the same indices must NOT collide
    cons.fix_other(coord_b, [0, 1, 2], target=0.0)
    assert sum(len(v) for v in cons.records.values()) == 2

    cons.disable_satisfied_inequalities()
    assert cons.ncons == 1  # only the eq constraint stays active
    atoms.positions = pos * 3.0  # now coord_a > target: violated
    assert not cons.validate_inequalities()
    assert cons.ncons == 2
