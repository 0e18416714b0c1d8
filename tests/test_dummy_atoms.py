"""Dummy-atom tests: linear 2-coordinate centers get a perpendicular
dummy with constrained bond/angle and an improper-dihedral bend
(reference machinery at internal.py:3482-3550)."""
import jax.numpy as jnp
import numpy as np

from sella_tpu import Atoms, Sella
from sella_tpu.coords.internals import Internals
from sella_tpu.potentials.base import Potential


def test_linear_molecule_topology():
    atoms = Atoms("OCO", [[-1.16, 0, 0], [0, 0, 0], [1.16, 0, 0]])
    ints = Internals(atoms)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.ndummies == 1
    assert ints.dinds[1] == 3          # dummy attached to the center
    assert ints.nbonds == 3            # 2 real + 1 dummy bond
    assert ints.nangles == 2           # O-C-X angles
    assert ints.ndihedrals == 1        # improper O-C-X-O bend
    assert ints.cons.ncons == 2        # dummy bond + one dummy angle fixed
    # spans 3*(3+1)-6 = 6 DOF
    J = ints.jacobian()
    assert J.shape == (6, 12)
    s = np.linalg.svd(J, compute_uv=False)
    assert int(np.sum(s > 1e-8)) == 6


class TriatomicLinear(Potential):
    """Two harmonic bonds + a bending term minimized at 180 deg."""

    def energy(self, x, cell):
        p = x.reshape(3, 3)
        d1 = p[0] - p[1]
        d2 = p[2] - p[1]
        r1 = jnp.linalg.norm(d1)
        r2 = jnp.linalg.norm(d2)
        cosang = (d1 @ d2) / (r1 * r2)
        return (
            5.0 * (r1 - 1.16) ** 2
            + 5.0 * (r2 - 1.16) ** 2
            + 2.0 * (1.0 + cosang)
        )


def test_optimize_through_linearization():
    """Start bent at 140 deg; the minimum is exactly linear. The
    internal-coordinate optimizer must survive the angle going bad
    (rebuild -> dummy atom) and converge."""
    ang = np.radians(140.0)
    atoms = Atoms(
        "OCO",
        [[1.16 * np.cos(ang), 1.16 * np.sin(ang), 0], [0, 0, 0],
         [1.16, 0, 0]],
        calculator=TriatomicLinear(),
    )
    opt = Sella(atoms, order=0, internal=True, gamma=1e-3, logfile=None)
    assert opt.run(fmax=1e-4, steps=100), opt.nsteps
    # linear at the end
    d1 = atoms.positions[0] - atoms.positions[1]
    d2 = atoms.positions[2] - atoms.positions[1]
    cosang = d1 @ d2 / (
        np.linalg.norm(d1) * np.linalg.norm(d2)
    )
    assert cosang < -0.9999, cosang
    # bonds at equilibrium
    np.testing.assert_allclose(np.linalg.norm(d1), 1.16, atol=1e-3)
