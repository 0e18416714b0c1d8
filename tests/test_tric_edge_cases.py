"""TRIC fragment edge cases + linear-molecule regression.

Mirrors ``/root/reference/tests/internal/test_get_internal.py:58-140``
(single-atom fragments, bond-scale monotonicity) and
``/root/reference/tests/test_core_functionality.py:284-307``
(linear N2: degenerate quaternion spectra must not NaN the rotation
derivatives or zero the Jacobian via sign(0)==0).
"""
import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Internals, Sella
from sella_tpu.potentials import MorsePotential

BI_NITRATE = np.array(
    [
        [-0.168754, 0.103309, -0.601068],   # Bi
        [-1.452579, 0.996969, 1.671974],    # N
        [-1.906613, 1.312382, 2.719561],    # O
        [-0.390479, 0.236458, 1.599985],    # O
        [-1.916359, 1.339852, 0.548706],    # O
        [2.088604, 1.559729, 0.184556],     # N
        [3.081561, 2.106988, 0.537575],     # O
        [0.991304, 2.160371, -0.042657],    # O
        [2.046745, 0.279049, -0.004926],    # O
        [-0.824031, -2.516641, 0.135921],   # N
        [-1.024602, -3.638619, 0.469313],   # O
        [0.376482, -2.057305, -0.023988],   # O
        [-1.745220, -1.672049, -0.097571],  # O
    ]
)
BI_SYMBOLS = ["Bi"] + ["N", "O", "O", "O"] * 3


def test_tric_single_atom_fragment():
    """A lone Bi atom gets translations but never a rotation IC."""
    atoms = Atoms(BI_SYMBOLS, BI_NITRATE)
    ints = Internals(atoms, allow_fragments=True)
    ints.find_all_bonds(scale=1.0)
    ints.find_all_angles()
    ints.find_all_dihedrals()

    assert ints.ntrans > 0
    for indices, _axis, _ref in ints.rotations:
        assert len(np.atleast_1d(indices)) >= 2, (
            "Rotation IC added to single atom!"
        )


def test_tric_scale_parameter():
    """Smaller covalent scale -> more fragments -> at least as many TRICs."""
    counts = {}
    for scale in (1.0, 1.5):
        atoms = Atoms(BI_SYMBOLS, BI_NITRATE)
        ints = Internals(atoms, allow_fragments=True)
        ints.find_all_bonds(scale=scale)
        counts[scale] = (ints.ntrans, ints.nrotations)
    assert counts[1.0][0] >= counts[1.5][0]
    assert counts[1.0][1] >= counts[1.5][1]


@pytest.mark.parametrize("internal", [False, True])
def test_n2_linear_molecule(internal):
    """Linear diatomic relaxes without NaNs from the degenerate
    quaternion rotation parameterization (2 independent rotations)."""
    r0 = 1.10
    atoms = Atoms(
        ["N", "N"],
        np.array([[0.0, 0.0, 0.0], [0.0, 0.0, r0 * 1.2]]),
        calculator=MorsePotential(epsilon=9.76, r0=r0, rho0=2.7),
    )
    cons = Constraints(atoms)
    cons.fix_translation()
    cons.fix_rotation()
    opt = Sella(
        atoms,
        order=0,
        internal=internal,
        allow_fragments=internal,
        constraints=None if internal else cons,
        logfile=None,
    )
    assert opt.run(fmax=0.01, steps=100)
    assert np.all(np.isfinite(atoms.positions))
    d = np.linalg.norm(atoms.positions[0] - atoms.positions[1])
    np.testing.assert_allclose(d, r0, atol=1e-2)
