"""IRC end-to-end: find a saddle with Sella, then follow the reaction
path forward and reverse to minima (cf. reference irc.py semantics).

Uses the LJ4 cluster: its first-order saddle is well-conditioned
(leftmost mode -0.47, next +55), so the path endpoints are genuine
minima. (A soft Morse Xe4 cluster has near-flat shoulders where the IRC
inertia criterion is ill-posed.)
"""
import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.optimize.irc import IRC
from sella_tpu.potentials import LennardJones


@pytest.fixture(scope="module")
def lj4_saddle():
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(7)
    atoms = Atoms(
        ["Ar"] * 4,
        tet + 0.12 * rng.normal(size=(4, 3)),
        calculator=LennardJones(),
    )
    cons = Constraints(atoms)
    cons.fix_translation()
    cons.fix_rotation()
    opt = Sella(atoms, order=1, gamma=1e-3, constraints=cons, logfile=None)
    assert opt.run(fmax=1e-4, steps=300)
    return atoms


def test_irc_forward_reverse(lj4_saddle):
    atoms = lj4_saddle.copy()
    atoms.calc = lj4_saddle.calc
    e_ts = atoms.get_potential_energy()

    # dx is a mass-weighted arc length (amu^1/2 Angstrom): with Ar
    # masses, dx=0.4 moves ~0.06 Angstrom of geometry per outer step
    irc = IRC(atoms, dx=0.4, eta=1e-4, gamma=0.01, logfile=None,
              keep_going=True)
    conv_f = irc.run(fmax=1e-2, steps=150, direction="forward")
    e_fwd = irc.pes.get_f()
    x_fwd = irc.pes.get_x().copy()
    assert conv_f, (irc.nsteps, e_fwd, e_ts)
    assert e_fwd < e_ts
    # LJ4 minimum is the perfect tetrahedron at E = -6
    assert abs(e_fwd - (-6.0)) < 1e-5

    conv_r = irc.run(fmax=1e-2, steps=150, direction="reverse")
    e_rev = irc.pes.get_f()
    assert conv_r, (irc.nsteps, e_rev, e_ts)
    assert abs(e_rev - (-6.0)) < 1e-5
    # distinct endpoints (different tetrahedron permutations)
    assert np.linalg.norm(x_fwd - irc.pes.get_x()) > 1e-2
