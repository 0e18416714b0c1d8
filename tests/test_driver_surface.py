"""Driver-surface parity tests: restart payload, append_trajectory,
master silencing, EMT cell validity (reference
``optimize/optimize.py:45-65,144-148``)."""
import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.potentials import MorsePotential
from sella_tpu.utils.trajectory import read_trajectory
from sella_tpu.utils.units import kB


def make_atoms(seed=4):
    rng = np.random.RandomState(seed)
    return Atoms(
        ["Xe"] * 4,
        rng.normal(size=(4, 3), scale=3.0),
        calculator=MorsePotential(epsilon=226.9 * kB, r0=4.73,
                                  rho0=4.73 * 1.099),
    )


def make_opt(atoms, **kwargs):
    cons = Constraints(atoms)
    cons.fix_translation()
    cons.fix_rotation()
    return Sella(atoms, order=0, gamma=1e-3, constraints=cons,
                 logfile=None, **kwargs)


def test_restart_roundtrip(tmp_path):
    restart = str(tmp_path / "restart.npz")

    atoms = make_atoms()
    opt = make_opt(atoms, restart=restart)
    opt.run(fmax=1e-3, steps=5)
    delta, rho = opt.delta, opt.rho
    B = np.array(opt.pes.H.B)

    # resume from the same positions: trust/H state must be restored
    atoms2 = Atoms(atoms.numbers, atoms.positions.copy(),
                   calculator=atoms.calc)
    opt2 = make_opt(atoms2, restart=restart)
    assert opt2.delta == pytest.approx(delta)
    assert opt2.rho == pytest.approx(rho)
    assert opt2.initialized  # restored H replaces the initial diag
    np.testing.assert_allclose(np.array(opt2.pes.H.B), B)

    # and the resumed run still converges
    assert opt2.run(fmax=1e-3, steps=200)


def test_restart_missing_file_is_fresh_start(tmp_path):
    opt = make_opt(make_atoms(), restart=str(tmp_path / "nope.npz"))
    assert not opt.initialized


def test_append_trajectory(tmp_path):
    traj = str(tmp_path / "t.xyz")

    atoms = make_atoms()
    make_opt(atoms, trajectory=traj).run(fmax=1e-1, steps=3)
    n1 = len(read_trajectory(traj))
    assert n1 > 0

    make_opt(make_atoms(), trajectory=traj,
             append_trajectory=True).run(fmax=1e-1, steps=3)
    n2 = len(read_trajectory(traj))
    assert n2 > n1

    # default overwrites
    make_opt(make_atoms(), trajectory=traj).run(fmax=1e-1, steps=3)
    assert len(read_trajectory(traj)) < n2


def test_master_false_silences_output(tmp_path):
    traj = str(tmp_path / "t.xyz")
    opt = make_opt(make_atoms(), trajectory=traj, master=False)
    opt.run(fmax=1e-1, steps=2)
    assert opt.pes.traj is None
    assert opt.logfile is None
    assert not (tmp_path / "t.xyz").exists()


def test_emt_min_cell_check():
    from sella_tpu.potentials import EMT

    # 2-atom Cu cell much smaller than rc: one image shell is invalid
    pot = EMT([29, 29], pbc=True)
    with pytest.raises(ValueError, match="cell height"):
        pot.validate_cell(np.eye(3) * 2.0)
    # a roomy cell passes
    pot.validate_cell(np.eye(3) * 12.0)


def test_exact_geodesic_toggle():
    """``exact_geodesic=False`` freezes the step-start B+ during the
    geodesic integration (reference ``optimize.py:79,125,281``,
    ``peswrapper.py:1215``); both settings must converge on the same
    internal-coordinate minimization and the flag must reach the PES."""
    from sella_tpu.pes.internal import InternalPES

    for exact in (True, False):
        atoms = make_atoms(seed=1)
        # iterative_stepper=0 forces every move through the geodesic
        # integrator so the frozen-Binv path is actually exercised
        opt = Sella(atoms, order=0, gamma=1e-3, internal=True,
                    logfile=None, exact_geodesic=exact,
                    iterative_stepper=0)
        assert isinstance(opt.pes, InternalPES)
        assert opt.pes.exact_geodesic is exact
        assert opt.run(fmax=1e-3, steps=100)


def test_attach_observers():
    """The ASE Optimizer observer protocol: attach(fn, interval) fires
    every interval steps (positive) or once at step -interval."""
    atoms = make_atoms()
    opt = make_opt(atoms)
    every, once = [], []
    opt.attach(lambda: every.append(opt.nsteps), interval=2)
    opt.attach(lambda: once.append(opt.nsteps), interval=-3)
    assert opt.run(fmax=1e-3, steps=20) or opt.nsteps == 20
    assert every == [s for s in range(opt.nsteps + 1) if s % 2 == 0]
    assert once == [3]
