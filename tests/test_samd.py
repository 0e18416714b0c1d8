"""Annealing-MD tests: energy conservation (no thermostat limit),
thermostat temperature control, annealing toward low energy."""
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu import Atoms
from sella_tpu.optimize.samd import anneal, samd
from sella_tpu.potentials import LennardJones
from sella_tpu.utils.units import kB


def _lj4():
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    return Atoms(["Ar"] * 4, tet, calculator=LennardJones())


@pytest.mark.parametrize("thermostat", ["bdp", "rescale"])
def test_thermostat_targets_temperature(thermostat):
    atoms = _lj4()
    T = 300.0
    state, (epot, ekin) = anneal(
        atoms.calc, atoms.positions.ravel(), atoms.get_masses(),
        T, T, 4000, dt_fs=2.0, thermostat=thermostat, taut_steps=50,
    )
    ndof = 12
    t_measured = np.mean(np.asarray(ekin)[2000:]) / (0.5 * ndof * kB)
    assert abs(t_measured - T) / T < 0.35, t_measured


def test_annealing_lowers_energy():
    atoms = _lj4()
    rng = np.random.RandomState(0)
    atoms.positions = atoms.positions + 0.2 * rng.normal(size=(4, 3))
    e_start = atoms.get_potential_energy()
    record = samd(atoms, t_start=300.0, t_end=1.0, nsteps=5000, dt_fs=2.0)
    e_end = atoms.get_potential_energy()
    assert np.isfinite(e_end)
    assert e_end < e_start
    # annealed near the tetrahedral minimum basin
    assert e_end < -5.0
