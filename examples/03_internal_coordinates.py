"""Molecular saddle refinement in redundant internal coordinates,
batched — the reference's convergence advantage at ensemble scale.
Run: python examples/03_internal_coordinates.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import jax.numpy as jnp
import numpy as np

from sella_tpu.atoms import Atoms
from sella_tpu.coords.internals import Internals
from sella_tpu.parallel.ensemble_internal import (
    InternalEnsembleConfig,
    run_internal_ensemble,
)
from sella_tpu.potentials import MorsePotential
from sella_tpu.utils.units import kB

r0 = 4.73
pot = MorsePotential(epsilon=226.9 * kB, r0=r0, rho0=r0 * 1.099)
rng = np.random.RandomState(4)
pos0 = rng.normal(size=(4, 3), scale=3.0)
ints = Internals(Atoms(["Xe"] * 4, pos0))
ints.find_all_bonds()
ints.find_all_angles()
ints.find_all_dihedrals()

# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
batch = 4 if FAST else 32
x0 = jnp.asarray(
    (pos0[None] + 0.3 * np.random.RandomState(0).normal(
        size=(batch, 4, 3))).reshape(batch, 12)
)
cfg = InternalEnsembleConfig(natoms=4, nint=ints.nint, order=1,
                             fmax=1e-3, gamma=1e-3, restart_after=60)
state = run_internal_ensemble(pot, ints, x0, cfg,
                              max_steps=60 if FAST else 150)
conv = np.asarray(state.converged)
print(f"{conv.sum()}/{batch} converged, "
      f"mean steps {np.asarray(state.nsteps)[conv].mean():.1f} "
      f"(vs ~39 for the Cartesian tier on the same starts)")
