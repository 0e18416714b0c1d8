"""Batched saddle-search ensemble: many searches in one jitted program.

This is the capability the reference does not have — the TPU tier.
Run: python examples/02_batched_ensemble.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import jax.numpy as jnp
import numpy as np

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.potentials import LennardJones

tet = np.array(
    [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
     [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
) * 1.12
rng = np.random.RandomState(7)
# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
batch = 8 if FAST else 64
x0 = jnp.asarray(
    (tet[None] + 0.12 * rng.normal(size=(batch, 4, 3))).reshape(batch, 12)
)

cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                     restart_after=50)
state = run_ensemble(LennardJones(), x0, cfg,
                     max_steps=100 if FAST else 300)
conv = np.asarray(state.converged)
print(f"{conv.sum()}/{batch} saddles converged, "
      f"mean steps {np.asarray(state.nsteps)[conv].mean():.1f}, "
      f"mean Davidson matvecs {np.asarray(state.nmatvec).mean():.1f}")
