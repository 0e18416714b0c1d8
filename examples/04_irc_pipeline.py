"""Saddle ensemble -> batched IRC work queue: refine transition states,
then follow every reaction path forward AND reverse to its minima.
Run: python examples/04_irc_pipeline.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import jax.numpy as jnp
import numpy as np

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.parallel.ensemble_irc import (
    IRCEnsembleConfig,
    run_irc_ensemble_queue,
)
from sella_tpu.potentials import LennardJones

tet = np.array(
    [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
     [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
) * 1.12
rng = np.random.RandomState(7)
# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
nstart = 4 if FAST else 8
x0 = jnp.asarray(
    (tet[None] + 0.12 * rng.normal(size=(nstart, 4, 3))).reshape(
        nstart, 12)
)
pot = LennardJones()
st = run_ensemble(pot, x0,
                  EnsembleConfig(natoms=4, order=1, fmax=1e-4,
                                 gamma=1e-3),
                  max_steps=150 if FAST else 300)
sel = np.where(np.asarray(st.converged))[0][:2 if FAST else 4]
print(f"harvested {len(sel)} transition states")

out = run_irc_ensemble_queue(
    pot, st.x[sel], st.B[sel],
    IRCEnsembleConfig(natoms=4, fmax=1e-2, dx=0.4),
    masses=np.full(4, 39.948), batch=4, directions="both",
)
for r in out:
    print(f"TS {r['ts']} dir {r['direction']:+d}: "
          f"endpoint E={r['f']:.4f} in {r['nsteps']} steps "
          f"(converged={r['converged']})")
