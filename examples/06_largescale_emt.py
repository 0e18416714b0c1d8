"""Large-single-system path: O(N) binned EMT + matrix-free MMF.

A ~4000-atom Cu(111) slab relaxes (order=0) with the cell-binned EMT
potential — forces and the Lanczos leftmost-mode HVPs are all O(N) and
the Hessian is never formed. Set order=1 for a minimum-mode-following
saddle search on the same machinery.
Run: python examples/06_largescale_emt.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import time

import jax
import jax.numpy as jnp
import numpy as np

from sella_tpu.parallel.largescale import make_mmf_step, mmf_init
from sella_tpu.potentials import BinnedEMT
from sella_tpu.potentials.emt import fcc111_slab

# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
# — the binned path needs every periodic extent >= 3 rc (~18.8 A), so
# (10, 10, 4) is the smallest comfortable slab
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
slab = fcc111_slab("Cu", 3.59, size=(10, 10, 4) if FAST else (32, 32, 4),
                   vacuum=12.0)
n = len(slab.positions)
x0 = jnp.asarray(
    (slab.positions
     + 0.03 * np.random.RandomState(0).normal(
         size=slab.positions.shape)).ravel()
)
cell = jnp.asarray(slab.cell)

pot = BinnedEMT(np.array([29] * n), x0, cell)
step = jax.jit(make_mmf_step(pot, cell, order=0, fmax=5e-3))
state = mmf_init(pot, x0, cell)
g0 = jax.grad(pot.energy)(x0, cell)
fmax0 = float(jnp.max(jnp.linalg.norm(g0.reshape(n, 3), axis=1)))

state = step(state)            # compile + first step
jax.block_until_ready(state.x)
t0 = time.perf_counter()
nsteps = 3 if FAST else 20
for _ in range(nsteps):
    state = step(state)
jax.block_until_ready(state.x)
dt = (time.perf_counter() - t0) / nsteps

g = jax.grad(pot.energy)(state.x, cell)
fmax_now = float(jnp.max(jnp.linalg.norm(g.reshape(n, 3), axis=1)))
print(f"{n} atoms: {dt * 1e3:.0f} ms/step, "
      f"fmax {fmax0:.2e} -> {fmax_now:.2e}, "
      f"E = {float(pot.energy(state.x, cell)):.3f} eV")
