"""Adatom-hop saddle on a 4k-atom Cu(111) slab: binned EMT + MMF.

The reference's headline physics (Cu adatom diffusion on Cu(111),
/root/reference/README.md:10-39) at a system size the dense path cannot
touch: the O(N) `BinnedEMT` supplies forces and exact Lanczos HVPs, and
the matrix-free minimum-mode-following driver (`order=1`) refines the
bridge-site saddle without ever forming the 12k x 12k Hessian.
Converges in ~10 steps from the bridge midpoint (measured on a v5e:
lam = -0.44 eV/A^2 along the hop mode, fmax < 0.02 eV/A).
Run: python examples/07_largescale_saddle.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import numpy as np
import jax
import jax.numpy as jnp

from sella_tpu.parallel.largescale import make_mmf_step, mmf_init
from sella_tpu.potentials import BinnedEMT
from sella_tpu.potentials.emt import fcc111_slab

a = 3.59
# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
# FAST floor: the binned path needs every periodic extent >= 3 rc
# (~18.8 A for the EMT candidate cutoff) — (10, 10, 4) is the smallest
# comfortable slab
slab = fcc111_slab("Cu", a, size=(10, 10, 4) if FAST else (32, 32, 4),
                   vacuum=12.0)
top_z = slab.positions[:, 2].max()
tops = slab.positions[slab.positions[:, 2] > top_z - 0.1]
ci = int(np.argmin(np.linalg.norm(tops[:, :2] - tops[:, :2].mean(0),
                                  axis=1)))
A = tops[ci]
d2 = np.linalg.norm(tops[:, :2] - A[:2], axis=1)
d2[ci] = np.inf
B = tops[int(np.argmin(d2))]
# adatom at the bridge midpoint between two adjacent surface atoms —
# the hop saddle's neighborhood
ad = (A + B) / 2.0 + np.array([0.0, 0.0, a / np.sqrt(3)])

pos = np.vstack([slab.positions, ad])
n = len(pos)
x0 = jnp.asarray(pos.ravel())
cell = jnp.asarray(slab.cell)

# tight bin capacity: the HVP graph at default 2x occupancy exceeds
# 16 GB HBM at this size (see BinnedEMT docstring)
pot = BinnedEMT(np.array([29] * n), x0, cell, capacity=32)
step = jax.jit(make_mmf_step(pot, cell, order=1, fmax=0.02,
                             max_move=0.05))
state = mmf_init(pot, x0, cell)
for k in range(10 if FAST else 60):
    state = step(state)
    if bool(state.converged):
        break

fm = float(jnp.max(jnp.linalg.norm(
    np.asarray(jax.grad(pot.energy)(state.x, cell)).reshape(n, 3),
    axis=1)))
print(f"{n} atoms: converged={bool(state.converged)} in "
      f"{int(state.nsteps)} steps, fmax {fm:.4f}, "
      f"leftmost eigenvalue {float(state.lam):.3f} eV/A^2 "
      f"({int(state.nmatvec)} HVPs, {int(state.neval)} force calls)")
