"""Coupled atom + cell optimization (sequential tier): bulk LJ crystal
relaxes positions and lattice under the log-deformation
parameterization with a cell mask.
Run: python examples/05_cell_optimization.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import numpy as np

from sella_tpu import Atoms, Sella
from sella_tpu.potentials import LennardJones

a = 1.5599  # fcc lattice constant for LJ sigma=1
base = []
for s in ([0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]):
    base.append(np.asarray(s) * a)
pos = np.asarray(base)
rng = np.random.RandomState(0)
atoms = Atoms(["Ar"] * 4, pos + 0.02 * rng.normal(size=pos.shape),
              cell=np.eye(3) * a * 1.06, pbc=True,
              calculator=LennardJones(pbc=True, rc=2.5))

opt = Sella(atoms, order=0, optimize_cell=True, logfile=None)
converged = opt.run(fmax=1e-3, steps=200)
# note: the relaxed lattice of this truncated-shifted LJ with
# single-image MIC sits a few % above the full-LJ value 1.5599
print(f"converged={converged} "
      f"a={np.linalg.norm(atoms.cell[0]):.4f} "
      f"E={atoms.get_potential_energy():.6f}")
