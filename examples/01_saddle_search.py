"""First-order saddle search on a Morse Xe4 cluster (sequential API).

The sequential tier mirrors the reference's user surface
(``Sella(atoms).run(fmax)``, /root/reference/README.md:32-38) with
jax-native potentials instead of ASE calculators.
Run: python examples/01_saddle_search.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import numpy as np

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.potentials import MorsePotential
from sella_tpu.utils.units import kB

rng = np.random.RandomState(4)
r0 = 4.73
atoms = Atoms(
    ["Xe"] * 4, rng.normal(size=(4, 3), scale=3.0),
    calculator=MorsePotential(epsilon=226.9 * kB, r0=r0, rho0=r0 * 1.099),
)
cons = Constraints(atoms)
cons.fix_translation()
cons.fix_rotation()

opt = Sella(atoms, order=1, gamma=1e-3, constraints=cons, logfile="-")
converged = opt.run(fmax=1e-3, steps=200)
print(f"converged={converged} steps={opt.nsteps} "
      f"force_calls={opt.pes.neval} E={atoms.get_potential_energy():.6f}")
