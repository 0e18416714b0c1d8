"""Heterogeneous sweep: one job list mixing different structure sizes.

The batched tiers compile one fixed-shape program per (natoms, config)
signature; ``run_heterogeneous_queue`` buckets a mixed job list into
homogeneous sub-batches, streams each bucket through the compiled work
queue, and stitches results back in input order — the reference's
"any structure per run" generality
(``/root/reference/sella/optimize/optimize.py:42-216``) at batched
throughput.

Run: python examples/09_heterogeneous_sweep.py
"""
import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install

import numpy as np

from sella_tpu.parallel.ensemble import EnsembleConfig
from sella_tpu.parallel.hetero import run_heterogeneous_queue
from sella_tpu.potentials import LennardJones

rng = np.random.RandomState(0)

tet = np.array(
    [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
     [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
) * 1.12

rstar = 2.0 ** (1.0 / 6.0)
ring_r = rstar / (2.0 * np.sin(np.pi / 5.0))
apex_z = np.sqrt(rstar ** 2 - ring_r ** 2)
ang = 2.0 * np.pi * np.arange(5) / 5.0
pbp = np.vstack([
    np.stack([ring_r * np.cos(ang), ring_r * np.sin(ang),
              np.zeros(5)], axis=1),
    [[0.0, 0.0, apex_z]],
    [[0.0, 0.0, -apex_z]],
])

# an interleaved campaign: 12 LJ4 + 12 LJ7 saddle searches
# (SELLA_TPU_EXAMPLES_FAST=1: CI smoke sizes, tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
jobs = []
for k in range(4 if FAST else 12):
    jobs.append((tet + 0.12 * rng.normal(size=(4, 3))).ravel())
    jobs.append((pbp + 0.2 * rng.normal(size=(7, 3))).ravel())

cfg = EnsembleConfig(natoms=1, order=1, fmax=1e-3, gamma=1e-3,
                     restart_after=30)
results = run_heterogeneous_queue(
    LennardJones(), jobs, batch=8, cfg=cfg,
    max_steps_per_search=150, refill_every=10,
    max_retries=2, retry_kick=0.3,
)

for tag, nat in (("LJ4", 4), ("LJ7", 7)):
    sel = [r for r, x in zip(results, jobs) if len(x) == 3 * nat]
    nconv = sum(1 for r in sel if r[3])
    steps = [r[2] for r in sel if r[3]]
    msg = f"{tag}: {nconv}/{len(sel)} saddles converged"
    if steps:
        msg += f", mean steps {np.mean(steps):.1f}"
    print(msg)

# --- mixed-molecule TS sweep in INTERNAL coordinates -----------------
# Bucketing key = (potential, discovered topology signature): perturbed
# starts of one molecule share a compiled internal-tier program; a
# different molecule (species/size/bond graph) gets its own bucket.
from sella_tpu.atoms import Atoms
from sella_tpu.parallel.ensemble_internal import InternalEnsembleConfig
from sella_tpu.parallel.hetero import run_heterogeneous_internal_queue
from sella_tpu.potentials import MorsePotential
from sella_tpu.utils.units import kB

r0 = 4.73
morse = MorsePotential(epsilon=226.9 * kB, r0=r0, rho0=r0 * 1.099)
rng2 = np.random.RandomState(4)
xe4_pos = rng2.normal(size=(4, 3), scale=3.0)
xe4 = Atoms(["Xe"] * 4, xe4_pos)
he7 = Atoms(["He"] * 7, pbp)
lj = LennardJones()

ijobs = []
for k in range(2 if FAST else 6):
    ijobs.append((morse, xe4,
                  (xe4_pos + 0.3 * rng.normal(size=(4, 3))).ravel()))
    ijobs.append((lj, he7, (pbp + 0.12 * rng.normal(size=(7, 3))).ravel()))

icfg = InternalEnsembleConfig(natoms=1, nint=1, order=1, fmax=1e-3,
                              gamma=1e-3)
iresults = run_heterogeneous_internal_queue(
    ijobs, batch=6, cfg=icfg, max_steps_per_search=300,
)
for tag, nat in (("Morse Xe4", 4), ("LJ He7", 7)):
    sel = [r for r, (p, a, x) in zip(iresults, ijobs)
           if len(x) == 3 * nat]
    print(f"internal {tag}: {sum(1 for r in sel if r[3])}/{len(sel)} "
          "TS converged")
