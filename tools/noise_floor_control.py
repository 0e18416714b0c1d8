"""Noise-floor control experiment: measure the REFERENCE's
self-irreproducibility on its default adaptive-LSODA internal-saddle
path, justifying the loose gates in
``tests/test_reference_parity.py::test_reference_parity_noise_floor``.

Protocol: run the real reference package (through the test-only shim,
exactly as fixture generation does) on a noise-floor config, then rerun
it with the starting geometry perturbed by a controlled amplitude and
record how far the two reference trajectories diverge FROM EACH OTHER —
no sella_tpu optimizer is involved.  If the reference cannot reproduce
its own trajectory under an eps-scale start perturbation, no
cross-implementation gate tighter than that divergence is meaningful,
because any fp-inequivalent build injects at least last-ulp differences
into the LSODA step-acceptance decisions
(``/root/reference/sella/peswrapper.py:841-880``, atol ~1e-6).

Usage:  python tools/noise_floor_control.py [config ...]
Default configs: morse_xe4_int_saddle ethanol_int_saddle

Round-3 measured output (this machine, committed for the record):

    config=morse_xe4_int_saddle   (29 steps, 12 matvecs, 42 calls)
      eps=1e-12  steps=29 matvecs=12  max|dx|=1.8e-09 final|dE|=5.7e-13
      eps=1e-08  steps=29 matvecs=12  max|dx|=6.3e-08 final|dE|=2.9e-11
      eps=3e-07  steps=29 matvecs=12  max|dx|=1.8e-06 final|dE|=8.3e-10
      eps=1e-06  steps=29 matvecs=12  max|dx|=6.0e-06 final|dE|=2.8e-09
      eps=1e-05  steps=29 matvecs=12  max|dx|=5.9e-05 final|dE|=2.7e-08
    config=ethanol_int_saddle     (9 steps, 21 matvecs, 31 calls)
      eps=1e-12  steps=9  matvecs=21  max|dx|=1.4e-11 final|dE|=1.4e-14
      eps=1e-08  steps=9  matvecs=21  max|dx|=2.1e-08 final|dE|=2.8e-14
      eps=3e-07  steps=9  matvecs=21  max|dx|=6.4e-07 final|dE|=6.4e-13
      eps=1e-05  steps=9  matvecs=21  max|dx|=2.1e-05 final|dE|=2.1e-11

Interpretation, and how each noise-floor gate follows:

* A start perturbation is amplified ~6x on the morse path (~2x on
  ethanol) and never damped — the reference cannot hold a trajectory
  tighter than ~6x whatever noise enters it.  A cross-build comparison
  injects fresh integrator-realization noise at EVERY step, not only
  at the start: LSODA runs at atol~1e-6 (``peswrapper.py:854``) and
  its accept/reject sequence differs between any two fp-inequivalent
  builds, so the per-step injection scale is ~1e-7..1e-6.  Compounded
  over ~30 steps with the measured growth, trajectory agreement
  beyond ~1e-5 is unattainable in principle — hence the
  first-5-steps-at-1e-5 gate (before compounding) and no whole-run
  trajectory gate at all.
* The stationary point is far more stable than the path: final |dE|
  stays below 3e-8 even under a 1e-5 start perturbation — hence the
  1e-6 final-energy gate, with two orders of margin.
* Step/matvec counts are stable on these (deliberately short,
  near-saddle) fixtures, but each diag-schedule decision
  (``optimize.py:362-378``: re-diagonalize iff the leftmost Ritz value
  crosses zero or the step parity changes) is a knife edge: a 1e-6
  path difference near such a crossing changes WHETHER a Davidson
  call happens, which then changes every count downstream.  The 40%
  effort gate is headroom for exactly that discrete event, which the
  round-2 long-run (100+ step, from-equilibrium) variants of these
  configs did exhibit — that is why the committed fixtures start near
  the saddle (see ``gen_reference_fixtures.ethanol_positions``).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/refshim_jax_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tools import gen_reference_fixtures as gen  # noqa: E402
from tools.refshim.ase import Atoms  # noqa: E402
from tools.refshim.calculators import PotentialCalculator  # noqa: E402

from sella import Constraints, Sella  # noqa: E402  (the REFERENCE package)

EPSILONS = (0.0, 1e-12, 1e-8, 3e-7)


def run_reference(name: str, eps: float, seed: int = 77):
    kwargs, fmax, max_steps, recipe = gen.CONFIGS[name]
    symbols, positions, potential, spec = gen.build_system(name)
    if eps:
        rng = np.random.RandomState(seed)
        positions = positions + eps * rng.normal(size=positions.shape)
    atoms = Atoms(
        symbols, positions.copy(),
        cell=np.array(spec["cell"]) if "cell" in spec else None,
        pbc=spec.get("pbc", False),
    )
    calc = PotentialCalculator(potential)
    atoms.calc = calc

    cons = gen.make_constraints(recipe, atoms, Constraints)

    gen.MATVECS["n"] = 0
    np.random.seed(2024)
    opt = Sella(atoms, constraints=cons, logfile=None, **kwargs)
    traj, energies = [], []

    def snap():
        traj.append(atoms.positions.copy())
        energies.append(float(opt.pes.get_f()))

    opt.fmax = fmax
    converged = opt.converged()
    snap()
    while not converged and opt.nsteps < max_steps:
        opt.step()
        opt.nsteps += 1
        snap()
        converged = opt.converged()

    return dict(
        positions=np.array(traj),
        energy=np.array(energies),
        steps=int(opt.nsteps),
        matvecs=int(gen.MATVECS["n"]),
        ncalls=int(calc.ncalls),
        converged=bool(converged),
    )


def main() -> None:
    names = sys.argv[1:] or ["morse_xe4_int_saddle", "ethanol_int_saddle"]
    for name in names:
        print(f"config={name}")
        base = run_reference(name, 0.0)
        print(
            f"  eps=0e+00  steps={base['steps']} matvecs={base['matvecs']} "
            f"ncalls={base['ncalls']}  (baseline, "
            f"converged={base['converged']})"
        )
        for eps in EPSILONS[1:]:
            r = run_reference(name, eps)
            k = min(len(base["positions"]), len(r["positions"]))
            dx = float(np.max(np.abs(
                base["positions"][:k] - r["positions"][:k])))
            de = float(abs(base["energy"][-1] - r["energy"][-1]))
            print(
                f"  eps={eps:.0e}  steps={r['steps']} "
                f"matvecs={r['matvecs']}  max|dx|={dx:.1e} "
                f"final|dE|={de:.1e}  converged={r['converged']}"
            )


if __name__ == "__main__":
    main()
