"""Generate golden per-step fixtures by running the ACTUAL reference
package (/root/reference/sella) through the test-only ASE shim.

Each fixture records, for every optimizer step, the Cartesian positions,
energy, trust radius, prediction ratio, cumulative calculator force
calls, and cumulative Davidson matvec count — captured from the real
reference driver loop (``/root/reference/sella/optimize/optimize.py:359-440``
with ``NumericalHessian._matvec`` instrumented,
``/root/reference/sella/linalg.py:39-95``).

Both the reference run (via ``tools.refshim.calculators``) and the
sella_tpu parity test evaluate the same jitted sella_tpu potential, so
any per-step divergence is the optimizer algorithm, not the PES.

Usage:  python tools/gen_reference_fixtures.py [outdir]
Writes: tests/fixtures/reference/<name>.npz
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
# isolate from any stale cross-machine compile cache
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/refshim_jax_cache"
# same XLA topology as tests/conftest.py: the compiled reduction order
# (hence the last-ulp of every energy) depends on the virtual device
# count, and fixture generation must match the test environment so the
# 1e-8 trajectory gate measures the ALGORITHM, not XLA partitioning
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tools.refshim.loader import import_reference_sella  # noqa: E402

sella = import_reference_sella()

from sella import Constraints, Sella  # noqa: E402  (the REFERENCE package)
import sella.linalg as _slin  # noqa: E402

from tools.refshim.ase import Atoms  # noqa: E402
from tools.refshim.calculators import PotentialCalculator  # noqa: E402
from sella_tpu.potentials import LennardJones, MorsePotential  # noqa: E402
from sella_tpu.utils.units import kB  # noqa: E402

MATVECS = {"n": 0}
_orig_matvec = _slin.NumericalHessian._matvec


def _counted_matvec(self, v):
    MATVECS["n"] += 1
    return _orig_matvec(self, v)


_slin.NumericalHessian._matvec = _counted_matvec


# ---------------------------------------------------------------------------
# Shared system builders (the parity test imports these to build the
# sella_tpu side with bit-identical geometry + potential parameters).
# ---------------------------------------------------------------------------
def morse_xe4_positions() -> np.ndarray:
    rng = np.random.RandomState(4)
    return rng.normal(size=(4, 3), scale=3.0)


def morse_params() -> dict:
    # DOI 10.1515/zna-1987-0505 Xe2 parameters, as in the reference's
    # integration test (/root/reference/tests/integration/
    # test_morse_cluster.py:26)
    return dict(epsilon=226.9 * kB, r0=4.73, rho0=4.73 * 1.099)


def lj7_positions() -> np.ndarray:
    """Perturbed pentagonal bipyramid (the LJ7 ground state): a
    well-conditioned saddle-search start. A fully random gas (the
    previous fixture) starts at E ~ +1.8e4 where last-ulp reduction
    noise is ~1e-9 absolute and chaos amplifies it past any trajectory
    gate."""
    rstar = 2.2 * 2.0 ** (1.0 / 6.0)       # LJ pair minimum for sigma=2.2
    ring_r = rstar / (2.0 * np.sin(np.pi / 5.0))
    apex_z = np.sqrt(max(rstar**2 - ring_r**2, 0.1))
    ang = 2.0 * np.pi * np.arange(5) / 5.0
    pos = np.vstack([
        np.stack([ring_r * np.cos(ang), ring_r * np.sin(ang),
                  np.zeros(5)], axis=1),
        [[0.0, 0.0, apex_z]],
        [[0.0, 0.0, -apex_z]],
    ])
    rng = np.random.RandomState(12)
    return pos + 0.25 * rng.normal(size=pos.shape)


def lj_params() -> dict:
    return dict(epsilon=1.0, sigma=2.2)


def ethanol_positions() -> np.ndarray:
    """Ethanol-like C2H6O start NEAR a first-order saddle of the
    surrogate Morse potential (Angstrom).

    The base geometry is the converged fmax=1e-3 saddle the reference
    itself found from the legacy perturbed-equilibrium start (152
    reference steps); rattling it by 0.03 A gives parity runs of
    ~10-25 steps. The legacy from-equilibrium start produced 100+-step
    wanders across this floppy 9-atom landscape, whose Lyapunov growth
    amplifies per-step fp-noise injections (~1e-11 for the Newton
    back-transform) past ANY trajectory gate — a chaos measurement,
    not an algorithm comparison. Short runs near the saddle measure
    the algorithm."""
    ts = np.array([
        [-0.545607, 0.458477, 0.524459],   # C
        [0.668282, 0.214175, 0.751008],    # C
        [1.112564, -0.919955, 0.43481],    # O
        [-0.069041, -0.65272, 0.114818],   # H
        [-1.288046, -0.36833, -0.106017],  # H
        [-0.3734, 0.258998, -0.739546],    # H
        [0.825327, -0.005384, -0.487285],  # H
        [0.349447, 1.100171, -0.108316],   # H
        [1.818581, -0.755517, -0.604077],  # H
    ])
    rng = np.random.RandomState(11)
    return ts + 0.03 * rng.normal(size=ts.shape)


def build_system(name: str):
    """Returns (symbols, positions, sella_tpu_potential, spec).

    ``spec`` is embedded in the fixture so the parity test can rebuild
    the identical potential without importing this module (or the
    reference)."""
    if name.startswith("morse_xe4"):
        spec = dict(kind="morse", symbols=["Xe"] * 4, **morse_params())
        return (spec["symbols"], morse_xe4_positions(),
                MorsePotential(**morse_params()), spec)
    if name.startswith("lj7"):
        spec = dict(kind="lj", symbols=["Ar"] * 7, **lj_params())
        return (spec["symbols"], lj7_positions(),
                LennardJones(**lj_params()), spec)
    if name.startswith("ethanol"):
        params = dict(epsilon=4.0, r0=1.3, rho0=1.3 * 3.0)
        spec = dict(
            kind="morse",
            symbols=["C", "C", "O", "H", "H", "H", "H", "H", "H"],
            **params,
        )
        return (spec["symbols"], ethanol_positions(),
                MorsePotential(**params), spec)
    raise KeyError(name)


CONFIGS = {
    # name: (sella kwargs, fmax, max steps, use trans/rot constraints)
    #
    # The *_newton variants run the reference's Newton back-transform
    # (``iterative_stepper=1``, ``peswrapper.py:616,749-839``) instead
    # of its default adaptive-LSODA geodesic move. Newton lands on the
    # q-target fixed point, so its trajectories reproduce across
    # implementations to fp accuracy; the LSODA default carries the
    # integrator's own ~atol=1e-6 realization noise, whose knife-edge
    # step-acceptance decisions amplify last-ulp differences (measured:
    # the reference does not reproduce ITSELF to better than ~1e-6 on
    # these paths when the start is perturbed at the noise floor).
    # Parity gates differ accordingly — see tests/test_reference_parity.py.
    "morse_xe4_cart_min": (
        dict(order=0, internal=False, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_cart_saddle": (
        dict(order=1, internal=False, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_int_min": (
        dict(order=0, internal=True, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_int_saddle": (
        dict(order=1, internal=True, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_int_saddle_newton": (
        dict(order=1, internal=True, gamma=1e-3, iterative_stepper=1),
        1e-3, 300, True),
    "lj7_cart_saddle": (
        dict(order=1, internal=False, gamma=0.1), 1e-3, 300, True),
    "ethanol_int_saddle": (
        dict(order=1, internal=True, gamma=0.1), 1e-3, 300, False),
    "ethanol_int_saddle_newton": (
        dict(order=1, internal=True, gamma=0.1, iterative_stepper=1),
        1e-3, 300, False),
}


def run_one(name: str, outdir: str) -> dict:
    kwargs, fmax, max_steps, use_cons = CONFIGS[name]
    symbols, positions, potential, spec = build_system(name)
    atoms = Atoms(symbols, positions.copy())
    calc = PotentialCalculator(potential)
    atoms.calc = calc

    cons = None
    if use_cons:
        cons = Constraints(atoms)
        cons.fix_translation()
        cons.fix_rotation()

    MATVECS["n"] = 0
    np.random.seed(2024)  # reference Davidson restart path uses np.random
    opt = Sella(atoms, constraints=cons, logfile=None, **kwargs)

    rec = {k: [] for k in
           ("positions", "energy", "delta", "rho", "ncalls", "nmatvec")}

    def snap():
        rec["positions"].append(atoms.positions.copy())
        rec["energy"].append(float(opt.pes.get_f()))
        rec["delta"].append(float(opt.delta))
        rec["rho"].append(float(opt.rho))
        rec["ncalls"].append(int(calc.ncalls))
        rec["nmatvec"].append(int(MATVECS["n"]))

    opt.fmax = fmax
    converged = opt.converged()
    snap()
    while not converged and opt.nsteps < max_steps:
        opt.step()
        opt.nsteps += 1
        snap()
        converged = opt.converged()

    out = dict(
        positions=np.array(rec["positions"]),
        energy=np.array(rec["energy"]),
        delta=np.array(rec["delta"]),
        rho=np.array(rec["rho"]),
        ncalls=np.array(rec["ncalls"], dtype=np.int64),
        nmatvec=np.array(rec["nmatvec"], dtype=np.int64),
        converged=np.array(bool(converged)),
        nsteps=np.array(int(opt.nsteps), dtype=np.int64),
        config=np.array(json.dumps(
            dict(name=name, fmax=fmax, max_steps=max_steps,
                 use_cons=use_cons, spec=spec, **kwargs)
        )),
    )
    path = os.path.join(outdir, f"{name}.npz")
    with open(path, "wb") as fh:
        np.savez_compressed(fh, **out)
    print(
        f"{name}: converged={bool(converged)} steps={opt.nsteps} "
        f"ncalls={calc.ncalls} nmatvec={MATVECS['n']} "
        f"E={rec['energy'][-1]:.8f}"
    )
    return out


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "reference",
    )
    os.makedirs(outdir, exist_ok=True)
    names = sys.argv[2:] or list(CONFIGS)
    for name in names:
        run_one(name, outdir)


if __name__ == "__main__":
    main()
