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

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# isolate from any stale cross-machine compile cache
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/refshim_jax_cache"

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
    # seed 9: the reference itself converges this saddle in ~107 steps
    rng = np.random.RandomState(9)
    return rng.normal(size=(7, 3), scale=1.7)


def lj_params() -> dict:
    return dict(epsilon=1.0, sigma=2.2)


def ethanol_positions() -> np.ndarray:
    """Ethanol-like C2H6O geometry (Angstrom), slightly perturbed off
    equilibrium so a TS search has something to do."""
    pos = np.array([
        [-0.748, -0.015, 0.024],   # C
        [0.720, 0.003, -0.303],    # C
        [1.402, -0.987, 0.474],    # O
        [-1.251, -0.942, -0.285],  # H
        [-0.922, 0.122, 1.098],    # H
        [-1.218, 0.832, -0.492],   # H
        [0.880, -0.154, -1.380],   # H
        [1.181, 0.972, -0.067],    # H
        [2.350, -0.940, 0.297],    # H
    ])
    rng = np.random.RandomState(11)
    return pos + 0.08 * rng.normal(size=pos.shape)


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
    "morse_xe4_cart_min": (
        dict(order=0, internal=False, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_cart_saddle": (
        dict(order=1, internal=False, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_int_min": (
        dict(order=0, internal=True, gamma=1e-3), 1e-3, 300, True),
    "morse_xe4_int_saddle": (
        dict(order=1, internal=True, gamma=1e-3), 1e-3, 300, True),
    "lj7_cart_saddle": (
        dict(order=1, internal=False, gamma=0.1), 1e-3, 300, True),
    "ethanol_int_saddle": (
        dict(order=1, internal=True, gamma=0.1), 1e-3, 300, False),
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
