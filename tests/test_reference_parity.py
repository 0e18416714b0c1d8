"""Golden-fixture parity against the ACTUAL reference implementation.

The fixtures in ``tests/fixtures/reference/`` are per-step traces of
the real, unmodified reference package (/root/reference/sella) executed
through the test-only ASE shim (``tools/refshim``), with the same jitted
sella_tpu potential on both sides — see ``tools/gen_reference_fixtures.py``.

Three gate classes, ordered by how deterministic the position update is:

* **strict** (north star): per-step Cartesian trajectory to 1e-8,
  energies to 1e-8, trust radii to 1e-6 relative, Davidson matvec
  counts within one, identical step counts. Applied to every Cartesian
  path (closed-form position update) and the internal LSODA
  minimization path (short, contractive).
* **newton**: internal saddle paths run with the reference's Newton
  back-transform (``iterative_stepper=1``). The update is a fixed-point
  map, so each step agrees to the Newton tolerance (~1e-10) — but the
  saddle landscape's Lyapunov growth amplifies that injection along the
  run (measured on morse_xe4: 7e-12 at step 1, 8e-10 at step 24,
  3e-7 at step 28 of 32, with IDENTICAL step and matvec counts
  throughout). Gates: identical step counts, matvecs within 1,
  trajectory 1e-8 over the first 3/4 of the run, 1e-6 over the whole
  run, final energy 1e-8.
* **noise floor**: the reference's DEFAULT internal saddle path
  realizes each step with adaptive LSODA at atol=1e-6
  (``peswrapper.py:854``). Its step-acceptance decisions are knife-edge
  in the last ulp of the RHS, so the integrator injects ~1e-7
  realization differences per step between any two fp-inequivalent
  builds — measured: the reference does not reproduce its own
  trajectory to better than ~1e-6 under a 3e-7 start perturbation,
  while being stable at 1e-8 (see the round-2 control experiment in
  the work log). For these configs the gates are: identical
  convergence, the same stationary point (energy to 1e-6), early-step
  trajectory at the integrator floor (first 5 steps < 1e-5), and
  step/matvec totals within 40%.
"""
import json
import os

import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.potentials import LennardJones, MorsePotential
from sella_tpu.potentials.emt import EMT
from sella_tpu.utils.elements import chemical_symbols

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "reference")

STRICT = [
    "morse_xe4_cart_min",
    "morse_xe4_cart_saddle",
    "morse_xe4_int_min",
    "lj7_cart_saddle",
    # round 3: constraint machinery beyond trans/rot
    "morse_xe4_cart_saddle_bond_eq",
    "morse_xe4_cart_min_ineq_active",
    # round 3: Cartesian + cell DOF (closed-form set_x)
    "cu_bulk_cellcart_min",
    # round 4: Niggli reduction FIRING mid-run (skewed start cell,
    # niggli=True): the rebase — reference/ASE position semantics
    # (old-basis fractionals repacked into the reduced cell) + the
    # Hessian chart transform — sits inside the strictly-gated
    # trajectory
    "xe4_skew_cellcart_niggli_min",
]
# FD-refined initial Hessian: H0's FD columns divide ~1e-10
# cross-implementation gradient agreement by 2*delta=2e-5, injecting
# ~5e-6 into H0 itself — strict 1e-8 trajectory gates are unattainable
# BY CONSTRUCTION for any two fp-inequivalent builds. Gates: identical
# step counts, EXACT per-step force-call counts (the refinement block
# is the deliverable — the reference pins these in its own
# ``tests/test_cell_optimization.py:1099``), trajectory at the
# FD-amplification floor.
FD_REFINE = [
    "cu_bulk_cellcart_refine1_min",
]
NEWTON = [
    "morse_xe4_int_saddle_newton",
    "ethanol_int_saddle_newton",
    # round 3: dummy atoms (Newton back-transform)
    "hcch_int_min_newton",
]
NOISE_FLOOR = [
    "morse_xe4_int_saddle",
    "ethanol_int_saddle",
    # round 3: internal + cell DOF. The reference's CellInternalPES
    # back-transform is ALWAYS the adaptive-LSODA ODE
    # (``peswrapper.py:2033`` — iterative_stepper is ignored by the
    # cell+internal class), so per the round-2 control experiment
    # (tools/noise_floor_control.py) strict gates are unattainable.
    "xe4_crystal_cellint_min",
    # round 4: rigid-fragment transport (auto-detected from TRIC
    # translations, both sides) on a two-diatomic molecular crystal
    "n2dimers_cellint_rigid_min",
    # round 4: TIP3P 8-water cluster, per-molecule rigid constraints +
    # fragment TRICs (the reference's hardest integration config)
    "water8_tip3p_int_min",
]

_DRIVER_KEYS = ("name", "fmax", "max_steps", "use_cons", "cons_recipe",
                "spec")


def _potential(spec: dict):
    kind = spec["kind"]
    if kind == "morse":
        return MorsePotential(
            epsilon=spec["epsilon"], r0=spec["r0"], rho0=spec["rho0"],
            pbc=bool(spec.get("pbc", False)),
        )
    if kind == "lj":
        return LennardJones(epsilon=spec["epsilon"], sigma=spec["sigma"])
    if kind == "emt":
        numbers = [chemical_symbols.index(s) for s in spec["symbols"]]
        return EMT(numbers, pbc=bool(spec.get("pbc", False)))
    if kind == "tip3p":
        from sella_tpu.potentials import TIP3P

        return TIP3P(nmol=int(spec["nmol"]))
    raise KeyError(kind)


def _make_constraints(recipe, atoms):
    """Mirror of tools/gen_reference_fixtures.make_constraints — the
    SAME recipe, by name, on the sella_tpu side (duplicated because the
    generator module imports the reference package at import time)."""
    if recipe is None:
        return None
    cons = Constraints(atoms)
    if recipe == "transrot":
        cons.fix_translation()
        cons.fix_rotation()
        return cons
    if recipe == "bond_angle_eq":
        cons.fix_translation()
        cons.fix_rotation()
        cons.fix_bond((0, 1))
        cons.fix_angle((0, 1, 2))
        return cons
    if recipe == "ineq_active":
        cons.fix_translation()
        d23 = float(np.linalg.norm(atoms.positions[3] - atoms.positions[2]))
        cons.fix_bond((2, 3), target=5.0 * d23, comparator="gt")
        return cons
    if recipe == "tip3p_rigid":
        from sella_tpu.potentials.tip3p import angleHOH, rOH

        nmol = len(atoms.positions) // 3
        for i in range(nmol):
            cons.fix_bond((3 * i, 3 * i + 1), target=rOH)
            cons.fix_bond((3 * i, 3 * i + 2), target=rOH)
            cons.fix_angle((3 * i + 1, 3 * i, 3 * i + 2), target=angleHOH)
        cons.fix_translation()
        cons.fix_rotation()
        return cons
    raise KeyError(recipe)


class _MatvecCounter:
    """Class-level instrumentation of the FD-Hessian matvec (the same
    probe the generator counts on the reference side,
    ``/root/reference/sella/linalg.py:39-95``)."""

    def __init__(self):
        self.n = 0

    def __enter__(self):
        import sella_tpu.ops.operators as ops

        self._ops = ops
        self._orig = ops.NumericalHessian.matvec
        counter = self

        def counted(hess_self, v):
            counter.n += 1
            return counter._orig(hess_self, v)

        ops.NumericalHessian.matvec = counted
        return self

    def __exit__(self, *exc):
        self._ops.NumericalHessian.matvec = self._orig
        return False


def _run_traced(name: str):
    data = np.load(os.path.join(FIXDIR, f"{name}.npz"))
    cfg = json.loads(str(data["config"]))
    spec = cfg["spec"]

    atoms = Atoms(
        spec["symbols"],
        data["positions"][0].copy(),
        cell=(np.array(data["cell"][0]) if "cell" in spec else None),
        pbc=spec.get("pbc", False),
        calculator=_potential(spec),
    )
    recipe = cfg.get(
        "cons_recipe", "transrot" if cfg.get("use_cons") else None
    )
    cons = _make_constraints(recipe, atoms)

    kwargs = {k: v for k, v in cfg.items() if k not in _DRIVER_KEYS}
    np.random.seed(2024)
    rec = {k: [] for k in ("positions", "cell", "energy", "delta", "rho",
                           "nmatvec", "ncalls")}
    with _MatvecCounter() as mv:
        opt = Sella(atoms, constraints=cons, logfile=None, **kwargs)

        def snap():
            rec["positions"].append(np.array(atoms.positions, copy=True))
            rec["cell"].append(np.array(atoms.cell, copy=True))
            rec["energy"].append(float(opt.pes.get_f()))
            rec["delta"].append(float(opt.delta))
            rec["rho"].append(float(opt.rho))
            rec["nmatvec"].append(int(mv.n))
            rec["ncalls"].append(int(opt.pes.neval))

        opt.fmax = cfg["fmax"]
        converged = opt.converged()
        snap()
        while not converged and opt.nsteps < cfg["max_steps"]:
            opt.step()
            opt.nsteps += 1
            snap()
            converged = opt.converged()

    return data, rec, bool(converged), opt


@pytest.mark.parametrize("name", STRICT)
def test_reference_parity_strict(name):
    data, rec, converged, opt = _run_traced(name)

    assert converged == bool(data["converged"])
    nsteps_ref = int(data["nsteps"])
    assert opt.nsteps == nsteps_ref, (
        f"step-count mismatch: mine={opt.nsteps} ref={nsteps_ref}"
    )

    pos_ref = data["positions"]
    pos_mine = np.array(rec["positions"])
    assert pos_mine.shape == pos_ref.shape
    np.testing.assert_allclose(
        pos_mine, pos_ref, atol=1e-8,
        err_msg="per-step Cartesian trajectory diverged from reference",
    )
    np.testing.assert_allclose(
        np.array(rec["energy"]), data["energy"], rtol=0, atol=1e-8
    )
    np.testing.assert_allclose(
        np.array(rec["delta"]), data["delta"], rtol=1e-6, atol=1e-10
    )
    if data["cell"].size and np.any(data["cell"]):
        np.testing.assert_allclose(
            np.array(rec["cell"]), data["cell"], atol=1e-8,
            err_msg="per-step CELL trajectory diverged from reference",
        )

    # Davidson matvec counts: within 1 per step (north star)
    mv_ref = data["nmatvec"]
    mv_mine = np.array(rec["nmatvec"])
    assert np.max(np.abs(mv_mine - mv_ref)) <= 1, (
        f"matvec counts diverged: mine={mv_mine.tolist()} "
        f"ref={mv_ref.tolist()}"
    )

    # Force-call counts per step: within 1 (exactness matters most for
    # cu_bulk_cellcart_refine1_min, whose FD initial-Hessian refinement
    # front-loads a probe block into ncalls[0] — the reference pins
    # these counts in its own ``tests/test_cell_optimization.py:1099``)
    nc_ref = data["ncalls"]
    nc_mine = np.array(rec["ncalls"])
    assert np.max(np.abs(nc_mine - nc_ref)) <= 1, (
        f"force-call counts diverged: mine={nc_mine.tolist()} "
        f"ref={nc_ref.tolist()}"
    )


@pytest.mark.parametrize("name", FD_REFINE)
def test_reference_parity_fd_refine(name):
    data, rec, converged, opt = _run_traced(name)

    assert converged == bool(data["converged"])
    nsteps_ref = int(data["nsteps"])
    assert opt.nsteps == nsteps_ref, (
        f"step-count mismatch: mine={opt.nsteps} ref={nsteps_ref}"
    )

    # the deliverable: force-call counts EXACT per step — ncalls[0]
    # carries the FD refinement probe block (2 per refined DOF)
    np.testing.assert_array_equal(
        np.array(rec["ncalls"]), data["ncalls"],
        err_msg="refinement force-call counts diverged",
    )

    # trajectory at the FD-amplification floor (measured 9.7e-5 max on
    # this config; the injected H0 perturbation is ~5e-6)
    pos_ref = data["positions"]
    pos_mine = np.array(rec["positions"])
    assert pos_mine.shape == pos_ref.shape
    np.testing.assert_allclose(pos_mine, pos_ref, atol=1e-3)
    np.testing.assert_allclose(
        np.array(rec["cell"]), data["cell"], atol=1e-3
    )
    assert abs(rec["energy"][-1] - data["energy"][-1]) < 1e-6


@pytest.mark.parametrize("name", NEWTON)
def test_reference_parity_newton(name):
    data, rec, converged, opt = _run_traced(name)

    assert converged == bool(data["converged"])
    nsteps_ref = int(data["nsteps"])
    assert opt.nsteps == nsteps_ref, (
        f"step-count mismatch: mine={opt.nsteps} ref={nsteps_ref}"
    )

    pos_ref = data["positions"]
    pos_mine = np.array(rec["positions"])
    assert pos_mine.shape == pos_ref.shape
    # fixed-point map: 1e-8 until Lyapunov growth of the per-step
    # ~1e-11 Newton-tolerance injection dominates (measured profile in
    # the module docstring); 1e-6 over the whole run
    k = (3 * len(pos_ref)) // 4
    np.testing.assert_allclose(
        pos_mine[:k], pos_ref[:k], atol=1e-8,
        err_msg="early trajectory diverged beyond the fixed-point floor",
    )
    np.testing.assert_allclose(pos_mine, pos_ref, atol=1e-6)
    assert abs(rec["energy"][-1] - data["energy"][-1]) < 1e-8
    if data["cell"].size and np.any(data["cell"]):
        cell_mine = np.array(rec["cell"])
        np.testing.assert_allclose(
            cell_mine[:k], data["cell"][:k], atol=1e-8,
            err_msg="early CELL trajectory diverged",
        )
        np.testing.assert_allclose(cell_mine, data["cell"], atol=1e-6)

    mv_ref = data["nmatvec"]
    mv_mine = np.array(rec["nmatvec"])
    assert np.max(np.abs(mv_mine - mv_ref)) <= 1, (
        f"matvec counts diverged: mine={mv_mine.tolist()} "
        f"ref={mv_ref.tolist()}"
    )


# Per-config final-energy tolerances for the noise-floor class. At
# fmax=1e-3 the energy sits within ~f^2/(2 k_min) of the stationary
# value; for water8's soft intermolecular modes (k ~ 0.05 eV/A^2) that
# floor is ~1e-5, so two independently-converged runs of the SAME basin
# legitimately differ by a few 1e-6 (measured 4.1e-6).
_NF_ETOL = {"water8_tip3p_int_min": 2e-5}


@pytest.mark.parametrize("name", NOISE_FLOOR)
def test_reference_parity_noise_floor(name):
    data, rec, converged, opt = _run_traced(name)

    if not bool(data["converged"]):
        # deliberately TRUNCATED fixture (e.g. n2dimers: 12 cell moves
        # with rigid transport, stopped before the chaotic repacking
        # tail): both sides must run the full budget, and the gated
        # content is the early trajectory below
        assert not converged
        assert opt.nsteps == int(data["nsteps"])
    else:
        # both converge, to the same stationary point
        assert converged
        assert (abs(rec["energy"][-1] - data["energy"][-1])
                < _NF_ETOL.get(name, 1e-6))

    # early steps at the integrator noise floor (before chaos can
    # amplify the per-step ~1e-7 LSODA realization differences)
    pos_ref = data["positions"]
    pos_mine = np.array(rec["positions"])
    k = min(5, len(pos_ref) - 1, len(pos_mine) - 1)
    # Cell configs ride every atom affinely on the cell DOF, so the
    # per-step LSODA realization noise (~1e-6 per
    # tools/noise_floor_control.py) enters multiplied by the move's
    # affine amplitude: measured 3.4e-5 over 5 steps on
    # xe4_crystal_cellint_min vs <1e-5 on the molecular configs.
    early_atol = 5e-5 if np.any(data["cell"]) else 1e-5
    np.testing.assert_allclose(pos_mine[:k], pos_ref[:k], atol=early_atol)
    if data["cell"].size and np.any(data["cell"]):
        cell_mine = np.array(rec["cell"])
        np.testing.assert_allclose(
            cell_mine[:k], data["cell"][:k], atol=2 * early_atol,
            err_msg="early CELL trajectory diverged",
        )
        if bool(data["converged"]):
            # truncated fixtures end mid-flight where per-step LSODA
            # noise has amplified freely; only converged runs pin the
            # endpoint
            np.testing.assert_allclose(
                cell_mine[-1], data["cell"][-1], atol=1e-4,
                err_msg="final cell diverged",
            )

    # effort within 40% (step counts legitimately differ once the
    # realization noise crosses a diag-schedule decision)
    nsteps_ref = max(int(data["nsteps"]), 1)
    assert abs(opt.nsteps - nsteps_ref) <= max(0.4 * nsteps_ref, 3)
    mv_ref = max(int(data["nmatvec"][-1]), 1)
    mv_mine = rec["nmatvec"][-1]
    assert abs(mv_mine - mv_ref) <= max(0.4 * mv_ref, 4)


def test_reference_parity_irc():
    """Per-outer-step IRC parity (forward + reverse) against a trace of
    the reference ``IRC`` driver (``/root/reference/sella/optimize/
    irc.py:74-165``) from the same converged-TS geometry. The IRC inner
    loop runs on the Cartesian PES (closed-form set_x), so strict gates
    apply: trajectory 1e-8 per outer step, matvecs within 1."""
    from sella_tpu import IRC

    path = os.path.join(FIXDIR, "lj4_irc.npz")
    if not os.path.exists(path):
        pytest.skip("lj4_irc fixture not generated")
    data = np.load(path)
    cfg = json.loads(str(data["config"]))
    spec = cfg["spec"]
    irc_kwargs = {k: v for k, v in cfg.items() if k not in _DRIVER_KEYS}

    atoms = Atoms(
        spec["symbols"], data["ts_positions"].copy(),
        calculator=_potential(spec),
    )
    np.random.seed(2024)
    with _MatvecCounter() as mv:
        irc = IRC(atoms, logfile=None, **irc_kwargs)
        for direction in ("forward", "reverse"):
            rec = {"positions": [], "energy": [], "nmatvec": []}
            converged = False
            for converged in irc.irun(cfg["fmax"], steps=cfg["max_steps"],
                                      direction=direction):
                rec["positions"].append(np.array(atoms.positions,
                                                 copy=True))
                rec["energy"].append(float(irc.pes.get_f()))
                rec["nmatvec"].append(int(mv.n))
                if converged:
                    break

            assert bool(converged) == bool(data[f"{direction}_converged"])
            pos_ref = data[f"{direction}_positions"]
            pos_mine = np.array(rec["positions"])
            assert pos_mine.shape == pos_ref.shape, (
                f"{direction}: outer-step count mismatch "
                f"mine={len(pos_mine)} ref={len(pos_ref)}"
            )
            np.testing.assert_allclose(
                pos_mine, pos_ref, atol=1e-8,
                err_msg=f"{direction} IRC trajectory diverged",
            )
            np.testing.assert_allclose(
                np.array(rec["energy"]), data[f"{direction}_energy"],
                rtol=0, atol=1e-8,
            )
            mv_ref = data[f"{direction}_nmatvec"]
            mv_mine = np.array(rec["nmatvec"])
            assert np.max(np.abs(mv_mine - mv_ref)) <= 1, (
                f"{direction}: matvec counts diverged: "
                f"mine={mv_mine.tolist()} ref={mv_ref.tolist()}"
            )
