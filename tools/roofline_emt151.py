"""Roofline measurement for the BASELINE config-1 ensemble step.

VERDICT r2 item 5: "make the MXU-utilization story a number with a
roofline". This script is that number's provenance — run it on the
bench chip and paste the JSON into docs/roofline.md.

For the Cu(111) 5x5x6 + adsorbate batched saddle step (151 atoms /
453 DOF, the (B, 453, 453) batched-linalg regime) it measures, for the
f64-potential and the f32-potential (potentials.F32Potential) variants:

* XLA's own cost model for the compiled step program: total FLOPs,
  transcendental count, and bytes accessed (the honest numerator —
  every eigh/QR/matmul XLA actually emits, not a hand model);
* wall-clock per step (tunnel-amortized: ``chunk`` steps per dispatch);
* achieved FLOP/s and bytes/s, as fractions of the chip's bf16 MXU
  peak and of its HBM bandwidth.

The roofline verdict is printed per variant: which ceiling (compute vs
memory) the XLA cost model says binds at this arithmetic intensity,
and what fraction of that ceiling the step achieves. See
docs/roofline.md for the interpretation and the workload-ceiling
argument.

Usage (bench chip):  python tools/roofline_emt151.py [batch] [steps]

NOTE: chunk defaults to 1 — fused multi-step dispatches of this
program crash the tunneled TPU worker during the initial
diag-compaction drain (~12-15 s/step; a 5-step chunk is a ~75 s
single RPC, measured 2026-08-20 to trip the worker watchdog at both
batch=64 and batch=32). Steady-state steps are ~1 s, so the roofline
should be timed AFTER the drain: the tool runs ``nsteps`` warmup
steps before the timed window.
"""
import json
import sys
import time

import numpy as np


_HBM_GBPS = {
    # chip HBM bandwidth (GB/s), public spec sheets
    "TPU v4": 1228.0,
    "TPU v5e": 819.0,
    "TPU v5 lite": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
}


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(batch=32, nsteps=20, chunk=1, only=None, warm=14):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _chip_peak_tflops, _emt151_setup, run_config  # noqa: F401
    from sella_tpu.parallel.ensemble import (
        EnsembleConfig,
        init_state,
        make_step_fn,
    )
    from sella_tpu.potentials import F32Potential

    peak_tflops, kind = _chip_peak_tflops()
    hbm = next(
        (v for k, v in _HBM_GBPS.items()
         if k.lower() in str(kind).lower()),
        None,
    )
    out = {"chip": kind, "batch": batch,
           "peak_bf16_tflops": peak_tflops, "hbm_gbps": hbm}

    pot64, x0, cell, nat = _emt151_setup(batch)
    variants = (
        ("f64", pot64, 1e-14),
        ("f32pot", F32Potential(pot64), 3.0 * 1e-5 * 15.0 * 151),
    )
    if only:
        variants = tuple(v for v in variants if v[0] == only)
    for name, pot, pred_min in variants:
        _log(f"[roofline] variant={name} building step fn ...")
        cfg = EnsembleConfig(
            natoms=nat, order=1, nproj=3, fmax=1e-3, gamma=0.3,
            davidson_max=60, delta0=5e-3,
            diag_budget=max(batch // 8, 1), eigh_f32=True,
            rs_maxiter=12, absb="ns", eval_chunk=min(batch, 16),
            pred_min=pred_min,
        )
        step = make_step_fn(pot, cfg, cell)
        key = jax.random.PRNGKey(0)

        # identical name/structure to bench.run_config's wrapper so the
        # persistent compile cache (keyed on the HLO module, which
        # carries the traced function name) hits across the two tools
        def multi_step(state, base_key, _step=step):
            def body(i, st):
                return _step(st, jax.random.fold_in(base_key, i))

            return jax.lax.fori_loop(0, chunk, body, state)

        jstep = jax.jit(multi_step, donate_argnums=0)
        state = init_state(pot, x0, cfg, cell)
        row = {}
        try:
            ca = jstep.lower(state, jax.random.fold_in(key, 0)) \
                      .compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops_per_step_G"] = round(
                float(ca.get("flops", 0)) / chunk / 1e9, 2
            )
            row["transcendentals_per_step_G"] = round(
                float(ca.get("transcendentals", 0)) / chunk / 1e9, 3
            )
            row["bytes_per_step_GB"] = round(
                float(ca.get("bytes accessed", 0)) / chunk / 1e9, 2
            )
        except Exception as e:  # pragma: no cover
            row["cost_analysis_error"] = str(e)

        _log(f"[roofline] variant={name} cost_analysis done "
             f"({row.get('flops_per_step_G', '?')} GF/step); compiling")
        # compile + run past the initial diag-compaction drain (the
        # first ~batch/diag_budget steps each carry a davidson_max-deep
        # bootstrap; the roofline characterizes the steady-state step,
        # with the drain cost reported separately)
        nwarm = max(warm // chunk, 1)
        tw = time.perf_counter()
        for i in range(nwarm):
            state = jstep(state, jax.random.fold_in(key, i))
            jax.block_until_ready(state.x)
            if i == 0:
                row["compile_plus_first_step_s"] = round(
                    time.perf_counter() - tw, 1
                )
        row["drain_steps_untimed"] = nwarm * chunk
        _log(f"[roofline] variant={name} warm "
             f"({nwarm * chunk} drain steps); timing {nsteps} steps")
        t0 = time.perf_counter()
        ncall = max(nsteps // chunk, 1)
        for i in range(nwarm, nwarm + ncall):
            state = jstep(state, jax.random.fold_in(key, i))
        jax.block_until_ready(state.x)
        dt = (time.perf_counter() - t0) / (ncall * chunk)
        row["sec_per_step"] = round(dt, 3)
        row["converged_frac"] = round(
            float(np.asarray(state.converged).mean()), 4
        )
        if "flops_per_step_G" in row and dt > 0:
            tfs = row["flops_per_step_G"] / dt / 1e3
            row["achieved_tflops_per_s"] = round(tfs, 4)
            gbs = row["bytes_per_step_GB"] / dt
            row["achieved_gb_per_s"] = round(gbs, 1)
            if peak_tflops:
                row["mfu_vs_bf16_peak"] = round(tfs / peak_tflops, 6)
            if hbm:
                row["hbm_fraction"] = round(gbs / hbm, 4)
                # which roofline binds at this arithmetic intensity
                ai = (row["flops_per_step_G"]
                      / max(row["bytes_per_step_GB"], 1e-12))  # flop/byte
                row["arithmetic_intensity_flop_per_byte"] = round(ai, 2)
                if peak_tflops:
                    knee = peak_tflops * 1e3 / hbm  # flop/byte at the knee
                    row["bound"] = (
                        "memory" if ai < knee else "compute"
                    )
                    ceil_tfs = min(peak_tflops, ai * hbm / 1e3)
                    row["roofline_ceiling_tflops"] = round(ceil_tfs, 2)
                    row["fraction_of_ceiling"] = round(tfs / ceil_tfs, 4)
        out[name] = row
        _log("[roofline] " + json.dumps({name: row}))
    return out


def measure_internal(batch=1024, nsteps=10, chunk=1):
    """Internal-tier roofline section (VERDICT r4 item 4): the batched
    Morse Xe4 internal-coordinate step (the bench's
    BENCH_CONFIG=internal config) with the chord back-transform ON and
    OFF — XLA cost model + steady-state wall-clock per variant, so the
    6.3 s/step serial-op diagnosis carries numbers and the chord win is
    measured, not asserted."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import _chip_peak_tflops
    from sella_tpu.atoms import Atoms
    from sella_tpu.coords.internals import Internals
    from sella_tpu.parallel.ensemble_internal import (
        InternalEnsembleConfig,
        init_internal_state,
        make_internal_step_fn,
    )
    from sella_tpu.potentials import MorsePotential
    from sella_tpu.utils.units import kB

    peak_tflops, kind = _chip_peak_tflops()
    hbm = next(
        (v for k, v in _HBM_GBPS.items()
         if k.lower() in str(kind).lower()),
        None,
    )
    out = {"chip": kind, "batch": batch, "tier": "internal",
           "peak_bf16_tflops": peak_tflops, "hbm_gbps": hbm}

    r0 = 4.73
    pot = MorsePotential(epsilon=226.9 * kB, r0=r0, rho0=r0 * 1.099)
    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    ints = Internals(Atoms(["Xe"] * 4, pos0))
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    rng2 = np.random.RandomState(0)
    x0 = jnp.asarray(
        (pos0[None] + 0.3 * rng2.normal(size=(batch, 4, 3))).reshape(
            batch, 12
        )
    )
    key = jax.random.PRNGKey(0)
    for name, chord in (("full_newton", False), ("chord", True)):
        _log(f"[roofline-int] variant={name} building step fn ...")
        cfg = InternalEnsembleConfig(
            natoms=4, nint=ints.nint, order=1, fmax=1e-3, gamma=1e-3,
            restart_after=60, newton_chord=chord,
        )
        step = make_internal_step_fn(pot, ints, cfg)

        def multi_step(state, base_key, _step=step):
            def body(i, st):
                return _step(st, jax.random.fold_in(base_key, i))

            return jax.lax.fori_loop(0, chunk, body, state)

        jstep = jax.jit(multi_step, donate_argnums=0)
        state = init_internal_state(pot, ints, x0, cfg)
        row = {}
        try:
            ca = jstep.lower(state, jax.random.fold_in(key, 0)) \
                      .compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            row["flops_per_step_G"] = round(
                float(ca.get("flops", 0)) / chunk / 1e9, 2
            )
            row["bytes_per_step_GB"] = round(
                float(ca.get("bytes accessed", 0)) / chunk / 1e9, 2
            )
        except Exception as e:  # pragma: no cover
            row["cost_analysis_error"] = str(e)
        tw = time.perf_counter()
        nwarm = max(4 // chunk, 1)
        for i in range(nwarm):
            state = jstep(state, jax.random.fold_in(key, i))
            jax.block_until_ready(state.x)
            if i == 0:
                row["compile_plus_first_step_s"] = round(
                    time.perf_counter() - tw, 1
                )
        t0 = time.perf_counter()
        ncall = max(nsteps // chunk, 1)
        for i in range(nwarm, nwarm + ncall):
            state = jstep(state, jax.random.fold_in(key, i))
        jax.block_until_ready(state.x)
        dt = (time.perf_counter() - t0) / (ncall * chunk)
        row["sec_per_step"] = round(dt, 3)
        row["converged_frac"] = round(
            float(np.asarray(state.converged).mean()), 4
        )
        if "flops_per_step_G" in row and dt > 0 and hbm:
            gbs = row["bytes_per_step_GB"] / dt
            row["achieved_gb_per_s"] = round(gbs, 1)
            row["hbm_fraction"] = round(gbs / hbm, 4)
        out[name] = row
        _log("[roofline-int] " + json.dumps({name: row}))
    if ("full_newton" in out and "chord" in out
            and out["full_newton"].get("sec_per_step")
            and out["chord"].get("sec_per_step")):
        out["chord_speedup"] = round(
            out["full_newton"]["sec_per_step"]
            / out["chord"]["sec_per_step"], 2
        )
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "internal":
        batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
        nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 1
        print(json.dumps(measure_internal(batch, nsteps, chunk),
                         indent=1))
    else:
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
        nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1
        only = sys.argv[4] if len(sys.argv) > 4 else None
        print(json.dumps(measure(batch, nsteps, chunk, only), indent=1))
