"""Heterogeneous work sets through shape buckets (VERDICT round-2
item 6): one call processes a mixed LJ4 + LJ7 job list end-to-end."""
import numpy as np

import jax.numpy as jnp

from sella_tpu.parallel.ensemble import EnsembleConfig
from sella_tpu.parallel.hetero import bucket_jobs, run_heterogeneous_queue
from sella_tpu.potentials import LennardJones

TET = np.array(
    [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
     [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
) * 1.12

E_LJ4_MIN = -6.0                 # tetrahedron, epsilon=sigma=1
E_LJ7_MIN = -16.505384           # pentagonal bipyramid


def _lj7_base():
    rstar = 2.0 ** (1.0 / 6.0)
    ring_r = rstar / (2.0 * np.sin(np.pi / 5.0))
    apex_z = np.sqrt(max(rstar ** 2 - ring_r ** 2, 0.1))
    ang = 2.0 * np.pi * np.arange(5) / 5.0
    return np.vstack([
        np.stack([ring_r * np.cos(ang), ring_r * np.sin(ang),
                  np.zeros(5)], axis=1),
        [[0.0, 0.0, apex_z]],
        [[0.0, 0.0, -apex_z]],
    ])


def test_bucket_jobs_groups_and_validates():
    jobs = [np.zeros(12), np.zeros(21), np.zeros(12)]
    b = bucket_jobs(jobs)
    assert b == {12: [0, 2], 21: [1]}
    try:
        bucket_jobs([np.zeros(11)])
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for non-3N length")


def test_mixed_lj4_lj7_minimization_sweep():
    """8 LJ4 + 6 LJ7 minimizations interleaved in one job list; every
    job converges to its cluster's ground state and results come back
    in input order with the 6-tuple queue contract."""
    rng = np.random.RandomState(3)
    lj7 = _lj7_base()
    jobs, want = [], []
    for k in range(14):
        if k % 2 == 0 and k < 12:
            jobs.append(
                (TET + 0.08 * rng.normal(size=(4, 3))).ravel())
            want.append(E_LJ4_MIN)
        else:
            jobs.append(
                (lj7 + 0.05 * rng.normal(size=(7, 3))).ravel())
            want.append(E_LJ7_MIN)

    cfg = EnsembleConfig(natoms=1, order=0, fmax=1e-3, eig=False,
                         method="qn", delta0=0.05)
    results = run_heterogeneous_queue(
        LennardJones(), jobs, batch=4, cfg=cfg,
        max_steps_per_search=300, refill_every=10,
    )
    assert len(results) == len(jobs)
    assert all(len(r) == 6 for r in results)
    for r, e_want, x_in in zip(results, want, jobs):
        x, f, nsteps, conv, nmv, nev = r
        assert conv, (nsteps, f)
        assert x.shape == x_in.shape          # input-order stitching
        # small perturbations of the ground state relax back to it
        np.testing.assert_allclose(f, e_want, atol=1e-5)
        assert nev > 0 and nsteps > 0


def test_mixed_saddle_sweep_order1():
    """Mixed-size saddle searches (order=1) with the full Davidson +
    P-RFO machinery: LJ4 and LJ7 lanes each converge to a first-order
    saddle of their own dimensionality."""
    rng = np.random.RandomState(7)
    lj7 = _lj7_base()
    jobs = [
        (TET + 0.12 * rng.normal(size=(4, 3))).ravel()
        for _ in range(4)
    ] + [
        (lj7 + 0.25 * rng.normal(size=(7, 3))).ravel()
        for _ in range(4)
    ]
    cfg = EnsembleConfig(natoms=1, order=1, fmax=1e-3, gamma=1e-3,
                         restart_after=30)
    results = run_heterogeneous_queue(
        LennardJones(), jobs, batch=4, cfg=cfg,
        max_steps_per_search=150, refill_every=10,
        max_retries=2, retry_kick=0.3,
    )
    nconv = sum(1 for r in results if r[3])
    assert nconv >= 7, [(r[2], r[3]) for r in results]
    # converged LJ7 lanes are bound clusters, not dissociated gas
    for r, x_in in zip(results, jobs):
        if r[3] and len(x_in) == 21:
            assert r[1] < -10.0, r[1]


# ---------------------------------------------------------------------------
# Internal-coordinate heterogeneous sweeps (VERDICT round-2 item 7)
# ---------------------------------------------------------------------------

def _morse_xe4():
    from sella_tpu.potentials import MorsePotential
    from sella_tpu.utils.units import kB

    r0 = 4.73
    pot = MorsePotential(epsilon=226.9 * kB, r0=r0, rho0=r0 * 1.099)
    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    return pot, pos0


def test_internal_topology_signature_buckets():
    """Perturbed copies of one molecule share a signature; a geometry
    whose bond graph differs does not."""
    from sella_tpu.atoms import Atoms
    from sella_tpu.coords.internals import Internals
    from sella_tpu.parallel.hetero import internal_topology_signature

    _, pos0 = _morse_xe4()
    rng = np.random.RandomState(0)

    def sig(pos):
        at = Atoms(["Xe"] * 4, pos)
        ints = Internals(at)
        ints.find_all_bonds()
        ints.find_all_angles()
        ints.find_all_dihedrals()
        return internal_topology_signature(ints)

    s0 = sig(pos0)
    assert sig(pos0 + 0.05 * rng.normal(size=(4, 3))) == s0
    # different species -> different signature even at equal geometry
    at2 = Atoms(["He"] * 4, pos0)
    i2 = Internals(at2)
    i2.find_all_bonds()
    from sella_tpu.parallel.hetero import (
        internal_topology_signature as s,
    )
    assert s(i2) != s0


def test_internal_hetero_mixed_ts_sweep():
    """Mixed-molecule first-order-saddle sweep in internal
    coordinates: 3 Morse Xe4 starts + 3 LJ He7 starts in ONE job
    list; bucketing by (potential, topology signature) routes each to
    its own compiled internal queue and every job converges (the
    Cartesian spill finishing any singular-topology lane)."""
    from sella_tpu.atoms import Atoms
    from sella_tpu.parallel.ensemble_internal import (
        InternalEnsembleConfig,
    )
    from sella_tpu.parallel.hetero import (
        run_heterogeneous_internal_queue,
    )

    mpot, pos0 = _morse_xe4()
    ljpot = LennardJones()
    lj7 = _lj7_base()
    xe4 = Atoms(["Xe"] * 4, pos0)
    he7 = Atoms(["He"] * 7, lj7)
    rng = np.random.RandomState(0)
    jobs = []
    for k in range(3):
        jobs.append((mpot, xe4,
                     (pos0 + 0.3 * rng.normal(size=(4, 3))).ravel()))
        jobs.append((ljpot, he7,
                     (lj7 + 0.12 * rng.normal(size=(7, 3))).ravel()))

    cfg = InternalEnsembleConfig(
        natoms=1, nint=1, order=1, fmax=1e-3, gamma=1e-3,
    )
    results = run_heterogeneous_internal_queue(
        jobs, batch=3, cfg=cfg, max_steps_per_search=300,
        refill_every=20,
    )
    assert len(results) == len(jobs)
    assert all(r is not None for r in results)
    assert all(bool(r[3]) for r in results), [
        (i, r[2], r[3]) for i, r in enumerate(results)
    ]
    # stitching: each result's DOF count matches its input's
    for (pot, at, x0), r in zip(jobs, results):
        assert np.asarray(r[0]).shape == np.asarray(x0).shape
