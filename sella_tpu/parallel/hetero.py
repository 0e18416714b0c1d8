"""Heterogeneous work sets: mixed structure sizes through the queue.

The reference driver trivially accepts arbitrary structures per run
(``/root/reference/sella/optimize/optimize.py:42-216``) because each
search is its own Python object. The batched tiers instead compile ONE
fixed-shape program per (natoms, config) signature — so a realistic
TS-sweep workload (many different molecules) is served by *bucketing*:
jobs are grouped into homogeneous sub-batches by their static shape
signature, each bucket runs through the compiled work queue
(:func:`sella_tpu.parallel.ensemble.run_ensemble_queue`), and results
are stitched back in input order.

Why bucketing instead of padding every structure to max-natoms: the
padded step pays max-natoms cost for every lane (the batched eighs are
O(n^3) in the PADDED dim), masked atoms contaminate the free-subspace
projection and the fmax reduction unless every kernel grows a mask
argument, and XLA compiles one executable per shape anyway. Buckets
keep each compiled program dense — every FLOP is a real structure —
at the cost of one compile per distinct natoms, amortized across the
whole bucket (and across calls via jax's jit cache when configs
repeat).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .ensemble import EnsembleConfig, run_ensemble_queue
from .ensemble_internal import (
    InternalEnsembleConfig,
    fixed_internal_constraints,
    run_internal_ensemble_queue,
)


def bucket_jobs(x0_list: Sequence[np.ndarray]):
    """Group job indices by DOF size. Returns {dim: [input indices]}
    in first-seen order (deterministic)."""
    buckets: dict = {}
    for i, x in enumerate(x0_list):
        d = int(np.asarray(x).ravel().shape[0])
        if d % 3 != 0:
            raise ValueError(
                f"job {i}: flat coordinate length {d} is not 3*natoms"
            )
        buckets.setdefault(d, []).append(i)
    return buckets


def run_heterogeneous_queue(
    potential,
    x0_list: Sequence[np.ndarray],
    batch: int,
    cfg: Optional[EnsembleConfig] = None,
    max_steps_per_search: int = 300,
    refill_every: int = 10,
    seed: int = 0,
    mesh=None,
    max_retries: int = 0,
    retry_kick: float = 0.3,
    **cfg_overrides,
):
    """Run a mixed-size job list through per-shape homogeneous queues.

    ``x0_list``: flat (3*natoms,) start coordinates — sizes may differ
    per job. ``cfg``: a template :class:`EnsembleConfig` whose
    ``natoms`` is replaced per bucket (or None to build one from
    ``cfg_overrides``). A bucket smaller than ``batch`` runs with
    exactly as many lanes as it has jobs — no padded idle lanes.

    Returns a list of (x_final, f, nsteps, converged, nmatvec, neval)
    tuples aligned with ``x0_list`` — the same 6-tuple contract as
    :func:`run_ensemble_queue`.
    """
    if cfg is None:
        cfg = EnsembleConfig(natoms=1, **cfg_overrides)
    elif cfg_overrides:
        cfg = cfg._replace(**cfg_overrides)

    buckets = bucket_jobs(x0_list)
    results: list = [None] * len(x0_list)
    for dim, idxs in buckets.items():
        natoms = dim // 3
        bcfg = cfg._replace(natoms=natoms)
        x0 = jnp.asarray(
            np.stack([np.asarray(x0_list[i]).ravel() for i in idxs])
        )
        bbatch = min(batch, len(idxs))
        out = run_ensemble_queue(
            potential, x0, bcfg, bbatch,
            max_steps_per_search=max_steps_per_search,
            refill_every=refill_every, seed=seed, mesh=mesh,
            max_retries=max_retries, retry_kick=retry_kick,
        )
        for i, r in zip(idxs, out):
            results[i] = r
    return results


def internal_topology_signature(ints) -> tuple:
    """Hashable bucket key for internal-coordinate jobs: two jobs may
    share one compiled internal-tier program iff they have the same
    species and the same discovered coordinate sets (the batched tier
    compiles one fixed-shape engine per topology)."""
    from ..coords import topology as _topo

    return (
        ints.natoms,
        tuple(int(z) for z in ints.atoms.numbers),
        ints.ntrans,
        ints.ndummies,
        tuple(sorted(_topo._bond_key(i, j, nc)
                     for i, j, nc in ints.bonds)),
        tuple(sorted(_topo._angle_key(i, j, k, nc)
                     for i, j, k, nc in ints.angles)),
        tuple(sorted(_topo._dihedral_key(i, j, k, l2, nc)
                     for i, j, k, l2, nc in ints.dihedrals)),
    )


def run_heterogeneous_internal_queue(
    jobs: Sequence[tuple],
    batch: int,
    cfg: Optional[InternalEnsembleConfig] = None,
    max_steps_per_search: int = 300,
    refill_every: int = 10,
    seed: int = 0,
    spill: Optional[str] = "cartesian",
    discover: Sequence[str] = ("bonds", "angles", "dihedrals"),
    **cfg_overrides,
):
    """Mixed-molecule TS sweep in internal coordinates — the
    internal-tier analogue of :func:`run_heterogeneous_queue`
    (reference generality: ``optimize.py:42-216`` accepts any
    structure per run, with internals auto-discovered per structure,
    ``peswrapper.py:623-627``).

    ``jobs``: sequence of ``(potential, atoms, x0)`` — ``atoms``
    carries species and the geometry used for topology discovery,
    ``x0`` the flat start coordinates (many jobs may share one
    ``atoms``/potential: perturbed starts of one molecule). Each job's
    topology is discovered at its OWN start geometry; jobs land in the
    same bucket iff their potential is the same object and their
    discovered topology signatures match — so a perturbation large
    enough to change the bond graph becomes its own (correctly
    compiled) bucket rather than running under a wrong shared
    topology. Per bucket the first job's :class:`Internals` drives one
    :func:`run_internal_ensemble_queue`; results are stitched back in
    input order (same 6-tuple contract).

    ``cfg``: template whose per-bucket static fields (natoms, nint,
    ndummies, ncons) are replaced per bucket."""
    from ..coords.internals import Internals

    if cfg is None:
        cfg = InternalEnsembleConfig(natoms=1, nint=1, **cfg_overrides)
    elif cfg_overrides:
        cfg = cfg._replace(**cfg_overrides)

    buckets: dict = {}
    bucket_ints: dict = {}
    for idx, (pot, atoms, x0) in enumerate(jobs):
        x = np.asarray(x0, dtype=float).ravel()
        if x.shape[0] != 3 * len(atoms.positions):
            raise ValueError(
                f"job {idx}: x0 length {x.shape[0]} != 3*natoms"
            )
        at = atoms.copy()
        at.set_positions(x.reshape(-1, 3))
        ints = Internals(at)
        if "bonds" in discover:
            ints.find_all_bonds()
        if "angles" in discover:
            ints.find_all_angles()
        if "dihedrals" in discover:
            ints.find_all_dihedrals()
        key = (id(pot), internal_topology_signature(ints))
        buckets.setdefault(key, []).append(idx)
        if key not in bucket_ints:
            bucket_ints[key] = (pot, ints)

    results: list = [None] * len(jobs)
    for key, idxs in buckets.items():
        pot, ints = bucket_ints[key]
        cidx, _ = fixed_internal_constraints(ints)
        bcfg = cfg._replace(
            natoms=ints.natoms, nint=ints.nint,
            ndummies=ints.ndummies, ncons=len(cidx),
        )
        x0 = jnp.asarray(
            np.stack([np.asarray(jobs[i][2], dtype=float).ravel()
                      for i in idxs])
        )
        bbatch = min(batch, len(idxs))
        out = run_internal_ensemble_queue(
            pot, ints, x0, bcfg, bbatch,
            max_steps_per_search=max_steps_per_search,
            refill_every=refill_every, seed=seed, spill=spill,
        )
        for i, r in zip(idxs, out):
            results[i] = r
    return results
