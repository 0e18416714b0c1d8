"""Parity pins for the mixed-precision potential path.

``potentials.mixed.F32Potential`` evaluates a jax-native potential in
float32 behind the optimizer's float64 interface — the TPU fast path
for the O(n^2 * images) pair/density sums (f64 is emulated on TPU).
These tests pin the two claims the wrapper makes:

* derivative fidelity: f32 energies/gradients/HVPs agree with the f64
  evaluation to ~f32 machine noise (relative 1e-5 class), far below
  the fmax=1e-3 convergence gate;
* optimizer robustness: a batched saddle search driven entirely by
  f32 potential evaluations (with ``pred_min`` raised above the f32
  energy-noise floor) converges the same lanes to the same stationary
  points as the f64 run, in a comparable number of steps.

Style follows tests/test_fastmath_parity.py (the fast-math policy
pins); gates here are necessarily looser — the f32 potential changes
every trajectory at the 1e-6 level by design, so bit-identity is not
the claim, matching convergence behavior is.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.potentials import EMT, F32Potential, LennardJones

TET = np.array(
    [[0.0, 0.0, 0.0],
     [1.0, 0.0, 0.0],
     [0.5, np.sqrt(3.0) / 2.0, 0.0],
     [0.5, np.sqrt(3.0) / 6.0, np.sqrt(2.0 / 3.0)]]
) * 1.12


def _fcc_cu_cluster(n_side=2):
    """Small periodic Cu box for the EMT derivative checks."""
    from sella_tpu.potentials.emt import fcc_bulk

    atoms = fcc_bulk("Cu", 3.59, reps=(n_side, n_side, n_side))
    return atoms


def test_emt_grad_matches_f64():
    atoms = _fcc_cu_cluster()
    n = len(atoms.positions)
    pot64 = EMT(np.array([29] * n), pbc=True)
    pot32 = F32Potential(pot64)
    rng = np.random.RandomState(0)
    x = jnp.asarray((atoms.positions
                     + 0.05 * rng.normal(size=(n, 3))).ravel())
    cell = jnp.asarray(atoms.cell)

    e64, g64 = pot64.energy_and_grad(x, cell)
    e32, g32 = pot32.energy_and_grad(x, cell)
    assert e32.dtype == jnp.float64 and g32.dtype == jnp.float64
    # energy: the EMT total is a large cancellation (pair and
    # conversion terms are each O(10 eV/atom) with opposite sign), so
    # the f32 noise floor scales with the CANCELLING terms, ~1e-5 *
    # natoms * 10 eV — this is exactly why pred_min must be raised
    # when running f32 slabs (see potentials.mixed docstring)
    assert abs(float(e32 - e64)) < 1e-5 * 15.0 * n
    # gradient: absolute noise ~1e-5 eV/A on O(1) forces — three
    # orders below the fmax=1e-3 gate
    assert float(jnp.max(jnp.abs(g32 - g64))) < 5e-5


def test_emt_hvp_matches_f64():
    atoms = _fcc_cu_cluster()
    n = len(atoms.positions)
    pot64 = EMT(np.array([29] * n), pbc=True)
    pot32 = F32Potential(pot64)
    rng = np.random.RandomState(1)
    x = jnp.asarray((atoms.positions
                     + 0.05 * rng.normal(size=(n, 3))).ravel())
    v = jnp.asarray(rng.normal(size=3 * n))
    v = v / jnp.linalg.norm(v)
    cell = jnp.asarray(atoms.cell)
    h64 = pot64.hvp(x, v, cell)
    h32 = pot32.hvp(x, v, cell)
    assert h32.dtype == jnp.float64
    scale = float(jnp.linalg.norm(h64))
    assert float(jnp.linalg.norm(h32 - h64)) < 2e-4 * max(scale, 1.0)


def test_strain_grad_matches_f64():
    atoms = _fcc_cu_cluster()
    n = len(atoms.positions)
    pot64 = EMT(np.array([29] * n), pbc=True)
    pot32 = F32Potential(pot64)
    x = jnp.asarray(atoms.positions.ravel())
    cell = jnp.asarray(atoms.cell)
    _, d64 = pot64.energy_and_strain_grad(x, cell)
    _, d32 = pot32.energy_and_strain_grad(x, cell)
    assert float(jnp.max(jnp.abs(d32 - d64))) < 1e-3 * max(
        float(jnp.max(jnp.abs(d64))), 1.0
    )


def _run(pot, x0, pred_min=1e-14):
    cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                         pred_min=pred_min)
    st = run_ensemble(pot, x0, cfg, max_steps=100)
    return st


def test_saddle_search_f32_potential_parity():
    """LJ4 saddle batch: the f32-potential run must converge the same
    lanes to the same stationary points as f64 (geometry match at the
    1e-3-class level set by fmax, not bitwise)."""
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(
        (TET[None] + 0.05 * rng.normal(size=(16, 4, 3))).reshape(16, 12)
    )
    base = _run(LennardJones(), x0)
    alt = _run(F32Potential(LennardJones()), x0, pred_min=1e-6)
    cb = np.asarray(base.converged)
    ca = np.asarray(alt.converged)
    assert cb.mean() > 0.5, "baseline must mostly converge"
    # every f64-converged lane must also converge in f32
    assert (ca | ~cb).all(), (cb, ca)
    both = cb & ca
    # converged geometries agree: same saddle, displacement bounded by
    # the curvature-scaled force tolerance (LJ4 soft modes ~0.1 eV/A^2
    # -> fmax=1e-3 allows ~1e-2 A wiggle per mode)
    dx = np.abs(np.asarray(base.x) - np.asarray(alt.x))[both]
    assert dx.max() < 5e-2, dx.max()
    dsteps = np.abs(np.asarray(base.nsteps, int)
                    - np.asarray(alt.nsteps, int))[both]
    assert dsteps.mean() <= 10.0, dsteps


def test_pred_min_guard_accepts_subnoise_predictions():
    """With pred_min raised, sub-threshold predictions take ratio=1
    (accept, trust unchanged) instead of a noise-driven trust crash."""
    rng = np.random.RandomState(5)
    x0 = jnp.asarray(
        (TET[None] + 0.03 * rng.normal(size=(8, 4, 3))).reshape(8, 12)
    )
    st = _run(F32Potential(LennardJones()), x0, pred_min=1e-6)
    # the run stays sane: finite state, most lanes converged
    assert np.isfinite(np.asarray(st.x)).all()
    assert np.asarray(st.converged).mean() >= 0.5
