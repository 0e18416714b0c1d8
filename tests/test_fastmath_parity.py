"""Regression pins for the fast-math policies.

The ensemble tiers ship three TPU fast-math knobs whose docstrings
claim "identical convergence statistics" to the reference-faithful
defaults (``parallel/ensemble.py`` EnsembleConfig):

- ``absb="ns"``    — Newton–Schulz |B| metric in TS-BFGS instead of a
  full batched eigh (``ensemble.py`` ``_abs_psd``),
- ``eigh_f32``     — run the P-RFO projected eigh in float32 with a
  float64 Rayleigh-quotient refinement,
- ``prfo_eigh="jacobi"`` — batched parallel-Jacobi eigh instead of
  XLA's LAPACK-style custom call.

Those claims were measured once at tuning time; this file pins them as
invariants so a numerical drift in any of the three paths (or in the
refinement logic that backstops them) fails CI instead of silently
degrading the batched tiers.

Two gate classes, following the measured behavior:

- minimization (order=0, eig=True so every lane runs Davidson): the
  policies are bit-stable on CPU — converged mask, nsteps, nmatvec,
  and neval all identical lane-for-lane;
- saddle search (order=1): the iterate sequence passes through many
  more eigensolves, so per-lane trajectories may split by an ULP and
  re-merge; the converged MASK must still be identical, with nsteps
  within a few steps per lane and mean matvecs within a couple.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.potentials import LennardJones

TET = np.array(
    [[0.0, 0.0, 0.0],
     [1.0, 0.0, 0.0],
     [0.5, np.sqrt(3.0) / 2.0, 0.0],
     [0.5, np.sqrt(3.0) / 6.0, np.sqrt(2.0 / 3.0)]]
) * 1.12

POLICIES = [
    ("ns", dict(absb="ns")),
    ("f32", dict(eigh_f32=True)),
    ("jacobi", dict(prfo_eigh="jacobi")),
]


def _run(x0, order, **kw):
    if order == 0:
        cfg = EnsembleConfig(natoms=4, order=0, fmax=1e-3, gamma=0.1,
                             eig=True, method="prfo", **kw)
        max_steps = 60
    else:
        cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                             **kw)
        max_steps = 100
    st = run_ensemble(LennardJones(), x0, cfg, max_steps=max_steps)
    return (np.asarray(st.converged), np.asarray(st.nsteps),
            np.asarray(st.nmatvec), np.asarray(st.neval))


@pytest.fixture(scope="module")
def x0_min():
    rng = np.random.RandomState(0)
    return jnp.asarray(
        (TET[None] + 0.08 * rng.normal(size=(16, 4, 3))).reshape(16, 12)
    )


@pytest.fixture(scope="module")
def x0_sad():
    rng = np.random.RandomState(3)
    return jnp.asarray(
        (TET[None] + 0.05 * rng.normal(size=(16, 4, 3))).reshape(16, 12)
    )


@pytest.mark.parametrize("name,kw", POLICIES)
def test_minimization_stats_identical(x0_min, name, kw):
    base = _run(x0_min, order=0)
    alt = _run(x0_min, order=0, **kw)
    assert base[0].all(), "baseline config must fully converge"
    np.testing.assert_array_equal(base[0], alt[0], err_msg=name)
    np.testing.assert_array_equal(base[1], alt[1], err_msg=name)
    np.testing.assert_array_equal(base[2], alt[2], err_msg=name)
    np.testing.assert_array_equal(base[3], alt[3], err_msg=name)


@pytest.mark.parametrize("name,kw", POLICIES)
def test_saddle_mask_identical_steps_close(x0_sad, name, kw):
    base = _run(x0_sad, order=1)
    alt = _run(x0_sad, order=1, **kw)
    # the partially-converged mask makes this nontrivial: every policy
    # must converge exactly the same lanes in 100 steps
    assert 0.0 < base[0].mean() < 1.0
    np.testing.assert_array_equal(base[0], alt[0], err_msg=name)
    dsteps = np.abs(base[1].astype(int) - alt[1].astype(int))
    assert dsteps.max() <= 5, (name, dsteps)
    assert abs(base[1].mean() - alt[1].mean()) <= 1.0, name
    assert abs(base[2].mean() - alt[2].mean()) <= 3.0, name
