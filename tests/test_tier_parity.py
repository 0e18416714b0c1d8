"""Cross-tier parity: sequential ``Sella`` vs a 1-lane batched ensemble.

ASE is absent from this image, so the reference cannot run here; the
trajectory-match bar (north star: 1e-8) is enforced between this
package's own two tiers instead. Where the algorithms are identical
(quasi-Newton trust-region minimization, no Davidson), the tiers must
produce the SAME trajectory step for step. Deliberate divergences, each
exercised by the saddle test below:

* Davidson matvecs: the sequential tier uses finite-difference probes
  through ``NumericalHessian`` (eta displacement, reference
  ``linalg.py:50-87``); the batched tier uses exact HVPs (``jax.jvp``).
  The probe *subspace dynamics* still agree: matvec counts must match
  within 1 per the north-star bar.
* Rigid-body handling: the sequential tier can treat rotations as
  nonlinear *constraints* (Lagrangian curvature Hc enters the projected
  Hessian); the batched tier projects instantaneous rigid modes. For
  parity both tiers are run with linear translation handling only
  (``proj_rot=False`` / ``nproj=3``), where Hc == 0.
* Force-call accounting: the sequential tier pays one force call per FD
  matvec (neval includes them); the batched tier's HVPs are not force
  calls (counted in nmatvec only).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.parallel.ensemble import (
    EnsembleConfig,
    init_state,
    make_step_fn,
)
from sella_tpu.potentials import LennardJones


def _lj4_start(seed=0, scale=0.05):
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(seed)
    return tet + scale * rng.normal(size=(4, 3))


def _sequential(pos0, pot, order, **kw):
    atoms = Atoms(["X"] * 4, pos0.copy(), calculator=pot)
    cons = Constraints(atoms)
    cons.fix_translation()
    return Sella(atoms, order=order, constraints=cons, logfile=None,
                 proj_rot=False, rs="ras", delta0=0.1, rho_inc=1.035,
                 sigma_inc=1.15, **kw)


def test_minimization_trajectory_parity():
    """Identical-algorithm regime: per-step trajectories must agree to
    1e-8 (they agree to ~1e-11; the slack is for platform variation)."""
    pos0 = _lj4_start()
    pot = LennardJones()
    opt = _sequential(pos0, pot, order=0, eig=False, method="qn",
                      sigma_dec=0.9, rho_dec=100.0)
    cfg = EnsembleConfig(
        natoms=4, order=0, nproj=3, fmax=1e-3, delta0=0.1,
        sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035, rho_dec=100.0,
        method="qn", rs="ras", eig=False, rs_tol=1e-12,
    )
    state = init_state(pot, jnp.asarray(pos0.ravel()[None]), cfg)
    step = jax.jit(make_step_fn(pot, cfg))
    key = jax.random.PRNGKey(0)

    worst = 0.0
    for i in range(60):
        if bool(state.converged[0]):
            break
        opt.step()
        state = step(state, jax.random.fold_in(key, i))
        diff = float(
            np.max(np.abs(opt.pes.atoms.positions.ravel()
                          - np.asarray(state.x[0])))
        )
        worst = max(worst, diff)
        assert diff < 1e-8, f"tier trajectories diverged at step {i}: {diff}"
        # deltas track smag, whose agreement is set by the alpha
        # root-find tolerances (1e-10 host vs 1e-12 batched)
        assert float(state.delta[0]) == pytest.approx(opt.delta, rel=1e-8)
    assert bool(state.converged[0]), "batched lane did not converge"
    # keep a record of how tight the parity actually is
    assert worst < 1e-9


def test_saddle_parity_matvec_counts():
    """Saddle search: the Davidson implementations differ by design
    (FD probes vs exact HVPs) so trajectories drift, but both tiers
    must find a saddle of the same energy with the SAME iteration
    economy: steps equal, Davidson matvec totals within 1 (north-star
    bar), and the force-call accounting identities must hold exactly."""
    pos0 = _lj4_start()
    pot = LennardJones()

    opt = _sequential(pos0, pot, order=1, gamma=1e-3, method="prfo",
                      sigma_dec=0.65, rho_dec=5.0, nsteps_per_diag=3)
    assert opt.run(fmax=1e-3, steps=200)

    cfg = EnsembleConfig(
        natoms=4, order=1, nproj=3, fmax=1e-3, gamma=1e-3, delta0=0.1,
        sigma_inc=1.15, sigma_dec=0.65, rho_inc=1.035, rho_dec=5.0,
        nsteps_per_diag=3, method="prfo", rs="ras", rs_tol=1e-10,
    )
    state = init_state(pot, jnp.asarray(pos0.ravel()[None]), cfg)
    step = jax.jit(make_step_fn(pot, cfg))
    key = jax.random.PRNGKey(0)
    i = 0
    while not bool(state.converged.all()) and i < 200:
        state = step(state, jax.random.fold_in(key, i))
        i += 1
    assert bool(state.converged[0])

    nsteps_b = int(state.nsteps[0])
    nmatvec_b = int(state.nmatvec[0])
    neval_b = int(state.neval[0])

    # pinned expectations for this seed (LJ4 saddle at E = -6.0):
    assert opt.nsteps == 12 and nsteps_b == 12
    assert opt.pes.nmatvec == 18 and nmatvec_b == 18
    assert abs(opt.pes.nmatvec - nmatvec_b) <= 1  # the north-star bar
    assert float(state.f[0]) == pytest.approx(opt.pes.get_f(), abs=1e-6)

    # accounting identities: sequential pays a force call per FD matvec
    # (+1 initial eval); batched HVPs are free of force calls
    assert opt.pes.neval == opt.nsteps + opt.pes.nmatvec + 1
    assert neval_b == nsteps_b + 1
