"""Cross-tier parity: sequential ``Sella`` vs a 1-lane batched ensemble.

ASE is absent from this image, but the ACTUAL reference does run here
through the test-only ASE shim (``tools/refshim``) — the 1e-8
trajectory gates against it live in ``tests/test_reference_parity.py``.
This module enforces the complementary bar between this package's own
two tiers (sequential driver vs 1-lane batched ensemble). Where the algorithms are identical
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

from sella_tpu import Atoms, Constraints, IRC, Sella
from sella_tpu.coords.internals import Internals
from sella_tpu.parallel.ensemble import (
    EnsembleConfig,
    init_state,
    make_step_fn,
)
from sella_tpu.parallel.ensemble_cell import (
    CellEnsembleConfig,
    cells_of,
    init_cell_state,
    make_cell_step_fn,
)
from sella_tpu.parallel.ensemble_internal import (
    InternalEnsembleConfig,
    init_internal_state,
    make_internal_step_fn,
)
from sella_tpu.parallel.ensemble_irc import (
    IRCEnsembleConfig,
    init_irc_state,
    make_irc_step_fn,
)
from sella_tpu.potentials import LennardJones, MorsePotential
from sella_tpu.utils.units import kB


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


# ---------------------------------------------------------------------------
# Internal-coordinate tier (VERDICT r2 item 2)
# ---------------------------------------------------------------------------

_MORSE_KW = dict(epsilon=226.9 * kB, r0=4.73, rho0=4.73 * 1.099)


def _xe4_chain(seed=3, scale=0.10):
    """A 4-atom zigzag chain whose auto-discovered internals are exactly
    non-redundant (3 bonds + 2 angles + 1 dihedral = 3N-6 = 6): every
    internal target q0+dq is then exactly realizable, so both tiers'
    Newton solves converge quadratically to the stopping tolerance and
    the trajectories can be compared at the 1e-8 north-star bar."""
    r0 = 4.73
    base = np.array([
        [0.0, 0.0, 0.0],
        [r0, 0.0, 0.0],
        [r0 + r0 * np.cos(1.9), r0 * np.sin(1.9), 0.0],
    ])
    p3 = base[2] + r0 * np.array([
        np.cos(0.6), np.sin(0.6) * np.cos(1.0), np.sin(0.6) * np.sin(1.0)
    ])
    rng = np.random.RandomState(seed)
    return np.vstack([base, p3]) + scale * rng.normal(size=(4, 3))


def test_internal_tier_trajectory_parity():
    """Sequential InternalPES driver (Newton fast path) vs the batched
    internal ensemble on a NON-redundant topology: identical-algorithm
    regime, so per-step internal coordinates must agree to 1e-8 all the
    way to convergence (measured 3.6e-10; requires the batched tier's
    parallel-transported secant, the 'rms' Newton stop metric, and both
    Newton tolerances at 1e-12)."""
    pos0 = _xe4_chain()
    pot = MorsePotential(**_MORSE_KW)

    atoms2 = Atoms(["Xe"] * 4, pos0.copy())
    ints = Internals(atoms2)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.nint == 6  # non-redundant by construction

    atoms = Atoms(["Xe"] * 4, pos0.copy(), calculator=pot)
    opt = Sella(atoms, order=0, internal=True, logfile=None, eig=False,
                method="qn", iterative_stepper=1, newton_tol=1e-12,
                delta0=0.1, sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035,
                rho_dec=100.0)
    assert opt.pes.dim == 6

    cfg = InternalEnsembleConfig(
        natoms=4, nint=6, order=0, fmax=1e-3, delta0=0.1,
        sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035, rho_dec=100.0,
        method="qn", eig=False, rs_tol=1e-12, geo_substeps=0,
        newton_stop="rms", newton_tol=1e-12,
    )
    state = init_internal_state(pot, ints, jnp.asarray(pos0.ravel()[None]),
                                cfg)
    step = jax.jit(make_internal_step_fn(pot, ints, cfg))
    key = jax.random.PRNGKey(0)
    eng = ints._get_engine()
    cell = jnp.zeros((3, 3))

    worst = 0.0
    for i in range(60):
        if bool(state.converged[0]):
            break
        opt.step()
        state = step(state, jax.random.fold_in(key, i))
        q_seq = np.asarray(eng._calc_impl(
            jnp.asarray(opt.pes.atoms.positions), cell))
        q_bat = np.asarray(eng._calc_impl(
            jnp.asarray(np.asarray(state.x[0]).reshape(4, 3)), cell))
        dq = float(np.abs(q_seq - q_bat).max())
        worst = max(worst, dq)
        assert dq < 1e-8, f"internal tiers diverged at step {i}: {dq}"
        assert float(state.delta[0]) == pytest.approx(opt.delta, rel=1e-8)
    assert bool(state.converged[0]) and opt.converged()
    assert worst < 1e-9  # record of actual tightness


def test_internal_tier_redundant_noise_floor():
    """On a REDUNDANT topology (Morse Xe4 cluster, 11 internals over 6
    DOF) a predicted internal target is generally off the realizable
    manifold; both tiers' Gauss-Newton solves then stall at the same
    manifold gap (~1e-5 here) but at slightly different points, so
    exact per-step parity is unattainable BY THE ALGORITHM, not by this
    implementation: the sequential tier's Newton accept gate
    (rms <= 1e-6, reference ``peswrapper.py:830-833``) rejects the
    stalled solve and falls back to the adaptive LSODA geodesic, while
    the batched Newton-only config accepts the Gauss-Newton point, so
    from step 1 the tiers integrate different (equally valid) paths.
    This test documents the measured bounds: step 0 agrees to well
    under the manifold gap (1.9e-7 vs ~9e-6), the subsequent drift
    stays bounded over the window (measured <= 9e-3 at step 5), and
    trust radii track each other exactly."""
    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    pot = MorsePotential(**_MORSE_KW)

    atoms2 = Atoms(["Xe"] * 4, pos0.copy())
    ints = Internals(atoms2)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert ints.nint > 6  # redundant

    atoms = Atoms(["Xe"] * 4, pos0.copy(), calculator=pot)
    opt = Sella(atoms, order=0, internal=True, logfile=None, eig=False,
                method="qn", iterative_stepper=1, newton_tol=1e-12,
                delta0=0.1, sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035,
                rho_dec=100.0)

    cfg = InternalEnsembleConfig(
        natoms=4, nint=ints.nint, order=0, fmax=1e-3, delta0=0.1,
        sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035, rho_dec=100.0,
        method="qn", eig=False, rs_tol=1e-12, geo_substeps=0,
        newton_stop="rms", newton_tol=1e-12,
    )
    state = init_internal_state(pot, ints, jnp.asarray(pos0.ravel()[None]),
                                cfg)
    step = jax.jit(make_internal_step_fn(pot, ints, cfg))
    key = jax.random.PRNGKey(0)
    eng = ints._get_engine()
    cell = jnp.zeros((3, 3))

    for i in range(6):
        opt.step()
        state = step(state, jax.random.fold_in(key, i))
        q_seq = np.asarray(eng._calc_impl(
            jnp.asarray(opt.pes.atoms.positions), cell))
        q_bat = np.asarray(eng._calc_impl(
            jnp.asarray(np.asarray(state.x[0]).reshape(4, 3)), cell))
        dq = float(np.abs(q_seq - q_bat).max())
        # measured: [1.9e-7, 9.4e-4, 2.4e-3, 4.5e-3, 6.8e-3, 9.0e-3]
        bound = 1e-6 if i == 0 else 5e-2
        assert dq < bound, f"noise floor exceeded at step {i}: {dq}"
        assert float(state.delta[0]) == pytest.approx(opt.delta, rel=1e-8)


# ---------------------------------------------------------------------------
# Cell tier (VERDICT r2 item 2)
# ---------------------------------------------------------------------------

def test_cell_tier_trajectory_parity():
    """Sequential CellCartesianPES driver vs the batched cell ensemble
    on a strained periodic Xe crystal: identical-algorithm regime
    (quasi-Newton, no Davidson), so positions, cell matrices, Hessians,
    trust ratios and radii must agree per step to 1e-8 (measured
    ~1e-12)."""
    a = 6.69
    base = np.array([[0, 0, 0], [0.5, 0.5, 0],
                     [0.5, 0, 0.5], [0, 0.5, 0.5]]) * a
    rng = np.random.RandomState(17)
    eps = 0.05 * rng.normal(size=(3, 3))
    eps = 0.5 * (eps + eps.T)
    F = np.eye(3) + eps
    cell0 = (np.eye(3) * a) @ F.T
    pos0 = base @ F.T + 0.25 * rng.normal(size=base.shape)
    pot = MorsePotential(**_MORSE_KW, pbc=True)

    atoms = Atoms(["Xe"] * 4, pos0.copy(), cell=cell0.copy(), pbc=True,
                  calculator=pot)
    opt = Sella(atoms, order=0, internal=False, optimize_cell=True,
                logfile=None, eig=False, method="qn", delta0=0.1,
                sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035,
                rho_dec=100.0, rs="tr")

    cfg = CellEnsembleConfig(
        natoms=4, ncell=9, order=0, fmax=1e-3,
        # the sequential tr driver scales delta0 by the free-subspace
        # dimension (12 atomic + 9 cell - 3 translations = 18)
        delta0=float(opt.delta),
        sigma_inc=1.15, sigma_dec=0.9, rho_inc=1.035, rho_dec=100.0,
        method="qn", rs="tr", eig=False, rs_tol=1e-12,
    )
    state = init_cell_state(pot, jnp.asarray(pos0.ravel()[None]), cfg,
                            cell0)
    step = jax.jit(make_cell_step_fn(pot, cfg))
    key = jax.random.PRNGKey(0)
    mask = np.ones((3, 3), bool)

    worst = 0.0
    for i in range(120):  # converges at step 63 (measured)
        if bool(state.converged[0]):
            break
        opt.step()
        state = step(state, jax.random.fold_in(key, i))
        z = np.asarray(state.z[0])
        cellb = np.asarray(cells_of(state, cfg, mask))[0]
        dpos = float(np.abs(opt.pes.atoms.positions.ravel()
                            - z[:12]).max())
        dcell = float(np.abs(np.asarray(atoms.cell) - cellb).max())
        worst = max(worst, dpos, dcell)
        assert dpos < 1e-8, f"cell-tier positions diverged at {i}: {dpos}"
        assert dcell < 1e-8, f"cell-tier cells diverged at {i}: {dcell}"
        assert float(state.delta[0]) == pytest.approx(opt.delta, rel=1e-8)
    assert bool(state.converged[0])
    assert worst < 1e-9


# ---------------------------------------------------------------------------
# IRC tier (VERDICT r2 item 2)
# ---------------------------------------------------------------------------

def test_irc_tier_trajectory_parity():
    """Sequential IRC driver vs the batched IRC ensemble, integrating
    forward from the same LJ4 transition state with the same full
    Hessian: with the reference pivot rule (``pivot_free=False``: raw
    mass-weighted eigh + first-nonzero sign, ``irc.py:85-97``) the two
    tiers must produce the same path point after each outer step to
    1e-8 (measured ~3e-16 — bit-exact), with matching force-call
    accounting."""
    tet = np.array([[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
                    [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]) * 1.12
    rng = np.random.RandomState(7)
    pos0 = tet + 0.12 * rng.normal(size=(4, 3))
    pot = LennardJones()

    # converge a TS first (shared starting point for both tiers)
    atoms = Atoms(["Ar"] * 4, pos0.copy(), calculator=pot)
    cons = Constraints(atoms)
    cons.fix_translation()
    cons.fix_rotation()
    np.random.seed(2024)
    opt = Sella(atoms, order=1, gamma=1e-3, constraints=cons, logfile=None)
    assert opt.run(fmax=1e-4, steps=300)
    x_ts = atoms.positions.copy()

    atoms2 = Atoms(["Ar"] * 4, x_ts.copy(), calculator=pot)
    np.random.seed(2024)
    irc = IRC(atoms2, logfile=None, dx=0.15, eta=1e-4, gamma=0.01,
              ninner_iter=20)
    gen = irc.irun(5e-2, steps=3, direction="forward")
    seq_path = []
    for j, _ in enumerate(gen):
        seq_path.append(atoms2.positions.copy())
        if j >= 2:
            break
    H0 = irc.H0.copy()
    masses = np.full(4, 39.948)

    cfg = IRCEnsembleConfig(natoms=4, fmax=5e-2, dx=0.15, ninner_iter=20,
                            pivot_free=False)
    st = init_irc_state(pot, jnp.asarray(x_ts.ravel()[None]),
                        jnp.asarray(H0[None]), cfg, masses, "forward")
    step = jax.jit(make_irc_step_fn(pot, cfg, masses))
    # seq_path[0] is the pre-step TS snapshot; [1], [2] follow outer
    # steps 1, 2
    for k in (1, 2):
        st = step(st)
        diff = float(np.abs(np.asarray(st.x[0])
                            - seq_path[k].ravel()).max())
        assert diff < 1e-8, f"IRC tiers diverged at outer step {k}: {diff}"
