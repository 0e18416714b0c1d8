"""HostBatchedCalculator: host potentials driving the batched tiers.

The host boundary crosses once per batched evaluation (SURVEY §7
two-tier calculator design); HVPs are reference-style FD gradients
(``NumericalHessian``, ``/root/reference/sella/linalg.py:50-87``).
"""
import numpy as np
import jax
import jax.numpy as jnp

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.potentials import MorsePotential
from sella_tpu.potentials.host import (
    HostBatchedCalculator,
    from_ase_calculator,
)
from sella_tpu.utils.units import kB

R0 = 4.73


def _morse():
    return MorsePotential(epsilon=226.9 * kB, r0=R0, rho0=R0 * 1.099)


def _host_wrap(record=None, **kw):
    """Wrap the jax Morse as an opaque host function (numpy in/out)."""
    ref = _morse()
    egrad = jax.jit(jax.vmap(
        lambda x: jax.value_and_grad(ref.energy)(x, jnp.zeros((3, 3)))
    ))

    def func(X, cell):
        if record is not None:
            record.append(X.shape)
        E, G = egrad(jnp.asarray(X))
        return np.asarray(E), np.asarray(G)

    return HostBatchedCalculator(func, natoms=4, **kw)


def _starts(batch, seed=0):
    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    rng2 = np.random.RandomState(seed)
    return jnp.asarray(
        (pos0[None] + 0.25 * rng2.normal(size=(batch, 4, 3)))
        .reshape(batch, 12)
    )


def test_grad_and_value():
    pot = _host_wrap()
    ref = _morse()
    x = _starts(3)[0]
    cell = jnp.zeros((3, 3))
    e, g = jax.value_and_grad(pot.energy)(x, cell)
    e_ref, g_ref = jax.value_and_grad(ref.energy)(x, cell)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-12)


def test_fd_hvp_matches_exact():
    pot = _host_wrap(eta=1e-5)
    ref = _morse()
    x = _starts(3)[1]
    cell = jnp.zeros((3, 3))
    v = jnp.asarray(np.random.RandomState(1).normal(size=12))
    hv_fd = pot.hvp(x, v, cell)
    hv_ex = ref.hvp(x, v, cell)
    np.testing.assert_allclose(np.asarray(hv_fd), np.asarray(hv_ex),
                               rtol=0, atol=2e-4 * float(
                                   jnp.linalg.norm(hv_ex)))


def test_ensemble_runs_with_host_potential():
    """A Cartesian saddle ensemble converges through the host boundary;
    every host call carries the FULL batch (one round trip per batched
    evaluation, not one per lane)."""
    shapes = []
    pot = _host_wrap(record=shapes, eta=1e-6)
    Bsz = 6
    x0 = _starts(Bsz)
    cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                         restart_after=60)
    st = run_ensemble(pot, x0, cfg, max_steps=150)
    conv = np.asarray(st.converged)
    assert conv.sum() >= Bsz - 1, conv
    # saddle-point energies of Morse Xe4 match the native-tier results
    assert np.all(np.asarray(st.f)[conv] < 0.0)
    # batched host crossings: every call saw the whole batch
    assert shapes, "host function was never called"
    assert all(s[0] == Bsz for s in shapes), set(shapes)
    # host-call economy: force calls + FD matvec gradients, not B x that
    ncalls = pot.ncalls
    steps = int(np.asarray(st.nsteps).max())
    matvecs = int(np.asarray(st.nmatvec).max())
    assert ncalls <= 3 * (steps + matvecs) + 20, (
        ncalls, steps, matvecs
    )


def test_ensemble_matches_native_morse():
    """Same starts through the host tier and the jax-native tier: both
    converge to first-order saddles with matching energies."""
    Bsz = 4
    x0 = _starts(Bsz, seed=3)
    cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                         restart_after=60)
    st_host = run_ensemble(_host_wrap(eta=1e-6), jnp.array(x0), cfg,
                           max_steps=150)
    st_nat = run_ensemble(_morse(), jnp.array(x0), cfg, max_steps=150)
    ch, cn = np.asarray(st_host.converged), np.asarray(st_nat.converged)
    assert ch.sum() >= Bsz - 1 and cn.sum() >= Bsz - 1
    both = ch & cn
    # FD-vs-exact HVPs make trajectories diverge, but the basins and
    # converged saddle energies agree
    np.testing.assert_allclose(
        np.sort(np.asarray(st_host.f)[both]),
        np.sort(np.asarray(st_nat.f)[both]), atol=1e-5,
    )


def test_from_ase_calculator_duck_typed():
    """ASE itself is absent from this image; a duck-typed Atoms-like
    object exercises the adapter loop."""
    ref = _morse()

    class FakeAtoms:
        def __init__(self):
            self.positions = np.zeros((4, 3))
            self.cell = np.zeros((3, 3))

        def __len__(self):
            return 4

        def get_potential_energy(self):
            return float(ref.energy(
                jnp.asarray(self.positions.reshape(-1)),
                jnp.zeros((3, 3)),
            ))

        def get_forces(self):
            g = jax.grad(ref.energy)(
                jnp.asarray(self.positions.reshape(-1)),
                jnp.zeros((3, 3)),
            )
            return -np.asarray(g).reshape(4, 3)

    pot = from_ase_calculator(FakeAtoms())
    x = _starts(2)[0]
    cell = jnp.zeros((3, 3))
    e, g = jax.value_and_grad(pot.energy)(x, cell)
    e_ref, g_ref = jax.value_and_grad(ref.energy)(x, cell)
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-12)


def test_internal_tier_with_host_potential():
    """Redundant-internal batched tier through the host boundary: the
    Newton back-transform, Gram pinv, and FD-HVP Davidson all compose."""
    from sella_tpu.atoms import Atoms
    from sella_tpu.coords.internals import Internals
    from sella_tpu.parallel.ensemble_internal import (
        InternalEnsembleConfig,
        run_internal_ensemble,
    )

    rng = np.random.RandomState(4)
    pos0 = rng.normal(size=(4, 3), scale=3.0)
    ints = Internals(Atoms(["Xe"] * 4, pos0))
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    Bsz = 4
    x0 = _starts(Bsz, seed=5)
    cfg = InternalEnsembleConfig(
        natoms=4, nint=ints.nint, order=1, fmax=1e-3, gamma=1e-3,
        restart_after=60,
    )
    pot = _host_wrap(eta=1e-6)
    st = run_internal_ensemble(pot, ints, x0, cfg, max_steps=150)
    conv = np.asarray(st.converged)
    assert conv.sum() >= Bsz - 1, (conv, np.asarray(st.nsteps))
