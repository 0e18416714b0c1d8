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


def _lj_host_with_stress(eta=1e-6):
    """Host shim over the jax LJ exposing forces + virial stress (the
    DFT interface shape), for the batched cell tiers."""
    from sella_tpu.pes.cell import full_3x3_to_voigt_6_stress
    from sella_tpu.potentials import LennardJones

    lj = LennardJones(epsilon=0.0104, sigma=3.4, pbc=True)

    def func(X, cell):
        c = jnp.asarray(cell)
        E, G = jax.vmap(
            lambda x: jax.value_and_grad(lj.energy)(x, c)
        )(jnp.asarray(X))
        return np.asarray(E), np.asarray(G)

    def stress_func(X, cell):
        c0 = jnp.asarray(cell)
        vol = float(abs(np.linalg.det(np.asarray(cell))))

        def one(x):
            x3 = x.reshape(-1, 3)

            def e_of(eps):
                F = jnp.eye(3) + eps
                return lj.energy((x3 @ F.T).ravel(), c0 @ F.T)

            d = jax.grad(e_of)(jnp.zeros((3, 3)))
            return 0.5 * (d + d.T) / vol

        S = np.asarray(jax.vmap(one)(jnp.asarray(X)))
        return np.stack([full_3x3_to_voigt_6_stress(s) for s in S])

    host = HostBatchedCalculator(func, natoms=4, eta=eta, pbc=True,
                                 stress_func=stress_func)
    return host, lj


def test_host_stress_cell_tier_gradient():
    """Batched cell tier through the host boundary: the virial-stress
    cell gradient must match the native autodiff extended gradient, and
    joint (x, cell) FD HVPs must approximate the exact ones."""
    from sella_tpu.parallel.ensemble_cell import (
        CellEnsembleConfig,
        make_ext_energy,
    )

    host, lj = _lj_host_with_stress()
    a = 5.2
    cell0 = np.eye(3) * a
    cfg = CellEnsembleConfig(natoms=4, ncell=9)
    mask = np.ones((3, 3), dtype=bool)
    ext_h, _ = make_ext_energy(host, cfg, cell0, mask)
    ext_n, _ = make_ext_energy(lj, cfg, cell0, mask)

    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    ) * a
    rng = np.random.RandomState(0)
    Bsz = 3
    z = jnp.asarray(np.concatenate([
        (base[None] + 0.05 * rng.normal(size=(Bsz, 4, 3))).reshape(
            Bsz, 12
        ),
        0.1 * rng.normal(size=(Bsz, 9)),
    ], axis=1))

    fh, gh = jax.vmap(jax.value_and_grad(ext_h))(z)
    fn, gn = jax.vmap(jax.value_and_grad(ext_n))(z)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(fn),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gn),
                               rtol=1e-7, atol=1e-12)

    u = jnp.asarray(rng.normal(size=(Bsz, 21)))
    hvp_h = jax.vmap(
        lambda z1, u1: jax.jvp(jax.grad(ext_h), (z1,), (u1,))[1]
    )(z, u)
    hvp_n = jax.vmap(
        lambda z1, u1: jax.jvp(jax.grad(ext_n), (z1,), (u1,))[1]
    )(z, u)
    scale = float(jnp.linalg.norm(hvp_n))
    np.testing.assert_allclose(np.asarray(hvp_h), np.asarray(hvp_n),
                               rtol=0, atol=3e-4 * scale)


def test_host_without_stress_cell_paths_raise():
    """A stress-less host potential must be refused by every cell-DOF
    path (silent zero cell gradients are the failure mode guarded
    against)."""
    import pytest

    from sella_tpu.parallel.ensemble_cell import (
        CellEnsembleConfig,
        make_ext_energy,
    )

    pot = _host_wrap()
    cfg = CellEnsembleConfig(natoms=4, ncell=9)
    with pytest.raises(ValueError, match="stress"):
        make_ext_energy(pot, cfg, np.eye(3) * 5.0,
                        np.ones((3, 3), dtype=bool))

    from sella_tpu.atoms import Atoms
    from sella_tpu.pes.cell import CellCartesianPES

    atoms = Atoms(["Xe"] * 4, np.random.RandomState(0).normal(
        size=(4, 3)) * 2.0 + 4.0, cell=np.eye(3) * 9.0, pbc=True)
    atoms.calc = _host_wrap()
    with pytest.raises(ValueError, match="stress"):
        CellCartesianPES(atoms)


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
