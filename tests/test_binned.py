"""BinnedPairPotential (O(N) cell list) vs the dense pair panel."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sella_tpu.potentials import LennardJones, MorsePotential
from sella_tpu.potentials.binned import BinnedPairPotential


def _rand_cluster(n, scale, seed=0):
    rng = np.random.RandomState(seed)
    # Poisson-disk-ish: sample then push apart too-close pairs once
    pos = rng.uniform(0, scale, size=(n, 3))
    return jnp.asarray(pos.reshape(-1))


def test_free_cluster_matches_dense_morse():
    """rc covering every pair + shift=False == the dense all-pairs sum."""
    x = _rand_cluster(40, 6.0, seed=1)
    dense = MorsePotential(epsilon=1.0, r0=1.2, rho0=6.0)
    binned = BinnedPairPotential(dense, rc=20.0, x0=x, shift=False)
    cell = jnp.zeros((3, 3))
    e_d = dense.energy(x, cell)
    e_b = binned.energy(x, cell)
    np.testing.assert_allclose(float(e_b), float(e_d), rtol=1e-13)
    g_d = jax.grad(dense.energy)(x, cell)
    g_b = jax.grad(binned.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-12)


def test_lj_cutoff_matches_dense():
    """LJ applies its own cutoff+shift in pair_energy, so binned with
    shift=False and rc=inner.rc reproduces the dense energy exactly."""
    x = _rand_cluster(120, 8.0, seed=2)
    dense = LennardJones(epsilon=1.0, sigma=1.0, rc=2.5)
    binned = BinnedPairPotential(dense, rc=2.5, x0=x, shift=False)
    cell = jnp.zeros((3, 3))
    np.testing.assert_allclose(float(binned.energy(x, cell)),
                               float(dense.energy(x, cell)), rtol=1e-12)
    g_d = jax.grad(dense.energy)(x, cell)
    g_b = jax.grad(binned.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-11)


def test_pbc_matches_dense():
    dense = LennardJones(epsilon=1.0, sigma=1.0, rc=2.5, pbc=True)
    x = _rand_cluster(100, 10.0, seed=3)
    cell = jnp.asarray(10.0 * np.eye(3))
    binned = BinnedPairPotential(dense, rc=2.5, x0=x, cell=cell,
                                 shift=False)
    np.testing.assert_allclose(float(binned.energy(x, cell)),
                               float(dense.energy(x, cell)), rtol=1e-12)
    g_d = jax.grad(dense.energy)(x, cell)
    g_b = jax.grad(binned.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-11)


def test_pbc_triclinic_matches_dense():
    cell = jnp.asarray(np.array(
        [[12.0, 0, 0], [3.0, 11.0, 0], [1.0, 2.0, 10.5]]
    ))
    rng = np.random.RandomState(4)
    frac = rng.uniform(size=(80, 3))
    x = jnp.asarray((frac @ np.asarray(cell)).reshape(-1))
    dense = LennardJones(epsilon=1.0, sigma=1.0, rc=2.5, pbc=True)
    binned = BinnedPairPotential(dense, rc=2.5, x0=x, cell=cell,
                                 shift=False)
    np.testing.assert_allclose(float(binned.energy(x, cell)),
                               float(dense.energy(x, cell)), rtol=1e-12)


def test_hvp_matches_dense():
    """Exact HVPs (the Lanczos matvec of the large-system driver) agree."""
    x = _rand_cluster(60, 7.0, seed=5)
    dense = LennardJones(rc=2.5)
    binned = BinnedPairPotential(dense, rc=2.5, x0=x, shift=False)
    cell = jnp.zeros((3, 3))
    v = jnp.asarray(np.random.RandomState(6).normal(size=x.shape))

    def hvp(pot):
        gf = lambda y: jax.grad(pot.energy)(y, cell)
        return jax.jvp(gf, (x,), (v,))[1]

    np.testing.assert_allclose(np.asarray(hvp(binned)),
                               np.asarray(hvp(dense)), atol=1e-10)


def test_small_periodic_cell_rejected():
    dense = LennardJones(rc=2.5, pbc=True)
    x = _rand_cluster(20, 6.0)
    with pytest.raises(ValueError, match="3 rc"):
        BinnedPairPotential(dense, rc=2.5, x0=x,
                            cell=jnp.asarray(6.0 * np.eye(3)))


def test_capacity_diagnostics():
    x = _rand_cluster(100, 5.0, seed=7)
    dense = LennardJones(rc=1.5)
    binned = BinnedPairPotential(dense, rc=1.5, x0=x, shift=False)
    occ = binned.max_occupancy(x)
    assert binned.capacity >= occ
    # an undersized capacity is detectable through the same call
    tight = BinnedPairPotential(dense, rc=1.5, x0=x, capacity=1,
                                shift=False)
    assert tight.max_occupancy(x) > tight.capacity


def test_mmf_binned_matches_chunked():
    """The matrix-free driver converges to the same minimum through the
    O(N) binned potential as through the O(N^2) chunked panel."""
    from sella_tpu.parallel.largescale import run_mmf
    from sella_tpu.potentials.sharded import ChunkedPairPotential

    # small fcc block of LJ atoms, slightly rattled
    a = 1.5599  # fcc lattice constant for LJ sigma=1
    base = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                o = np.array([i, j, k], float) * a
                for s in ([0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5],
                          [0, 0.5, 0.5]):
                    base.append(o + np.asarray(s) * a)
    pos = np.asarray(base)
    rng = np.random.RandomState(8)
    x0 = jnp.asarray((pos + 0.05 * rng.normal(size=pos.shape))
                     .reshape(-1))
    lj = LennardJones(rc=2.5)
    binned = BinnedPairPotential(lj, rc=2.5, x0=x0, shift=False)
    chunked = ChunkedPairPotential(lj, chunk=16)
    # fresh buffers per run: the driver donates its state
    st_b = run_mmf(binned, jnp.array(x0), order=0, fmax=1e-4,
                   max_steps=400)
    st_c = run_mmf(chunked, jnp.array(x0), order=0, fmax=1e-4,
                   max_steps=400)
    assert bool(st_b.converged) and bool(st_c.converged)
    np.testing.assert_allclose(float(st_b.f), float(st_c.f), atol=1e-8)


def test_binned_pair_chunked_matches_full():
    """chunk=C row-chunked evaluation equals the full-panel path for
    energy/gradient/HVP (memory-bounded large-N mode)."""
    import jax
    from sella_tpu.potentials import BinnedPairPotential, LennardJones

    rng = np.random.RandomState(2)
    pos = rng.uniform(0, 12.0, size=(200, 3))
    x = jnp.asarray(pos.ravel())
    cell = jnp.eye(3) * 12.0
    inner = LennardJones(pbc=True, sigma=1.0, epsilon=1.0)
    full = BinnedPairPotential(inner, rc=2.5, x0=x, cell=cell)
    chunked = BinnedPairPotential(inner, rc=2.5, x0=x, cell=cell,
                                  chunk=64)
    np.testing.assert_allclose(
        float(chunked.energy(x, cell)), float(full.energy(x, cell)),
        rtol=1e-12,
    )
    g1 = jax.grad(full.energy)(x, cell)
    g2 = jax.grad(chunked.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=1e-11)
    v = jnp.asarray(rng.normal(size=x.shape))
    h1 = jax.jvp(jax.grad(lambda xx: full.energy(xx, cell)),
                 (x,), (v,))[1]
    h2 = jax.jvp(jax.grad(lambda xx: chunked.energy(xx, cell)),
                 (x,), (v,))[1]
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               atol=1e-10)


def test_overflow_count_device_side():
    """The jittable overflow counter flags capacity overruns (the
    silent-pair-drop hazard) without a host round trip."""
    import jax
    from sella_tpu.potentials import BinnedPairPotential, LennardJones

    rng = np.random.RandomState(4)
    pos = rng.uniform(0, 12.0, size=(100, 3))
    x = jnp.asarray(pos.ravel())
    cell = jnp.eye(3) * 12.0
    inner = LennardJones(pbc=True, sigma=1.0, epsilon=1.0)
    ok = BinnedPairPotential(inner, rc=2.5, x0=x, cell=cell)
    tight = BinnedPairPotential(inner, rc=2.5, x0=x, cell=cell,
                                capacity=1)
    count_ok = int(jax.jit(ok._bins.overflow_count)(
        x.reshape(-1, 3), cell))
    count_tight = int(jax.jit(tight._bins.overflow_count)(
        x.reshape(-1, 3), cell))
    assert count_ok == 0
    assert count_tight > 0
    # agrees with the host-side diagnostic
    assert (tight.max_occupancy(x) > tight.capacity) == (count_tight > 0)
