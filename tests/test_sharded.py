"""Sharded pair potential: the large-single-system multi-chip path.

The mesh here is the 8 virtual CPU devices from conftest; the same code
shards over real ICI on a TPU pod (SURVEY.md §2, parallelism item 3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sella_tpu.parallel.largescale import leftmost_mode, run_mmf
from sella_tpu.potentials import LennardJones, ShardedPairPotential


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()), ("atoms",))


def _cluster(n, seed=0, scale=2.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.normal(size=(3 * n,)) * scale)


def test_sharded_matches_unsharded(mesh):
    """energy/grad/HVP identical to the single-device potential, with a
    block count (20 atoms) that does not divide the 8-device mesh."""
    inner = LennardJones()
    pot = ShardedPairPotential(inner, mesh)
    x = _cluster(20)
    cell = jnp.zeros((3, 3))
    assert jnp.allclose(pot.energy(x, cell), inner.energy(x, cell))
    assert jnp.allclose(pot.grad(x, cell), inner.grad(x, cell),
                        atol=1e-10)
    v = _cluster(20, seed=1, scale=1.0)
    assert jnp.allclose(pot.hvp(x, v, cell), inner.hvp(x, v, cell),
                        atol=1e-8)


def test_sharded_pbc_matches(mesh):
    inner = LennardJones(pbc=True, rc=2.5)
    pot = ShardedPairPotential(inner, mesh)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(0, 6, size=(60,)))
    cell = jnp.eye(3) * 6.0
    assert jnp.allclose(pot.energy(x, cell), inner.energy(x, cell))
    assert jnp.allclose(pot.grad(x, cell), inner.grad(x, cell),
                        atol=1e-10)


def test_sharded_leftmost_mode(mesh):
    """Matrix-free Lanczos through the sharded HVP reproduces the
    unsharded leftmost eigenvalue."""
    inner = LennardJones()
    pot = ShardedPairPotential(inner, mesh)
    x = _cluster(20)
    cell = jnp.zeros((3, 3))
    v0 = _cluster(20, seed=3, scale=1.0)
    v0 = v0 / jnp.linalg.norm(v0)
    lam_s = leftmost_mode(lambda u: pot.hvp(x, u, cell), v0)[0]
    lam_u = leftmost_mode(lambda u: inner.hvp(x, u, cell), v0)[0]
    assert abs(float(lam_s - lam_u)) < 1e-6


def test_sharded_mmf_saddle(mesh):
    """run_mmf drives a saddle search entirely through the sharded
    potential: forces, mode tracking, and convergence all multi-device."""
    inner = LennardJones()
    pot = ShardedPairPotential(inner, mesh)
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(5)
    x0 = jnp.asarray((tet + 0.08 * rng.normal(size=(4, 3))).ravel())
    fin = run_mmf(pot, x0, order=1, fmax=1e-3, max_steps=300)
    assert bool(fin.converged)
    # verify against the unsharded Hessian: exactly one negative mode in
    # the rigid-free subspace
    from sella_tpu.parallel.ensemble import free_basis

    cell = jnp.zeros((3, 3))
    H = np.asarray(inner.hessian(fin.x, cell))
    U = np.asarray(free_basis(fin.x, 6))
    evals = np.linalg.eigvalsh(U.T @ H @ U)
    assert np.sum(evals < -1e-6) == 1, evals


def test_sharded_requires_pair_energy(mesh):
    class NotAPair:
        pass

    with pytest.raises(TypeError):
        ShardedPairPotential(NotAPair(), mesh)


def test_chunked_pair_potential_matches_dense():
    """ChunkedPairPotential == dense potential to roundoff: energy,
    gradient, HVP (the single-chip large-N path; memory is bounded at
    chunk * n instead of n^2)."""
    from sella_tpu.potentials import ChunkedPairPotential, LennardJones

    rng = np.random.RandomState(0)
    n = 40
    x = jnp.asarray(rng.normal(size=(n * 3,)) * 3 + 10)
    cell = jnp.eye(3) * 20.0
    dense = LennardJones(pbc=True)
    chunked = ChunkedPairPotential(LennardJones(pbc=True), chunk=7)

    ed, gd = dense.energy_and_grad(x, cell)
    ec, gc = chunked.energy_and_grad(x, cell)
    np.testing.assert_allclose(float(ec), float(ed), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                               atol=1e-10)
    v = jnp.asarray(rng.normal(size=x.shape))
    np.testing.assert_allclose(
        np.asarray(chunked.hvp(x, v, cell)),
        np.asarray(dense.hvp(x, v, cell)), atol=1e-10,
    )


def test_chunked_mmf_minimization():
    """The matrix-free MMF driver runs on a ChunkedPairPotential
    (bounded-memory 10k-atom path, here scaled down for CI)."""
    from sella_tpu.parallel.largescale import run_mmf
    from sella_tpu.potentials import ChunkedPairPotential, LennardJones
    from sella_tpu.potentials.emt import fcc111_slab

    slab = fcc111_slab("Cu", 3.59, size=(4, 4, 3))
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        (slab.positions + 0.05 * rng.normal(
            size=slab.positions.shape
        )).ravel()
    )
    pot = ChunkedPairPotential(
        LennardJones(sigma=2.3, epsilon=0.4, pbc=True), chunk=13
    )
    st = run_mmf(pot, x0, cell=jnp.asarray(slab.cell), order=0,
                 fmax=5e-3, max_steps=400)
    assert bool(st.converged), int(st.nsteps)


@pytest.mark.slow
def test_sharded_binned_matches_unsharded():
    """ShardedBinnedPotential == the single-device binned potential
    (energy/grad/HVP) over the 8-device mesh, for both the pair and
    the many-body EMT inner."""
    from jax.sharding import Mesh

    from sella_tpu.potentials import (
        BinnedEMT,
        BinnedPairPotential,
        LennardJones,
        ShardedBinnedPotential,
    )
    from sella_tpu.potentials.emt import fcc_bulk

    mesh = Mesh(np.array(jax.devices()[:8]), ("atoms",))
    rng = np.random.RandomState(5)

    atoms = fcc_bulk("Cu", 3.59, reps=(6, 6, 6))      # 864 atoms
    x = jnp.asarray(
        (atoms.positions + 0.05 * rng.normal(
            size=atoms.positions.shape)).ravel()
    )
    cell = jnp.asarray(atoms.cell)
    inner_lj = LennardJones(pbc=True, sigma=2.3, epsilon=0.4)
    for base in (
        BinnedPairPotential(inner_lj, rc=5.5, x0=x, cell=cell),
        BinnedEMT(atoms.numbers, x, cell),
    ):
        sharded = ShardedBinnedPotential(base, mesh)
        np.testing.assert_allclose(
            float(jax.jit(sharded.energy)(x, cell)),
            float(base.energy(x, cell)), rtol=1e-12,
        )
        g0 = jax.grad(base.energy)(x, cell)
        g1 = jax.jit(jax.grad(sharded.energy))(x, cell)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   atol=1e-11)
        v = jnp.asarray(rng.normal(size=x.shape))
        h0 = jax.jvp(jax.grad(lambda xx: base.energy(xx, cell)),
                     (x,), (v,))[1]
        h1 = jax.jvp(jax.grad(lambda xx: sharded.energy(xx, cell)),
                     (x,), (v,))[1]
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                                   atol=1e-10)
