"""EMT potential tests: FD-vs-AD forces, lattice constant, and the
headline Cu(111)+adatom saddle search (the reference README example,
/root/reference/README.md:10-39, scaled down for CI)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sella_tpu import Atoms, Constraints, Sella
from sella_tpu.potentials.emt import EMT, fcc111_slab, fcc_bulk


def test_forces_fd():
    bulk = fcc_bulk("Cu", 3.59, reps=(2, 2, 2))
    rng = np.random.RandomState(0)
    bulk.positions = bulk.positions + 0.05 * rng.normal(
        size=bulk.positions.shape
    )
    pot = bulk.calc
    x = jnp.asarray(bulk.positions.ravel())
    cell = jnp.asarray(bulk.cell)
    g = np.asarray(pot.grad(x, cell))
    h = 1e-5
    for _ in range(3):
        d = rng.normal(size=len(g))
        d /= np.linalg.norm(d)
        ep = float(pot.energy(x + h * jnp.asarray(d), cell))
        em = float(pot.energy(x - h * jnp.asarray(d), cell))
        np.testing.assert_allclose(
            (ep - em) / (2 * h), float(g @ d), rtol=1e-5, atol=1e-8
        )


def test_lattice_constant():
    es = []
    grid = np.linspace(3.5, 3.7, 9)
    for a in grid:
        atoms = fcc_bulk("Cu", a)
        es.append(atoms.get_potential_energy() / len(atoms))
    es = np.array(es)
    i = int(np.argmin(es))
    c = np.polyfit(grid[i - 2:i + 3], es[i - 2:i + 3], 2)
    a0 = -c[1] / (2 * c[0])
    # ASE EMT: 3.589
    assert abs(a0 - 3.59) < 0.02, a0
    # near-zero cohesive reference at equilibrium
    assert abs(es[i]) < 0.01


def test_slab_forces_small():
    slab = fcc111_slab("Cu", 3.59, size=(4, 4, 3))
    f = slab.get_forces()
    assert np.all(np.isfinite(f))
    # unrelaxed surface forces are small (no bulk strain)
    assert np.abs(f).max() < 0.1
    # nearest-neighbor distance is exact in the builder
    pos, cell = slab.positions, slab.cell
    n = len(pos)
    dr = pos[None] - pos[:, None]
    frac = dr @ np.linalg.inv(cell)
    frac -= np.round(frac * slab.pbc)
    d = np.linalg.norm(frac @ cell, axis=-1)
    d[np.arange(n), np.arange(n)] = np.inf
    np.testing.assert_allclose(d.min(), 3.59 / np.sqrt(2), rtol=1e-10)


def test_fcc111_primitive_matches_orthogonal():
    """The primitive-cell (5, 5, nz)-capable builder and the
    orthogonal builder describe the same crystal: exact nn distance,
    bulk coordination 12, and identical EMT energy/atom at equal nz
    (measured 5e-14)."""
    import jax.numpy as jnp

    from sella_tpu.potentials.emt import fcc111_primitive

    a = 3.59
    at = fcc111_primitive("Cu", a, size=(3, 3, 4))
    pos, cell = at.positions, np.asarray(at.cell)
    n = len(pos)
    assert n == 36
    offs = (np.array(np.meshgrid(*([[-1, 0, 1]] * 3)))
            .reshape(3, -1).T @ cell)
    dr = pos[None] - pos[:, None]
    r = np.linalg.norm(dr[:, :, None, :] + offs[None, None], axis=-1)
    r[np.arange(n), np.arange(n), 13] = np.inf
    d = a / np.sqrt(2.0)
    np.testing.assert_allclose(r.min(), d, rtol=1e-12)
    mid = np.argmin(np.abs(pos[:, 2] - pos[:, 2].mean()))
    assert int((r[mid] < d * 1.05).sum()) == 12

    e1 = float(at.calc.energy(jnp.asarray(pos.ravel()),
                              jnp.asarray(cell))) / n
    slab = fcc111_slab("Cu", a, size=(3, 4, 4))
    e2 = float(slab.calc.energy(
        jnp.asarray(slab.positions.ravel()),
        jnp.asarray(np.asarray(slab.cell)),
    )) / len(slab.positions)
    np.testing.assert_allclose(e1, e2, atol=1e-10)


@pytest.mark.slow
def test_cu_adatom_saddle():
    """Cu adatom hopping on Cu(111): first-order saddle via Sella with
    the bottom layers fixed — the reference's headline use case."""
    a = 3.59
    slab = fcc111_slab("Cu", a, size=(3, 4, 3))
    nslab = len(slab)
    d = a / np.sqrt(2)
    # adatom in an fcc hollow site of the top layer, nudged toward the
    # neighboring hcp hollow (through the bridge saddle)
    top_z = slab.positions[:, 2].max()
    base = slab.positions[slab.positions[:, 2] > top_z - 0.1][0]
    ad = base + np.array([d / 2 + 0.35, d / (2 * np.sqrt(3)) + 0.1,
                          a / np.sqrt(3)])
    atoms = Atoms(
        ["Cu"] * (nslab + 1),
        np.vstack([slab.positions, ad]),
        cell=slab.cell,
        pbc=slab.pbc,
    )
    atoms.calc = EMT(atoms.numbers, pbc=True)

    cons = Constraints(atoms)
    bottom = np.where(atoms.positions[:, 2] < top_z - 1.0)[0]
    for i in bottom:
        cons.fix_translation(int(i))

    opt = Sella(atoms, order=1, gamma=0.3, constraints=cons, logfile=None,
                delta0=5e-3)
    assert opt.run(fmax=0.02, steps=100), opt.nsteps
    # saddle inertia in the free subspace of the quasi-Newton Hessian
    # refreshed by an exact-tolerance diag
    Ufree = opt.pes.get_Ufree()
    np.testing.assert_allclose(opt.pes.get_g() @ Ufree, 0, atol=0.1)


def _mic_emt_reference(pot, x, cell):
    """O(n^2) minimum-image EMT — test-only reference for the binned
    path (the dense 27-image panel is too memory-heavy at sizes where
    binning is valid). Exact when every cell height >= 2 (rc + 1.5)."""
    import jax
    from sella_tpu.potentials.emt import BETA

    E0, s0, V0, eta2, kappa, lam, n0, gamma1, gamma2 = pot._base._arrs
    n = pot.n
    pos = x.reshape(n, 3)
    dr = pos[None, :, :] - pos[:, None, :]
    inv = jnp.linalg.inv(cell)
    fr = dr @ inv
    dr = (fr - jnp.round(fr)) @ cell
    r2 = jnp.sum(dr * dr, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    valid = ~eye & (r2 < pot.rc_list ** 2)
    r = jnp.sqrt(jnp.where(valid, r2, 1.0))
    theta = jax.nn.sigmoid(-pot.acut * (r - pot.rc)) * valid
    chi = n0[None, :] / n0[:, None]
    w1 = chi * jnp.exp(-eta2[None, :] * (r - BETA * s0[None, :])) * theta
    sigma1 = jnp.maximum(jnp.sum(w1, axis=1) / gamma1, 1e-12)
    w2 = chi * jnp.exp(-kappa[None, :] * (r / BETA - s0[None, :])) * theta
    e_pair = -0.5 * jnp.sum(V0 * jnp.sum(w2, axis=1) / gamma2)
    ds = -jnp.log(sigma1 / 12.0) / (BETA * eta2)
    xl = lam * ds
    e_coh = jnp.sum(E0 * ((1.0 + xl) * jnp.exp(-xl) - 1.0))
    e_conv = jnp.sum(6.0 * V0 * jnp.exp(-kappa * ds))
    return e_coh + e_conv + e_pair


@pytest.mark.slow
def test_binned_emt_matches_mic_reference_pbc():
    """BinnedEMT == the O(n^2) MIC EMT (energy, forces, HVP) on a bulk
    Cu supercell large enough for the binned validity regime."""
    import jax
    from sella_tpu.potentials import BinnedEMT
    from sella_tpu.potentials.emt import fcc_bulk

    atoms = fcc_bulk("Cu", 3.59, reps=(6, 6, 6))       # 864 atoms
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        (atoms.positions + 0.05 * rng.normal(
            size=atoms.positions.shape)).ravel()
    )
    cell = jnp.asarray(atoms.cell)
    pot = BinnedEMT(atoms.numbers, x, cell)

    e_b = float(pot.energy(x, cell))
    e_ref = float(_mic_emt_reference(pot, x, cell))
    np.testing.assert_allclose(e_b, e_ref, rtol=1e-12)

    g_b = jax.grad(pot.energy)(x, cell)
    g_ref = jax.grad(lambda xx: _mic_emt_reference(pot, xx, cell))(x)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_ref),
                               atol=1e-10)

    v = jnp.asarray(rng.normal(size=x.shape))
    hvp_b = jax.jvp(
        jax.grad(lambda xx: pot.energy(xx, cell)), (x,), (v,)
    )[1][:30]
    hvp_r = jax.jvp(
        jax.grad(lambda xx: _mic_emt_reference(pot, xx, cell)),
        (x,), (v,))[1][:30]
    np.testing.assert_allclose(np.asarray(hvp_b), np.asarray(hvp_r),
                               atol=1e-9)


def test_binned_emt_matches_dense_cluster():
    """Free-boundary BinnedEMT == the dense EMT on a Cu cluster
    (same theta cutoff semantics, no images involved)."""
    import jax
    from sella_tpu.potentials import BinnedEMT
    from sella_tpu.potentials.emt import fcc_bulk

    atoms = fcc_bulk("Cu", 3.59, reps=(3, 3, 3))
    rng = np.random.RandomState(1)
    pos = atoms.positions + 0.05 * rng.normal(size=atoms.positions.shape)
    x = jnp.asarray(pos.ravel())
    dense = EMT(atoms.numbers, pbc=False)
    binned = BinnedEMT(atoms.numbers, x, cell=None)
    cell = jnp.zeros((3, 3))
    np.testing.assert_allclose(
        float(binned.energy(x, cell)), float(dense.energy(x, cell)),
        rtol=1e-12,
    )
    g_b = jax.grad(binned.energy)(x, cell)
    g_d = jax.grad(dense.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               atol=1e-10)


def test_binned_emt_chunked_matches_full():
    """chunk=C (lax.map + remat rows) must equal the full-panel path
    for energy, gradient, and HVP — the memory-bounded large-N mode."""
    import jax
    from sella_tpu.potentials import BinnedEMT
    from sella_tpu.potentials.emt import fcc_bulk

    atoms = fcc_bulk("Cu", 3.59, reps=(6, 6, 6))
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        (atoms.positions + 0.05 * rng.normal(
            size=atoms.positions.shape)).ravel()
    )
    cell = jnp.asarray(atoms.cell)
    full = BinnedEMT(atoms.numbers, x, cell)
    # 864 atoms / 100 -> 9 chunks including a padded tail
    chunked = BinnedEMT(atoms.numbers, x, cell, chunk=100)

    np.testing.assert_allclose(
        float(chunked.energy(x, cell)), float(full.energy(x, cell)),
        rtol=1e-12,
    )
    g1 = jax.grad(full.energy)(x, cell)
    g2 = jax.grad(chunked.energy)(x, cell)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=1e-12)
    v = jnp.asarray(rng.normal(size=x.shape))
    h1 = jax.jvp(jax.grad(lambda xx: full.energy(xx, cell)),
                 (x,), (v,))[1]
    h2 = jax.jvp(jax.grad(lambda xx: chunked.energy(xx, cell)),
                 (x,), (v,))[1]
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               atol=1e-11)
