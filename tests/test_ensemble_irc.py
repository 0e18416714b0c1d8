"""Batched IRC tier: harvest a saddle ensemble, then follow every
lane's reaction path forward and reverse inside one jitted program
(reference ``optimize/irc.py`` batched)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sella_tpu.parallel.ensemble import EnsembleConfig, run_ensemble
from sella_tpu.parallel.ensemble_irc import (
    IRCEnsembleConfig,
    init_irc_state,
    run_irc_ensemble,
)
from sella_tpu.potentials import LennardJones


@pytest.fixture(scope="module")
def lj4_saddle_ensemble():
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(7)
    Bsz = 8
    x0 = jnp.asarray(
        (tet[None] + 0.12 * rng.normal(size=(Bsz, 4, 3))).reshape(Bsz, 12)
    )
    pot = LennardJones()
    cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-4, gamma=1e-3)
    st = run_ensemble(pot, x0, cfg, max_steps=300)
    sel = np.where(np.asarray(st.converged))[0]
    assert len(sel) >= 6
    return pot, st.x[sel], st.B[sel], np.asarray(st.f)[sel]


def test_irc_ensemble_forward_reverse(lj4_saddle_ensemble):
    """Every TS lane integrates to the LJ4 tetrahedron minimum
    (E = -6 exactly) in both directions, with no inner-loop failures,
    and the two endpoints are distinct permutation isomers."""
    pot, x_ts, H_ts, e_ts = lj4_saddle_ensemble
    masses = np.full(4, 39.948)
    cfg = IRCEnsembleConfig(natoms=4, fmax=1e-2, dx=0.4)

    ends = {}
    for direction in ("forward", "reverse"):
        st = run_irc_ensemble(pot, x_ts, H_ts, cfg, masses,
                              direction=direction, max_steps=150)
        assert bool(st.converged.all()), np.asarray(st.nsteps)
        assert int(np.asarray(st.inner_fail).sum()) == 0
        e_end = np.asarray(st.f)
        assert np.all(e_end < e_ts - 0.1)
        np.testing.assert_allclose(e_end, -6.0, atol=1e-4)
        ends[direction] = np.asarray(st.x)

    # the paths leave the TS in opposite directions
    dist = np.linalg.norm(ends["forward"] - ends["reverse"], axis=1)
    assert np.all(dist > 1e-2), dist


def test_irc_ensemble_pivot_is_imaginary_mode(lj4_saddle_ensemble):
    """The initial pivot lies along the mass-weighted imaginary mode:
    unit mass-weighted arc length dx and negative curvature."""
    pot, x_ts, H_ts, e_ts = lj4_saddle_ensemble
    masses = np.full(4, 39.948)
    cfg = IRCEnsembleConfig(natoms=4, fmax=1e-2, dx=0.4)
    st = init_irc_state(pot, x_ts, H_ts, cfg, masses, "forward")
    sqrtm = np.repeat(np.sqrt(masses), 3)
    d1 = np.asarray(st.d1)
    np.testing.assert_allclose(
        np.linalg.norm(d1 * sqrtm[None], axis=1), cfg.dx, atol=1e-10
    )
    for b in range(d1.shape[0]):
        v = d1[b]
        curv = v @ np.asarray(H_ts[b]) @ v / (v @ v)
        assert curv < 0, (b, curv)


def test_irc_ensemble_path_recording(lj4_saddle_ensemble):
    """record_path returns the outer-step geometries; the energy along
    the path decreases monotonically after the pivot."""
    pot, x_ts, H_ts, e_ts = lj4_saddle_ensemble
    masses = np.full(4, 39.948)
    cfg = IRCEnsembleConfig(natoms=4, fmax=1e-2, dx=0.4)
    st, path = run_irc_ensemble(pot, x_ts[:3], H_ts[:3], cfg, masses,
                                max_steps=150, record_path=True)
    assert path.shape[1:] == (3, 12)
    cell = jnp.zeros((3, 3))
    for b in range(3):
        es = [float(pot.energy(jnp.asarray(p[b]), cell)) for p in path]
        nst = int(np.asarray(st.nsteps)[b])
        es = es[:nst]
        assert all(e2 <= e1 + 1e-10 for e1, e2 in zip(es, es[1:])), es


def test_irc_ensemble_queue(lj4_saddle_ensemble):
    """Work queue: 6 TSs x both directions = 12 items through a
    4-lane batch. Every item integrates to the LJ4 tetrahedron minimum
    (E = -6), and per-TS forward/reverse endpoints differ."""
    from sella_tpu.parallel.ensemble_irc import run_irc_ensemble_queue

    pot, x_ts, H_ts, e_ts = lj4_saddle_ensemble
    masses = np.full(4, 39.948)
    cfg = IRCEnsembleConfig(natoms=4, fmax=1e-2, dx=0.4)
    out = run_irc_ensemble_queue(
        pot, x_ts[:6], H_ts[:6], cfg, masses, batch=4,
        directions="both", max_steps_per_search=150, refill_every=10,
    )
    assert len(out) == 12
    # ordering contract: (ts, forward) then (ts, reverse)
    assert [(r["ts"], r["direction"]) for r in out] == [
        (i, s) for i in range(6) for s in (1, -1)
    ]
    for r in out:
        assert r["converged"], r
        assert not r["inner_fail"], r
        np.testing.assert_allclose(r["f"], -6.0, atol=1e-4)
    for i in range(6):
        fwd = out[2 * i]["x"]
        rev = out[2 * i + 1]["x"]
        assert np.linalg.norm(fwd - rev) > 1e-2
