"""BFGS_auto under jit — eager, batched, and end-to-end.

The reference's recommended *minimization* update is ``BFGS_auto``
(``/root/reference/sella/hessian_update.py:80-87``): plain BFGS when
both B and the secant overlap are positive definite, TS-BFGS otherwise.
The reference implements the dispatch as an eager Python branch; here
it is a traceable select (``ops/hessian_update.update_H``) and a
per-lane batched select (``parallel/ensemble.quasi_newton_update_
batched``) so heterogeneous ensembles mix both updates inside one
jitted step.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_utils import get_matrix

from sella_tpu.ops.hessian_update import update_H
from sella_tpu.parallel.ensemble import (
    EnsembleConfig,
    bfgs_update_batched,
    quasi_newton_update_batched,
    run_ensemble,
    ts_bfgs_update_batched,
)


def _pairs(pd, dim=8, k=2, seed=0):
    rng = np.random.RandomState(seed)
    B = get_matrix(dim, dim, pd, True, rng=rng)
    H = get_matrix(dim, dim, pd, True, rng=rng)
    S = get_matrix(dim, k, rng=rng)
    return B, S, H @ S


@pytest.mark.parametrize("pd", [True, False])
def test_update_H_auto_jits(pd):
    """The eager and jitted BFGS_auto agree, and dispatch correctly."""
    B, S, Y = _pairs(pd)
    eager = np.asarray(update_H(B, S, Y, method="BFGS_auto"))
    jitted = np.asarray(
        jax.jit(lambda b, s, y: update_H(b, s, y, method="BFGS_auto"))(
            B, S, Y
        )
    )
    np.testing.assert_allclose(eager, jitted, rtol=1e-9, atol=1e-9)
    ref = np.asarray(
        update_H(B, S, Y, method="BFGS" if pd else "TS-BFGS")
    )
    np.testing.assert_allclose(eager, ref, rtol=1e-8, atol=1e-8)


def test_batched_bfgs_matches_eager():
    B, S, Y = _pairs(True)
    batched = np.asarray(
        bfgs_update_batched(
            jnp.asarray(B)[None], jnp.asarray(S)[None],
            jnp.asarray(Y)[None], jnp.ones((1, S.shape[1]), bool),
        )
    )[0]
    eager = np.asarray(update_H(B, S, Y, method="BFGS", symm=None))
    np.testing.assert_allclose(batched, eager, rtol=1e-7, atol=1e-9)
    # secant condition holds
    np.testing.assert_allclose(batched @ S, Y, rtol=1e-6, atol=1e-8)


def test_batched_auto_mixes_lanes():
    """One PD lane takes BFGS, one indefinite lane takes TS-BFGS —
    inside a single jitted call."""
    Bp, Sp, Yp = _pairs(True, seed=1)
    Bn, Sn, Yn = _pairs(False, seed=2)
    Bb = jnp.stack([jnp.asarray(Bp), jnp.asarray(Bn)])
    Sb = jnp.stack([jnp.asarray(Sp), jnp.asarray(Sn)])
    Yb = jnp.stack([jnp.asarray(Yp), jnp.asarray(Yn)])
    mask = jnp.ones((2, Sp.shape[1]), bool)
    out = np.asarray(
        jax.jit(
            lambda b, s, y, m: quasi_newton_update_batched(
                b, s, y, m, method="BFGS_auto"
            )
        )(Bb, Sb, Yb, mask)
    )
    ref_bfgs = np.asarray(bfgs_update_batched(Bb[:1], Sb[:1], Yb[:1],
                                              mask[:1]))[0]
    ref_ts = np.asarray(ts_bfgs_update_batched(Bb[1:], Sb[1:], Yb[1:],
                                               mask[1:]))[0]
    np.testing.assert_allclose(out[0], ref_bfgs, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(out[1], ref_ts, rtol=1e-8, atol=1e-10)


def test_batched_auto_masked_columns():
    """Inactive secant columns must not flip the PD decision."""
    Bp, Sp, Yp = _pairs(True, dim=8, k=3, seed=3)
    Sb = jnp.asarray(Sp)[None].at[:, :, 2].set(0.0)
    Yb = jnp.asarray(Yp)[None].at[:, :, 2].set(0.0)
    mask = jnp.asarray([[True, True, False]])
    out = np.asarray(
        quasi_newton_update_batched(
            jnp.asarray(Bp)[None], Sb, Yb, mask, method="BFGS_auto"
        )
    )[0]
    ref = np.asarray(
        bfgs_update_batched(jnp.asarray(Bp)[None], Sb, Yb, mask)
    )[0]
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)
    # and the active-secant condition still holds
    np.testing.assert_allclose(
        out @ Sp[:, :2], Yp[:, :2], rtol=1e-6, atol=1e-8
    )


def test_minimization_with_bfgs_auto_converges():
    """End-to-end: LJ4 minimization ensemble under update='BFGS_auto'
    reaches genuine minima (all free-space curvatures positive)."""
    from sella_tpu.potentials import LennardJones

    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(5)
    x0 = jnp.asarray(
        (tet[None] + 0.05 * rng.normal(size=(6, 4, 3))).reshape(6, 12)
    )
    pot = LennardJones()
    st = run_ensemble(
        pot, x0,
        EnsembleConfig(natoms=4, order=0, fmax=1e-3, eig=False,
                       method="qn", update="BFGS_auto", delta0=0.05),
        max_steps=120,
    )
    conv = np.asarray(st.converged)
    assert conv.all(), conv
    cell = jnp.zeros((3, 3))
    from sella_tpu.parallel.ensemble import free_basis

    for b in range(6):
        H = np.asarray(pot.hessian(st.x[b], cell))
        U = np.asarray(free_basis(st.x[b], 6))
        evals = np.linalg.eigvalsh(U.T @ H @ U)
        assert evals.min() > 0, (b, evals)
