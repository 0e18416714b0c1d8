"""Batched intrinsic-reaction-coordinate (IRC) integration.

Follows reaction paths from an ENSEMBLE of transition states inside one
jitted XLA program — the batched counterpart of
:class:`sella_tpu.optimize.irc.IRC` (reference
``/root/reference/sella/optimize/irc.py``). Natural pipeline: harvest
converged lanes (x, H) from a saddle ensemble
(:mod:`sella_tpu.parallel.ensemble`), then integrate every lane's IRC
forward/reverse concurrently.

Per outer step (``irc.py:121-165``): displace by the pivot vector d1,
then run a masked inner loop of mass-weighted trust-region corrector
steps — the qn_irc stepper (``stepper.py:99-111``) with the sphere
constraint ||sqrtm (d1 + s)|| = dx — absorbing every realized secant
into the per-lane TS-BFGS Hessian; the inner loop exits when the step
is bound-clipped and the mass-weighted path-orthogonal force is small.
Convergence requires per-atom forces < fmax AND a positive leftmost
eigenvalue of the rigid-projected Hessian (endpoint is a minimum).

Design notes (TPU-first):

* The initial mass-weighted mode comes from one batched eigh of
  H / (sqrtm x sqrtm); the sign canonicalization uses the largest-
  magnitude component (the reference's first-nonzero rule,
  ``irc.py:94-97``, is not vectorizable across lanes whose sparsity
  patterns differ — both are arbitrary tie-breaks).
* The inner loop is a ``lax.fori_loop`` over ``ninner_iter`` with
  per-lane done masks (the reference raises
  ``IRCInnerLoopConvergenceFailure``; here lanes that exhaust the
  budget are flagged in ``inner_fail`` and keep integrating, matching
  ``keep_going=True`` semantics).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sella_tpu.ops.linalg import batched_eigh

from .ensemble import (
    batch_pspec as _batch_pspec,
    free_basis,
    restricted_step_batched,
    ts_bfgs_update_batched,
)


class IRCEnsembleConfig(NamedTuple):
    """Static configuration of a batched IRC integration."""

    natoms: int
    fmax: float = 0.05
    fmax_inner: float = 0.01
    dx: float = 0.1               # mass-weighted path step length
    ninner_iter: int = 10
    nproj: int = 6                # rigid modes for the endpoint test
    rs_maxiter: int = 24
    rs_tol: float = 1e-8
    pivot_free: bool = True       # take the imaginary-mode pivot inside
    #   the rigid-free subspace (safe for quasi-Newton H from an
    #   ensemble run; see _mw_pivot). False = the reference's raw-eigh
    #   pivot + first-nonzero sign rule (``irc.py:85-97``) — use for
    #   strict tier parity when H_ts comes from a fresh full diag.
    # fields read by restricted_step_batched
    method: str = "qn"
    rs: str = "tr"
    order: int = 0
    absb: str = "eigh"             # TS-BFGS |B| metric: "eigh" or "ns"
    #   (Newton-Schulz matmuls; see ensemble.EnsembleConfig.absb)

    @property
    def dim(self) -> int:
        return 3 * self.natoms


class IRCState(NamedTuple):
    """Per-path state; every leaf has a leading batch axis."""

    x: jnp.ndarray            # (B, 3n)
    f: jnp.ndarray
    g: jnp.ndarray
    H: jnp.ndarray            # (B, 3n, 3n)
    d1: jnp.ndarray           # (B, 3n) pivot displacement
    converged: jnp.ndarray
    inner_fail: jnp.ndarray   # lanes whose inner loop hit the budget
    nsteps: jnp.ndarray
    neval: jnp.ndarray


def _qn_irc_prepare_batched(g, H, d1):
    """Batched analogue of ``qn_irc_prepare`` (``stepper.py:99-111``)."""
    lams, V = batched_eigh(H)
    Vg = jnp.einsum("bij,bi->bj", V, g)
    Vd1 = jnp.einsum("bij,bi->bj", V, d1)
    return (lams, V, Vg, Vd1)


def _qn_irc_step_batched(prep, order, alpha):
    lams, V, Vg, Vd1 = prep
    a = alpha[:, None]
    denom = jnp.abs(lams) + a
    sproj = -(Vg + a * Vd1) / denom
    s = jnp.einsum("bij,bj->bi", V, sproj)
    dsda = -jnp.einsum("bij,bj->bi", V, (sproj + Vd1) / denom)
    return s, dsda


def make_irc_step_fn(potential, cfg: IRCEnsembleConfig,
                     masses: np.ndarray,
                     cell: Optional[jnp.ndarray] = None):
    """Build the jittable batched IRC outer step."""
    if cell is None:
        cell = jnp.zeros((3, 3))
    sqrtm = jnp.asarray(np.repeat(np.sqrt(np.asarray(masses)), 3))
    n = cfg.natoms
    Bdim = cfg.dim

    def batch_eval(x):
        return jax.vmap(
            lambda xx: jax.value_and_grad(potential.energy)(xx, cell)
        )(x)

    def irc_norm(d1):
        def norm_fn(s_full, ds_full):
            v = sqrtm[None, :] * (d1 + s_full)
            val = jnp.linalg.norm(v, axis=1)
            dval = jnp.einsum(
                "bi,bi->b", sqrtm[None, :] * ds_full, v
            ) / jnp.maximum(val, 1e-12)
            return val, dval

        return norm_fn

    eyeN = jnp.eye(Bdim)

    class _Inner(NamedTuple):
        x: jnp.ndarray
        f: jnp.ndarray
        g: jnp.ndarray
        H: jnp.ndarray
        d1: jnp.ndarray
        done: jnp.ndarray
        neval: jnp.ndarray

    def step(state: IRCState, key=None) -> IRCState:
        del key
        Bsz = state.x.shape[0]
        act = ~state.converged

        # ---- pivot displacement off the previous point (irc.py:123)
        x1 = state.x + jnp.where(act[:, None], state.d1, 0.0)
        f1, g1 = batch_eval(x1)
        # secant from the pivot move
        m_piv = act & (jnp.linalg.norm(state.d1, axis=1) > 1e-12)
        H1 = ts_bfgs_update_batched(
            state.H, state.d1[:, :, None], (g1 - state.g)[:, :, None],
            m_piv[:, None], absb=getattr(cfg, 'absb', 'eigh'),
        )
        H1 = jnp.where(m_piv[:, None, None], H1, state.H)
        neval0 = state.neval + act.astype(jnp.int32)

        init = _Inner(
            x=jnp.where(act[:, None], x1, state.x),
            f=jnp.where(act, f1, state.f),
            g=jnp.where(act[:, None], g1, state.g),
            H=H1,
            d1=state.d1,
            done=~act,
            neval=neval0,
        )

        def inner(i, st: _Inner) -> _Inner:
            del i
            prep = _qn_irc_prepare_batched(st.g, st.H, st.d1)
            Ufree_b = jnp.broadcast_to(eyeN[None], (Bsz, Bdim, Bdim))
            s, smag = restricted_step_batched(
                jnp.zeros_like(st.g), st.H, Ufree_b,
                jnp.full((Bsz,), cfg.dx, st.x.dtype), cfg,
                prep=prep, norm_fn=irc_norm(st.d1),
                stepper_fn=_qn_irc_step_batched,
            )
            s = jnp.where(st.done[:, None], 0.0, s)
            bound_clip = jnp.abs(smag - cfg.dx) < 1e-8

            x_new = st.x + s
            f_new, g_new = batch_eval(x_new)
            moved = ~st.done
            H_new = ts_bfgs_update_batched(
                st.H, s[:, :, None], (g_new - st.g)[:, :, None],
                (moved & (jnp.linalg.norm(s, axis=1) > 1e-12))[:, None],
                absb=getattr(cfg, 'absb', 'eigh'),
            )
            H_new = jnp.where(moved[:, None, None], H_new, st.H)
            d1_new = st.d1 + s

            # mass-weighted path-orthogonal force (irc.py:127-133)
            d1m = d1_new * sqrtm[None, :]
            d1m = d1m / jnp.maximum(
                jnp.linalg.norm(d1m, axis=1, keepdims=True), 1e-30
            )
            g1m = g_new / sqrtm[None, :]
            g1m_proj = g1m - d1m * jnp.einsum(
                "bi,bi->b", d1m, g1m
            )[:, None]
            fmax_mw = jnp.max(
                jnp.linalg.norm(
                    (g1m_proj * sqrtm[None, :]).reshape(Bsz, n, 3),
                    axis=2,
                ), axis=1,
            )
            # inner exit: bound-clipped step with small path-orthogonal
            # force, OR the endpoint itself is converged (the
            # reference's ``elif self.converged(): break``,
            # ``irc.py:137-138``): small forces AND positive leftmost
            # rigid-projected curvature — without the eigenvalue gate a
            # lane would break out near the TS where total forces dip
            # under fmax while the imaginary mode is still present
            # (measured 2.7e-4 trajectory jump vs the sequential tier).
            fmax_cart = jnp.max(
                jnp.linalg.norm(g_new.reshape(Bsz, n, 3), axis=2),
                axis=1,
            )
            Uxi = jax.vmap(lambda xx: free_basis(xx, cfg.nproj))(x_new)
            Hpi = jnp.einsum(
                "bij,bjk,bkl->bil", jnp.swapaxes(Uxi, 1, 2), H_new, Uxi
            )
            lam0i = batched_eigh(Hpi)[0][:, 0]
            done_new = st.done | (
                moved & bound_clip & (fmax_mw < cfg.fmax_inner)
            ) | (moved & (fmax_cart < cfg.fmax) & (lam0i > 0))
            return _Inner(
                x=jnp.where(moved[:, None], x_new, st.x),
                f=jnp.where(moved, f_new, st.f),
                g=jnp.where(moved[:, None], g_new, st.g),
                H=H_new,
                d1=jnp.where(moved[:, None], d1_new, st.d1),
                done=done_new,
                neval=st.neval + moved.astype(jnp.int32),
            )

        fin = jax.lax.fori_loop(0, cfg.ninner_iter, inner, init)
        inner_fail = state.inner_fail | (act & ~fin.done)

        # ---- endpoint test: forces small AND projected H positive ----
        fmax_now = jnp.max(
            jnp.linalg.norm(fin.g.reshape(Bsz, n, 3), axis=2), axis=1
        )
        Ux = jax.vmap(lambda xx: free_basis(xx, cfg.nproj))(fin.x)
        Hp = jnp.einsum("bij,bjk,bkl->bil", jnp.swapaxes(Ux, 1, 2),
                        fin.H, Ux)
        lam0 = batched_eigh(Hp)[0][:, 0]
        conv_new = state.converged | (
            act & (fmax_now < cfg.fmax) & (lam0 > 0)
        )

        # d1 resets to zero after every outer step (irc.py:148): the
        # pivot displacement only ever fires on the FIRST outer step
        # (d1 = the TS imaginary mode); afterwards each outer step's
        # inner loop advances the path from d1 = 0, where the sphere
        # constraint ||W(d1+s)|| = dx itself pulls the corrector a
        # mass-weighted arc length dx downhill
        return IRCState(
            x=fin.x,
            f=fin.f,
            g=fin.g,
            H=fin.H,
            d1=jnp.zeros_like(fin.d1),
            converged=conv_new,
            inner_fail=inner_fail,
            nsteps=state.nsteps + act.astype(jnp.int32),
            neval=fin.neval,
        )

    return step


def _mw_pivot(x_ts: jnp.ndarray, H_ts: jnp.ndarray,
              cfg: IRCEnsembleConfig, sqrtm: jnp.ndarray) -> jnp.ndarray:
    """Sign-canonical mass-weighted imaginary-mode pivot, length
    ``cfg.dx`` in mass-weighted arc length (``irc.py:85-99``).

    The leftmost mass-weighted mode is taken INSIDE the rigid-free
    subspace: quasi-Newton Hessians from an ensemble run carry
    unconstrained (often spuriously negative) rigid-mode blocks — the
    raw eigh of Hw would hand back a translation/rotation as the
    "imaginary mode" and both IRC directions would fall into the same
    basin. (The reference sidesteps this by running a fresh full
    diagonalization at the TS.) Canonical sign: largest-|component|
    positive (the reference's first-nonzero rule, ``irc.py:94-97``, is
    not vectorizable across lanes with different sparsity patterns —
    both are arbitrary tie-breaks)."""
    Bsz = x_ts.shape[0]

    def leftmost_mw_mode(x, H):
        U = free_basis(x, cfg.nproj)                 # (dim, m)
        Uw = jnp.linalg.qr(sqrtm[:, None] * U)[0]    # mw-orthonormal
        Hw = H / (sqrtm[:, None] * sqrtm[None, :])
        A = Uw.T @ Hw @ Uw
        _, V = batched_eigh(A)
        return Uw @ V[:, 0]

    def leftmost_mw_mode_raw(x, H):
        # the reference's rule verbatim (``irc.py:89-91``): raw eigh of
        # Hw with NO rigid-subspace projection. Only safe when H comes
        # from a fresh full diagonalization at the TS (clean rigid
        # blocks) — which is how the reference always reaches this code.
        Hw = H / (sqrtm[:, None] * sqrtm[None, :])
        _, V = batched_eigh(Hw)
        return V[:, 0]

    mode = (leftmost_mw_mode if getattr(cfg, "pivot_free", True)
            else leftmost_mw_mode_raw)
    vw = jax.vmap(mode)(x_ts, H_ts)
    v0 = vw / sqrtm[None, :]
    v0 = cfg.dx * v0 / jnp.linalg.norm(
        v0 * sqrtm[None, :], axis=1, keepdims=True
    )
    b = jnp.arange(Bsz)
    if getattr(cfg, "pivot_free", True):
        # canonical sign: largest-|component| positive (the reference's
        # first-nonzero rule is not meaningful after projection)
        lead = v0[b, jnp.argmax(jnp.abs(v0), axis=1)]
    else:
        # the reference's sign rule: first non-(numerically-)zero
        # component positive (``irc.py:94-97``)
        nz = jnp.abs(v0) > 1e-12 * jnp.max(
            jnp.abs(v0), axis=1, keepdims=True
        )
        lead = v0[b, jnp.argmax(nz, axis=1)]
    return v0 * jnp.where(lead < 0, -1.0, 1.0)[:, None]


def init_irc_state(
    potential,
    x_ts: jnp.ndarray,
    H_ts: jnp.ndarray,
    cfg: IRCEnsembleConfig,
    masses: np.ndarray,
    direction: str = "forward",
    cell: Optional[jnp.ndarray] = None,
) -> IRCState:
    """Initialize from an ensemble of transition states: per-lane
    mass-weighted eigh gives the imaginary-mode pivot (``irc.py:85-99``);
    ``direction`` flips its sign for the reverse run — either a string
    applied to every lane or a per-lane ±1 array (the work-queue path,
    where forward and reverse runs of different TSs share one batch)."""
    if cell is None:
        cell = jnp.zeros((3, 3))
    x_ts = jnp.asarray(x_ts)
    H_ts = jnp.asarray(H_ts)
    Bsz = x_ts.shape[0]
    sqrtm = jnp.asarray(np.repeat(np.sqrt(np.asarray(masses)), 3))

    if isinstance(direction, str):
        if direction not in ("forward", "reverse"):
            raise ValueError('direction must be "forward" or "reverse"')
        sign = jnp.full(Bsz, -1.0 if direction == "reverse" else 1.0)
    else:
        sign = jnp.asarray(direction, x_ts.dtype)

    v0 = _mw_pivot(x_ts, H_ts, cfg, sqrtm) * sign[:, None]

    f, g = jax.vmap(
        lambda xx: jax.value_and_grad(potential.energy)(xx, cell)
    )(x_ts)
    return IRCState(
        x=x_ts,
        f=f,
        g=g,
        H=H_ts,
        d1=v0,
        converged=jnp.zeros(Bsz, bool),
        inner_fail=jnp.zeros(Bsz, bool),
        nsteps=jnp.zeros(Bsz, jnp.int32),
        neval=jnp.ones(Bsz, jnp.int32),
    )


def run_irc_ensemble(
    potential,
    x_ts: jnp.ndarray,
    H_ts: jnp.ndarray,
    cfg: IRCEnsembleConfig,
    masses: np.ndarray,
    direction: str = "forward",
    max_steps: int = 50,
    cell: Optional[jnp.ndarray] = None,
    mesh=None,
    record_path: bool = False,
):
    """Host loop driving the jitted batched IRC step. With
    ``record_path`` returns ``(state, path)`` where path is
    (nsteps, B, 3n) outer-step geometries (host-gathered — IRC paths
    are the product, unlike optimizer trajectories)."""
    step = make_irc_step_fn(potential, cfg, masses, cell)
    state = init_irc_state(potential, x_ts, H_ts, cfg, masses,
                           direction, cell)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.tree.map(
            lambda a: jax.device_put(
                a,
                NamedSharding(
                    mesh, _batch_pspec(a)
                ),
            ),
            state,
        )

    step_jit = jax.jit(step)
    path = []
    for _ in range(max_steps):
        state = step_jit(state)
        if record_path:
            path.append(np.asarray(state.x))
        if bool(jnp.all(state.converged)):
            break
    if record_path:
        return state, np.stack(path) if path else np.zeros(
            (0,) + state.x.shape
        )
    return state


def make_irc_refill_fn(potential, cfg: IRCEnsembleConfig,
                       masses: np.ndarray,
                       cell: Optional[jnp.ndarray] = None):
    """Jittable lane refill for the IRC work queue.

    ``refill(state, x_new, H_new, sign_new, avail)`` re-initializes
    every lane where ``state.converged & avail`` from the corresponding
    rows of (x_new, H_new, sign_new) — fresh pivot, reset counters —
    and leaves the rest untouched. Follows the splice pattern of
    :func:`sella_tpu.parallel.ensemble_internal.refill_converged_internal`:
    the fresh quantities are computed for the whole batch (one batched
    eigh + one batched force call, cheap at queue cadence) and
    where-spliced, keeping shapes static."""
    if cell is None:
        cell = jnp.zeros((3, 3))
    sqrtm = jnp.asarray(np.repeat(np.sqrt(np.asarray(masses)), 3))

    def refill(state: IRCState, x_new, H_new, sign_new, avail):
        take = state.converged & avail
        v0 = _mw_pivot(x_new, H_new, cfg, sqrtm) * sign_new[:, None]
        f, g = jax.vmap(
            lambda xx: jax.value_and_grad(potential.energy)(xx, cell)
        )(x_new)
        tf = take[:, None]
        tm = take[:, None, None]
        return IRCState(
            x=jnp.where(tf, x_new, state.x),
            f=jnp.where(take, f, state.f),
            g=jnp.where(tf, g, state.g),
            H=jnp.where(tm, H_new, state.H),
            d1=jnp.where(tf, v0, state.d1),
            converged=state.converged & ~take,
            inner_fail=state.inner_fail & ~take,
            nsteps=jnp.where(take, 0, state.nsteps),
            neval=jnp.where(take, 1, state.neval),
        ), take

    return refill


def run_irc_ensemble_queue(
    potential,
    x_ts_all: jnp.ndarray,
    H_ts_all: jnp.ndarray,
    cfg: IRCEnsembleConfig,
    masses: np.ndarray,
    batch: int,
    directions: str = "both",
    max_steps_per_search: int = 150,
    cell: Optional[jnp.ndarray] = None,
    refill_every: int = 10,
):
    """Process an arbitrarily large set of transition states with a
    fixed device batch (mirror of
    :func:`sella_tpu.parallel.ensemble.run_ensemble_queue`).

    ``directions='both'`` expands every TS into a forward and a reverse
    work item — both path halves of different TSs advance in the same
    jitted batch. Returns one dict per work item:
    ``{"ts": i, "direction": +1|-1, "x": endpoint, "f": energy,
    "nsteps": outer steps, "converged": bool, "inner_fail": bool}``
    ordered by (ts index, forward-then-reverse).
    """
    x_ts_all = jnp.asarray(x_ts_all)
    H_ts_all = jnp.asarray(H_ts_all)
    nts = x_ts_all.shape[0]
    if directions == "both":
        items = [(i, s) for i in range(nts) for s in (1.0, -1.0)]
    elif directions in ("forward", "reverse"):
        s = 1.0 if directions == "forward" else -1.0
        items = [(i, s) for i in range(nts)]
    else:
        raise ValueError(
            'directions must be "forward", "reverse" or "both"'
        )
    total = len(items)
    batch = min(batch, total)

    step = jax.jit(make_irc_step_fn(potential, cfg, masses, cell),
                   donate_argnums=0)
    refill = jax.jit(make_irc_refill_fn(potential, cfg, masses, cell),
                     donate_argnums=0)

    def block(idxs):
        ts = np.array([items[j][0] for j in idxs])
        sg = np.array([items[j][1] for j in idxs])
        return (x_ts_all[jnp.asarray(ts)], H_ts_all[jnp.asarray(ts)],
                jnp.asarray(sg))

    x_b, H_b, sg_b = block(range(batch))
    state = init_irc_state(potential, x_b, H_b, cfg, masses,
                           np.asarray(sg_b), cell)
    origin = np.arange(batch)
    next_idx = batch
    results: dict = {}

    while len(results) < total:
        for _ in range(refill_every):
            state = step(state)

        conv = np.asarray(state.converged)
        nsteps = np.asarray(state.nsteps)
        done = conv | (nsteps >= max_steps_per_search)
        if not np.any(done):
            continue

        xs = np.asarray(state.x)
        fs = np.asarray(state.f)
        ifail = np.asarray(state.inner_fail)
        for lane in np.where(done)[0]:
            j = origin[lane]
            if j >= 0 and j not in results:
                results[int(j)] = {
                    "ts": items[j][0],
                    "direction": int(items[j][1]),
                    "x": xs[lane].copy(),
                    "f": float(fs[lane]),
                    "nsteps": int(nsteps[lane]),
                    "converged": bool(conv[lane]),
                    "inner_fail": bool(ifail[lane]),
                }

        x_new = np.array(xs)
        H_new = np.array(np.asarray(state.H))
        sg_new = np.ones(batch)
        avail = np.zeros(batch, dtype=bool)
        new_origin = origin.copy()
        for lane in np.where(done)[0]:
            if next_idx < total:
                ti, si = items[next_idx]
                x_new[lane] = np.asarray(x_ts_all[ti])
                H_new[lane] = np.asarray(H_ts_all[ti])
                sg_new[lane] = si
                avail[lane] = True
                new_origin[lane] = next_idx
                next_idx += 1
            else:
                new_origin[lane] = -1
        # done-but-unconverged lanes become refillable / idle cheaply
        state = state._replace(converged=jnp.asarray(conv | done))
        if np.any(avail):
            state, _ = refill(
                state, jnp.asarray(x_new), jnp.asarray(H_new),
                jnp.asarray(sg_new), jnp.asarray(avail),
            )
            origin = new_origin

    return [results[j] for j in range(total)]
