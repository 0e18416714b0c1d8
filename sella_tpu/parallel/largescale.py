"""Large-system path: matrix-free saddle refinement, no dense Hessian.

BASELINE.json config 5 calls for 10k-atom systems with a JAX ML-style
potential. A dense quasi-Newton Hessian is O((3N)^2) memory — out of the
question — so this module provides the matrix-free pipeline the
reference points toward with its ``NumericalHessian`` matvecs
(``/root/reference/sella/linalg.py:39-95``), taken to its conclusion:

* the leftmost Hessian mode comes from a Lanczos/Davidson loop whose
  matvecs are exact potential HVPs (``jax.jvp`` through the gradient),
  warm-started from the previous step's mode — typically 1-3 HVPs per
  optimizer step once converged;
* the step is minimum-mode following (dimer-style): the force component
  along the leftmost mode is reversed, and an L-BFGS two-loop recursion
  over a fixed secant window preconditions the remainder;
* everything is one jitted ``lax.while_loop``; for sharded potentials
  the (3N,) state vectors shard over the atom axis and XLA inserts the
  reductions.

For ``order=0`` the mode machinery is skipped and this is a plain
trust-clipped L-BFGS minimizer.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from sella_tpu.ops.linalg import batched_eigh


class LBFGSMemory(NamedTuple):
    S: jnp.ndarray      # (K, d) position secants
    Y: jnp.ndarray      # (K, d) gradient secants
    rho: jnp.ndarray    # (K,) 1 / (s . y)
    count: jnp.ndarray  # () int32 — total secants pushed


def lbfgs_init(d: int, window: int, dtype=jnp.float64) -> LBFGSMemory:
    return LBFGSMemory(
        S=jnp.zeros((window, d), dtype),
        Y=jnp.zeros((window, d), dtype),
        rho=jnp.zeros((window,), dtype),
        count=jnp.int32(0),
    )


def lbfgs_push(mem: LBFGSMemory, s: jnp.ndarray, y: jnp.ndarray
               ) -> LBFGSMemory:
    """Ring-buffer push; degenerate secants (s.y <= 0) are skipped so the
    implicit Hessian stays positive definite."""
    sy = s @ y
    ok = sy > 1e-12
    slot = mem.count % mem.S.shape[0]
    S = jnp.where(ok, mem.S.at[slot].set(s), mem.S)
    Y = jnp.where(ok, mem.Y.at[slot].set(y), mem.Y)
    rho = jnp.where(
        ok, mem.rho.at[slot].set(1.0 / jnp.where(ok, sy, 1.0)), mem.rho
    )
    return LBFGSMemory(S, Y, rho, mem.count + ok.astype(jnp.int32))


def lbfgs_apply(mem: LBFGSMemory, g: jnp.ndarray) -> jnp.ndarray:
    """Two-loop recursion: returns H_approx^{-1} g (masked fixed window)."""
    K = mem.S.shape[0]
    n_valid = jnp.minimum(mem.count, K)
    newest = (mem.count - 1) % K

    def order_idx(i):
        # i = 0 is newest, walking backwards
        return (newest - i) % K

    q = g
    alphas = jnp.zeros((K,), g.dtype)

    def bwd(i, carry):
        q, alphas = carry
        j = order_idx(i)
        valid = i < n_valid
        alpha = mem.rho[j] * (mem.S[j] @ q)
        alpha = jnp.where(valid, alpha, 0.0)
        q = q - alpha * mem.Y[j]
        return q, alphas.at[j].set(alpha)

    q, alphas = jax.lax.fori_loop(0, K, bwd, (q, alphas))

    # initial scaling gamma = s.y / y.y of the newest pair
    sy = mem.S[newest] @ mem.Y[newest]
    yy = mem.Y[newest] @ mem.Y[newest]
    gamma = jnp.where(
        (n_valid > 0) & (yy > 1e-300), sy / jnp.maximum(yy, 1e-300), 1.0
    )
    r = gamma * q

    def fwd(i, r):
        j = order_idx(n_valid - 1 - i)
        valid = i < n_valid
        beta = mem.rho[j] * (mem.Y[j] @ r)
        upd = (alphas[j] - beta) * mem.S[j]
        return r + jnp.where(valid, upd, 0.0)

    r = jax.lax.fori_loop(0, K, fwd, r)
    return r


def leftmost_mode(hvp: Callable, v0: jnp.ndarray, n_iter: int = 10,
                  tol: float = 1e-3, krylov: int = 5):
    """Leftmost eigenpair via restarted fixed-size Lanczos (HVP matvecs).

    Each outer iteration builds a ``krylov``-dimensional Krylov subspace
    from the current estimate (full reorthogonalization — m is tiny),
    takes the leftmost Ritz pair, and restarts. Fixed shapes throughout
    (jit-friendly); warm-started from the previous optimizer step, one
    restart usually suffices. Returns (lam, v, n_hvp_used).
    """
    d = v0.shape[0]
    m = krylov
    dtype = v0.dtype

    def restart(carry):
        v, lam, i, done, nmv = carry
        V = jnp.zeros((m, d), dtype).at[0].set(v)
        T = jnp.zeros((m, m), dtype)

        def lanczos_step(k, VT):
            V, T = VT
            w = hvp(V[k])
            # full reorthogonalization against all previous vectors
            coeffs = V @ w                      # (m,)
            mask = jnp.arange(m) <= k
            T = T.at[k].set(jnp.where(mask, coeffs, 0.0))
            T = T.at[:, k].set(jnp.where(mask, coeffs, 0.0))
            w = w - (jnp.where(mask, coeffs, 0.0)[:, None] * V).sum(0)
            w = w - (V * ((V @ w)[:, None])).sum(0)  # second pass
            nrm = jnp.linalg.norm(w)
            w = jnp.where(nrm > 1e-12, w / jnp.maximum(nrm, 1e-300), 0.0)
            V = jax.lax.cond(
                k + 1 < m, lambda V: V.at[k + 1].set(w), lambda V: V, V
            )
            return (V, T)

        V, T = jax.lax.fori_loop(0, m, lanczos_step, (V, T))
        lams, W = batched_eigh(T)
        v_new = W[:, 0] @ V
        nrm = jnp.linalg.norm(v_new)
        v_new = v_new / jnp.maximum(nrm, 1e-300)
        lam_new = lams[0]

        Hv = hvp(v_new)
        r = Hv - (v_new @ Hv) * v_new
        done_new = jnp.linalg.norm(r) < tol * jnp.maximum(
            jnp.abs(lam_new), 1e-3
        )
        return (v_new, v_new @ Hv, i + 1, done | done_new,
                nmv + jnp.int32(m + 1))

    def cond(carry):
        v, lam, i, done, nmv = carry
        return (~done) & (i < n_iter)

    v0n = v0 / jnp.linalg.norm(v0)
    v, lam, _, _, nmv = jax.lax.while_loop(
        cond, restart, (v0n, jnp.asarray(0.0, dtype), jnp.int32(0),
                        jnp.asarray(False), jnp.int32(0))
    )
    return lam, v, nmv


class MMFState(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    mode: jnp.ndarray       # current leftmost-mode estimate
    lam: jnp.ndarray        # its Rayleigh quotient
    mem: LBFGSMemory
    tr: jnp.ndarray         # adaptive max step length
    geff_norm: jnp.ndarray  # last effective-gradient norm (merit)
    nsteps: jnp.ndarray
    neval: jnp.ndarray
    nmatvec: jnp.ndarray
    converged: jnp.ndarray


def make_mmf_step(potential, cell=None, order: int = 1,
                  fmax: float = 1e-3, max_move: float = 0.1,
                  window: int = 20, mode_iter: int = 8):
    """Jittable minimum-mode-following step for ONE large system."""
    if cell is None:
        cell = jnp.zeros((3, 3))

    egrad = jax.value_and_grad(potential.energy)

    def hvp_at(x):
        def hvp(v):
            gfun = lambda y: jax.grad(potential.energy)(y, cell)
            return jax.jvp(gfun, (x,), (v,))[1]

        return hvp

    def step(state: MMFState) -> MMFState:
        if order > 0:
            lam, mode, nmv = leftmost_mode(
                hvp_at(state.x), state.mode, n_iter=mode_iter
            )
            gpar_coef = state.g @ mode
            g_perp = state.g - gpar_coef * mode
            # parallel: exact Newton along the mode — the curvature lam
            # is known from the Lanczos solve. With lam < 0 this walks
            # uphill toward the saddle; with lam >= 0 walk up the mode
            # to create negative curvature.
            s_par_len = jnp.where(
                lam < 0,
                -gpar_coef / jnp.where(lam < 0, lam, -1.0),
                # no negative mode yet: move against the gradient
                # component along the mode, bounded
                -jnp.sign(gpar_coef) * 0.5 * max_move,
            )
            s_par_len = jnp.clip(s_par_len, -max_move, max_move)
            s_par = s_par_len * mode
        else:
            lam, mode, nmv = state.lam, state.mode, jnp.int32(0)
            g_perp = state.g
            s_par = jnp.zeros_like(state.g)

        # perpendicular: L-BFGS on the perpendicular gradient with a
        # steepest-descent fallback (order=0: the full gradient)
        p = lbfgs_apply(state.mem, g_perp)
        pg = p @ g_perp
        bad = (pg <= 1e-14) | (~jnp.all(jnp.isfinite(p)))
        p = jnp.where(bad, g_perp, p)
        s_perp = -p
        if order > 0:
            s_perp = s_perp - (s_perp @ mode) * mode
        norm = jnp.linalg.norm(s_perp)
        s_perp = jnp.where(
            norm > max_move,
            s_perp * (max_move / jnp.maximum(norm, 1e-300)),
            s_perp,
        )

        step_vec = s_par + s_perp
        x_new = state.x + step_vec
        f_new, g_new = egrad(x_new, cell)

        # L-BFGS secants on the PERPENDICULAR gradient (fixed mode)
        if order > 0:
            g_perp_new = g_new - (g_new @ mode) * mode
        else:
            g_perp_new = g_new
        mem = lbfgs_push(state.mem, step_vec, g_perp_new - g_perp)

        natoms = state.x.shape[0] // 3
        fmax_now = jnp.max(
            jnp.linalg.norm(g_new.reshape(natoms, 3), axis=1)
        )
        conv = (fmax_now < fmax) & ((lam < 0) if order > 0 else True)

        return MMFState(
            x=x_new, f=f_new, g=g_new, mode=mode, lam=lam, mem=mem,
            tr=state.tr, geff_norm=jnp.linalg.norm(g_perp_new),
            nsteps=state.nsteps + 1, neval=state.neval + 1,
            nmatvec=state.nmatvec + nmv, converged=conv,
        )

    return step


def mmf_init(potential, x0, cell=None, window: int = 20,
             seed: int = 0) -> MMFState:
    x0 = jnp.asarray(x0)
    if cell is None:
        cell = jnp.zeros((3, 3), x0.dtype)
    f, g = jax.value_and_grad(potential.energy)(x0, cell)
    v0 = jax.random.normal(jax.random.PRNGKey(seed), x0.shape, x0.dtype)
    v0 = v0 / jnp.linalg.norm(v0)
    return MMFState(
        x=x0, f=f, g=g, mode=v0, lam=jnp.asarray(0.0, x0.dtype),
        mem=lbfgs_init(x0.shape[0], window, x0.dtype),
        tr=jnp.asarray(0.05, x0.dtype),
        geff_norm=jnp.asarray(jnp.inf, x0.dtype),
        nsteps=jnp.int32(0), neval=jnp.int32(1), nmatvec=jnp.int32(0),
        converged=jnp.asarray(False),
    )


def run_mmf(potential, x0, cell=None, order: int = 1, fmax: float = 1e-3,
            max_steps: int = 500, max_move: float = 0.1,
            steps_per_call: int = 25, **kwargs) -> MMFState:
    """Host loop around the jitted MMF step until convergence."""
    step = make_mmf_step(potential, cell, order, fmax, max_move, **kwargs)

    def multi(state):
        def body(i, st):
            return jax.lax.cond(st.converged, lambda s: s, step, st)

        return jax.lax.fori_loop(0, steps_per_call, body, state)

    multi_jit = jax.jit(multi, donate_argnums=0)
    state = mmf_init(potential, x0, cell)
    for _ in range(max_steps // steps_per_call + 1):
        state = multi_jit(state)
        if bool(state.converged) or int(state.nsteps) >= max_steps:
            break
    return state
