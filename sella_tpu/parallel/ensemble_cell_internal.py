"""Batched ensemble optimization in internal coordinates + cell DOF.

The batched analog of the sequential ``CellInternalPES``
(reference ``/root/reference/sella/peswrapper.py:1320-2373``): per-lane
DOF are ``z = [q (redundant internals), s (masked log-deformation cell
parameters)]``; steps are predicted by RS-(P-)RFO in the nonredundant
free subspace of z and realized by (1) applying the cell update
``cell = expm(L/factor) @ cell0`` and then (2) a masked Newton
back-transform that moves the atoms until the internals at the NEW cell
hit ``q_after_cell + dq`` — exactly the reference's sequencing
(``peswrapper.py:2015-2016``: cell first, then the internal target).

Design (TPU-first):

* ONE shared topology layout; per-lane activity rows (``qact``) mask
  which entries a lane uses (the repave/Niggli union mechanics of the
  internal tier). Per-lane reference cells (``cell0``) are state, so
  per-lane Niggli rebases run without recompiling; per-lane cells
  differ further through the ``s`` parameters (ordinary DOF). The
  internal engine evaluates q/B at a traced per-lane cell, so periodic
  image vectors ride the deformation automatically.
* The enthalpy ``E + P |det cell|`` is one differentiable jax scalar of
  ``(x, s)``; its gradient delivers atom forces and the full
  stress -> cell-gradient pipeline (the reference's expm-Frechet
  machinery, ``peswrapper.py:2135-2208``) by autodiff through ``expm``.
* Curvature is secant-driven (TS-BFGS on z-space secants) from a
  block guess [Lindh q-Hessian, scaled identity cell block] — matching
  the reference, whose ``CellInternalPES`` Hessian is likewise
  quasi-Newton (+ optional FD refinement) rather than Davidson-exact.
* Fixed internal coordinates (``fix_bond``/``fix_angle``/... that are
  q-members) are supported exactly as in the internal tier: the free
  subspace splits against the constrained rows, and the Newton
  back-transform pins their targets (constraint restoration for free).
* The trust norm is the weighted max-component (`mis`) norm over z with
  a separate weight ``wc`` for the cell components (the reference
  couples its split atom/cell trust radii into MaxInternalStep via
  ``wc = delta/delta_cell``, ``optimize.py:333-337``).

Dummy atoms are not supported in this tier (linear-center dummies are a
molecular feature; raise at construction) — use the sequential
``CellInternalPES`` for those systems.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import expm
from .ensemble import (
    batch_pspec as _batch_pspec,
    prfo_prepare_batched,
    restricted_step_batched,
    ts_bfgs_update_batched,
)
from .ensemble_internal import (
    _dihedral_mask,
    _gram_pinv,
    _kind_weights,
    _split_fixed,
    fixed_internal_constraints,
)


class CellInternalEnsembleConfig(NamedTuple):
    """Static (trace-time) configuration of a batched internal+cell
    search. ``nint`` internals + ``ncell`` free cell parameters (True
    count of the 3x3 cell mask); ``nred`` is the nonredundant width of
    range(B) = ``3 natoms - nproj`` (``nproj=3``: translations are
    invariant in q under PBC; rotations are not, the cell pins them)."""

    natoms: int
    nint: int
    ncell: int = 9
    order: int = 0
    nproj: int = 3
    ncons: int = 0
    fmax: float = 1e-3
    smax: float = 0.0              # 0 -> use fmax (reference default)
    gamma: float = 0.1
    delta0: float = 0.1
    delta_min: float = 1e-4
    sigma_inc: float = 1.15
    sigma_dec: float = 0.65
    rho_inc: float = 1.035
    rho_dec: float = 5.0
    rs_maxiter: int = 18
    rs_tol: float = 1e-8
    method: str = "prfo"
    rs: str = "mis"
    newton_maxiter: int = 20
    newton_tol: float = 1e-10
    rigid_fragments: bool = False
    exp_cell_factor: float = 0.0   # <= 0 -> float(natoms) (reference)
    scalar_pressure: float = 0.0
    absb: str = "eigh"             # TS-BFGS |B| metric: "eigh" or "ns"
    #   (Newton-Schulz matmuls; see ensemble.EnsembleConfig.absb)
    h0_cell: float = 60.0          # cell-block guess curvature (eV)
    # mis weights per coordinate kind + cell components
    wx: float = 1.0
    wb: float = 1.0
    wa: float = 1.0
    wd: float = 1.0
    wo: float = 1.0
    wc: float = 1.0
    pred_min: float = 1e-14        # smallest trusted |predicted dE| in
    #   the ratio test (see ensemble.EnsembleConfig.pred_min)

    @property
    def nz(self) -> int:
        return self.nint + self.ncell

    @property
    def nred(self) -> int:
        return 3 * self.natoms - self.nproj

    @property
    def nfree(self) -> int:
        """Free width of the z-subspace: nonredundant internals minus
        fixed coordinates, plus all cell parameters."""
        return self.nred - self.ncons + self.ncell


class CellInternalSearchState(NamedTuple):
    """Per-search state; every leaf has a leading batch axis."""

    x: jnp.ndarray            # (B, 3n) Cartesian positions
    s: jnp.ndarray            # (B, ncell) masked log-deformation params
    q: jnp.ndarray            # (B, nint) internal values (continuous)
    f: jnp.ndarray            # (B,) enthalpy E + PV
    g: jnp.ndarray            # (B, 3n) Cartesian enthalpy gradient
    gs: jnp.ndarray           # (B, ncell) cell-parameter gradient
    gq: jnp.ndarray           # (B, nint) internal gradient B^+T g
    H: jnp.ndarray            # (B, nz, nz) quasi-Newton Hessian (z)
    delta: jnp.ndarray
    rho: jnp.ndarray
    converged: jnp.ndarray
    nsteps: jnp.ndarray
    neval: jnp.ndarray
    cell0: jnp.ndarray        # (B, 3, 3) per-lane base cell — the
    #   log-deformation reference; constant between rebase events.
    #   :func:`niggli_rebase_cell_internal_lanes` replaces a skewed
    #   lane's base with a reduced lattice basis, zeroes its params and
    #   remaps its image vectors (reference ``optimize.py:437-440`` +
    #   ``peswrapper.py:1521-1567``).
    qact: jnp.ndarray         # (B, nint) per-lane active topology rows
    #   (all True until a repave/Niggli event diversifies lanes)
    qcons: jnp.ndarray        # (B, ncons) per-lane rows of the fixed
    #   internal coordinates. Identical across lanes at init; a Niggli
    #   rebase remaps an image-pinned constraint to its remapped row
    #   (nc @ M^{-1}) for that lane only — the reason these are DATA,
    #   not trace-time constants.


def _cell_map(cfg: CellInternalEnsembleConfig,
              cell_mask: Optional[np.ndarray]):
    """(cell_of, enthalpy) closures shared by step/init. Both take the
    lane's base cell ``c0`` as an ordinary traced argument so one
    compiled step serves every per-lane base (Niggli rebases are pure
    state updates)."""
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    mask_flat = jnp.asarray(
        np.where(np.asarray(cell_mask, dtype=bool).ravel())[0]
    )
    if mask_flat.shape[0] != cfg.ncell:
        raise ValueError(
            f"cell_mask has {mask_flat.shape[0]} free entries, "
            f"cfg.ncell={cfg.ncell}"
        )
    factor = (cfg.exp_cell_factor if cfg.exp_cell_factor > 0
              else float(cfg.natoms))
    pressure = cfg.scalar_pressure

    def cell_of(s, c0):
        L = jnp.zeros(9, s.dtype).at[mask_flat].set(s).reshape(3, 3)
        return expm(L / factor) @ c0

    def make_enthalpy(potential):
        if not getattr(potential, "has_stress", True):
            raise ValueError(
                "this host potential has no stress source: cell DOF "
                "derivatives would be silently wrong. Construct the "
                "HostBatchedCalculator with stress_func=... (Voigt "
                "virial stress per lane) to drive the batched cell "
                "tiers."
            )

        def enthalpy(x, s, c0):
            cell = cell_of(s, c0)
            e = potential.energy(x, cell)
            if pressure != 0.0:
                e = e + pressure * jnp.abs(jnp.linalg.det(cell))
            return e

        return enthalpy

    return cell_of, make_enthalpy


def _rigid_maps(ints, cfg: CellInternalEnsembleConfig, cell_of):
    """Single-lane rigid-fragment transport + corrected cell gradient.

    Batched analog of the sequential ``CellInternalPES`` rigid transport
    (reference ``peswrapper.py:1986-2010``): under a cell change each
    fragment keeps its internal geometry — its centroid follows the
    cell affinely and its orientation rotates by the polar factor of the
    incremental deformation ``F_inc = cell_new @ cell_old^-1``; lone
    atoms (their own singleton fragments) follow the cell affinely.

    Because atoms MOVE with ``s`` along this transport, the consistent
    cell gradient is the total derivative ``dE/ds = ∂E/∂s +
    g_x · ∂T/∂s``. Rather than autodiff through the polar
    decomposition (SVD derivatives are NaN at the F_inc = I evaluation
    point), ``gs_corr`` uses the closed-form linearization at the
    current cell: ``dF_k = D_k @ cell^-1``, ``dR_k = skew(dF_k)``,
    ``d pos_a = com_f @ cell^-1 @ D_k - (pos_a - com_f) @ skew(dF_k)``
    with ``D_k = ∂cell/∂s_k`` (autodiff through ``expm``, which is
    smooth).

    Returns ``(transport, gs_corr)`` over one lane; vmap at call sites.
    """
    from ..ops.linalg import inv3

    n = cfg.natoms
    frag_id_np = np.full(n, -1, dtype=np.int64)
    nfrag = 0
    for group in ints.fragment_atom_groups or []:
        frag_id_np[np.asarray(group)] = nfrag
        nfrag += 1
    for a in range(n):
        if frag_id_np[a] < 0:
            frag_id_np[a] = nfrag
            nfrag += 1
    frag_id = jnp.asarray(frag_id_np)
    counts = jnp.asarray(np.bincount(frag_id_np, minlength=nfrag),
                         dtype=jnp.float64)

    def _coms(pos):                               # (n,3) -> (nfrag,3)
        sums = jax.ops.segment_sum(pos, frag_id, num_segments=nfrag)
        return sums / counts[:, None]

    def transport(x_flat, cell_old, cell_new):
        pos = x_flat.reshape(n, 3)
        com = _coms(pos)
        inv_old = inv3(cell_old)
        F_inc = cell_new @ inv_old
        # polar rotation factor; SVD value (no derivative) is stable
        # even at F_inc = I (converged lanes, ds = 0)
        U, _, Vt = jnp.linalg.svd(F_inc)
        R = U @ Vt
        com_new = (com @ inv_old) @ cell_new
        delta = pos - com[frag_id]
        pos_new = com_new[frag_id] + delta @ R.T
        return pos_new.reshape(-1)

    dcell_of = jax.jacfwd(cell_of)                # s -> (3, 3, ncell)

    def gs_corr(g_flat, x_flat, s, c0):
        gm = g_flat.reshape(n, 3)
        pos = x_flat.reshape(n, 3)
        com = _coms(pos)
        cell = cell_of(s, c0)
        inv_c = inv3(cell)
        D = dcell_of(s, c0)                       # (3, 3, ncell)
        A = jnp.einsum("ij,jlk->ilk", inv_c, D)   # com part, (3,3,ncell)
        dF = jnp.einsum("ijk,jl->ilk", D, inv_c)  # (3, 3, ncell)
        S = 0.5 * (dF - jnp.swapaxes(dF, 0, 1))   # skew(dF)
        G = jax.ops.segment_sum(gm, frag_id, num_segments=nfrag)
        term1 = jnp.einsum("fi,ijk,fj->k", com, A, G)
        delta = pos - com[frag_id]
        P = delta.T @ gm                          # (3, 3)
        term2 = jnp.einsum("ij,ijk->k", P, S)
        return term1 - term2

    return transport, gs_corr


def make_cell_internal_step_fn(
    potential, ints, cfg: CellInternalEnsembleConfig, cell0,
    cell_mask: Optional[np.ndarray] = None,
):
    """Build the jittable batched internal+cell RS-RFO step."""
    if ints.ndummies:
        raise ValueError(
            "dummy atoms are not supported in the batched internal+cell"
            " tier; use the sequential CellInternalPES"
        )
    if ints.nint != cfg.nint:
        raise ValueError(f"cfg.nint={cfg.nint} != topology {ints.nint}")
    cons_idx_np, cons_target_np = fixed_internal_constraints(ints)
    if len(cons_idx_np) != cfg.ncons:
        raise ValueError(
            f"cfg.ncons={cfg.ncons} != mapped constraints "
            f"{len(cons_idx_np)}"
        )
    cons_idx = jnp.asarray(cons_idx_np)
    cons_target = jnp.asarray(cons_target_np)
    ncons = cfg.ncons

    engine = ints._get_engine()
    n = cfg.natoms
    nint = cfg.nint

    del cell0  # back-compat arg; the base cell is per-lane STATE
    cell_of, make_enthalpy = _cell_map(cfg, cell_mask)
    enthalpy = make_enthalpy(potential)
    batch_eval = jax.vmap(jax.value_and_grad(enthalpy, argnums=(0, 1)))

    if cfg.rigid_fragments:
        transport, gs_corr = _rigid_maps(ints, cfg, cell_of)
        batch_transport = jax.vmap(transport)
        batch_gs_corr = jax.vmap(gs_corr)

    batch_q = jax.vmap(
        lambda x, c: engine._calc_impl(x.reshape(n, 3), c)
    )
    batch_B = jax.vmap(
        lambda x, c: engine._jac_impl(x.reshape(n, 3), c)
    )
    batch_cell = jax.vmap(cell_of)

    dih = jnp.asarray(_dihedral_mask(ints))
    w_q = jnp.asarray(_kind_weights(ints, cfg))
    w_z = jnp.concatenate(
        [w_q, cfg.wc * jnp.ones(cfg.ncell, w_q.dtype)]
    )

    def wrap_dq(r):
        wrapped = r - 2 * jnp.pi * jnp.round(r / (2 * jnp.pi))
        return jnp.where(dih[None, :], wrapped, r)

    def mis_norm(s_full, ds_full):
        ws = w_z[None, :] * jnp.abs(s_full)
        idx = jnp.argmax(ws, axis=1)
        b = jnp.arange(s_full.shape[0])
        val = ws[b, idx]
        sgn = jnp.sign(s_full[b, idx])
        dval = w_z[idx] * sgn * ds_full[b, idx]
        return val, dval

    def blockdiag_free(Ufree_q):
        """(B, nint, kq) -> (B, nz, kq + ncell) with identity cell
        block: cell parameters are already nonredundant DOF."""
        Bsz, _, kq = Ufree_q.shape
        top = jnp.concatenate(
            [Ufree_q,
             jnp.zeros((Bsz, nint, cfg.ncell), Ufree_q.dtype)], axis=2
        )
        bot = jnp.concatenate(
            [jnp.zeros((Bsz, cfg.ncell, kq), Ufree_q.dtype),
             jnp.broadcast_to(
                 jnp.eye(cfg.ncell, dtype=Ufree_q.dtype)[None],
                 (Bsz, cfg.ncell, cfg.ncell),
             )], axis=2,
        )
        return jnp.concatenate([top, bot], axis=1)

    def newton_set_x(x0, cells, q_after, dq_target, rows, qcons_rows):
        """Find x with q(x; cell_new) = q_after + dq_target (masked
        Newton, best-iterate tracking; fixed components pinned,
        inactive rows ignored)."""
        q_target = q_after + dq_target
        if ncons:
            q_target = jax.vmap(
                lambda qt, ci: qt.at[ci].set(cons_target)
            )(q_target, qcons_rows)

        class _NS(NamedTuple):
            x: jnp.ndarray
            x_best: jnp.ndarray
            r_best: jnp.ndarray
            it: jnp.ndarray
            done: jnp.ndarray

        def resid(x):
            return wrap_dq(q_target - batch_q(x, cells)) * rows

        r0 = resid(x0)
        st = _NS(x0, x0, jnp.max(jnp.abs(r0), axis=1), jnp.int32(0),
                 jnp.zeros(x0.shape[0], bool))

        def cond(st):
            return jnp.any(~st.done) & (st.it < cfg.newton_maxiter)

        def body(st):
            r = resid(st.x)
            rinf = jnp.max(jnp.abs(r), axis=1)
            better = rinf < st.r_best
            x_best = jnp.where(better[:, None], st.x, st.x_best)
            r_best = jnp.where(better, rinf, st.r_best)
            done = st.done | (rinf < cfg.newton_tol)

            Bm = batch_B(st.x, cells) * rows[:, :, None]
            apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
            dx = jnp.einsum("bki,bk->bi", Bm, apply_pinv(r))
            x_new = jnp.where(done[:, None], st.x, st.x + dx)
            return _NS(x_new, x_best, r_best, st.it + 1, done)

        st = jax.lax.while_loop(cond, body, st)
        r_fin = resid(st.x)
        rinf_fin = jnp.max(jnp.abs(r_fin), axis=1)
        better = rinf_fin < st.r_best
        return jnp.where(better[:, None], st.x, st.x_best)

    smax_tol = cfg.smax if cfg.smax > 0 else cfg.fmax

    def step(state: CellInternalSearchState, key
             ) -> CellInternalSearchState:
        Bsz = state.x.shape[0]
        act = ~state.converged
        rows = state.qact.astype(state.x.dtype)

        cells = batch_cell(state.s, state.cell0)
        Bm = batch_B(state.x, cells) * rows[:, :, None]
        apply_pinv, Ured_q = _gram_pinv(Bm, cfg.nred)
        Ufree_q = _split_fixed(Ured_q, state.qcons if ncons else cons_idx, ncons)
        Ufree_z = blockdiag_free(Ufree_q)           # (B, nz, nfree)

        gz = jnp.concatenate([state.gq, state.gs], axis=1)
        UT = jnp.swapaxes(Ufree_z, 1, 2)
        g_free = jnp.einsum("bij,bi->bj", Ufree_z, gz)
        Hproj = jnp.einsum("bij,bjk,bkl->bil", UT, state.H, Ufree_z)
        prep = prfo_prepare_batched(g_free, Hproj, cfg.order)

        dz_pred, smag = restricted_step_batched(
            g_free, Hproj, Ufree_z, state.delta, cfg, prep=prep,
            norm_fn=mis_norm,
        )
        dz_pred = jnp.where(act[:, None], dz_pred, 0.0)
        dq_pred, ds = dz_pred[:, :nint] * rows, dz_pred[:, nint:]

        # ---- apply: cell first, then internals at the new cell ----
        s_new = state.s + ds
        cells_new = batch_cell(s_new, state.cell0)
        if cfg.rigid_fragments:
            # rigid transport to the new cell: fragments keep their
            # internal geometry, so intra-fragment internals are exact
            # at the transported point and the Newton solve only works
            # on the predicted dq (reference ``peswrapper.py:1986-2010``)
            x_base = batch_transport(state.x, cells, cells_new)
        else:
            x_base = state.x
        q_after = wrap_dq(batch_q(x_base, cells_new) - state.q
                          ) + state.q
        x_new = newton_set_x(x_base, cells_new, q_after, dq_pred, rows,
                              state.qcons)
        x_new = jnp.where(act[:, None], x_new, state.x)
        q_new = wrap_dq(batch_q(x_new, cells_new) - state.q) + state.q

        f_new, (g_new, gs_new) = batch_eval(x_new, s_new, state.cell0)
        if cfg.rigid_fragments:
            # total cell derivative along the transported path
            gs_new = gs_new + batch_gs_corr(g_new, x_new, s_new,
                                            state.cell0)
        neval = state.neval + act.astype(jnp.int32)

        Bm_new = batch_B(x_new, cells_new) * rows[:, :, None]
        apply_pinv_new, Ured_q_new = _gram_pinv(Bm_new, cfg.nred)
        gq_new = apply_pinv_new(
            jnp.einsum("bij,bj->bi", Bm_new, g_new)
        )

        # ---- trust ratio ----
        df_pred = jnp.einsum("bi,bi->b", gz, dz_pred) + 0.5 * jnp.einsum(
            "bi,bij,bj->b", dz_pred, state.H, dz_pred
        )
        df_actual = f_new - state.f
        pred_ok = jnp.abs(df_pred) > cfg.pred_min
        ratio = jnp.where(
            pred_ok, df_actual / jnp.where(pred_ok, df_pred, 1.0), 1.0
        )

        # ---- TS-BFGS with the realized z secant ----
        dz_real = jnp.concatenate(
            [(q_new - state.q) * rows, s_new - state.s], axis=1
        )
        gz_new = jnp.concatenate([gq_new, gs_new], axis=1)
        # Parallel-transport the internal block of the old gradient
        # into the post-step B frame (reference ``peswrapper.py:835-839``
        # via the inner InternalPES; the cell block is NOT transported,
        # ``cell.py:750`` / reference ``peswrapper.py:2039-2065``):
        # g_par = B_new (B_old^T G_old^+ gq_old).
        g0_cart = jnp.einsum("bij,bi->bj", Bm, apply_pinv(state.gq))
        gq_par = jnp.einsum("bij,bj->bi", Bm_new, g0_cart)
        dgz = gz_new - jnp.concatenate([gq_par, state.gs], axis=1)
        m1 = (jnp.linalg.norm(dz_real, axis=1) > 1e-10)[:, None]
        H2 = ts_bfgs_update_batched(
            state.H, dz_real[:, :, None], dgz[:, :, None],
            m1 & act[:, None], absb=getattr(cfg, 'absb', 'eigh'),
        )
        H2 = jnp.where((act & m1[:, 0])[:, None, None], H2, state.H)

        # ---- trust update ----
        bad = (ratio < 1.0 / cfg.rho_dec) | (ratio > cfg.rho_dec)
        good = (1.0 / cfg.rho_inc < ratio) & (ratio < cfg.rho_inc)
        delta_new = jnp.where(
            bad,
            jnp.maximum(smag * cfg.sigma_dec, cfg.delta_min),
            jnp.where(
                good,
                jnp.maximum(cfg.sigma_inc * smag, state.delta),
                state.delta,
            ),
        )
        delta_new = jnp.where(act, delta_new, state.delta)

        # ---- convergence: projected forces AND cell gradient ----
        Ufree_new = _split_fixed(Ured_q_new, state.qcons if ncons else cons_idx, ncons)
        gqp = jnp.einsum(
            "bij,bj->bi", Ufree_new,
            jnp.einsum("bij,bi->bj", Ufree_new, gq_new),
        )
        gp = jnp.einsum("bi,bij->bj", gqp, Bm_new)
        fmax_now = jnp.max(
            jnp.linalg.norm(gp.reshape(Bsz, n, 3), axis=2), axis=1
        )
        smax_now = (
            jnp.max(jnp.abs(gs_new), axis=1)
            if cfg.ncell else jnp.zeros(Bsz)
        )
        conv_new = state.converged | (
            act & (fmax_now < cfg.fmax) & (smax_now < smax_tol)
        )

        return CellInternalSearchState(
            x=jnp.where(act[:, None], x_new, state.x),
            s=jnp.where(act[:, None], s_new, state.s),
            q=jnp.where(act[:, None], q_new, state.q),
            f=jnp.where(act, f_new, state.f),
            g=jnp.where(act[:, None], g_new, state.g),
            gs=jnp.where(act[:, None], gs_new, state.gs),
            gq=jnp.where(act[:, None], gq_new, state.gq),
            H=H2,
            delta=delta_new,
            rho=jnp.where(act, ratio, state.rho),
            converged=conv_new,
            nsteps=state.nsteps + act.astype(jnp.int32),
            neval=neval,
            cell0=state.cell0,
            qact=state.qact,
            qcons=state.qcons,
        )

    return step


def init_cell_internal_state(
    potential, ints, x0: jnp.ndarray, cfg: CellInternalEnsembleConfig,
    cell0, cell_mask: Optional[np.ndarray] = None,
    s0: Optional[jnp.ndarray] = None,
) -> CellInternalSearchState:
    """Initialize the batched internal+cell state; the z-space Hessian
    guess is blockdiag(Lindh q-Hessian, ``h0_cell`` * I)."""
    x0 = jnp.asarray(x0).copy()
    Bsz = x0.shape[0]
    dtype = x0.dtype
    n = cfg.natoms
    cons_idx0, _ = fixed_internal_constraints(ints)
    if len(cons_idx0) != cfg.ncons:
        raise ValueError(
            f"cfg.ncons={cfg.ncons} != mapped constraints "
            f"{len(cons_idx0)}"
        )
    cons_idx0 = np.asarray(cons_idx0, np.int64).reshape(-1)
    if s0 is None:
        s0 = jnp.zeros((Bsz, cfg.ncell), dtype)
    else:
        s0 = jnp.asarray(s0).copy()

    engine = ints._get_engine()
    cell_of, make_enthalpy = _cell_map(cfg, cell_mask)
    enthalpy = make_enthalpy(potential)
    cell0 = jnp.asarray(cell0, dtype)
    if cell0.ndim == 2:
        cell0 = jnp.broadcast_to(cell0[None], (Bsz, 3, 3))
    cell0 = cell0.copy()
    cells = jax.vmap(cell_of)(s0, cell0)

    f, (g, gs) = jax.vmap(
        jax.value_and_grad(enthalpy, argnums=(0, 1))
    )(x0, s0, cell0)
    if cfg.rigid_fragments:
        _, gs_corr = _rigid_maps(ints, cfg, cell_of)
        gs = gs + jax.vmap(gs_corr)(g, x0, s0, cell0)
    q = jax.vmap(lambda x, c: engine._calc_impl(x.reshape(n, 3), c))(
        x0, cells
    )
    Bm = jax.vmap(lambda x, c: engine._jac_impl(x.reshape(n, 3), c))(
        x0, cells
    )
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, g))

    Hq = np.asarray(ints.guess_hessian())
    H0 = np.zeros((cfg.nz, cfg.nz))
    H0[:cfg.nint, :cfg.nint] = Hq
    H0[cfg.nint:, cfg.nint:] = cfg.h0_cell * np.eye(cfg.ncell)
    H0 = jnp.asarray(H0, dtype)

    return CellInternalSearchState(
        x=x0,
        s=s0,
        q=q,
        f=f,
        g=g,
        gs=gs,
        gq=gq,
        H=jnp.broadcast_to(H0[None], (Bsz, cfg.nz, cfg.nz)).copy(),
        delta=jnp.full((Bsz,), cfg.delta0, dtype),
        rho=jnp.ones((Bsz,), dtype),
        converged=jnp.zeros(Bsz, bool),
        nsteps=jnp.zeros(Bsz, jnp.int32),
        neval=jnp.ones(Bsz, jnp.int32),
        cell0=cell0,
        qact=jnp.ones((Bsz, cfg.nint), bool),
        qcons=jnp.broadcast_to(
            jnp.asarray(cons_idx0, jnp.int32)[None], (Bsz, cfg.ncons)
        ).copy(),
    )


def realized_cells(state: CellInternalSearchState,
                   cfg: CellInternalEnsembleConfig,
                   cell_mask: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Per-lane realized cells ``expm(L(s)/factor) @ cell0``."""
    cell_of, _ = _cell_map(cfg, cell_mask)
    return jax.vmap(cell_of)(state.s, state.cell0)


def _recompute_q_gq(state, merged, cfg, cell_mask):
    """(q, gq) of every lane in the (possibly grown) masked layout at
    the lane's realized cell. q continuity re-bases at principal
    values — safe, all later differences are dihedral-wrapped."""
    eng = merged._get_engine()
    n = cfg.natoms
    cells = realized_cells(state, cfg, cell_mask)
    batch_q = jax.vmap(
        lambda x, c: eng._calc_impl(x.reshape(n, 3), c)
    )
    batch_B = jax.vmap(
        lambda x, c: eng._jac_impl(x.reshape(n, 3), c)
    )
    q = batch_q(state.x, cells)
    Bm = batch_B(state.x, cells) * state.qact.astype(
        state.x.dtype)[:, :, None]
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, state.g))
    return q, gq


def repave_cell_internal_lanes(
    state: CellInternalSearchState, ints,
    cfg: CellInternalEnsembleConfig, bad,
    cell_mask: Optional[np.ndarray] = None, atol_deg: float = 0.5,
):
    """Rebuild the topology of every ``bad`` lane from its CURRENT
    geometry at its CURRENT realized cell and keep it converging
    in-place — the combined-tier analogue of the internal tier's
    :func:`~sella_tpu.parallel.ensemble_internal.repave_lanes`
    (reference: the driver applies the bad-internal rebuild to every
    PES class, ``optimize.py:384-410``; the cell classes inherit
    ``update_internals`` through ``InternalPES``,
    ``peswrapper.py:1129-1174``).

    Mechanics mirror the internal tier: per-lane rediscovery (at the
    lane's cell — periodic image offsets are integers in the lane's
    ``cell0`` basis, which the smooth ``expm`` deformation preserves),
    union-layout merge, per-lane ``qact`` rows, Hessian transfer of
    the q-block through Cartesian space with the curvilinear
    corrections. The z-space extras:

    * the cell block ``H[ss]`` is parameterization-invariant under a
      topology change and is carried over untouched;
    * the cross block transfers through Cartesian space linearly,
      ``H'[qs] = Bn^{+T} (Bo^T H[qs])`` (the ``dB/ds`` curvature term
      is dropped — quasi-Newton secants repair it, same as the
      sequential tier's transfer which only corrects the q-block).

    Fixed internal coordinates survive (the rebuild folds ``ints.cons``
    back into the lane topology); dummy-atom topologies are rejected at
    tier construction. Returns ``(state', ints', cfg', repaved_mask)``;
    rebuild the step function (and re-shard, if under a mesh) whenever
    ``cfg'.nint`` grew.
    """
    from .ensemble_internal import (
        _layout_offsets,
        _membership_rows,
        _old_to_new_map,
        merge_novel_internals,
        rebuild_internals_at,
    )

    bad = np.asarray(bad).copy()
    lanes = np.where(bad)[0]
    if lanes.size == 0:
        return state, ints, cfg, bad

    n = cfg.natoms
    nint_old = cfg.nint
    xs = np.asarray(state.x)
    cells = np.asarray(realized_cells(state, cfg, cell_mask))
    rebuilt = {
        int(l): rebuild_internals_at(ints, xs[l].reshape(n, 3),
                                     cell=cells[l])
        for l in lanes
    }
    merged = ints
    for r in rebuilt.values():
        merged, _ = merge_novel_internals(merged, r)
    nint_new = merged.nint
    cfg_new = (cfg._replace(nint=nint_new)
               if nint_new != cfg.nint else cfg)

    # scatter every lane's old state into the new z layout: q rows move
    # by the rigid block shifts, the trailing cell rows just translate
    mp = _old_to_new_map(ints, merged)
    mz = np.concatenate([mp, nint_new + np.arange(cfg.ncell)])
    Bsz = xs.shape[0]
    qact = np.zeros((Bsz, nint_new), bool)
    qact[:, mp] = np.asarray(state.qact)
    nz_new = nint_new + cfg.ncell
    H = np.zeros((Bsz, nz_new, nz_new),
                 dtype=np.asarray(state.H).dtype)
    H[:, mz[:, None], mz[None, :]] = np.asarray(state.H)
    novel = np.ones(nint_new, bool)
    novel[mp] = False
    if novel.any():
        hg = np.diag(merged.guess_hessian())
        H[:, np.where(novel)[0], np.where(novel)[0]] = (
            hg[novel][None, :]
        )

    eng_old = ints._get_engine()
    eng_new = merged._get_engine()
    qact_old = np.asarray(state.qact)
    gq_old_all = np.asarray(state.gq)
    H_old_all = np.asarray(state.H)

    for l in lanes:
        lane = rebuilt[int(l)]
        pos = xs[l].reshape(n, 3)
        cell_l = jnp.asarray(cells[l])
        rows_new = _membership_rows(merged, lane)
        Bfull = np.asarray(eng_new._jac_impl(pos, cell_l))
        Bn = Bfull * rows_new[:, None]
        sv = np.linalg.svd(Bn, compute_uv=False)
        if int(np.sum(sv > 1e-8 * max(sv[0], 1e-300))) < cfg.nred:
            # rebuilt set too sparse: augment with previously active
            # rows, EXCLUDING the near-singular angles that triggered
            # the event
            off_b, off_a, off_d, _, _ = _layout_offsets(merged)
            qv = np.asarray(eng_new._calc_impl(pos, cell_l))
            atol = np.radians(atol_deg)
            sing = np.zeros(nint_new, bool)
            sing[off_a:off_d] = (qv[off_a:off_d] < atol) | (
                qv[off_a:off_d] > np.pi - atol
            )
            rows_new = rows_new | (qact[l] & ~sing)
            Bn = Bfull * rows_new[:, None]
            sv = np.linalg.svd(Bn, compute_uv=False)
            if int(np.sum(sv > 1e-8 * max(sv[0], 1e-300))) < cfg.nred:
                bad[l] = False      # cannot repave this lane
                continue
        # Hessian transfer through Cartesian space (q-block, exact
        # curvilinear formula; cross block linear; cell block carried)
        Bo = (np.asarray(eng_old._jac_impl(pos, cell_l))
              * qact_old[l][:, None])
        gq_o = gq_old_all[l]
        g_cart = gq_o @ Bo
        Binv = np.linalg.pinv(Bn)
        gq_n = g_cart @ Binv
        hld_o = np.asarray(
            eng_old._hldot_impl(pos, cell_l, jnp.asarray(gq_o))
        )
        hld_n = np.asarray(
            eng_new._hldot_impl(pos, cell_l, jnp.asarray(gq_n))
        )
        Hqq_o = H_old_all[l, :nint_old, :nint_old]
        Hqs_o = H_old_all[l, :nint_old, nint_old:]
        Hcart = Bo.T @ Hqq_o @ Bo + hld_o
        H[int(l), :nint_new, :nint_new] = Binv.T @ (Hcart - hld_n) @ Binv
        Hqs_n = Binv.T @ (Bo.T @ Hqs_o)
        H[int(l), :nint_new, nint_new:] = Hqs_n
        H[int(l), nint_new:, :nint_new] = Hqs_n.T
        qact[int(l)] = rows_new

    state = state._replace(
        H=jnp.asarray(H), qact=jnp.asarray(qact),
        # constraint rows ride the rigid block shifts of the union
        qcons=jnp.asarray(mp, jnp.int32)[state.qcons],
    )
    q, gq = _recompute_q_gq(state, merged, cfg_new, cell_mask)
    state = state._replace(q=q, gq=gq)
    return state, merged, cfg_new, bad


def niggli_rebase_cell_internal_lanes(
    state: CellInternalSearchState, ints,
    cfg: CellInternalEnsembleConfig,
    cell_mask: Optional[np.ndarray] = None,
    angle_threshold: float = 30.0,
    potential=None,
    pbc: Optional[np.ndarray] = None,
):
    """Per-lane cell rebase for the batched internal+cell tier — the
    combined-tier analogue of
    :func:`~sella_tpu.parallel.ensemble_cell.niggli_rebase_cell_lanes`
    (reference trigger ``optimize.py:437-440``, transform
    ``peswrapper.py:151-211, 1521-1567``).

    For every unconverged lane whose realized cell has an angle more
    than ``angle_threshold`` degrees from 90:

    1. reduce the lattice basis (same lattice, compact rows;
       ``new_cell = M @ cell`` with integer unimodular M),
    2. reset the lane's base cell to the reduced cell and zero its
       log-deformation params (positions untouched — the chart change
       stays exact, see the cell-tier production note),
    3. REMAP the lane's periodic image offsets: an entry with offset
       ``nc`` in the old basis describes the same physical vector as
       ``nc @ M^{-1}`` in the new basis. Remapped entries are merged
       into the shared union layout as (possibly novel) rows and the
       lane's ``qact`` flips to exactly the remapped set — the same
       union mechanics as a repave, so other lanes are untouched,
    4. transform the Hessian: q rows/cols permute to their remapped
       positions; the cell block (and cross columns) transform by
       ``T = J_old^{-1} (M^{-1} ⊗ I) J_new`` (exact chain rule — the
       reference drops the ``M^{-1}`` factor; see
       tests/test_cell_niggli_batched.py).

    Constraints on coordinates with nonzero image offsets are remapped
    per lane by the same ``nc @ M^{-1}`` transform as the coordinate
    rows (their member rows live in the per-lane ``state.qcons``).
    With ``potential`` given, (f, g, gs) of the rebased lanes are
    re-evaluated (same physical point; the cell gradient's
    parameterization changed). Returns
    ``(state', ints', cfg', rebased_mask)``; rebuild the step function
    whenever ``cfg'.nint`` grew (no growth -> no recompile).
    """
    from types import SimpleNamespace

    from ..coords import topology as topo_mod
    from ..pes.cell import _cell_param_jacobian
    from ..utils.lattice import reduce_cell_basis
    from .ensemble_internal import (
        _layout_offsets,
        _old_to_new_map,
        merge_novel_internals,
    )

    # Constraints pinned to nonzero periodic image offsets are
    # remapped per lane exactly like the coordinate rows (nc @ M^{-1})
    # — their member rows live in ``state.qcons`` (per-lane data), so
    # lane A's rebase leaves lane B's constraint rows untouched.
    # (Round 4: this replaced a NotImplementedError guard; the
    # reference applies Niggli to every PES unconditionally,
    # ``optimize.py:437-440``.)
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    if pbc is None:
        periodic_axes = (0, 1, 2)
    else:
        pbc = np.asarray(pbc, dtype=bool)
        periodic_axes = tuple(i for i in range(3) if pbc[i])
    axis_pairs = [
        (i, j) for ai, i in enumerate(periodic_axes)
        for j in periodic_axes[ai + 1:]
    ]
    midx = np.where(np.asarray(cell_mask, bool).ravel())[0]
    factor = (cfg.exp_cell_factor if cfg.exp_cell_factor > 0
              else float(cfg.natoms))
    nint_old = cfg.nint

    def _angle_dev(cell):
        norms = np.linalg.norm(cell, axis=1)
        if np.any(norms[list(periodic_axes)] < 1e-10):
            return None              # degenerate row: skip, don't NaN
        devs = [0.0]
        for i, j in axis_pairs:
            c = cell[i] @ cell[j] / (norms[i] * norms[j])
            devs.append(
                abs(np.degrees(np.arccos(np.clip(c, -1, 1))) - 90.0)
            )
        return max(devs)

    ss = np.asarray(state.s).copy()
    c0 = np.asarray(state.cell0).copy()
    conv = np.asarray(state.converged)
    cells = np.asarray(realized_cells(state, cfg, cell_mask))
    Bsz = ss.shape[0]
    rebased = np.zeros(Bsz, bool)
    qact_old = np.asarray(state.qact)
    off_b, off_a, off_d, off_o, _ = _layout_offsets(ints)

    # -- pass 1: decide per-lane rebases, build remapped topologies ----
    plans = {}
    for lane in range(Bsz):
        if conv[lane]:
            continue
        cell = cells[lane]
        dev = _angle_dev(cell)
        if dev is None or dev <= angle_threshold:
            continue
        new_cell, M = reduce_cell_basis(cell, pbc=pbc)
        new_dev = _angle_dev(new_cell)
        if new_dev is None or new_dev >= dev - 1e-9:
            continue                     # reduction gained nothing
        Minv = np.rint(np.linalg.inv(M)).astype(np.int64)
        assert np.array_equal(M @ Minv, np.eye(3, dtype=np.int64))
        # remapped topology of the lane's ACTIVE rows; records the
        # old-row -> key pairing for the Hessian permutation below
        lane_topo = SimpleNamespace(bonds=[], angles=[], dihedrals=[])
        src_rows, keys = [], []
        for m, (i, j, nc) in enumerate(ints.bonds):
            r = off_b + m
            if not qact_old[lane, r]:
                continue
            nc2 = np.asarray(nc, np.int64) @ Minv
            lane_topo.bonds.append((i, j, nc2))
            src_rows.append(r)
            keys.append(("b", topo_mod._bond_key(i, j, nc2)))
        for m, (i, j, k, ncvs) in enumerate(ints.angles):
            r = off_a + m
            if not qact_old[lane, r]:
                continue
            nc2 = np.asarray(ncvs, np.int64) @ Minv
            lane_topo.angles.append((i, j, k, nc2))
            src_rows.append(r)
            keys.append(("a", topo_mod._angle_key(i, j, k, nc2)))
        for m, (i, j, k, l2, ncvs) in enumerate(ints.dihedrals):
            r = off_d + m
            if not qact_old[lane, r]:
                continue
            nc2 = np.asarray(ncvs, np.int64) @ Minv
            lane_topo.dihedrals.append((i, j, k, l2, nc2))
            src_rows.append(r)
            keys.append(("d", topo_mod._dihedral_key(i, j, k, l2, nc2)))
        plans[lane] = (new_cell, M, lane_topo, src_rows, keys)
        rebased[lane] = True

    if not rebased.any():
        return state, ints, cfg, jnp.asarray(rebased)

    merged = ints
    for (_, _, lane_topo, _, _) in plans.values():
        merged, _ = merge_novel_internals(merged, lane_topo)
    nint_new = merged.nint
    cfg_new = (cfg._replace(nint=nint_new)
               if nint_new != cfg.nint else cfg)

    # merged-layout key -> row index
    offs = _layout_offsets(merged)
    key_pos = {}
    for m, (i, j, nc) in enumerate(merged.bonds):
        key_pos[("b", topo_mod._bond_key(i, j, nc))] = offs[0] + m
    for m, (i, j, k, ncvs) in enumerate(merged.angles):
        key_pos[("a", topo_mod._angle_key(i, j, k, ncvs))] = offs[1] + m
    for m, (i, j, k, l2, ncvs) in enumerate(merged.dihedrals):
        key_pos[("d", topo_mod._dihedral_key(i, j, k, l2, ncvs))] = (
            offs[2] + m
        )

    # scatter every lane into the new z layout (rigid block shifts)
    mp = _old_to_new_map(ints, merged)
    qcons_new = mp[np.asarray(state.qcons, np.int64)]
    mz = np.concatenate([mp, nint_new + np.arange(cfg.ncell)])
    qact = np.zeros((Bsz, nint_new), bool)
    qact[:, mp] = qact_old
    nz_new = nint_new + cfg.ncell
    H = np.zeros((Bsz, nz_new, nz_new),
                 dtype=np.asarray(state.H).dtype)
    H[:, mz[:, None], mz[None, :]] = np.asarray(state.H)
    novel = np.ones(nint_new, bool)
    novel[mp] = False
    if novel.any():
        hg = np.diag(merged.guess_hessian())
        H[:, np.where(novel)[0], np.where(novel)[0]] = (
            hg[novel][None, :]
        )
    H_old_all = np.asarray(state.H)

    for lane, (new_cell, M, lane_topo, src_rows, keys) in plans.items():
        # source rows: always-active trans/other/rotation rows keep
        # their (shifted) positions; remapped rows go to their keys
        src = np.concatenate([
            np.arange(off_b),                      # translations
            np.arange(off_o, nint_old),            # others + rotations
            np.asarray(src_rows, np.int64),
        ]).astype(np.int64)
        tgt = np.concatenate([
            mp[:off_b],
            mp[off_o:nint_old],
            np.asarray([key_pos[k] for k in keys], np.int64),
        ]).astype(np.int64)
        assert len(np.unique(tgt)) == len(tgt)

        L = np.zeros(9)
        L[midx] = ss[lane]
        L = L.reshape(3, 3)
        J_old = _cell_param_jacobian(L, c0[lane], factor)
        J_new = _cell_param_jacobian(np.zeros((3, 3)), new_cell,
                                     factor)
        K = np.kron(np.linalg.inv(M), np.eye(3))
        T = np.linalg.solve(J_old, K @ J_new)[np.ix_(midx, midx)]

        Hl = np.zeros((nz_new, nz_new), H.dtype)
        hg = np.diag(merged.guess_hessian())
        Hl[:nint_new, :nint_new] = np.diag(hg)
        Hqq_o = H_old_all[lane, :nint_old, :nint_old]
        Hqs_o = H_old_all[lane, :nint_old, nint_old:]
        Hss_o = H_old_all[lane, nint_old:, nint_old:]
        Hl[tgt[:, None], tgt[None, :]] = Hqq_o[src[:, None],
                                               src[None, :]]
        cross = Hqs_o[src] @ T
        Hl[tgt, nint_new:] = cross
        Hl[nint_new:, tgt] = cross.T
        Hl[nint_new:, nint_new:] = T.T @ Hss_o @ T
        H[lane] = Hl

        qact[lane] = False
        qact[lane, tgt] = True
        ss[lane] = 0.0
        c0[lane] = new_cell
        # constraint member rows follow the same remap as their
        # coordinates (active rows are all in src by construction)
        rowmap = dict(zip(src.tolist(), tgt.tolist()))
        qcons_new[lane] = [
            rowmap[int(r)]
            for r in np.asarray(state.qcons[lane], np.int64)
        ]

    state = state._replace(
        s=jnp.asarray(ss), cell0=jnp.asarray(c0),
        H=jnp.asarray(H), qact=jnp.asarray(qact),
        qcons=jnp.asarray(qcons_new, jnp.int32),
    )
    q, gq = _recompute_q_gq(state, merged, cfg_new, cell_mask)
    state = state._replace(q=q, gq=gq)
    if potential is not None:
        state = refresh_cell_internal(
            state, potential, merged, cfg_new, None,
            cell_mask=cell_mask, mask=jnp.asarray(rebased),
        )
    return state, merged, cfg_new, jnp.asarray(rebased)


def run_cell_internal_ensemble(
    potential, ints, x0: jnp.ndarray, cfg: CellInternalEnsembleConfig,
    cell0, cell_mask: Optional[np.ndarray] = None,
    s0: Optional[jnp.ndarray] = None, max_steps: int = 100,
    mesh=None, seed: int = 0, steps_per_call: int = 1,
    repave: bool = False, repave_atol_deg: float = 0.5,
    max_repaves_per_lane: int = 2,
    niggli: bool = False, niggli_threshold: float = 30.0,
    pbc: Optional[np.ndarray] = None,
):
    """Host loop driving the jitted batched internal+cell step.

    ``repave=True`` enables per-lane bad-internal recovery
    (:func:`repave_cell_internal_lanes`) and ``niggli=True`` enables
    per-lane cell rebases (:func:`niggli_rebase_cell_internal_lanes`)
    between jitted calls — the combined-tier analogues of the
    reference driver's universal bad-internal/Niggli events
    (``optimize.py:384-410, 437-440``). When the union layout grows,
    the step function is rebuilt (one recompile per growth event) and
    sharding is re-applied. With either flag the return value is
    ``(state, ints)`` — the final topology is needed to interpret
    ``state.q``.
    """
    def _make_multi(step_fn):
        def multi_step(state, key):
            def body(i, st):
                return step_fn(st, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, steps_per_call, body, state)

        return jax.jit(multi_step, donate_argnums=0)

    state = init_cell_internal_state(potential, ints, x0, cfg, cell0,
                                     cell_mask, s0)

    def _shard(st):
        if mesh is None:
            return st
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree.map(
            lambda a: jax.device_put(
                a,
                NamedSharding(
                    mesh, _batch_pspec(a)
                ),
            ),
            st,
        )

    state = _shard(state)
    multi_jit = _make_multi(
        make_cell_internal_step_fn(potential, ints, cfg, cell0,
                                   cell_mask)
    )
    key = jax.random.PRNGKey(seed)
    n_calls = (max_steps + steps_per_call - 1) // steps_per_call
    nrepaves = np.zeros(state.x.shape[0], np.int64)
    for i in range(n_calls):
        if repave or niggli:
            nint_before = cfg.nint
            changed = False
            if repave:
                from .ensemble_internal import bad_internals_mask

                bad = np.array(
                    bad_internals_mask(state, ints, repave_atol_deg)
                )
                bad &= ~np.asarray(state.converged)
                bad &= nrepaves < max_repaves_per_lane
                if bad.any():
                    state, ints, cfg, _ = repave_cell_internal_lanes(
                        state, ints, cfg, bad, cell_mask,
                        atol_deg=repave_atol_deg,
                    )
                    nrepaves[bad] += 1      # count attempts, even failed
                    changed = True
            if niggli:
                state, ints, cfg, hit = (
                    niggli_rebase_cell_internal_lanes(
                        state, ints, cfg, cell_mask,
                        angle_threshold=niggli_threshold,
                        potential=potential, pbc=pbc,
                    )
                )
                changed = changed or bool(np.asarray(hit).any())
            if changed:
                if cfg.nint != nint_before:
                    multi_jit = _make_multi(
                        make_cell_internal_step_fn(
                            potential, ints, cfg, cell0, cell_mask
                        )
                    )
                state = _shard(state)
        state = multi_jit(state, jax.random.fold_in(key, i))
        if bool(jnp.all(state.converged)):
            break
    if repave or niggli:
        return state, ints
    return state


def refresh_cell_internal(
    state: CellInternalSearchState, potential, ints,
    cfg: CellInternalEnsembleConfig, cell0,
    cell_mask: Optional[np.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> CellInternalSearchState:
    """Recompute (f, g, gs, q, gq) for all lanes — call once after a
    refill; only ``mask`` lanes' neval counters advance. ``cell0`` is
    accepted for back-compat but unused (the base cell is per-lane
    state)."""
    del cell0
    engine = ints._get_engine()
    n = cfg.natoms
    cell_of, make_enthalpy = _cell_map(cfg, cell_mask)
    enthalpy = make_enthalpy(potential)
    cells = jax.vmap(cell_of)(state.s, state.cell0)
    f, (g, gs) = jax.vmap(
        jax.value_and_grad(enthalpy, argnums=(0, 1))
    )(state.x, state.s, state.cell0)
    if cfg.rigid_fragments:
        _, gs_corr = _rigid_maps(ints, cfg, cell_of)
        gs = gs + jax.vmap(gs_corr)(g, state.x, state.s, state.cell0)
    q = jax.vmap(lambda x, c: engine._calc_impl(x.reshape(n, 3), c))(
        state.x, cells
    )
    Bm = jax.vmap(lambda x, c: engine._jac_impl(x.reshape(n, 3), c))(
        state.x, cells
    )
    Bm = Bm * state.qact.astype(Bm.dtype)[:, :, None]
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, g))
    inc = 1 if mask is None else mask.astype(state.neval.dtype)
    return state._replace(f=f, g=g, gs=gs, q=q, gq=gq,
                          neval=state.neval + inc)


def run_cell_internal_ensemble_queue(
    potential, ints, x0_all: jnp.ndarray,
    cfg: CellInternalEnsembleConfig, cell0, batch: int,
    cell_mask: Optional[np.ndarray] = None,
    s0_all: Optional[jnp.ndarray] = None,
    max_steps_per_search: int = 200, refill_every: int = 10,
    seed: int = 0,
):
    """Work-queue compaction for the internal+cell tier (mirror of
    ``ensemble.run_ensemble_queue``). Returns per-input dicts
    ``{x, s, f, nsteps, converged}`` in input order."""
    x0_all = jnp.asarray(x0_all)
    total = x0_all.shape[0]
    dtype = x0_all.dtype
    if s0_all is None:
        s0_all = jnp.zeros((total, cfg.ncell), dtype)
    else:
        s0_all = jnp.asarray(s0_all, dtype)
    cell0_j = jnp.asarray(cell0, dtype)

    step = jax.jit(
        make_cell_internal_step_fn(potential, ints, cfg, cell0,
                                   cell_mask),
        donate_argnums=0,
    )

    state = init_cell_internal_state(
        potential, ints, x0_all[:batch], cfg, cell0, cell_mask,
        s0_all[:batch],
    )
    H0 = state.H[0]
    origin = np.arange(batch)
    next_idx = batch
    results: dict = {}
    key = jax.random.PRNGKey(seed)

    it = 0
    while len(results) < total:
        for _ in range(refill_every):
            state = step(state, jax.random.fold_in(key, it))
            it += 1

        conv = np.asarray(state.converged)
        nsteps = np.asarray(state.nsteps)
        done = conv | (nsteps >= max_steps_per_search)
        if not np.any(done):
            continue

        xs = np.asarray(state.x)
        ss = np.asarray(state.s)
        fs = np.asarray(state.f)
        for lane in np.where(done)[0]:
            oi = origin[lane]
            if oi >= 0 and oi not in results:
                results[oi] = dict(
                    x=xs[lane].copy(), s=ss[lane].copy(),
                    f=float(fs[lane]), nsteps=int(nsteps[lane]),
                    converged=bool(conv[lane]),
                )

        x_fill = jnp.asarray(xs)
        s_fill = jnp.asarray(ss)
        take = np.zeros(batch, dtype=bool)
        new_origin = origin.copy()
        for lane in np.where(done)[0]:
            if next_idx < total:
                x_fill = x_fill.at[lane].set(x0_all[next_idx])
                s_fill = s_fill.at[lane].set(s0_all[next_idx])
                take[lane] = True
                new_origin[lane] = next_idx
                next_idx += 1
            else:
                new_origin[lane] = -1
        take_j = jnp.asarray(take)
        tk = take_j[:, None]
        state = state._replace(
            x=jnp.where(tk, x_fill, state.x),
            s=jnp.where(tk, s_fill, state.s),
            H=jnp.where(take_j[:, None, None],
                        jnp.broadcast_to(H0[None], state.H.shape),
                        state.H),
            delta=jnp.where(take_j, jnp.asarray(cfg.delta0, dtype),
                            state.delta),
            rho=jnp.where(take_j, jnp.ones((), dtype), state.rho),
            converged=(
                ((jnp.asarray(done) | state.converged) & ~take_j)
                | jnp.asarray(new_origin < 0)
            ),
            nsteps=jnp.where(take_j, 0, state.nsteps),
            neval=jnp.where(take_j, 0, state.neval),
            # refilled lanes restart from the shared base cell and the
            # full shared topology
            cell0=jnp.where(take_j[:, None, None], cell0_j, state.cell0),
            qact=jnp.where(tk, True, state.qact),
        )
        if take.any():
            state = refresh_cell_internal(
                state, potential, ints, cfg, cell0, cell_mask, take_j
            )
        origin = new_origin

    return [results[i] for i in range(total)]
