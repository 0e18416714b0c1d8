"""Batched ensemble optimization of atoms + cell (variable-cell tier).

Extends the Cartesian batched tier with the coupled atom+cell DOF of
``CellCartesianPES`` (reference ``/root/reference/sella/peswrapper.py:
2376-2933``): each lane's DOF vector is ``z = [x_cart (3n), s (ncell)]``
where ``s`` holds the masked entries of the scaled log-deformation L
and ``cell = expm(L / factor) @ cell0`` — the enthalpy ``E + P V`` is
one differentiable jax scalar, so gradients (atom forces AND the full
stress -> cell-gradient pipeline) and exact Hessian-vector products for
the Davidson diagonalization all come from autodiff through
:func:`sella_tpu.ops.linalg.expm`, batched over the ensemble inside one
jitted XLA program.

Design notes (TPU-first):

* One reference cell ``cell0`` shared by every lane (the ensemble
  refines perturbations of one structure); per-lane cells differ
  through the per-lane ``s`` parameters, which are ordinary DOF.
* The rigid-mode projection is CONSTANT: under periodic boundary
  conditions only the 3 atom translations are free (rotations are not,
  the cell fixes orientation), and their generators do not depend on
  the geometry — the free basis is one host-side complete QR, reused
  by every lane and every step (no per-lane basis work at all).
* Convergence mirrors ``CellCartesianPES.converged``
  (``peswrapper.py:2867-2910``): max per-atom projected force < fmax
  AND max |dE/ds| < smax.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.linalg import expm
from .ensemble import (
    batch_pspec as _batch_pspec,
    _davidson_loop,
    _masked_ritz,
    prfo_prepare_batched,
    restricted_step_batched,
    ts_bfgs_update_batched,
)


class CellEnsembleConfig(NamedTuple):
    """Static (trace-time) configuration of a batched atom+cell search.

    ``ncell`` is the number of free cell parameters (the True count of
    the 3x3 ``cell_mask``); ``exp_cell_factor`` <= 0 means the
    reference default ``float(natoms)`` (``peswrapper.py:2442``)."""

    natoms: int
    ncell: int = 9
    order: int = 0
    nproj: int = 3                 # atom translations only (PBC)
    fmax: float = 1e-3
    smax: float = 0.0              # 0 -> use fmax (reference default)
    gamma: float = 0.1
    delta0: float = 0.1
    delta_min: float = 1e-4
    sigma_inc: float = 1.15
    sigma_dec: float = 0.65
    rho_inc: float = 1.035
    rho_dec: float = 5.0
    nsteps_per_diag: int = 3
    diag_every_n: int = 0
    davidson_max: int = 0
    rs_maxiter: int = 18
    rs_tol: float = 1e-8
    method: str = "prfo"
    rs: str = "tr"
    eig: bool = False              # minima by default (order=0)
    exp_cell_factor: float = 0.0
    scalar_pressure: float = 0.0
    absb: str = "eigh"             # TS-BFGS |B| metric: "eigh" or "ns"
    #   (Newton-Schulz matmuls; see ensemble.EnsembleConfig.absb)
    pred_min: float = 1e-14        # smallest trusted |predicted dE| in
    #   the ratio test (see ensemble.EnsembleConfig.pred_min)

    @property
    def dim(self) -> int:
        return 3 * self.natoms + self.ncell

    @property
    def nfree(self) -> int:
        return self.dim - self.nproj

    @property
    def subspace_max(self) -> int:
        m = self.nfree
        k = self.davidson_max if self.davidson_max > 0 else 2 * m + 1
        return min(m, k)


class CellSearchState(NamedTuple):
    """Per-search state; every leaf has a leading batch axis."""

    z: jnp.ndarray            # (B, 3n + ncell) positions + cell params
    f: jnp.ndarray            # (B,) enthalpy E + PV
    g: jnp.ndarray            # (B, 3n + ncell) gradient
    H: jnp.ndarray            # (B, dim, dim) quasi-Newton Hessian
    delta: jnp.ndarray
    rho: jnp.ndarray
    nsteps_since_diag: jnp.ndarray
    converged: jnp.ndarray
    nsteps: jnp.ndarray
    neval: jnp.ndarray
    nmatvec: jnp.ndarray
    cell0: jnp.ndarray        # (B, 3, 3) per-lane base cell — the
    #   log-deformation reference. Constant between rebase events;
    #   :func:`niggli_rebase_cell_lanes` replaces a skewed lane's base
    #   with a reduced lattice basis and zeroes its cell params (the
    #   batched analogue of the sequential ``maybe_niggli_reduce``,
    #   reference ``optimize.py:437-440`` + ``peswrapper.py:2511-2555``)


def _const_free_basis(natoms: int, ncell: int, nproj: int) -> np.ndarray:
    """Orthonormal complement of the (constant) translation generators:
    (dim, dim - nproj), shared by all lanes and steps."""
    dim = 3 * natoms + ncell
    if nproj == 0:
        return np.eye(dim)
    if nproj != 3:
        raise ValueError("cell tier supports nproj in (0, 3)")
    T = np.zeros((dim, 3))
    for a in range(3):
        T[np.arange(natoms) * 3 + a, a] = 1.0 / np.sqrt(natoms)
    Q = np.linalg.qr(T, mode="complete")[0]
    return Q[:, 3:]


def make_ext_energy_c0(potential, cfg: CellEnsembleConfig,
                       cell_mask: np.ndarray):
    """The differentiable extended objective (z, cell0) -> E + PV with
    the base cell as a per-call argument: each lane carries its OWN
    base cell (``CellSearchState.cell0``), which is what makes the
    per-lane Niggli rebase (:func:`niggli_rebase_cell_lanes`) and
    heterogeneous base cells possible inside one compiled program.
    Gradients w.r.t. z give forces and the cell gradient simultaneously
    — the TPU-native collapse of ``peswrapper.py:2752-2819``."""
    if not getattr(potential, "has_stress", True):
        raise ValueError(
            "this host potential has no stress source: cell DOF "
            "derivatives would be silently wrong. Construct the "
            "HostBatchedCalculator with stress_func=... (Voigt virial "
            "stress per lane) to drive the batched cell tiers."
        )
    nr3 = 3 * cfg.natoms
    factor = (cfg.exp_cell_factor if cfg.exp_cell_factor > 0
              else float(cfg.natoms))
    mask_flat = jnp.asarray(np.where(np.asarray(
        cell_mask, dtype=bool).ravel())[0])
    if mask_flat.shape[0] != cfg.ncell:
        raise ValueError(
            f"cell_mask has {mask_flat.shape[0]} free entries, "
            f"cfg.ncell={cfg.ncell}"
        )
    pressure = cfg.scalar_pressure

    def cell_of(s, cell0):
        L = jnp.zeros(9, s.dtype).at[mask_flat].set(s).reshape(3, 3)
        return expm(L / factor) @ cell0

    def ext_energy(z, cell0):
        x, s = z[:nr3], z[nr3:]
        cell = cell_of(s, cell0)
        e = potential.energy(x, cell)
        if pressure != 0.0:
            e = e + pressure * jnp.abs(jnp.linalg.det(cell))
        return e

    return ext_energy, cell_of


def make_ext_energy(potential, cfg: CellEnsembleConfig,
                    cell0: jnp.ndarray, cell_mask: np.ndarray):
    """Back-compat wrapper of :func:`make_ext_energy_c0` with the base
    cell closed over (one shared base cell)."""
    e2, c2 = make_ext_energy_c0(potential, cfg, cell_mask)
    cell0 = jnp.asarray(cell0)
    return (lambda z: e2(z, cell0)), (lambda s: c2(s, cell0))


def make_cell_step_fn(potential, cfg: CellEnsembleConfig,
                      cell0=None, cell_mask: Optional[np.ndarray] = None):
    """Build the jittable batched atom+cell RS-(P-)RFO step.

    ``cell0`` is accepted for back-compat but unused: since the
    per-lane Niggli rebase, the base cell lives in the state
    (``CellSearchState.cell0``), so one compiled step serves every
    (possibly per-lane-rebased) base cell without recompiling."""
    del cell0
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    ext_energy, _ = make_ext_energy_c0(potential, cfg, cell_mask)
    nr3 = 3 * cfg.natoms
    n = cfg.natoms

    batch_eval = jax.vmap(jax.value_and_grad(ext_energy, argnums=0))

    def batch_hvp(z, u, c0):
        def one(z1, u1, c01):
            return jax.jvp(
                lambda zz: jax.grad(ext_energy)(zz, c01), (z1,), (u1,)
            )[1]

        return jax.vmap(one)(z, u, c0)

    Ufree_np = _const_free_basis(cfg.natoms, cfg.ncell, cfg.nproj)
    Ufree = jnp.asarray(Ufree_np)               # (dim, nfree) constant
    smax = cfg.smax if cfg.smax > 0 else cfg.fmax
    K = cfg.subspace_max

    def to_free(v):                              # (B, dim) -> (B, nfree)
        return v @ Ufree

    def to_full(v):                              # (B, nfree) -> (B, dim)
        return v @ Ufree.T

    def davidson_absorb(z, g, H, active, key, c0):
        """Batched Davidson with exact extended-objective HVPs; every
        probe absorbed into H (TS-BFGS, ``peswrapper.py:508-556``)."""

        def hvp_free(v_free):
            u = to_full(v_free)
            w = batch_hvp(z, u, c0)
            return to_free(w), w

        P = jnp.einsum("ij,bjk,kl->bil", Ufree.T, H, Ufree)
        v0 = to_free(g)

        V, AVp, YF, k = _davidson_loop(
            hvp_free, P, v0, cfg.gamma, K, active, key
        )
        lams, W, colmask = _masked_ritz(V, AVp, k, K)
        Vr = jnp.einsum("bik,bkl->bil", V, W)
        YFr = jnp.einsum("bik,bkl->bil", YF, W)
        S_full = jnp.einsum("ij,bjk->bik", Ufree, Vr)
        H_new = ts_bfgs_update_batched(H, S_full, YFr, colmask,
                                       absb=getattr(cfg, 'absb', 'eigh'))
        return jnp.where(active[:, None, None], H_new, H), k

    def step(state: CellSearchState, key) -> CellSearchState:
        Bsz = state.z.shape[0]
        act = ~state.converged

        g_free = to_free(state.g)
        Hproj = jnp.einsum("ij,bjk,kl->bil", Ufree.T, state.H, Ufree)
        prep = prfo_prepare_batched(g_free, Hproj, cfg.order)

        # ---- diag scheduling (saddles only) ----
        if cfg.eig and cfg.order > 0:
            lams_proj = prep[0]
            too_few = jnp.any(lams_proj[:, : cfg.order] > 0, axis=1)
            too_many = (
                lams_proj[:, cfg.order] < 0
                if cfg.order < cfg.nfree
                else jnp.zeros(Bsz, bool)
            )
            ev = act & (state.nsteps_since_diag >= cfg.nsteps_per_diag) & (
                too_few | too_many
            )
            ev = ev | (act & (state.nsteps == 0))
        else:
            ev = jnp.zeros(Bsz, bool)
        if cfg.diag_every_n > 0:
            ev = ev | (act & (state.nsteps_since_diag >= cfg.diag_every_n))

        def run_diag(_):
            return davidson_absorb(
                state.z, state.g, state.H, ev,
                jax.random.fold_in(key, 0), state.cell0,
            )

        def skip_diag(_):
            return state.H, jnp.zeros(Bsz, state.nsteps.dtype)

        H1, k_diag = jax.lax.cond(jnp.any(ev), run_diag, skip_diag, None)
        nmv = state.nmatvec + jnp.where(ev, k_diag, 0)
        nsd = jnp.where(ev, 0, state.nsteps_since_diag + 1)

        # ---- trust-region step ----
        Hproj1 = jnp.einsum("ij,bjk,kl->bil", Ufree.T, H1, Ufree)
        prep1 = prfo_prepare_batched(g_free, Hproj1, cfg.order)
        Ufree_b = jnp.broadcast_to(
            Ufree[None], (Bsz,) + Ufree.shape
        )
        dz, smag = restricted_step_batched(
            g_free, Hproj1, Ufree_b, state.delta, cfg, prep=prep1
        )
        dz = jnp.where(act[:, None], dz, 0.0)

        z_new = state.z + dz
        f_new, g_new = batch_eval(z_new, state.cell0)
        neval = state.neval + act.astype(jnp.int32)

        # ---- trust ratio ----
        df_pred = jnp.einsum("bi,bi->b", state.g, dz) + 0.5 * jnp.einsum(
            "bi,bij,bj->b", dz, H1, dz
        )
        df_actual = f_new - state.f
        pred_ok = jnp.abs(df_pred) > cfg.pred_min
        ratio = jnp.where(
            pred_ok, df_actual / jnp.where(pred_ok, df_pred, 1.0), 1.0
        )

        # ---- quasi-Newton update with the realized secant ----
        dg = g_new - state.g
        m1 = (jnp.linalg.norm(dz, axis=1) > 1e-10)[:, None]
        H2 = ts_bfgs_update_batched(
            H1, dz[:, :, None], dg[:, :, None], m1 & act[:, None],
            absb=getattr(cfg, 'absb', 'eigh'),
        )
        H2 = jnp.where((act & m1[:, 0])[:, None, None], H2, H1)

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

        # ---- convergence (``peswrapper.py:2867-2910``) ----
        gp = to_full(to_free(g_new))
        fmax_now = jnp.max(
            jnp.linalg.norm(gp[:, :nr3].reshape(Bsz, n, 3), axis=2),
            axis=1,
        )
        smax_now = (
            jnp.max(jnp.abs(g_new[:, nr3:]), axis=1)
            if cfg.ncell else jnp.zeros(Bsz)
        )
        conv_new = state.converged | (
            act & (fmax_now < cfg.fmax) & (smax_now < smax)
        )

        return CellSearchState(
            z=jnp.where(act[:, None], z_new, state.z),
            f=jnp.where(act, f_new, state.f),
            g=jnp.where(act[:, None], g_new, state.g),
            H=H2,
            delta=delta_new,
            rho=jnp.where(act, ratio, state.rho),
            nsteps_since_diag=nsd,
            converged=conv_new,
            nsteps=state.nsteps + act.astype(jnp.int32),
            neval=neval,
            nmatvec=nmv,
            cell0=state.cell0,
        )

    return step


def init_cell_state(
    potential, x0: jnp.ndarray, cfg: CellEnsembleConfig, cell0,
    cell_mask: Optional[np.ndarray] = None,
    s0: Optional[jnp.ndarray] = None,
) -> CellSearchState:
    """Initialize the batched atom+cell state. ``x0`` is (B, 3n)
    Cartesian positions; ``s0`` optional (B, ncell) initial cell
    parameters (zeros = the reference cell). The initial Hessian is the
    reference's block-diagonal bootstrap: 70 eV/A^2 on the Cartesian
    block, identity on the cell block (``peswrapper.py:2470-2509``)."""
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    ext_energy, _ = make_ext_energy_c0(potential, cfg, cell_mask)
    x0 = jnp.asarray(x0)
    Bsz = x0.shape[0]
    dtype = x0.dtype
    if s0 is None:
        s0 = jnp.zeros((Bsz, cfg.ncell), dtype)
    z0 = jnp.concatenate([x0, jnp.asarray(s0, dtype)], axis=1)
    cell0 = jnp.asarray(cell0, dtype)
    if cell0.ndim == 2:                  # one shared base cell
        cell0 = jnp.broadcast_to(cell0[None], (Bsz, 3, 3))

    f, g = jax.vmap(jax.value_and_grad(ext_energy, argnums=0))(z0, cell0)

    H0 = np.zeros((cfg.dim, cfg.dim))
    H0[: 3 * cfg.natoms, : 3 * cfg.natoms] = 70.0 * np.eye(3 * cfg.natoms)
    H0[3 * cfg.natoms:, 3 * cfg.natoms:] = np.eye(cfg.ncell)
    return CellSearchState(
        z=z0,
        f=f,
        g=g,
        H=jnp.broadcast_to(
            jnp.asarray(H0, dtype)[None], (Bsz, cfg.dim, cfg.dim)
        ).copy(),
        delta=jnp.full((Bsz,), cfg.delta0, dtype),
        rho=jnp.ones((Bsz,), dtype),
        nsteps_since_diag=jnp.zeros(Bsz, jnp.int32),
        converged=jnp.zeros(Bsz, bool),
        nsteps=jnp.zeros(Bsz, jnp.int32),
        neval=jnp.ones(Bsz, jnp.int32),
        nmatvec=jnp.zeros(Bsz, jnp.int32),
        cell0=cell0,
    )


def cells_of(state: CellSearchState, cfg: CellEnsembleConfig, cell0=None,
             cell_mask: Optional[np.ndarray] = None) -> jnp.ndarray:
    """Per-lane 3x3 cells realized from the state's cell parameters.
    ``cell0`` is accepted for back-compat but ignored — the base cells
    live in ``state.cell0``."""
    del cell0
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    _, cell_of = make_ext_energy_c0(_NullPotential(), cfg, cell_mask)
    return jax.vmap(cell_of)(state.z[:, 3 * cfg.natoms:], state.cell0)


class _NullPotential:
    def energy(self, x, cell):
        return 0.0


def run_cell_ensemble(
    potential,
    x0: jnp.ndarray,
    cfg: CellEnsembleConfig,
    cell0,
    cell_mask: Optional[np.ndarray] = None,
    s0: Optional[jnp.ndarray] = None,
    max_steps: int = 100,
    mesh=None,
    seed: int = 0,
    steps_per_call: int = 1,
    niggli: bool = False,
    niggli_angle: float = 30.0,
    pbc: Optional[np.ndarray] = None,
) -> CellSearchState:
    """Host loop driving the jitted batched atom+cell step (mirror of
    :func:`sella_tpu.parallel.ensemble.run_ensemble`).

    ``niggli=True`` checks every lane's realized cell between jitted
    chunks and rebases skewed lanes onto a reduced lattice basis
    (:func:`niggli_rebase_cell_lanes`) — no recompilation, the base
    cell is per-lane state. ``pbc`` (per-axis bools) restricts the
    rebase to the periodic sub-basis for slabs/wires."""
    step = make_cell_step_fn(potential, cfg, cell0, cell_mask)

    def multi_step(state, key):
        def body(i, st):
            return step(st, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, steps_per_call, body, state)

    state = init_cell_state(potential, jnp.asarray(x0), cfg, cell0,
                            cell_mask, s0)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _shard(st):
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
    else:
        def _shard(st):
            return st

    multi_jit = jax.jit(multi_step, donate_argnums=0)
    key = jax.random.PRNGKey(seed)
    n_calls = (max_steps + steps_per_call - 1) // steps_per_call
    for i in range(n_calls):
        state = multi_jit(state, jax.random.fold_in(key, i))
        if bool(jnp.all(state.converged)):
            break
        if niggli:
            state, hit = niggli_rebase_cell_lanes(
                state, cfg, cell_mask, niggli_angle, potential, pbc=pbc
            )
            if hit.any():
                state = _shard(state)
    return state


def refill_converged_cell(
    state: CellSearchState, z_new: jnp.ndarray, avail: jnp.ndarray,
    cfg: CellEnsembleConfig,
):
    """Replace converged lanes with fresh starts (atom+cell work-queue
    compaction; mirror of ``ensemble.refill_converged``). ``z_new`` is
    (B, dim) = [x, s] replacement DOF vectors. Call
    :func:`refresh_cell` afterwards to fill (f, g)."""
    take = state.converged & avail
    tk = take[:, None]
    dtype = state.z.dtype
    H0 = np.zeros((cfg.dim, cfg.dim))
    H0[: 3 * cfg.natoms, : 3 * cfg.natoms] = 70.0 * np.eye(3 * cfg.natoms)
    H0[3 * cfg.natoms:, 3 * cfg.natoms:] = np.eye(cfg.ncell)
    H0 = jnp.asarray(H0, dtype)
    new_state = CellSearchState(
        z=jnp.where(tk, z_new, state.z),
        f=jnp.where(take, jnp.zeros_like(state.f), state.f),
        g=jnp.where(tk, jnp.zeros_like(state.g), state.g),
        H=jnp.where(take[:, None, None],
                    jnp.broadcast_to(H0[None], state.H.shape), state.H),
        delta=jnp.where(take, jnp.asarray(cfg.delta0, dtype), state.delta),
        rho=jnp.where(take, jnp.ones((), dtype), state.rho),
        nsteps_since_diag=jnp.where(take, 0, state.nsteps_since_diag),
        converged=jnp.where(take, False, state.converged),
        nsteps=jnp.where(take, 0, state.nsteps),
        neval=jnp.where(take, 0, state.neval),
        nmatvec=jnp.where(take, 0, state.nmatvec),
        cell0=state.cell0,
    )
    return new_state, take


def refresh_cell(state: CellSearchState, potential,
                 cfg: CellEnsembleConfig, cell0=None,
                 cell_mask: Optional[np.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None) -> CellSearchState:
    """Recompute (f, g) for all lanes — call once after refill; only
    ``mask`` lanes' neval counters advance. ``cell0`` is accepted for
    back-compat but ignored (base cells live in ``state.cell0``)."""
    del cell0
    if cell_mask is None:
        cell_mask = np.ones((3, 3), dtype=bool)
    ext_energy, _ = make_ext_energy_c0(potential, cfg, cell_mask)
    f, g = jax.vmap(jax.value_and_grad(ext_energy, argnums=0))(
        state.z, state.cell0
    )
    inc = 1 if mask is None else mask.astype(state.neval.dtype)
    return state._replace(f=f, g=g, neval=state.neval + inc)


def niggli_rebase_cell_lanes(
    state: CellSearchState, cfg: CellEnsembleConfig,
    cell_mask: Optional[np.ndarray] = None,
    angle_threshold: float = 30.0,
    potential=None,
    pbc: Optional[np.ndarray] = None,
):
    """Per-lane cell rebase for the batched atom+cell tier — the
    batched analogue of the sequential ``maybe_niggli_reduce``
    (``pes/cell.py``; reference driver trigger ``optimize.py:437-440``,
    transform ``peswrapper.py:151-211, 2511-2555``).

    Host-side event (call between jitted step chunks, like the
    internal tier's repave): for every unconverged lane whose realized
    cell has an angle more than ``angle_threshold`` degrees from 90,

    1. reduce the lattice basis (``utils.lattice.reduce_cell_basis``
       — same lattice, compact representation),
    2. reset the lane's base cell (``state.cell0``) to the reduced
       cell and its log-deformation params to zero (Cartesian
       positions stay untouched — see the in-body note),
    3. transform the Hessian cell blocks by
       ``T = J_old^{-1} (M^{-1} ⊗ I) J_new`` (parameterization
       Jacobians by autodiff through expm; the unimodular M maps
       same-lattice cell-matrix perturbations between the two
       representations).

    No recompile: the base cell is per-lane state, so the same
    compiled step keeps running. With ``potential`` given, (f, g) of
    the rebased lanes are re-evaluated (physically identical point —
    the fresh values only refresh the gradient's parameterization).

    With ``pbc`` given (per-axis bools), only angles BETWEEN periodic
    rows count as skew and the reduction never mixes a non-periodic
    axis (slab vacuum direction) into the periodic basis — the lattice
    change would not be physically equivalent otherwise. Lanes with a
    degenerate (near-zero) cell row are skipped, never NaN-classified.

    Returns ``(state', rebased_mask)``.
    """
    from ..pes.cell import _cell_param_jacobian
    from ..utils.lattice import reduce_cell_basis

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
    nr3 = 3 * cfg.natoms

    zs = np.asarray(state.z).copy()
    c0 = np.asarray(state.cell0).copy()
    H = np.asarray(state.H).copy()
    conv = np.asarray(state.converged)
    Bsz = zs.shape[0]
    rebased = np.zeros(Bsz, bool)

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

    from scipy.linalg import expm as _sexpm

    for lane in range(Bsz):
        if conv[lane]:
            continue
        L = np.zeros(9)
        L[midx] = zs[lane, nr3:]
        L = L.reshape(3, 3)
        cell = _sexpm(L / factor) @ c0[lane]
        dev = _angle_dev(cell)
        if dev is None or dev <= angle_threshold:
            continue
        new_cell, M = reduce_cell_basis(cell, pbc=pbc)
        new_dev = _angle_dev(new_cell)
        if new_dev is None or new_dev >= dev - 1e-9:
            continue                     # reduction gained nothing

        # Positions are NOT wrapped into the reduced cell (unlike the
        # sequential tier, which mirrors ASE's user-visible
        # convention): wrapping shifts atoms by lattice vectors, which
        # changes the "fixed Cartesian position under cell
        # perturbation" chart and makes the Hessian/gradient transform
        # below only approximate (measured O(1) error on wrapped
        # atoms' image terms). Leaving Cartesian positions untouched
        # keeps the chart change EXACT (pinned to 1e-14 in
        # tests/test_cell_niggli_batched.py); a PBC potential is
        # indifferent to atoms sitting outside the cell.

        # Hessian transform dL_old = T dL_new for the SAME physical
        # lattice perturbation: new-rep generators relate to old by
        # the unimodular M (new_cell = M @ cell), so equivalent cell-
        # matrix perturbations satisfy dC_old = M^{-1} dC_new, giving
        # T = J_old^{-1} (M^{-1} ⊗ I) J_new. NOTE the reference
        # (``peswrapper.py:151-211``) drops the M^{-1} factor — its
        # transform maps gradients/Hessians with O(1) error whenever
        # the reduction is nontrivial (verified numerically:
        # tests/test_cell_niggli_batched.py pins the exact chain rule
        # to 1e-14); this is a deliberate fix, not a port.
        J_old = _cell_param_jacobian(L, c0[lane], factor)
        J_new = _cell_param_jacobian(np.zeros((3, 3)), new_cell, factor)
        K = np.kron(np.linalg.inv(M), np.eye(3))
        T = np.linalg.solve(J_old, K @ J_new)[np.ix_(midx, midx)]
        H[lane, nr3:, nr3:] = T.T @ H[lane, nr3:, nr3:] @ T
        H[lane, :nr3, nr3:] = H[lane, :nr3, nr3:] @ T
        H[lane, nr3:, :nr3] = T.T @ H[lane, nr3:, :nr3]

        zs[lane, nr3:] = 0.0
        c0[lane] = new_cell
        rebased[lane] = True

    if not rebased.any():
        return state, rebased

    state = state._replace(
        z=jnp.asarray(zs), cell0=jnp.asarray(c0), H=jnp.asarray(H)
    )
    if potential is not None:
        state = refresh_cell(
            state, potential, cfg, cell_mask=cell_mask,
            mask=jnp.asarray(rebased),
        )
    return state, rebased


def run_cell_ensemble_queue(
    potential,
    x0_all: jnp.ndarray,
    cfg: CellEnsembleConfig,
    cell0,
    batch: int,
    cell_mask: Optional[np.ndarray] = None,
    s0_all: Optional[jnp.ndarray] = None,
    max_steps_per_search: int = 200,
    refill_every: int = 10,
    seed: int = 0,
):
    """Process an arbitrarily large set of atom+cell relaxations with a
    fixed device batch (convergence-mask compaction; mirror of
    ``ensemble.run_ensemble_queue``). Returns per-input result dicts
    ``{z, f, nsteps, converged}`` in input order."""
    from functools import partial as _partial

    x0_all = jnp.asarray(x0_all)
    total = x0_all.shape[0]
    dtype = x0_all.dtype
    if s0_all is None:
        s0_all = jnp.zeros((total, cfg.ncell), dtype)
    else:
        s0_all = jnp.asarray(s0_all, dtype)
    z_all = jnp.concatenate([x0_all, s0_all], axis=1)

    step = jax.jit(
        make_cell_step_fn(potential, cfg, cell0, cell_mask),
        donate_argnums=0,
    )
    refill = jax.jit(
        _partial(refill_converged_cell, cfg=cfg), donate_argnums=0
    )

    state = init_cell_state(
        potential, x0_all[:batch], cfg, cell0, cell_mask,
        s0_all[:batch],
    )
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

        zs = np.asarray(state.z)
        fs = np.asarray(state.f)
        for lane in np.where(done)[0]:
            oi = origin[lane]
            if oi >= 0 and oi not in results:
                results[oi] = dict(
                    z=zs[lane].copy(), f=float(fs[lane]),
                    nsteps=int(nsteps[lane]), converged=bool(conv[lane]),
                )

        # refill from the queue (timed-out lanes are retired too)
        z_fill = np.zeros((batch, cfg.dim), dtype=np.asarray(zs).dtype)
        avail = np.zeros(batch, dtype=bool)
        new_origin = origin.copy()
        for lane in np.where(done)[0]:
            if next_idx < total:
                z_fill[lane] = np.asarray(z_all[next_idx])
                avail[lane] = True
                new_origin[lane] = next_idx
                next_idx += 1
            else:
                new_origin[lane] = -1
        state = state._replace(
            converged=jnp.asarray(done) | state.converged
        )
        state, took = refill(
            state, jnp.asarray(z_fill), jnp.asarray(avail)
        )
        # lanes with no replacement idle as "converged"
        state = state._replace(
            converged=state.converged | jnp.asarray(new_origin < 0)
        )
        took_np = np.asarray(took)
        if took_np.any():
            state = refresh_cell(
                state, potential, cfg, cell0, cell_mask,
                jnp.asarray(took_np),
            )
        origin = new_origin

    return [results[i] for i in range(total)]
