"""Batched ensemble saddle search in redundant internal coordinates.

Extends the Cartesian batched tier (:mod:`sella_tpu.parallel.ensemble`)
with the machinery that gives the reference its convergence advantage on
molecules (``/root/reference/sella/internal.py:1209-2745``,
``peswrapper.py:749-880``): a Lindh-style guess Hessian, P-RFO steps
taken in the nonredundant internal subspace with the weighted
max-internal-step (`mis`) trust norm, and a masked Newton back-transform
realizing each internal step in Cartesian space — all inside ONE jitted
XLA program over the whole ensemble.

Design (TPU-first, not a port):

* ONE union topology layout, shared by every lane, with per-lane
  coordinate-activity rows (``state.qact``) masking each lane's
  effective topology inside it. Built host-side by
  :class:`~sella_tpu.coords.internals.Internals`; the compiled
  ``_Engine`` evaluates q/B/dB as pure jnp and vmaps over the batch.
  A lane whose coordinates go singular mid-run is *repaved* in-place
  (:func:`repave_lanes`): its topology is rebuilt from its current
  geometry, novel entries are appended to the union (one recompile
  per growth event), and its Hessian is transferred through Cartesian
  space — the batched analogue of the reference's bad-internal rebuild
  (``optimize.py:384-410``).
* The nonredundant subspace comes from one batched eigh of the Gram
  matrix G = B B^T per geometry: its top ``3 natoms - nproj``
  eigenvectors span range(B) with a STATIC width (replacing the
  reference's rank-revealing QR of B, ``peswrapper.py:674-736``), and
  the same eigendecomposition provides every pseudo-inverse application
  (B^+ r = B^T G^+ r).
* Rigid modes never appear: internal coordinates are translation/
  rotation invariant, so the q-space needs no projection machinery.
* The Davidson operator is the exact internal-coordinate Lagrangian
  Hessian action W v = G^+ B (H_x u - dB[u]^T g_q), u = B^T G^+ v —
  one potential HVP plus one Jacobian-JVP per matvec, never a dense
  Hessian (the curvilinear correction term is the reference's
  ``peswrapper.py:1011-1031`` get_Hc, evaluated matrix-free).
* ``set_x`` is a masked Newton iteration on q(x) = q_target with
  dihedral residuals wrapped into (-pi, pi] and best-iterate tracking
  (the reference's Newton fast path, ``peswrapper.py:749-839``). Lanes
  whose Newton residual stays above ``newton_accept`` re-run from a
  fixed-substep RK4 geodesic initializer — the reference's ODE fallback
  (``peswrapper.py:841-880, 1200-1221``) with LSODA's adaptivity
  replaced by a static substep count — followed by a Newton polish;
  the whole fallback branch executes under ``lax.cond`` only when some
  lane actually needs it, so well-conditioned steps pay nothing.
* Dummy atoms and fixed internal coordinates (reference
  ``internal.py:3483-3573`` dummies, ``internal.py:2748-3030``
  constraints) ARE supported, because both reduce to *linear*
  constraints in q-space when each constrained coordinate is a member
  of the q-vector: the constrained free subspace is a static-width
  complete-QR split of range(B) against the constrained rows of U, the
  Lagrangian curvature correction reduces to zeroing the constrained
  components of g_q inside the dB[u]^T g_q term (the constraints have
  no q-space curvature), and constraint restoration is free — the
  Newton back-transform simply pins the constrained components of
  q_target to their targets (the reference's manifold projection,
  ``peswrapper.py:928-994``, collapses into the same Newton solve).
  Dummy atoms extend the DOF vector; the potential sees only the real
  atoms (dummy forces are identically zero, as in the reference where
  dummies are spectators held by their constrained bond + angle).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sella_tpu.ops.linalg import batched_eigh

from .ensemble import (
    batch_pspec as _batch_pspec,
    _davidson_loop,
    _masked_ritz,
    free_basis,
    prfo_prepare_batched,
    restricted_step_batched,
    ts_bfgs_update_batched,
)


class InternalEnsembleConfig(NamedTuple):
    """Static (trace-time) configuration of a batched internal search.

    ``natoms`` counts REAL atoms; ``ndummies`` extends the DOF vector
    with dummy-atom coordinates (linear-center dummies from
    :class:`Internals`); ``ncons`` is the number of fixed internal
    coordinates (dummy bond/angle constraints plus any user
    ``fix_bond``/``fix_angle``/... that maps onto a q-vector member).
    """

    natoms: int
    nint: int                      # number of internal coordinates
    order: int = 1
    nproj: int = 6                 # rigid modes absent from range(B)
    ndummies: int = 0              # dummy atoms appended to the DOF
    ncons: int = 0                 # fixed internal coordinates
    fmax: float = 1e-3
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
    rs: str = "mis"                # fixed: weighted max internal step
    eig: bool = True
    newton_maxiter: int = 20
    newton_tol: float = 1e-10
    newton_accept: float = 1e-6    # residual above this after Newton
    #   engages the geodesic fallback (reference acceptance gate,
    #   ``peswrapper.py:830-833``)
    davidson_seed: str = "grad"    # Davidson start vector: "grad" or
    #   "pmode" (leftmost eigenvector of the projected quasi-Newton
    #   preconditioner — the reference's subspace init,
    #   ``eigensolvers.py:47-50``); see ensemble.EnsembleConfig
    newton_chord: bool = False     # chord back-transform: the Newton
    #   fast path reuses the step-start B/Gram factorization for every
    #   iteration (no per-iteration B rebuild + Gram eigh — the
    #   dominant serial cost at ensemble scale); lanes above the accept
    #   gate fall through to a full-Newton polish, then the geodesic.
    #   Same fixed point to newton_tol; OFF by default (the sequential
    #   tier's per-step 1e-8 parity is pinned against full Newton).
    newton_stop: str = "inf"       # Newton stop metric: "inf" (default;
    #   max|r| < newton_tol — tightest realization) or "rms"
    #   (|r|_2/sqrt(n_active) < newton_tol — the REFERENCE's stopping
    #   rule, ``peswrapper.py:770``). With "rms" and newton_tol=1e-8
    #   the batched solve takes the same iterates and stops on the same
    #   iteration as the sequential tier's Newton fast path, enabling
    #   1e-8 per-step tier parity (tests/test_tier_parity.py).
    geo_substeps: int = 16         # RK4 substeps of the geodesic
    #   fallback integrator (0 disables the fallback — Newton only)
    restart_after: int = 0         # stagnation restart (0 = disabled);
    #   see ensemble.EnsembleConfig.restart_after — same mechanism, with
    #   the Hessian reset to the shared Lindh guess
    restart_kick: float = 0.25     # kick stddev per real-atom DOF
    eigh_f32: bool = False         # f32 P-RFO prep + TS-BFGS |B| eighs
    #   (see ensemble.EnsembleConfig.eigh_f32)
    absb: str = "eigh"             # TS-BFGS |B| metric: "eigh" or "ns"
    #   (Newton-Schulz matmuls; see ensemble.EnsembleConfig.absb)
    # mis weights per coordinate kind (``restricted_step.py:186-243``)
    wx: float = 1.0                # translations
    wb: float = 1.0                # bonds
    wa: float = 1.0                # angles
    wd: float = 1.0                # dihedrals
    wo: float = 1.0                # user coords / rotations
    pred_min: float = 1e-14        # smallest trusted |predicted dE| in
    #   the ratio test (see ensemble.EnsembleConfig.pred_min)

    @property
    def dim(self) -> int:
        return 3 * (self.natoms + self.ndummies)

    @property
    def nred(self) -> int:
        """Width of range(B) — the nonredundant subspace."""
        return self.dim - self.nproj

    @property
    def nfree(self) -> int:
        """Width of the constrained free subspace."""
        return self.nred - self.ncons

    @property
    def subspace_max(self) -> int:
        m = self.nfree
        k = self.davidson_max if self.davidson_max > 0 else 2 * m + 1
        return min(m, k)


class InternalSearchState(NamedTuple):
    """Per-search state; every leaf has a leading batch axis."""

    x: jnp.ndarray            # (B, 3n) Cartesian positions
    q: jnp.ndarray            # (B, nint) internal values (continuous)
    f: jnp.ndarray            # (B,)
    g: jnp.ndarray            # (B, 3n) Cartesian gradient
    gq: jnp.ndarray           # (B, nint) internal gradient B^+T g
    H: jnp.ndarray            # (B, nint, nint) quasi-Newton Hessian
    delta: jnp.ndarray        # (B,) trust radius (mis norm)
    rho: jnp.ndarray
    nsteps_since_diag: jnp.ndarray
    converged: jnp.ndarray
    nsteps: jnp.ndarray
    neval: jnp.ndarray
    nmatvec: jnp.ndarray
    best_fmax: jnp.ndarray    # (B,) best fmax since the last restart
    stall: jnp.ndarray        # (B,) int32 steps since best_fmax improved
    nrestarts: jnp.ndarray    # (B,) int32 stagnation restarts taken
    x_home: jnp.ndarray       # (B, 3n) pristine start (restart anchor)
    qact: jnp.ndarray         # (B, nint) bool per-lane coordinate
    #   activity: rows of B (and residuals/secants in q-space) are
    #   masked by this, giving every lane its own effective topology
    #   inside the shared union layout. All-True until a repave event
    #   (:func:`repave_lanes`) deactivates singular coordinates for a
    #   lane and/or activates union rows rebuilt from its geometry —
    #   the batched analogue of the reference's mid-run internals
    #   rebuild (``optimize.py:384-410``).


def _kind_weights(ints, cfg: InternalEnsembleConfig) -> np.ndarray:
    return np.concatenate([
        np.full(ints.ntrans, cfg.wx),
        np.full(ints.nbonds, cfg.wb),
        np.full(ints.nangles, cfg.wa),
        np.full(ints.ndihedrals, cfg.wd),
        np.full(ints.nother, cfg.wo),
        np.full(ints.nrotations, cfg.wo),
    ])


def _dihedral_mask(ints) -> np.ndarray:
    m = np.zeros(ints.nint, dtype=bool)
    a0 = ints.ntrans + ints.nbonds + ints.nangles
    m[a0:a0 + ints.ndihedrals] = True
    return m


def fixed_internal_constraints(ints):
    """Map every active equality constraint of ``ints.cons`` onto its
    member coordinate in the q-vector.

    Returns ``(idx, targets)`` int/float arrays of length ncons. The
    batched tier supports exactly the constraints that are *linear in
    q* — i.e. each constrained coordinate must itself be an internal
    coordinate of ``ints`` (always true for dummy-atom constraints,
    which constrain the dummy bond and one dummy angle that
    ``_add_dummy_for_linear_center`` also adds to the q-vector).
    Raises ``ValueError`` for constraints with no q-vector member
    (use the sequential tier or the Cartesian ensemble's residual
    constraints for those)."""
    idx, targets = [], []
    off_b = ints.ntrans
    off_a = off_b + ints.nbonds
    off_d = off_a + ints.nangles

    def _nc_eq(a, b):
        return np.array_equal(np.asarray(a), np.asarray(b))

    for rec in ints.cons._iter_records(only_active=False):
        if rec.comparator != "eq":
            raise ValueError(
                "batched tier supports equality constraints only "
                f"(got {rec.comparator} {rec.kind})"
            )
        found = None
        ii = [int(v) for v in np.atleast_1d(rec.indices)]
        nc = rec.ncvecs
        if rec.kind == "bond":
            z = np.zeros((1, 3)) if nc is None else nc
            for m, (i, j, bnc) in enumerate(ints.bonds):
                if [i, j] == ii and _nc_eq(bnc, z[0]):
                    found = off_b + m
                elif [j, i] == ii and _nc_eq(-bnc, z[0]):
                    found = off_b + m
                if found is not None:
                    break
        elif rec.kind == "angle":
            z = np.zeros((2, 3)) if nc is None else nc
            for m, (i, j, k, anc) in enumerate(ints.angles):
                if [i, j, k] == ii and _nc_eq(anc, z):
                    found = off_a + m
                # reversed record: offsets negate AND reverse, the
                # same convention as topology._angle_key
                elif [k, j, i] == ii and _nc_eq(-anc[::-1], z):
                    found = off_a + m
                if found is not None:
                    break
        elif rec.kind == "dihedral":
            z = np.zeros((3, 3)) if nc is None else nc
            for m, (i, j, k, l, dnc) in enumerate(ints.dihedrals):
                if [i, j, k, l] == ii and _nc_eq(dnc, z):
                    found = off_d + m
                elif [l, k, j, i] == ii and _nc_eq(-dnc[::-1], z):
                    found = off_d + m
                if found is not None:
                    break
        elif rec.kind == "translation":
            for m, (tind, tax) in enumerate(zip(ints.trans,
                                                ints.trans_axes)):
                if tax == rec.axis and len(tind) == len(ii) and \
                        np.array_equal(np.sort(tind), np.sort(ii)):
                    found = m
                    break
        else:
            raise ValueError(
                f"batched tier cannot map a {rec.kind} constraint "
                "onto the q-vector"
            )
        if found is None:
            raise ValueError(
                f"constraint {rec.kind}{ii} has no matching internal "
                "coordinate; add it to the Internals first"
            )
        idx.append(found)
        targets.append(float(rec.target))
    return (np.asarray(idx, dtype=np.int64),
            np.asarray(targets, dtype=np.float64))


def extend_with_dummies(ints, x0: jnp.ndarray) -> jnp.ndarray:
    """Append per-lane dummy-atom coordinates to a (B, 3*natoms) batch.

    Each lane's dummy is placed at its center atom plus the base
    geometry's center->dummy offset; the first Newton back-transform
    (whose q_target pins the constrained dummy bond/angle) snaps it
    onto the constraint manifold exactly."""
    nd = ints.ndummies
    if nd == 0:
        return x0
    n = ints.natoms
    centers = np.full(nd, -1, dtype=np.int64)
    for j, dind in enumerate(np.asarray(ints.dinds)):
        if dind >= 0:
            centers[int(dind) - n] = j
    if np.any(centers < 0):
        raise ValueError("dummy atom with no recorded center")
    offsets = ints.dummies.positions - ints.atoms.positions[centers]
    pos = x0.reshape(x0.shape[0], n, 3)
    dpos = pos[:, centers, :] + jnp.asarray(offsets)[None]
    return jnp.concatenate(
        [pos, dpos], axis=1
    ).reshape(x0.shape[0], 3 * (n + nd))


def _gram_pinv(Bm: jnp.ndarray, nfree: int):
    """Batched eigh of G = B B^T: returns (apply_pinv, Ufree_q).

    The top ``nfree`` eigenvectors span range(B) (static width — the
    rank of a connected molecule's B is always 3n - 6); thresholded
    inverse eigenvalues give the pseudo-inverse application.

    Uses ``batched_eigh(..., "robust")``: G is singular with a zero
    eigenvalue of multiplicity nint - nred, exactly the
    degenerate-cluster shape on which accelerator emulated-f64 eigh
    returns NaN eigenpairs (reproduced on Morse Xe4 lane geometries) —
    there :func:`sella_tpu.ops.linalg.eigh_refined` takes over, while
    CPU keeps bit-stable LAPACK f64, which handles these matrices."""
    G = jnp.einsum("bik,bjk->bij", Bm, Bm)
    lams, V = batched_eigh(G, "robust")
    lmax = jnp.maximum(lams[:, -1:], 1e-300)
    keep = lams > 1e-10 * lmax
    inv = jnp.where(keep, 1.0 / jnp.where(keep, lams, 1.0), 0.0)

    def apply_pinv(x):
        return jnp.einsum("bij,bj,bkj,bk->bi", V, inv, V, x)

    Ufree_q = V[:, :, -nfree:]
    return apply_pinv, Ufree_q


def _split_fixed(Ured: jnp.ndarray, cons_idx: jnp.ndarray,
                 ncons: int) -> jnp.ndarray:
    """Constrained free subspace: the orthogonal complement, inside
    range(B), of the fixed-coordinate directions.

    A fixed internal ``q_i = t`` has q-space gradient ``P_range e_i``;
    in the U-coordinates of range(B) that is row i of U, so a complete
    QR of W = U[cons_idx]^T (static shape (nred, ncons)) yields the
    free columns directly (the reference's rank-revealing
    ``_split_cons_subspace``, ``peswrapper.py:51-69``, with the rank
    static by construction)."""
    if ncons == 0:
        return Ured
    if cons_idx.ndim == 2:
        # per-lane constraint rows (the combined tier after a Niggli
        # rebase remapped image-pinned constraints lane-by-lane)
        sel = jnp.take_along_axis(Ured, cons_idx[:, :, None], axis=1)
        W = jnp.swapaxes(sel, 1, 2)                    # (B, nred, nc)
    else:
        W = jnp.swapaxes(Ured[:, cons_idx, :], 1, 2)   # (B, nred, nc)
    Q = jnp.linalg.qr(W, mode="complete")[0]           # (B, nred, nred)
    return jnp.einsum("bij,bjk->bik", Ured, Q[:, :, ncons:])


def make_internal_step_fn(potential, ints, cfg: InternalEnsembleConfig,
                          cell: Optional[jnp.ndarray] = None):
    """Build the jittable batched internal-coordinate RS-P-RFO step.

    ``ints``: a host-side :class:`Internals` container defining the
    (shared, fixed) topology — including dummy atoms and fixed internal
    coordinates (``cfg.ndummies``/``cfg.ncons`` must match)."""
    if ints.ndummies != cfg.ndummies:
        raise ValueError(
            f"cfg.ndummies={cfg.ndummies} != topology "
            f"ndummies={ints.ndummies}"
        )
    if ints.nint != cfg.nint:
        raise ValueError(
            f"cfg.nint={cfg.nint} != topology nint={ints.nint}"
        )
    cons_idx, cons_target = fixed_internal_constraints(ints)
    if len(cons_idx) != cfg.ncons:
        raise ValueError(
            f"cfg.ncons={cfg.ncons} != mapped constraints "
            f"{len(cons_idx)}"
        )
    if cell is None:
        cell = jnp.zeros((3, 3))

    engine = ints._get_engine()
    n = cfg.natoms + cfg.ndummies          # extended atom count
    nr3 = 3 * cfg.natoms                   # real-atom DOF
    ncons = cfg.ncons
    cons_idx = jnp.asarray(cons_idx)
    cons_target = jnp.asarray(cons_target)

    def calc_q(x):
        return engine._calc_impl(x.reshape(n, 3), cell)

    def calc_B(x):
        return engine._jac_impl(x.reshape(n, 3), cell)

    def calc_dB(x, u):
        return engine._hrdot_impl(x.reshape(n, 3), cell,
                                  u.reshape(n, 3))

    batch_q = jax.vmap(calc_q)
    batch_B = jax.vmap(calc_B)
    batch_dB = jax.vmap(calc_dB)

    def _pad_dummy(g_real):
        """Zero-pad real-atom gradients/tangents to the extended DOF."""
        if cfg.ndummies == 0:
            return g_real
        pad = jnp.zeros(g_real.shape[:-1] + (3 * cfg.ndummies,),
                        g_real.dtype)
        return jnp.concatenate([g_real, pad], axis=-1)

    def batch_eval(x):
        f, gr = jax.vmap(
            lambda xx: jax.value_and_grad(potential.energy)(
                xx[:nr3], cell
            )
        )(x)
        return f, _pad_dummy(gr)

    def batch_hvp(x, u):
        def one(x1, u1):
            gfun = lambda y: jax.grad(potential.energy)(y, cell)
            return jax.jvp(gfun, (x1[:nr3],), (u1[:nr3],))[1]

        return _pad_dummy(jax.vmap(one)(x, u))

    def lagrangian_gq(gq):
        """Zero the constrained components: the multiplier of a fixed
        internal is exactly its g_q component, and its q-Hessian is
        zero, so the Lagrangian curvilinear term uses g_q with those
        rows removed (reference get_Hc, ``peswrapper.py:1011-1031``,
        specialized to member-coordinate constraints)."""
        if ncons == 0:
            return gq
        return gq.at[:, cons_idx].set(0.0)

    dih = jnp.asarray(_dihedral_mask(ints))
    w_mis = jnp.asarray(_kind_weights(ints, cfg))
    # shared Lindh guess — the restart re-bootstrap target
    H_guess = jnp.asarray(ints.guess_hessian())

    def wrap_dq(r):
        """Wrap dihedral components of an internal-space difference
        into (-pi, pi] (``internal.py:2577-2627``)."""
        wrapped = r - 2 * jnp.pi * jnp.round(r / (2 * jnp.pi))
        return jnp.where(dih[None, :], wrapped, r)

    def mis_norm(s_full, ds_full):
        """Weighted max-internal-step norm with analytic alpha
        derivative (``restricted_step.py:186-243``)."""
        ws = w_mis[None, :] * jnp.abs(s_full)
        idx = jnp.argmax(ws, axis=1)
        b = jnp.arange(s_full.shape[0])
        val = ws[b, idx]
        sgn = jnp.sign(s_full[b, idx])
        dval = w_mis[idx] * sgn * ds_full[b, idx]
        return val, dval

    K = cfg.subspace_max

    def davidson_absorb(x, gq, Bm, apply_pinv, Ufree_q, H, active, key,
                        P_eig=None):
        """Batched Davidson on the internal-coordinate Lagrangian
        Hessian; every probe pair is absorbed into H (TS-BFGS) —
        'full exploitation of partial diagonalization'
        (``peswrapper.py:508-556``). ``P_eig``: optional precomputed
        eigendecomposition of the projected H (the step's P-RFO prep
        diagonalizes the identical matrix — reused when full
        precision)."""

        gLq = lagrangian_gq(gq)

        def hvp_free(v_free):
            v_q = jnp.einsum("bij,bj->bi", Ufree_q, v_free)
            u = jnp.einsum("bki,bk->bi", Bm, apply_pinv(v_q))  # B^+ v
            w_x = batch_hvp(x, u)
            # curvilinear correction: - dB[u]^T g_Lq (matrix-free Hc of
            # the LAGRANGIAN, ``peswrapper.py:1011-1031``)
            dB = batch_dB(x, u)                        # (B, nint, 3n)
            w_x = w_x - jnp.einsum("bkj,bk->bj", dB, gLq)
            w_q = apply_pinv(jnp.einsum("bij,bj->bi", Bm, w_x))
            w_free = jnp.einsum("bij,bi->bj", Ufree_q, w_q)
            return w_free, w_q

        UT = jnp.swapaxes(Ufree_q, 1, 2)
        P = jnp.einsum("bij,bjk,bkl->bil", UT, H, Ufree_q)
        v0 = jnp.einsum("bij,bi->bj", Ufree_q, gq)

        # default "grad" keeps P_eig=None so the traced graph (and
        # compile-cache key) of existing programs is unchanged
        if getattr(cfg, "davidson_seed", "grad") != "pmode":
            P_eig = None
        elif P_eig is None:
            # reference subspace init from P's negative modes
            # (``eigensolvers.py:47-50``) — see
            # ensemble.EnsembleConfig.davidson_seed
            P_eig = batched_eigh(P)
        if P_eig is not None:
            v0 = P_eig[1][:, :, 0]

        V, AVp, YF, k = _davidson_loop(
            hvp_free, P, v0, cfg.gamma, K, active, key, P_eig=P_eig,
        )
        lams, W, colmask = _masked_ritz(V, AVp, k, K)
        Vr = jnp.einsum("bik,bkl->bil", V, W)
        YFr = jnp.einsum("bik,bkl->bil", YF, W)
        S_full = jnp.einsum("bij,bjk->bik", Ufree_q, Vr)
        H_new = ts_bfgs_update_batched(H, S_full, YFr, colmask,
                                       cfg.eigh_f32,
                                       getattr(cfg, "absb", "eigh"))
        H_out = jnp.where(active[:, None, None], H_new, H)
        return H_out, k

    def _pin_target(q0, dq_target):
        q_target = q0 + dq_target
        if ncons:
            q_target = q_target.at[:, cons_idx].set(cons_target[None])
        return q_target

    def _newton_iter(x_init, q_target, rows, frozen=None):
        """Masked Newton on q(x) = q_target with best-iterate tracking.
        ``rows`` (B, nint) masks each lane's inactive coordinates out
        of both the residual and the Jacobian. Returns
        (x_best, rinf_best).

        ``frozen``: optional ``(Bm0, apply_pinv0)`` evaluated at the
        step's start geometry — the CHORD variant (``cfg.newton_chord``)
        reuses that factorization for every iteration instead of
        rebuilding the scatter-heavy B matrix and re-eigendecomposing
        its Gram each time (the dominant serial cost of the batched
        internal step at ensemble scale). The chord map has the same
        fixed point (q(x) = q_target to ``newton_tol``); lanes it fails
        to converge fall through to the geodesic + full-Newton path in
        :func:`newton_set_x` exactly as before."""

        class _NS(NamedTuple):
            x: jnp.ndarray
            x_best: jnp.ndarray
            r_best: jnp.ndarray
            it: jnp.ndarray
            done: jnp.ndarray

        def resid(x):
            return wrap_dq(q_target - batch_q(x)) * rows

        n_act = jnp.maximum(jnp.sum(rows, axis=1), 1.0)

        def stop_metric(r):
            if getattr(cfg, "newton_stop", "inf") == "rms":
                return jnp.linalg.norm(r, axis=1) / jnp.sqrt(n_act)
            return jnp.max(jnp.abs(r), axis=1)

        r0 = resid(x_init)
        st = _NS(x_init, x_init, jnp.max(jnp.abs(r0), axis=1),
                 jnp.int32(0), jnp.zeros(x_init.shape[0], bool))

        def cond(st):
            return jnp.any(~st.done) & (st.it < cfg.newton_maxiter)

        def body(st):
            r = resid(st.x)
            rinf = jnp.max(jnp.abs(r), axis=1)
            better = rinf < st.r_best
            x_best = jnp.where(better[:, None], st.x, st.x_best)
            r_best = jnp.where(better, rinf, st.r_best)
            done = st.done | (stop_metric(r) < cfg.newton_tol)

            if frozen is not None:
                Bm, apply_pinv = frozen
            else:
                Bm = batch_B(st.x) * rows[:, :, None]
                apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
            dx = jnp.einsum("bki,bk->bi", Bm, apply_pinv(r))
            x_new = jnp.where(done[:, None], st.x, st.x + dx)
            return _NS(x_new, x_best, r_best, st.it + 1, done)

        st = jax.lax.while_loop(cond, body, st)
        r_fin = resid(st.x)
        rinf_fin = jnp.max(jnp.abs(r_fin), axis=1)
        better = rinf_fin < st.r_best
        x_best = jnp.where(better[:, None], st.x, st.x_best)
        return x_best, jnp.minimum(rinf_fin, st.r_best)

    def _geodesic_x(x0, q_target, rows):
        """Masked fixed-substep RK4 of the geodesic equation
        ``xdd = -B+ (dB/dx[xd] xd)`` (the reference's ODE move,
        ``peswrapper.py:841-880, 1200-1221``, with LSODA's adaptivity
        replaced by a static substep count — jit/vmap-compatible).
        Used as the fallback initializer when the Newton fast path
        fails on a large curved step; a Newton polish afterwards lands
        exactly on the target manifold."""
        dq = wrap_dq(q_target - batch_q(x0)) * rows

        def xdot(x, dq_vec):
            Bm = batch_B(x) * rows[:, :, None]
            apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
            return jnp.einsum("bki,bk->bi", Bm, apply_pinv(dq_vec))

        def rhs(carry):
            x, xd = carry
            # curvature term dB/dx[xd] · xd via one jvp through B(x)
            curv = jax.jvp(
                lambda xx: jnp.einsum(
                    "bki,bi->bk", batch_B(xx) * rows[:, :, None], xd
                ),
                (x,), (xd,),
            )[1]
            Bm = batch_B(x) * rows[:, :, None]
            apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
            xdd = -jnp.einsum("bki,bk->bi", Bm, apply_pinv(curv))
            return xd, xdd

        nsub = max(int(cfg.geo_substeps), 1)
        h = 1.0 / nsub
        xd0 = xdot(x0, dq)

        def body(_, carry):
            x, xd = carry
            k1x, k1v = rhs((x, xd))
            k2x, k2v = rhs((x + 0.5 * h * k1x, xd + 0.5 * h * k1v))
            k3x, k3v = rhs((x + 0.5 * h * k2x, xd + 0.5 * h * k2v))
            k4x, k4v = rhs((x + h * k3x, xd + h * k3v))
            return (
                x + (h / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x),
                xd + (h / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v),
            )

        x_end, _ = jax.lax.fori_loop(0, nsub, body, (x0, xd0))
        return x_end

    def newton_set_x(x0, q0, dq_target, rows, frozen=None):
        """Realize the internal step: find x with q(x) = q0 + dq_target.
        Constrained components of the target are pinned to their fixed
        values, so the same solve performs the reference's
        constraint-manifold projection (``peswrapper.py:928-994``) at
        zero extra cost. Newton fast path first (chord variant when
        ``cfg.newton_chord`` and ``frozen`` is given); lanes whose
        residual stays above ``cfg.newton_accept`` re-run from a
        geodesic RK4 initializer (the reference's ODE fallback,
        ``peswrapper.py:883-903``) plus a FULL-Newton polish — the
        whole fallback runs only when some lane actually needs it
        (lax.cond)."""
        q_target = _pin_target(q0, dq_target)
        if not getattr(cfg, "newton_chord", False):
            frozen = None
        x_nw, r_nw = _newton_iter(x0, q_target, rows, frozen=frozen)

        if frozen is not None:
            # chord converges linearly: lanes it left above the accept
            # gate get a full-Newton polish from the chord iterate
            # (quadratic, and already close) before the geodesic is
            # even considered — runs only when some lane needs it
            miss = r_nw > cfg.newton_accept

            def _polish(_):
                return _newton_iter(x_nw, q_target, rows)

            x_pl, r_pl = jax.lax.cond(
                jnp.any(miss), _polish, lambda _: (x_nw, r_nw), None
            )
            use_pl = miss & (r_pl < r_nw)
            x_nw = jnp.where(use_pl[:, None], x_pl, x_nw)
            r_nw = jnp.minimum(r_nw, r_pl)

        if getattr(cfg, "geo_substeps", 0) > 0:
            fail = r_nw > cfg.newton_accept

            def run_geo(_):
                x_geo = _geodesic_x(x0, q_target, rows)
                return _newton_iter(x_geo, q_target, rows)

            def skip_geo(_):
                return x_nw, r_nw

            x_geo, r_geo = jax.lax.cond(
                jnp.any(fail), run_geo, skip_geo, None
            )
            use_geo = fail & (r_geo < r_nw)
            x_fin = jnp.where(use_geo[:, None], x_geo, x_nw)
        else:
            x_fin = x_nw
        dq_real = wrap_dq(batch_q(x_fin) - q0) * rows
        return x_fin, dq_real

    def step(state: InternalSearchState, key) -> InternalSearchState:
        Bsz = state.x.shape[0]
        act = ~state.converged
        rows = state.qact.astype(state.x.dtype)

        Bm = batch_B(state.x) * rows[:, :, None]
        apply_pinv, Ured_q = _gram_pinv(Bm, cfg.nred)
        Ufree_q = _split_fixed(Ured_q, cons_idx, ncons)
        gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, state.g))

        # ---- projected quantities + diag scheduling ----
        UT = jnp.swapaxes(Ufree_q, 1, 2)
        Hproj = jnp.einsum("bij,bjk,bkl->bil", UT, state.H, Ufree_q)
        g_free = jnp.einsum("bij,bi->bj", Ufree_q, gq)
        prep = prfo_prepare_batched(g_free, Hproj, cfg.order,
                                    cfg.eigh_f32)

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
            # bootstrap diag on the very first step (reference
            # ``optimize.py:317-325``: eig -> diag before stepping)
            ev = ev | (act & (state.nsteps == 0))
        else:
            ev = jnp.zeros(Bsz, bool)
        if cfg.diag_every_n > 0:
            ev = ev | (act & (state.nsteps_since_diag >= cfg.diag_every_n))

        def run_diag(_):
            # the P-RFO prep already diagonalized UT @ H @ U — reuse it
            # as the Davidson preconditioner eigensystem when it is
            # full precision (pmode seeding needs P_eig; recomputing it
            # would repeat the step's hot (B, nfree, nfree) eigh)
            reuse = (
                (prep[0], prep[1])
                if (getattr(cfg, "davidson_seed", "grad") == "pmode"
                    and not cfg.eigh_f32)
                else None
            )
            return davidson_absorb(
                state.x, gq, Bm, apply_pinv, Ufree_q, state.H, ev,
                jax.random.fold_in(key, 0), P_eig=reuse,
            )

        def skip_diag(_):
            return state.H, jnp.zeros(Bsz, state.nsteps.dtype)

        H1, k_diag = jax.lax.cond(jnp.any(ev), run_diag, skip_diag, None)
        nmv = state.nmatvec + jnp.where(ev, k_diag, 0)
        nsd = jnp.where(ev, 0, state.nsteps_since_diag + 1)

        # ---- trust-region step in the free internal subspace ----
        # when no lane diagonalized this step (jnp.any(ev) False — the
        # exact predicate run_diag ran under, so H1 == state.H
        # bitwise), prep1 would recompute the identical
        # (B, nfree, nfree) eigensystem — reuse prep instead of paying
        # the second hot eigh. Holds for every config: with eig off
        # and diag_every_n=0, ev is all-False and the reuse branch
        # always takes (round-5 review: the old else branch recomputed
        # unconditionally for order=0 runs).
        Hproj1 = jnp.einsum("bij,bjk,bkl->bil", UT, H1, Ufree_q)
        prep1 = jax.lax.cond(
            jnp.any(ev),
            lambda _: prfo_prepare_batched(
                g_free, Hproj1, cfg.order, cfg.eigh_f32),
            lambda _: prep,
            None,
        )
        dq_pred, smag = restricted_step_batched(
            g_free, Hproj1, Ufree_q, state.delta, cfg, prep=prep1,
            norm_fn=mis_norm,
        )
        dq_pred = jnp.where(act[:, None], dq_pred, 0.0)

        # ---- realize the step + evaluate ----
        x_new, dq_real = newton_set_x(state.x, state.q, dq_pred, rows,
                                      frozen=(Bm, apply_pinv))
        x_new = jnp.where(act[:, None], x_new, state.x)
        dq_real = jnp.where(act[:, None], dq_real, 0.0)
        f_new, g_new = batch_eval(x_new)
        neval = state.neval + act.astype(jnp.int32)

        Bm_new = batch_B(x_new) * rows[:, :, None]
        apply_pinv_new, Ured_q_new = _gram_pinv(Bm_new, cfg.nred)
        gq_new = apply_pinv_new(
            jnp.einsum("bij,bj->bi", Bm_new, g_new)
        )

        # ---- trust ratio (prediction with the PREDICTED step) ----
        df_pred = jnp.einsum("bi,bi->b", gq, dq_pred) + 0.5 * jnp.einsum(
            "bi,bij,bj->b", dq_pred, H1, dq_pred
        )
        df_actual = f_new - state.f
        pred_ok = jnp.abs(df_pred) > cfg.pred_min
        ratio = jnp.where(
            pred_ok, df_actual / jnp.where(pred_ok, df_pred, 1.0), 1.0
        )

        # ---- quasi-Newton update with the REALIZED secant ----
        # Parallel-transport the pre-step internal gradient into the
        # post-step frame before differencing: the B-matrix rotates
        # with the geometry, so the raw gq_new - gq secant mixes frame
        # rotation into the curvature signal. The reference pulls the
        # old gradient back to Cartesians with the OLD B+ and pushes it
        # forward with the NEW B (``peswrapper.py:835-839``); same here,
        # batched: g_par = B_new (B_old^T G_old^+ gq_old).
        g0_cart = jnp.einsum("bij,bi->bj", Bm, apply_pinv(gq))
        g_par = jnp.einsum("bij,bj->bi", Bm_new, g0_cart)
        dgq = gq_new - g_par
        m1 = (jnp.linalg.norm(dq_real, axis=1) > 1e-10)[:, None]
        H2 = ts_bfgs_update_batched(
            H1, dq_real[:, :, None], dgq[:, :, None], m1 & act[:, None],
            cfg.eigh_f32, getattr(cfg, "absb", "eigh"),
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

        # ---- convergence: projected per-atom forces on REAL atoms ----
        if ncons or cfg.ndummies:
            # constrained/dummy case: project g_q into the constrained
            # free subspace and map back through B (the sequential
            # tier's get_projected_forces with dummy rows dropped)
            Ufree_new = _split_fixed(Ured_q_new, cons_idx, ncons)
            gqp = jnp.einsum(
                "bij,bj->bi", Ufree_new,
                jnp.einsum("bij,bi->bj", Ufree_new, gq_new),
            )
            gp = jnp.einsum("bi,bij->bj", gqp, Bm_new)[:, :nr3]
            fmax_now = jnp.max(
                jnp.linalg.norm(
                    gp.reshape(Bsz, cfg.natoms, 3), axis=2
                ), axis=1,
            )
        else:
            Ux = jax.vmap(lambda xx: free_basis(xx, cfg.nproj))(x_new)
            gfree_x = jnp.einsum("bij,bi->bj", Ux, g_new)
            gp = jnp.einsum("bij,bj->bi", Ux, gfree_x)
            fmax_now = jnp.max(
                jnp.linalg.norm(gp.reshape(Bsz, n, 3), axis=2), axis=1
            )
        conv_new = state.converged | (act & (fmax_now < cfg.fmax))

        # ---- stagnation restart (see ensemble.EnsembleConfig) ----
        improved = fmax_now < 0.97 * state.best_fmax
        best2 = jnp.where(act & improved, fmax_now, state.best_fmax)
        stall2 = jnp.where(act & ~improved, state.stall + 1, 0)
        x_fin = x_new
        q_fin = state.q + dq_real
        f_fin, g_fin, gq_fin = f_new, g_new, gq_new
        nrst = state.nrestarts
        if cfg.restart_after > 0:
            restart = act & ~conv_new & (stall2 >= cfg.restart_after)
            # restart from the PRISTINE start with a kick that grows
            # with the attempt count — independent perturbed attempts
            # decorrelate, while kicking the stalled geometry compounds
            # and dissociates clusters (measured on LJ4; see
            # ensemble.make_step_fn)
            scale = cfg.restart_kick * (
                1.0 + 0.5 * state.nrestarts.astype(x_new.dtype)
            )
            kick = scale[:, None] * jax.random.normal(
                jax.random.fold_in(key, 3), x_new.shape, x_new.dtype
            )
            if cfg.ndummies:
                # dummies are spectators pinned by constrained
                # bond+angle: leave them in place, the Newton transform
                # re-seats them on the next step
                kick = kick.at[:, nr3:].set(0.0)
            x_fin = jnp.where(
                restart[:, None], state.x_home + kick, x_new
            )

            def _reeval(_):
                f2, g2 = batch_eval(x_fin)
                q2 = batch_q(x_fin)
                Bm2 = batch_B(x_fin) * rows[:, :, None]
                ap2, _ = _gram_pinv(Bm2, cfg.nred)
                gq2 = ap2(jnp.einsum("bij,bj->bi", Bm2, g2))
                return f2, g2, q2, gq2

            f_k, g_k, q_k, gq_k = jax.lax.cond(
                jnp.any(restart), _reeval,
                lambda _: (f_new, g_new, q_fin, gq_new), None,
            )
            f_fin = jnp.where(restart, f_k, f_new)
            g_fin = jnp.where(restart[:, None], g_k, g_new)
            # restarted lanes re-base q continuity at principal values
            q_fin = jnp.where(restart[:, None], q_k, q_fin)
            gq_fin = jnp.where(restart[:, None], gq_k, gq_new)
            neval = neval + restart.astype(jnp.int32)
            H2 = jnp.where(restart[:, None, None], H_guess[None], H2)
            nsd = jnp.where(restart, cfg.nsteps_per_diag, nsd)
            delta_new = jnp.where(restart, cfg.delta0, delta_new)
            best2 = jnp.where(restart, jnp.inf, best2)
            stall2 = jnp.where(restart, 0, stall2)
            nrst = nrst + restart.astype(jnp.int32)

        return InternalSearchState(
            x=jnp.where(act[:, None], x_fin, state.x),
            q=jnp.where(act[:, None], q_fin, state.q),
            f=jnp.where(act, f_fin, state.f),
            g=jnp.where(act[:, None], g_fin, state.g),
            gq=jnp.where(act[:, None], gq_fin, state.gq),
            H=H2,
            delta=delta_new,
            rho=jnp.where(act, ratio, state.rho),
            nsteps_since_diag=nsd,
            converged=conv_new,
            nsteps=state.nsteps + act.astype(jnp.int32),
            neval=neval,
            nmatvec=nmv,
            best_fmax=best2,
            stall=stall2,
            nrestarts=nrst,
            x_home=state.x_home,
            qact=state.qact,
        )

    # expose the step-realization machinery for direct testing
    # (tests/test_ensemble_internal.py pins Newton-fails/geodesic-saves
    # behavior on targets the full driver would need many steps to hit)
    def _ones_rows(x0):
        return jnp.ones((x0.shape[0], cfg.nint), x0.dtype)

    step.newton_set_x = lambda x0, q0, dq, rows=None: newton_set_x(
        x0, q0, dq, _ones_rows(x0) if rows is None else rows
    )
    step.newton_iter = lambda x0, q_target, rows=None: _newton_iter(
        x0, q_target, _ones_rows(x0) if rows is None else rows
    )
    step.geodesic_x = lambda x0, q_target, rows=None: _geodesic_x(
        x0, q_target, _ones_rows(x0) if rows is None else rows
    )
    step.pin_target = _pin_target
    step.batch_q = batch_q
    step.wrap_dq = wrap_dq
    return step


def init_internal_state(
    potential, ints, x0: jnp.ndarray, cfg: InternalEnsembleConfig,
    cell: Optional[jnp.ndarray] = None,
) -> InternalSearchState:
    """Initialize the batched internal-coordinate state: the quasi-Newton
    Hessian starts from the Lindh-style diagonal guess of the shared
    topology (``internal.py:3738-3820``) — the second pillar of the
    internal tier's convergence advantage."""
    if cell is None:
        cell = jnp.zeros((3, 3))
    x0 = jnp.asarray(x0).copy()
    if cfg.ndummies and x0.shape[1] == 3 * cfg.natoms:
        x0 = extend_with_dummies(ints, x0)
    Bsz = x0.shape[0]
    dtype = x0.dtype
    n = cfg.natoms + cfg.ndummies
    nr3 = 3 * cfg.natoms

    engine = ints._get_engine()
    batch_q = jax.vmap(lambda x: engine._calc_impl(x.reshape(n, 3), cell))
    batch_B = jax.vmap(lambda x: engine._jac_impl(x.reshape(n, 3), cell))

    f, g = jax.vmap(
        lambda xx: jax.value_and_grad(potential.energy)(xx[:nr3], cell)
    )(x0)
    if cfg.ndummies:
        g = jnp.concatenate(
            [g, jnp.zeros((Bsz, 3 * cfg.ndummies), g.dtype)], axis=1
        )
    q = batch_q(x0)
    Bm = batch_B(x0)
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, g))

    H0 = jnp.asarray(ints.guess_hessian())
    return InternalSearchState(
        x=x0,
        q=q,
        f=f,
        g=g,
        gq=gq,
        H=jnp.broadcast_to(H0[None], (Bsz, cfg.nint, cfg.nint)).copy(),
        delta=jnp.full((Bsz,), cfg.delta0, dtype),
        rho=jnp.ones((Bsz,), dtype),
        nsteps_since_diag=jnp.zeros(Bsz, jnp.int32),
        converged=jnp.zeros(Bsz, bool),
        nsteps=jnp.zeros(Bsz, jnp.int32),
        neval=jnp.ones(Bsz, jnp.int32),
        nmatvec=jnp.zeros(Bsz, jnp.int32),
        best_fmax=jnp.full((Bsz,), jnp.inf, dtype),
        stall=jnp.zeros(Bsz, jnp.int32),
        nrestarts=jnp.zeros(Bsz, jnp.int32),
        x_home=x0.copy(),
        qact=jnp.ones((Bsz, cfg.nint), bool),
    )


def bad_internals_mask(state: InternalSearchState, ints,
                       atol_deg: float = 0.5) -> jnp.ndarray:
    """Per-lane mask of searches whose angles reached the singular
    0/180-deg points where the B matrix loses rank (reference
    ``internal.py:3704-3736``; the default window is much tighter than
    the sequential tier's 15 deg because cluster saddles legitimately
    converge with nearly-linear angles). Flagged lanes can be repaved
    in-place (:func:`repave_lanes` — fixed-ensemble mode), spilled to
    the Cartesian tier (queue mode), or re-seeded."""
    a0 = ints.ntrans + ints.nbonds
    ang = state.q[:, a0:a0 + ints.nangles]
    if ang.shape[1] == 0:
        return jnp.zeros(state.q.shape[0], bool)
    atol = np.radians(atol_deg)
    bad = (ang < atol) | (ang > np.pi - atol)
    # coordinates already deactivated for a lane (by a previous repave)
    # cannot re-trigger the event
    bad = bad & state.qact[:, a0:a0 + ints.nangles]
    return jnp.any(bad, axis=1)


# ---------------------------------------------------------------------------
# Per-lane repave: the batched analogue of the reference's mid-run
# bad-internal rebuild (``optimize.py:384-410`` + ``peswrapper.py:
# 1129-1174``). The shared layout grows into a UNION of every lane's
# topology; each lane activates only its own rows via ``state.qact``.
# ---------------------------------------------------------------------------

def _layout_offsets(ints):
    """Start offsets of the (bonds, angles, dihedrals, others,
    rotations) blocks in the q-vector layout."""
    off_b = ints.ntrans
    off_a = off_b + ints.nbonds
    off_d = off_a + ints.nangles
    off_o = off_d + ints.ndihedrals
    off_r = off_o + ints.nother
    return off_b, off_a, off_d, off_o, off_r


def rebuild_internals_at(ints, pos: np.ndarray,
                         cell: Optional[np.ndarray] = None,
                         keep_dummies: bool = False):
    """Rebuild a fresh topology from the given geometry, mirroring the
    reference's rebuild (``peswrapper.py:1134-1140``: copy the pristine
    container, re-run discovery).

    ``keep_dummies=False`` (dummy-free topologies): linear centers get
    NO dummy atom (the atom count is a static shape in the batched
    tier); their bending DOF must be covered by redundant coordinates
    instead.

    ``keep_dummies=True`` (dummy topologies): ``pos`` is the EXTENDED
    (natoms + ndummies, 3) geometry; discovery re-runs with dummy
    insertion allowed. When it reproduces the ORIGINAL dummy layout
    (same count, same linear centers — ``dinds`` equal), the rebuilt
    dummy container is simply pinned to the lane's CURRENT dummy
    positions. When the layout CHANGED (a linear center bent so its
    dummy would vanish, or a new center went linear), the static
    extended DOF count must still be preserved, so the rebuild is
    redone dummy-free (linear centers with >=3 neighbors get the
    improper redundant coverage, as in dummy-free repaves) and the
    ORIGINAL dummies are re-attached as pinned spectators: their store
    positions, ``dinds``, every topology row referencing them
    (near-singular unconstrained dummy angles filtered by the
    discovery window) and their constraint records are carried over
    verbatim. The lane repaves instead of being refused (VERDICT r4
    item 5); redundant internals tolerate the extra spectator
    coordinates by construction. Caveat: a NEW 2-neighbor center that
    went linear has no dummy-free bend coordinate — such a lane
    repaves only if previously-active rows restore the masked-B rank
    (the augment fallback in :func:`repave_lanes`); otherwise it is
    refused exactly as before, with the ensemble left untouched.

    ``cell`` overrides the discovery cell (per-lane realized cells in
    the internal+cell tier). Constrained coordinates are folded back in
    by the :class:`~sella_tpu.coords.internals.Internals` constructor
    (it registers every ``cons`` record), so a repaved lane never loses
    its fixed internals; with ``keep_dummies`` the dummy bond/angle
    constraints are stripped first and re-added by the dummy insertion
    itself (their records reference dummy indices that do not exist
    until discovery re-inserts the dummies)."""
    pos = np.asarray(pos)
    nreal = ints.natoms
    new = _rebuild_base(ints, pos, cell,
                        strip_dummy_records=keep_dummies)
    new.find_all_bonds()
    new.find_all_angles(allow_dummies=keep_dummies)
    new.find_all_dihedrals()
    if keep_dummies and ints.ndummies:
        if (new.ndummies != ints.ndummies
                or not np.array_equal(new.dinds, ints.dinds)):
            # dummy layout changed: redo dummy-free + spectator
            # re-attach (see docstring). The second discovery pass
            # repeats the bond search — accepted: repave events are
            # rare host-side work, and the dummy-insertion side
            # effects of THIS pass (records, store rows) make its
            # artifacts unsafe to splice into the dummy-free rebuild.
            return _rebuild_reattach_dummies(ints, pos, cell)
        # continuity: the lane's dummies stay where its DOF vector has
        # them (fresh insertion positions would teleport the dummy)
        new.dummies.positions[:] = pos[nreal:]
        new._engine = None
    return new


def _rebuild_base(ints, pos: np.ndarray, cell: Optional[np.ndarray],
                  strip_dummy_records: bool):
    """Shared repave-rebuild prologue: fresh atoms at the lane
    geometry, copied constraints (optionally stripped of
    dummy-referencing records — discovery or the re-attach path
    restores them), a fresh :class:`Internals` with the forbidden
    lists carried over. Callers run their own discovery variant."""
    nreal = ints.natoms
    at = ints.atoms.copy()
    at.set_positions(pos[:nreal])
    if cell is not None:
        at.set_cell(np.asarray(cell))
    cons = ints.cons.copy()
    cons.atoms = at
    if strip_dummy_records and ints.ndummies:
        from ..coords.constraints import DummyStore

        cons.dummies = DummyStore()
        cons.records = {
            g: [r for r in recs
                if np.max(np.atleast_1d(r.indices), initial=0) < nreal]
            for g, recs in cons.records.items()
        }
    new = type(ints)(at, cons, allow_fragments=ints.allow_fragments,
                     atol_deg=float(np.degrees(ints.atol)))
    new.forbidden = {g: set(s) for g, s in ints.forbidden.items()}
    return new


def _rebuild_reattach_dummies(ints, pos: np.ndarray,
                              cell: Optional[np.ndarray]):
    """Dummy-layout-change repave path: dummy-free re-discovery at the
    lane geometry + verbatim re-attach of the ORIGINAL dummies as
    pinned spectators (their constrained bond/angle keep them riding
    along; the improper dihedrals through them stay valid redundant
    coordinates). Keeps the static extended DOF count and ``dinds``."""
    import copy as _copy

    nreal = ints.natoms
    new = _rebuild_base(ints, pos, cell, strip_dummy_records=True)
    at = new.atoms
    new.find_all_bonds()
    # no dummy insertion: new linear centers get the improper
    # redundant coverage (same mechanism as dummy-free repaves)
    new.find_all_angles(allow_dummies=False)
    new.find_all_dihedrals()

    # re-attach the original dummies at the lane's CURRENT positions
    new.dummies.positions = np.asarray(pos[nreal:]).copy()
    new.dinds = ints.dinds.copy()

    from ..coords import topology as topo_mod

    def _refs_dummy(idx_tuple):
        return any(int(i) >= nreal for i in idx_tuple)

    cons_angle_keys = {
        topo_mod._angle_key(
            *(int(i) for i in np.atleast_1d(r.indices)),
            r.ncvecs if r.ncvecs is not None else np.zeros((2, 3)),
        )
        for recs in ints.cons.records.values() for r in recs
        if r.kind == "angle" and len(np.atleast_1d(r.indices)) == 3
    }
    for (i, j, nc) in ints.bonds:
        if _refs_dummy((i, j)):
            k = topo_mod._bond_key(i, j, nc)
            if k not in new._bond_keys:
                new.bonds.append((i, j, nc))
                new._bond_keys.add(k)
    have_a = {topo_mod._angle_key(*a) for a in new.angles}
    for a in ints.angles:
        idx = (a[0], a[1], a[2])
        if not _refs_dummy(idx):
            continue
        k = topo_mod._angle_key(*a)
        if k in have_a:
            continue
        # drop unconstrained dummy angles that are near-singular at the
        # lane's current geometry (the constrained one is held at its
        # target by the optimizer and must stay a q-member)
        if k not in cons_angle_keys:
            ncv = np.asarray(a[3]) if len(a) > 3 and a[3] is not None \
                else np.zeros((2, 3))
            cell_arr = np.asarray(at.cell)
            tv1 = ncv[0] @ cell_arr
            tv2 = ncv[1] @ cell_arr if ncv.shape[0] > 1 else np.zeros(3)
            ang = topo_mod._angle_of(pos, idx[0], idx[1], idx[2],
                                     tv1, tv2)
            if not (ints.atol < ang < np.pi - ints.atol):
                continue
        new.angles.append(a)
        have_a.add(k)
    have_d = {topo_mod._dihedral_key(*d) for d in new.dihedrals}
    for d in ints.dihedrals:
        if not _refs_dummy((d[0], d[1], d[2], d[3])):
            continue
        k = topo_mod._dihedral_key(*d)
        if k not in have_d:
            new.dihedrals.append(d)
            have_d.add(k)
    for g, recs in ints.cons.records.items():
        for r in recs:
            if np.max(np.atleast_1d(r.indices), initial=0) >= nreal:
                new.cons.records[g].append(_copy.deepcopy(r))
    new._engine = None
    return new


def merge_novel_internals(base, lane):
    """Append lane-topology entries missing from ``base`` at the end of
    their kind blocks (keeping every existing q position stable).
    Returns ``(merged, (nb, na, nd))`` with the novel counts."""
    from ..coords import topology as topo_mod

    merged = base.copy()
    have_b = {topo_mod._bond_key(i, j, nc) for (i, j, nc) in base.bonds}
    have_a = {topo_mod._angle_key(*a) for a in base.angles}
    have_d = {topo_mod._dihedral_key(*d) for d in base.dihedrals}
    nb = na = nd = 0
    for (i, j, nc) in lane.bonds:
        k = topo_mod._bond_key(i, j, nc)
        if k not in have_b:
            merged.bonds.append((i, j, nc))
            merged._bond_keys.add(k)
            have_b.add(k)
            nb += 1
    for a in lane.angles:
        k = topo_mod._angle_key(*a)
        if k not in have_a:
            merged.angles.append(a)
            have_a.add(k)
            na += 1
    for d in lane.dihedrals:
        k = topo_mod._dihedral_key(*d)
        if k not in have_d:
            merged.dihedrals.append(d)
            have_d.add(k)
            nd += 1
    merged._engine = None
    return merged, (nb, na, nd)


def _membership_rows(merged, lane) -> np.ndarray:
    """Activity rows of ``lane``'s topology inside ``merged``'s layout.
    Translations, user coordinates and rotations are shared (always
    active)."""
    from ..coords import topology as topo_mod

    rows = np.zeros(merged.nint, bool)
    off_b, off_a, off_d, off_o, off_r = _layout_offsets(merged)
    rows[:off_b] = True
    rows[off_o:] = True
    kb = {topo_mod._bond_key(i, j, nc) for (i, j, nc) in lane.bonds}
    ka = {topo_mod._angle_key(*a) for a in lane.angles}
    kd = {topo_mod._dihedral_key(*d) for d in lane.dihedrals}
    for m, (i, j, nc) in enumerate(merged.bonds):
        rows[off_b + m] = topo_mod._bond_key(i, j, nc) in kb
    for m, a in enumerate(merged.angles):
        rows[off_a + m] = topo_mod._angle_key(*a) in ka
    for m, d in enumerate(merged.dihedrals):
        rows[off_d + m] = topo_mod._dihedral_key(*d) in kd
    return rows


def _old_to_new_map(base, merged) -> np.ndarray:
    """Position of every base-layout q entry inside the merged layout
    (merge appends novel entries at kind-block ends, so each base block
    shifts rigidly)."""
    mp = np.empty(base.nint, np.int64)
    ob = (0,) + _layout_offsets(base)
    om = (0,) + _layout_offsets(merged)
    counts = (base.ntrans, base.nbonds, base.nangles, base.ndihedrals,
              base.nother, base.nrotations)
    for so, sn, c in zip(ob, om, counts):
        mp[so:so + c] = sn + np.arange(c)
    return mp


def repave_lanes(state: InternalSearchState, ints, cfg, bad,
                 cell: Optional[jnp.ndarray] = None,
                 atol_deg: float = 0.5):
    """Rebuild the topology of every ``bad`` lane from its CURRENT
    geometry and keep it converging in-place.

    The batched equivalent of the reference's bad-internal event
    (driver ``optimize.py:384-410``; PES ``peswrapper.py:1129-1174``):

    1. per bad lane, re-discover bonds/angles/dihedrals at the lane's
       geometry (:func:`rebuild_internals_at` — near-linear angles are
       excluded by discovery's ``atol`` window, and linear centers get
       redundant coverage instead of a dummy atom);
    2. merge novel entries into the shared union layout (existing q
       positions never move, so other lanes' state is a pure scatter);
    3. the bad lane's ``qact`` rows become exactly its rebuilt
       topology; every other lane keeps its rows (novel rows inactive);
    4. the bad lane's Hessian is transferred through Cartesian space
       with the curvilinear corrections (the exact sequential-tier
       formula, ``pes/internal.py`` ``update_internals``):
       ``Hx = Bo^T H Bo + hldot_o(gq)``,
       ``H' = Bn^+T (Hx - hldot_n(gq')) Bn^+``.

    A lane whose rebuilt (masked) B cannot span ``cfg.nred`` directions
    falls back to the union of rebuilt + previously active rows; if
    still rank-deficient the lane is left untouched and reported False
    in the returned mask.

    Returns ``(state', ints', cfg', repaved_mask)``. ``cfg'.nint``
    grows when the union gained entries — rebuild the step function
    (and re-shard, if under a mesh) whenever it does.
    """
    # Dummy topologies repave too (round 4, VERDICT r3 item 7): the
    # dummy DOF rows are static per topology signature, so a rebuild
    # that reproduces the original dummy layout re-pads into the same
    # union mechanics as constrained rows. A lane whose rebuilt dummy
    # layout CHANGED (linear center vanished / appeared) now ALSO
    # repaves (round 5, VERDICT r4 item 5): the real topology is
    # re-discovered dummy-free (new linear centers covered by improper
    # redundant coordinates) and the original dummies ride along as
    # pinned spectators, so the static extended DOF count never moves
    # (:func:`_rebuild_reattach_dummies`).
    #
    # Fixed internal coordinates survive a repave: the rebuild folds
    # every ``ints.cons`` record back into the lane topology (the
    # Internals constructor registers them), so the constrained rows
    # are always members of the rebuilt row set and
    # ``fixed_internal_constraints`` re-resolves their (possibly
    # shifted) positions when the step function is rebuilt.
    # topology re-discovery must see the SAME cell the engine
    # evaluates under (wrong cell -> wrong minimum-image bonds in the
    # rebuilt row set); None keeps the base atoms' stored cell
    cell_for_rebuild = None if cell is None else np.asarray(cell)
    if cell is None:
        cell = jnp.zeros((3, 3))
    bad = np.asarray(bad).copy()
    lanes = np.where(bad)[0]
    if lanes.size == 0:
        return state, ints, cfg, bad

    n = cfg.natoms + cfg.ndummies          # extended atom count
    keep_dummies = cfg.ndummies > 0
    xs = np.asarray(state.x)
    rebuilt = {}
    for l in lanes:
        r = rebuild_internals_at(ints, xs[l].reshape(n, 3),
                                 cell=cell_for_rebuild,
                                 keep_dummies=keep_dummies)
        if r is None:
            bad[l] = False          # defensive: rebuild failed outright
        else:
            rebuilt[int(l)] = r
    lanes = np.where(bad)[0]
    if lanes.size == 0:
        return state, ints, cfg, bad
    merged = ints
    for r in rebuilt.values():
        merged, _ = merge_novel_internals(merged, r)
    nint_new = merged.nint
    cfg_new = cfg._replace(nint=nint_new) if nint_new != cfg.nint else cfg

    # scatter every lane's old state into the new layout
    mp = _old_to_new_map(ints, merged)
    Bsz = xs.shape[0]
    qact = np.zeros((Bsz, nint_new), bool)
    qact[:, mp] = np.asarray(state.qact)
    H = np.zeros((Bsz, nint_new, nint_new), dtype=np.asarray(state.H).dtype)
    H[:, mp[:, None], mp[None, :]] = np.asarray(state.H)
    novel = np.ones(nint_new, bool)
    novel[mp] = False
    if novel.any():
        hg = np.diag(merged.guess_hessian())
        H[:, novel, novel] = hg[novel][None, :]

    eng_old = ints._get_engine()
    eng_new = merged._get_engine()
    qact_old = np.asarray(state.qact)
    gq_old_all = np.asarray(state.gq)

    for l in lanes:
        lane = rebuilt[int(l)]
        pos = xs[l].reshape(n, 3)
        rows_new = _membership_rows(merged, lane)
        Bfull = np.asarray(eng_new._jac_impl(pos, cell))
        Bn = Bfull * rows_new[:, None]
        sv = np.linalg.svd(Bn, compute_uv=False)
        if int(np.sum(sv > 1e-8 * max(sv[0], 1e-300))) < cfg.nred:
            # rebuilt set too sparse: augment with previously active
            # rows, EXCLUDING the near-singular angles that triggered
            # the event
            off_b, off_a, off_d, _, _ = _layout_offsets(merged)
            qv = np.asarray(eng_new._calc_impl(pos, cell))
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
        # Hessian transfer through Cartesian space
        Bo = np.asarray(eng_old._jac_impl(pos, cell)) * qact_old[l][:, None]
        gq_o = gq_old_all[l]
        g_cart = gq_o @ Bo
        Binv = np.linalg.pinv(Bn)
        gq_n = g_cart @ Binv
        hld_o = np.asarray(eng_old._hldot_impl(pos, cell, jnp.asarray(gq_o)))
        hld_n = np.asarray(eng_new._hldot_impl(pos, cell, jnp.asarray(gq_n)))
        Hcart = Bo.T @ np.asarray(state.H[l]) @ Bo + hld_o
        H[int(l)] = Binv.T @ (Hcart - hld_n) @ Binv
        qact[int(l)] = rows_new

    if not bad.any():
        # every flagged lane was refused (rank-deficient rebuilds —
        # e.g. a NEW 2-neighbor linear center whose bend the dummy-free
        # rediscovery cannot cover): leave the ensemble untouched.
        # Committing the union growth for lanes that never repave
        # would force a pointless step-fn recompile and re-pad every
        # lane's state (round-5 review finding).
        return state, ints, cfg, bad

    # re-derive (q, gq) for every lane in the new masked layout (q
    # continuity re-bases at principal values — safe, all differences
    # are dihedral-wrapped, same as the restart re-base)
    qact_j = jnp.asarray(qact)
    batch_q = jax.vmap(lambda x: eng_new._calc_impl(x.reshape(n, 3), cell))
    batch_B = jax.vmap(lambda x: eng_new._jac_impl(x.reshape(n, 3), cell))
    q = batch_q(state.x)
    Bm = batch_B(state.x) * qact_j.astype(state.x.dtype)[:, :, None]
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, state.g))

    badj = jnp.asarray(bad)
    state_new = state._replace(
        q=q,
        gq=gq,
        H=jnp.asarray(H),
        qact=qact_j,
        # repaved lanes restart their stagnation bookkeeping: the fmax
        # trajectory is not comparable across topologies
        best_fmax=jnp.where(badj, jnp.inf, state.best_fmax),
        stall=jnp.where(badj, 0, state.stall),
    )
    return state_new, merged, cfg_new, bad


def refill_converged_internal(
    state: InternalSearchState, x_new: jnp.ndarray, avail: jnp.ndarray,
    H0: jnp.ndarray,
):
    """Replace converged lanes with fresh starts (internal-tier
    convergence-mask compaction; mirror of
    :func:`sella_tpu.parallel.ensemble.refill_converged`). Refilled
    lanes restart from the shared Lindh guess Hessian ``H0``; call
    :func:`refresh_internal` afterwards to fill (f, g, q, gq)."""
    take = state.converged & avail
    tk = take[:, None]
    dtype = state.x.dtype
    new_state = InternalSearchState(
        x=jnp.where(tk, x_new, state.x),
        q=jnp.where(tk, jnp.zeros_like(state.q), state.q),
        f=jnp.where(take, jnp.zeros_like(state.f), state.f),
        g=jnp.where(tk, jnp.zeros_like(state.g), state.g),
        gq=jnp.where(tk, jnp.zeros_like(state.gq), state.gq),
        H=jnp.where(take[:, None, None],
                    jnp.broadcast_to(H0[None], state.H.shape), state.H),
        delta=jnp.where(take, jnp.asarray(0.0, dtype), state.delta),
        rho=jnp.where(take, jnp.ones((), dtype), state.rho),
        nsteps_since_diag=jnp.where(take, 0, state.nsteps_since_diag),
        converged=jnp.where(take, False, state.converged),
        nsteps=jnp.where(take, 0, state.nsteps),
        neval=jnp.where(take, 0, state.neval),
        nmatvec=jnp.where(take, 0, state.nmatvec),
        best_fmax=jnp.where(take, jnp.inf, state.best_fmax),
        stall=jnp.where(take, 0, state.stall),
        nrestarts=jnp.where(take, 0, state.nrestarts),
        x_home=jnp.where(tk, x_new, state.x_home),
        # refilled lanes restart on the full shared topology
        qact=jnp.where(tk, True, state.qact),
    )
    return new_state, take


def refresh_internal(state: InternalSearchState, potential, ints,
                     cfg: InternalEnsembleConfig,
                     cell: Optional[jnp.ndarray] = None,
                     mask: Optional[jnp.ndarray] = None,
                     delta0: Optional[float] = None
                     ) -> InternalSearchState:
    """Recompute (f, g, q, gq) for all lanes — call once after refill;
    only ``mask`` lanes' neval counters advance (refilled lanes also
    get their trust radius reset to ``delta0``)."""
    if cell is None:
        cell = jnp.zeros((3, 3))
    n = cfg.natoms + cfg.ndummies
    nr3 = 3 * cfg.natoms
    engine = ints._get_engine()
    f, g = jax.vmap(
        lambda xx: jax.value_and_grad(potential.energy)(xx[:nr3], cell)
    )(state.x)
    if cfg.ndummies:
        g = jnp.concatenate(
            [g, jnp.zeros((g.shape[0], 3 * cfg.ndummies), g.dtype)],
            axis=1,
        )
    q = jax.vmap(lambda x: engine._calc_impl(x.reshape(n, 3), cell))(
        state.x
    )
    Bm = jax.vmap(lambda x: engine._jac_impl(x.reshape(n, 3), cell))(
        state.x
    )
    Bm = Bm * state.qact.astype(Bm.dtype)[:, :, None]
    apply_pinv, _ = _gram_pinv(Bm, cfg.nred)
    gq = apply_pinv(jnp.einsum("bij,bj->bi", Bm, g))
    inc = 1 if mask is None else mask.astype(state.neval.dtype)
    delta = state.delta
    if mask is not None and delta0 is not None:
        delta = jnp.where(mask, jnp.asarray(delta0, delta.dtype), delta)
    return state._replace(f=f, g=g, q=q, gq=gq,
                          neval=state.neval + inc, delta=delta)


def run_internal_ensemble_queue(
    potential,
    ints,
    x0_all: jnp.ndarray,
    cfg: InternalEnsembleConfig,
    batch: int,
    max_steps_per_search: int = 300,
    cell: Optional[jnp.ndarray] = None,
    refill_every: int = 10,
    seed: int = 0,
    spill: Optional[str] = "cartesian",
    spill_max_steps: Optional[int] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
):
    """Process an arbitrarily large work set of internal-coordinate
    searches with a fixed device batch (mirror of
    :func:`sella_tpu.parallel.ensemble.run_ensemble_queue`). Returns a
    list of (x_final, f, nsteps, converged) per input.

    ``spill='cartesian'`` is the batched analogue of the reference's
    bad-internal topology-rebuild event (``optimize.py:384-410``):
    lanes whose angles hit the singular 0/180-deg points (where the
    shared-topology B matrix loses rank) are harvested early and —
    together with any other unconverged inputs — finished by one
    Cartesian ensemble run, whose coordinates need no topology at all
    (user fixed-internal constraints ride along as Cartesian residuals;
    ``spill_max_steps`` overrides the finishing pass's step budget).
    Pass ``spill=None`` to record them unconverged instead. Requires
    ``ndummies == 0`` (dummy constraints have no Cartesian analogue —
    warned and disabled otherwise)."""
    if spill not in (None, "cartesian"):
        raise ValueError(
            f"unknown spill mode {spill!r}: use None or 'cartesian'"
        )
    if spill == "cartesian" and cfg.ndummies:
        import warnings

        warnings.warn(
            "spill='cartesian' requires ndummies == 0 (dummy DOF have "
            "no Cartesian analogue); bad-topology lanes will be "
            "recorded unconverged instead"
        )
        spill = None
    x0_all = jnp.asarray(x0_all)
    if cfg.ndummies and x0_all.shape[1] == 3 * cfg.natoms:
        x0_all = extend_with_dummies(ints, x0_all)
    total = x0_all.shape[0]
    # work set smaller than the device batch: clamp (origin/avail are
    # sized to batch while the state holds total lanes otherwise)
    batch = min(batch, total)
    # resolved once: the spill pass re-expresses these as Cartesian
    # residuals so user constraints survive the topology hand-off
    cons_idx_all, cons_target_all = (
        fixed_internal_constraints(ints) if cfg.ncons else ([], [])
    )
    step = jax.jit(make_internal_step_fn(potential, ints, cfg, cell),
                   donate_argnums=0)
    H0 = jnp.asarray(ints.guess_hessian())
    refill = jax.jit(lambda st, xn, av: refill_converged_internal(
        st, xn, av, H0
    ), donate_argnums=0)

    it0 = 0
    loaded = None
    if checkpoint_path is not None and resume:
        import os as _os

        from .checkpoint import load_queue

        if _os.path.exists(checkpoint_path):
            loaded = load_queue(
                checkpoint_path, InternalSearchState,
                with_retry_state=True, fmax_default=cfg.fmax,
            )
    if loaded is not None:
        state, origin, next_idx, results, _rst = loaded
        # continue the PRNG key stream where the crashed run left it
        it0 = _rst.get("it", 0)
    else:
        state = init_internal_state(potential, ints, x0_all[:batch],
                                    cfg, cell)
        origin = np.arange(batch)
        next_idx = batch
        results = {}
    key = jax.random.PRNGKey(seed)

    cycle = 0
    it = it0
    while len(results) < total:
        for _ in range(refill_every):
            state = step(state, jax.random.fold_in(key, it))
            it += 1

        conv = np.asarray(state.converged)
        nsteps = np.asarray(state.nsteps)
        done = conv | (nsteps >= max_steps_per_search)
        if spill is not None:
            # harvest singular-topology lanes early; the Cartesian
            # pass below finishes them
            done = done | np.asarray(bad_internals_mask(state, ints))
        if not np.any(done):
            continue

        xs = np.asarray(state.x)
        fs = np.asarray(state.f)
        nmv = np.asarray(state.nmatvec)
        nev = np.asarray(state.neval)
        for lane in np.where(done)[0]:
            if origin[lane] >= 0 and origin[lane] not in results:
                # 6-tuple, same shape as the Cartesian queue's results
                # (x, f, nsteps, converged, nmatvec, neval)
                results[int(origin[lane])] = (
                    xs[lane].copy(), float(fs[lane]),
                    int(nsteps[lane]), bool(conv[lane]),
                    int(nmv[lane]), int(nev[lane]),
                )

        # build the replacement block host-side
        x_new = np.array(xs)
        avail = np.zeros(batch, dtype=bool)
        new_origin = origin.copy()
        for lane in np.where(done)[0]:
            if next_idx < total:
                x_new[lane] = np.asarray(x0_all[next_idx])
                avail[lane] = True
                new_origin[lane] = next_idx
                next_idx += 1
            else:
                new_origin[lane] = -1
        # mark ALL done lanes converged: maxed-out lanes become
        # refillable, exhausted-queue lanes idle cheaply
        state = state._replace(converged=jnp.asarray(conv | done))
        if np.any(avail):
            state, take = refill(
                state, jnp.asarray(x_new), jnp.asarray(avail)
            )
            state = refresh_internal(
                state, potential, ints, cfg, cell,
                mask=take, delta0=cfg.delta0,
            )
            origin = new_origin

        cycle += 1
        if checkpoint_path is not None and cycle % checkpoint_every == 0:
            from .checkpoint import save_queue

            save_queue(checkpoint_path, state, origin, next_idx,
                       results, it=it)

    if spill == "cartesian":
        todo = [i for i in range(total) if not results[i][3]]
        if todo:
            from .ensemble import EnsembleConfig
            from .ensemble import run_ensemble as _run_cart

            x_spill = jnp.asarray(
                np.stack([results[i][0] for i in todo])
            )
            ccfg = EnsembleConfig(
                natoms=cfg.natoms, order=cfg.order, fmax=cfg.fmax,
                gamma=cfg.gamma, nproj=cfg.nproj, ncons=cfg.ncons,
            )
            # user fixed-internal constraints must survive the spill:
            # express each as a Cartesian residual q_i(x) - target
            # through the same engine (dihedral rows wrapped), so the
            # finishing pass optimizes on the SAME constraint manifold
            cons_fn = None
            if cfg.ncons:
                engine_s = ints._get_engine()
                cell_s = jnp.zeros((3, 3)) if cell is None else cell
                ci_s = jnp.asarray(cons_idx_all)
                ct_s = jnp.asarray(cons_target_all)
                dih_s = jnp.asarray(
                    _dihedral_mask(ints))[np.asarray(cons_idx_all)]

                def cons_fn(x):
                    q = engine_s._calc_impl(
                        x.reshape(cfg.natoms, 3), cell_s
                    )
                    r = q[ci_s] - ct_s
                    wrapped = r - 2 * jnp.pi * jnp.round(
                        r / (2 * jnp.pi)
                    )
                    return jnp.where(dih_s, wrapped, r)

            cst = _run_cart(potential, x_spill, ccfg,
                            max_steps=(spill_max_steps
                                       or max_steps_per_search),
                            cell=cell, constraints=cons_fn)
            cxs = np.asarray(cst.x)
            cfs = np.asarray(cst.f)
            cconv = np.asarray(cst.converged)
            cns = np.asarray(cst.nsteps)
            cmv = np.asarray(cst.nmatvec)
            cev = np.asarray(cst.neval)
            for j, i in enumerate(todo):
                prev = results[i]
                # pre-counter checkpoint entries restore as 4-tuples
                pmv = prev[4] if len(prev) > 4 else 0
                pev = prev[5] if len(prev) > 5 else 0
                results[i] = (
                    cxs[j].copy(), float(cfs[j]),
                    prev[2] + int(cns[j]), bool(cconv[j]),
                    pmv + int(cmv[j]),
                    pev + int(cev[j]),
                )

    out = [results[i] for i in range(total)]
    return out


def run_internal_ensemble(
    potential,
    ints,
    x0: jnp.ndarray,
    cfg: InternalEnsembleConfig,
    max_steps: int = 100,
    cell: Optional[jnp.ndarray] = None,
    mesh=None,
    seed: int = 0,
    steps_per_call: int = 1,
    repave: bool = False,
    repave_atol_deg: float = 0.5,
    max_repaves_per_lane: int = 2,
):
    """Host loop driving the jitted batched internal step (mirror of
    :func:`sella_tpu.parallel.ensemble.run_ensemble`).

    ``repave=True`` enables the per-lane bad-internal recovery
    (:func:`repave_lanes`): between jitted calls, lanes whose active
    angles hit the singular 0/180-deg window are rebuilt in-place from
    their current geometry — the fixed-ensemble analogue of the
    reference's mid-run rebuild (``optimize.py:384-410``). When the
    union layout grows, the step function is rebuilt (one recompile
    per growth event) and sharding is re-applied. With ``repave=True``
    the return value is ``(state, ints)`` — the topology may have
    grown, and the final ``ints`` is needed to interpret ``state.q``.
    """
    step = make_internal_step_fn(potential, ints, cfg, cell)

    def _make_multi(step_fn):
        def multi_step(state, key):
            def body(i, st):
                return step_fn(st, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, steps_per_call, body, state)

        return jax.jit(multi_step, donate_argnums=0)

    state = init_internal_state(potential, ints, jnp.asarray(x0), cfg,
                                cell)

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
    multi_jit = _make_multi(step)
    key = jax.random.PRNGKey(seed)
    n_calls = (max_steps + steps_per_call - 1) // steps_per_call
    nrepaves = np.zeros(state.x.shape[0], np.int64)
    for i in range(n_calls):
        if repave:
            # checked BEFORE stepping (like the reference's per-step
            # check_for_bad_internals, ``optimize.py:384-410``): a lane
            # that starts — or lands — inside the singular window is
            # repaved before the next step tries to use its B matrix
            bad = np.array(
                bad_internals_mask(state, ints, repave_atol_deg)
            )
            bad &= ~np.asarray(state.converged)
            bad &= nrepaves < max_repaves_per_lane
            if bad.any():
                nint_before = cfg.nint
                state, ints, cfg, done = repave_lanes(
                    state, ints, cfg, bad, cell,
                    atol_deg=repave_atol_deg,
                )
                nrepaves[bad] += 1      # count attempts, even failed
                if cfg.nint != nint_before:
                    step = make_internal_step_fn(potential, ints, cfg,
                                                 cell)
                    multi_jit = _make_multi(step)
                state = _shard(state)
        state = multi_jit(state, jax.random.fold_in(key, i))
        if bool(jnp.all(state.converged)):
            break
    if repave:
        return state, ints
    return state
