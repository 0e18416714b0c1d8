"""Batched ensemble saddle search — the TPU-native execution tier.

This is what the reference cannot do: thousands of concurrent RS-PRFO
saddle searches advancing in lockstep inside ONE jitted XLA program,
sharded over a device mesh. Per-structure matrices are tiny (3N x 3N),
so the batch axis is the only way to reach MXU utilization
(``SURVEY.md`` §2, parallelism statement): every dense op here is a
batched (B, ., .) eigh/QR/solve/matmul, and every force call is a
batched potential evaluation.

Functional redesign of the reference's stateful step
(``/root/reference/sella/optimize/optimize.py:359-440`` +
``peswrapper.py:508-602``):

* state is a :class:`SearchState` pytree (positions, gradient, Hessian,
  trust radius, schedule counters, convergence mask) advanced by a pure
  ``step_fn``;
* the Davidson loop (``eigensolvers.py:31-112``) becomes a fixed-bound
  ``lax.while_loop`` over a statically-sized subspace with per-search
  active masks; matvecs are **exact HVPs** (``jax.jvp`` through the
  potential gradient) rather than finite differences — cheaper, exact,
  and it removes the need for on-the-fly Y-symmetrization;
* the trust-radius alpha root-find (``restricted_step.py:78-120``)
  becomes a masked Newton/bisection ``lax.while_loop`` with per-search
  alpha;
* trust-ratio accept/adjust logic (``optimize.py:412-432``) is
  elementwise ``jnp.where``.

Sharding: state is sharded over the ensemble axis; searches are
independent, so the only cross-chip traffic is batch-level reductions
(convergence counts) — XLA inserts them automatically under jit with
NamedSharding-annotated inputs.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sella_tpu.ops.linalg import batched_eigh

BIG = 1e30
# stiff positive curvature assigned to constrained-out directions in the
# inequality (projector) path: far above any physical eigenvalue, far
# below overflow in the alpha root-find denominators
_CONS_SHIFT = 1e6


class EnsembleConfig(NamedTuple):
    """Static (trace-time) configuration of a batched search."""

    natoms: int
    order: int = 1                 # saddle order (0 = minimization)
    nproj: int = 6                 # projected rigid modes (3 trans + 3 rot)
    fmax: float = 1e-3
    gamma: float = 0.1             # Davidson relative residual target
    delta0: float = 0.1
    delta_min: float = 1e-4
    sigma_inc: float = 1.15
    sigma_dec: float = 0.65
    rho_inc: float = 1.035
    rho_dec: float = 5.0
    nsteps_per_diag: int = 3
    diag_every_n: int = 0          # 0 -> never (reference default: inf)
    davidson_max: int = 0          # 0 -> 2*m+1 capped at m
    rs_maxiter: int = 18           # alpha root-find iterations (exact fori count)
    rs_tol: float = 1e-8
    method: str = "prfo"           # 'prfo' | 'qn'
    rs: str = "ras"                # 'ras' | 'tr'
    eig: bool = True               # run Davidson (saddle default)
    ncons: int = 0                 # number of equality-constraint rows
    ctol: float = 1e-4             # constraint-residual convergence tol
    diag_budget: int = 0           # max lanes re-diagonalized per step
    #   (0 = all). In steady state only ~10% of lanes request a diag on
    #   any step, so running Davidson on a compacted sub-batch (gather
    #   the requesting lanes, run, scatter back) cuts the dominant step
    #   cost; unserved lanes keep their request pending for the next
    #   step and are served longest-waiting-first (aging by
    #   nsteps_since_diag), so no lane starves when requests
    #   persistently exceed the budget.
    #   Trades the strict batch-composition independence guarantee
    #   for throughput — leave at 0 where bitwise reproducibility across
    #   different batch packings matters. The first-step bootstrap diag
    #   is always full-batch.
    restart_after: int = 0         # stagnation restart (0 = disabled):
    #   a lane whose best-seen fmax has not improved for this many steps
    #   is kicked by a random displacement and its Hessian re-bootstrapped
    #   (fresh init diag / secant bootstrap, trust radius reset). The
    #   reference has no analog — its sequential runs simply stall
    #   (verified on LJ4: ~25% of order-1 searches limit-cycle around
    #   index-2 regions in BOTH tiers; the approximate Hessian keeps
    #   losing the surplus negative mode between diags). Randomized
    #   restart is the batched-tier remedy in the spirit of the
    #   reference's Davidson random restart (``eigensolvers.py:100-109``).
    restart_kick: float = 0.25     # kick stddev per DOF
    dmax_restart: float = 0.0      # 0 = off; else restart a lane from
    #   home IMMEDIATELY when its max pair distance exceeds this (the
    #   cluster dissociated onto flat landscape — without the trigger
    #   the lane drifts until the stall counter drains, wasting its
    #   step budget). Only meaningful for cluster searches; requires
    #   the restart machinery to be armed (restart_after > 0, or
    #   conv_inertia's curvature audit for order > 0).
    prfo_eigh: str = "eigh"        # P-RFO prep eigendecomposition:
    #   "eigh" (XLA custom call, honors eigh_f32) or "jacobi" (batched
    #   parallel-order Jacobi in pure gather/scatter/elementwise XLA —
    #   f32-accuracy class, measured far cheaper than the TPU eigh
    #   custom call at ensemble batch sizes; see ops/linalg.jacobi_eigh)
    davidson_seed: str = "grad"    # Davidson start vector: "grad"
    #   (projected gradient — the tier's historical seed) or "pmode"
    #   (leftmost eigenvector of the projected quasi-Newton
    #   preconditioner for warm-Hessian lanes, the REFERENCE's subspace
    #   init from P's negative modes, ``eigensolvers.py:47-50``;
    #   bootstrap lanes with P = I keep the gradient seed). After
    #   TS-BFGS absorption P approximates the true curvature well, so
    #   re-diagonalizations seeded from its leftmost mode converge the
    #   sought mode in far fewer serialized iterations — the dominant
    #   cost of the 453-DOF drain (measured: see bench emt151 notes).
    absb: str = "eigh"             # |B| metric in TS-BFGS: "eigh"
    #   (exact eigendecomposition) or "ns" (Newton–Schulz matrix-sign,
    #   pure batched f32 matmuls — the TPU fast path; milliseconds vs
    #   ~0.9 s for the (4096, 75, 75) eigh on v5e, measured identical
    #   convergence statistics on the bench configs). The metric
    #   weights the multi-secant update; it does not need eigh-exact
    #   small eigenvalues.
    conv_inertia: bool = False     # gate convergence on the projected
    #   quasi-Newton inertia matching ``order`` (exactly `order`
    #   negative eigenvalues; > 0 leftmost for minimizations). The
    #   reference's convergence test is force-only
    #   (``optimize.py:445-455``), which accepts flat DISSOCIATED
    #   configurations (observed on LJ4: a detached atom leaves fmax
    #   below threshold on an index-!=order plateau). The inertia comes
    #   from the P-RFO prep eigendecomposition the step already
    #   computes, so the gate is free; a lane the exact-HVP audit
    #   rejects restarts immediately (even with restart_after=0), and
    #   an inertia-gated lane keeps stepping until a stagnation
    #   restart. Off by default to keep step-for-step parity with the
    #   reference semantics.
    #   NOTE the quasi-Newton inertia is evaluated at the PRE-step
    #   geometry while the force criterion uses the post-step one, so
    #   this gate lags the converging step by one geometry. For
    #   order>0 the exact-HVP curvature audit below closes the gap AT
    #   the new geometry; for order=0 a lane whose leftmost curvature
    #   flips sign on the converging step itself can pass one step
    #   early (bounded by the trust radius of that final, sub-fmax
    #   step).
    conv_curv_min: float = 1e-3    # minimum |leftmost curvature| the
    #   conv_inertia HVP audit demands of a saddle lane (the exact-HVP
    #   check that the quasi-Newton inertia is not an artifact); a
    #   genuine saddle softer than this is held un-converged, so soften
    #   the gate for low-curvature systems.
    update: str = "TS-BFGS"        # quasi-Newton update family:
    #   "TS-BFGS" (reference saddle default), "BFGS", or "BFGS_auto"
    #   (reference minimization default, ``hessian_update.py:80-87``)
    #   — per-lane traceable dispatch, see quasi_newton_update_batched
    eval_chunk: int = 0            # lanes per potential-eval chunk
    #   (0 = whole batch at once). Large ensembles of many-atom periodic
    #   potentials (EMT slab at 4096 lanes) exceed HBM if the vmapped
    #   energy/grad/HVP intermediates materialize for every lane at
    #   once; a nonzero chunk runs the potential through ``lax.map``
    #   over sub-batches of this many lanes, bounding peak memory at
    #   chunk-sized intermediates while the optimizer linear algebra
    #   stays whole-batch. Bitwise identical results; only the eval
    #   scheduling changes. Ignored when the batch is not divisible.
    eigh_f32: bool = False         # run the P-RFO projected eigh and
    #   the TS-BFGS |B| metric in f32 (results cast back to the state
    #   dtype). Empirically identical convergence on the bench configs
    #   (EMT 256: same 23.0 mean steps / 77.6 matvecs / 100% conv) and
    #   ~30% step-time win on v5e, where f64 eigh is emulated. Leave
    #   False where 1e-8 trajectory parity with the sequential tier
    #   matters; the Davidson subspace Ritz solve stays f64 either way.
    pred_min: float = 1e-14        # smallest |predicted dE| the trust
    #   ratio test trusts; below it ratio := 1 (accept, no trust
    #   change) — the reference's ratio=None skip
    #   (``peswrapper.py:586-594``). Raise to ~1e-6 * |E| when the
    #   potential evaluates in f32 (potentials.mixed.F32Potential):
    #   near convergence the predicted dE drops below the f32 energy
    #   noise floor and the raw ratio is noise that would collapse the
    #   trust radius.

    @property
    def dim(self) -> int:
        return 3 * self.natoms

    @property
    def nfree(self) -> int:
        return self.dim - self.nproj - self.ncons

    @property
    def subspace_max(self) -> int:
        m = self.nfree
        k = self.davidson_max if self.davidson_max > 0 else 2 * m + 1
        return min(m, k)


class SearchState(NamedTuple):
    """Per-search optimizer state; every leaf has a leading batch axis."""

    x: jnp.ndarray            # (B, d) flat positions
    f: jnp.ndarray            # (B,) energy
    g: jnp.ndarray            # (B, d) gradient
    B: jnp.ndarray            # (B, d, d) quasi-Newton Hessian
    B_init: jnp.ndarray       # (B,) bool — Hessian bootstrapped?
    delta: jnp.ndarray        # (B,) trust radius
    rho: jnp.ndarray          # (B,) last prediction ratio
    nsteps_since_diag: jnp.ndarray  # (B,) int32
    converged: jnp.ndarray    # (B,) bool
    nsteps: jnp.ndarray       # (B,) int32
    neval: jnp.ndarray        # (B,) int32 gradient evaluations
    nmatvec: jnp.ndarray      # (B,) int32 Davidson matvecs (HVPs)
    best_fmax: jnp.ndarray    # (B,) best fmax since the last restart
    stall: jnp.ndarray        # (B,) int32 steps since best_fmax improved
    nrestarts: jnp.ndarray    # (B,) int32 stagnation restarts taken
    x_home: jnp.ndarray       # (B, d) pristine start (restart anchor)
    fmax_t: jnp.ndarray       # () runtime convergence gate — a scalar
    #   DATA value rather than a compile-time constant, so one compiled
    #   step program serves every tolerance (the bench's 0.02 screening
    #   and 1e-3 north-star runs share one ~9-minute tunnel compile).
    #   Initialized from cfg.fmax; override via
    #   ``state._replace(fmax_t=...)`` with no recompilation.


# ---------------------------------------------------------------------------
# Rigid-mode projection basis
# ---------------------------------------------------------------------------
def free_basis(x: jnp.ndarray, nproj: int) -> jnp.ndarray:
    """Orthonormal basis of the non-rigid subspace, shape (d, d - nproj).

    Rows projected out by ``nproj``: 0 = nothing (identity basis, e.g.
    slabs whose rigid modes a fixed layer removes); 3 = the uniform
    translations; 5 = translations + the two rotations of a LINEAR
    geometry (the axis rotation generator is null — the rigid span is
    the top-2 singular directions of the rotation generators, a
    rank-revealing decision with a STATIC count); 6 = translations +
    the 3 instantaneous rigid rotations about the centroid — the same
    spans the reference builds from its Translation/Rotation constraint
    Jacobians (``internal.py:466-493, 601-648``) at the reference
    geometry. A full QR (static shapes) replaces the rank-revealing
    pivoted QR (``peswrapper.py:51-69``); other nproj values raise at
    trace time rather than returning a basis whose width contradicts
    ``cfg.nfree``.
    """
    d = x.shape[0]
    dtype = x.dtype
    if nproj == 0:
        return jnp.eye(d, dtype=dtype)
    if nproj not in (3, 5, 6):
        raise ValueError(
            f"nproj={nproj} unsupported: 0 (nothing), 3 (translations), "
            "5 (linear: translations + 2 rotations), or 6 "
            "(translations + rotations)"
        )
    n = d // 3
    pos = x.reshape(n, 3)
    cols = []
    for ax in range(3):
        t = jnp.zeros((n, 3), dtype).at[:, ax].set(1.0 / np.sqrt(n))
        cols.append(t.ravel())
    if nproj > 3:
        com = jnp.mean(pos, axis=0)
        rel = pos - com
        gens = []
        for ax in range(3):
            e = jnp.zeros(3, dtype).at[ax].set(1.0)
            r = jnp.cross(jnp.broadcast_to(e, rel.shape), rel)
            gens.append(r.ravel())
        if nproj == 6:
            cols.extend(gens)
        else:
            # degenerate rotations (linear geometry): the physical
            # rigid span is the top-(nproj - 3) singular directions of
            # the generator matrix; rotation generators about the
            # centroid are orthogonal to the uniform translations, so
            # no cross-orthogonalization is needed
            U, _, _ = jnp.linalg.svd(jnp.stack(gens, axis=1),
                                     full_matrices=False)
            for i in range(nproj - 3):
                cols.append(U[:, i])
    A = jnp.stack(cols, axis=1)  # (d, nproj)
    Q, _ = jnp.linalg.qr(A, mode="complete")
    return Q[:, A.shape[1]:]


def constrained_free_basis(x: jnp.ndarray, nproj: int,
                           cons_jac_fn) -> jnp.ndarray:
    """Free basis with equality constraints: the orthogonal complement of
    span(rigid generators) + span(J(x)^T), shape (d, d - nproj - m).

    Batched, static-shape equivalent of the reference's Ufree/Ucons QR
    split (``peswrapper.py:51-69`` + ``internal.py:2810-2840``): the
    constraint rows are required to be mutually independent and
    independent of the retained rigid modes (pick ``nproj`` accordingly —
    e.g. ``nproj=3`` when a constraint pins the orientation), so the
    rank decision is static and one full QR suffices.
    """
    J = cons_jac_fn(x)                      # (m, d)
    gens = []
    if nproj > 0:
        d = x.shape[0]
        n = d // 3
        pos = x.reshape(n, 3)
        dtype = x.dtype
        for ax in range(3):
            t = jnp.zeros((n, 3), dtype).at[:, ax].set(1.0 / np.sqrt(n))
            gens.append(t.ravel())
        if nproj == 6:
            com = jnp.mean(pos, axis=0)
            rel = pos - com
            for ax in range(3):
                e = jnp.zeros(3, dtype).at[ax].set(1.0)
                r = jnp.cross(jnp.broadcast_to(e, rel.shape), rel)
                gens.append(r.ravel())
    A = jnp.concatenate(
        ([jnp.stack(gens, axis=1)] if gens else []) + [J.T], axis=1
    )
    Q, _ = jnp.linalg.qr(A, mode="complete")
    return Q[:, A.shape[1]:]


# ---------------------------------------------------------------------------
# Batched masked Davidson (exact-HVP matvecs)
# ---------------------------------------------------------------------------
def _masked_ritz(V, AV, k, K):
    """Galerkin eigenproblem on the masked subspace.

    Padded columns are exactly zero, so ``V^T AV`` is block structured;
    adding a per-lane shift that dominates the physical spectrum to the
    padded diagonal pushes phantom Ritz values to the top, keeping the
    leftmost (physical) pairs in the first k slots after the
    ascending-order eigh. The shift is moderate (10 K max|Atilde| + 1,
    a Gershgorin-style bound) rather than a global BIG so the
    refined-eigh cluster threshold — scaled by the spectral radius —
    still resolves physical eigenvalue gaps (see
    :func:`sella_tpu.ops.linalg.eigh_refined`).
    """
    Atilde = jnp.einsum("bik,bil->bkl", V, AV)
    Atilde = 0.5 * (Atilde + jnp.swapaxes(Atilde, -1, -2))
    colmask = jnp.arange(K)[None, :] < k[:, None]          # (B, K)
    pad_val = 10.0 * K * jnp.max(
        jnp.abs(Atilde), axis=(-2, -1), keepdims=True
    ) + 1.0
    pad = jnp.where(colmask[:, None, :], 0.0, pad_val)
    Atilde = Atilde + jnp.eye(K, dtype=V.dtype)[None] * pad
    lams, W = batched_eigh(Atilde)
    return lams, W, colmask


# ---------------------------------------------------------------------------
# Batched TS-BFGS update (multi-secant, masked columns)
# ---------------------------------------------------------------------------
def sym_solve(A: jnp.ndarray, b: jnp.ndarray, rcond: float = 1e-14):
    """Batched symmetric-indefinite solve via eigendecomposition.

    TPU XLA implements LU decomposition only for f32 (probe: f64
    ``jnp.linalg.solve`` fails to compile on v5e), but f64 eigh works —
    and the jd0 augmented system is symmetric, so the eigh route is both
    portable and as stable as LDL^T for these tiny matrices.
    """
    lams, V = batched_eigh(A)
    amax = jnp.max(jnp.abs(lams), axis=-1, keepdims=True)
    keep = jnp.abs(lams) > rcond * jnp.maximum(amax, 1e-300)
    inv = jnp.where(keep, 1.0 / jnp.where(keep, lams, 1.0), 0.0)
    return jnp.einsum("bij,bj,bkj,bk->bi", V, inv, V, b)


def _sym_pinv(A: jnp.ndarray, rcond: float = 1e-12) -> jnp.ndarray:
    """Batched pseudo-inverse of a symmetric matrix via eigh (batched
    SVD is ~20x slower on TPU; see _blstsq)."""
    lams, V = batched_eigh(A)
    lmax = jnp.max(jnp.abs(lams), axis=-1, keepdims=True)
    keep = jnp.abs(lams) > rcond * jnp.maximum(lmax, 1e-300)
    inv = jnp.where(keep, 1.0 / jnp.where(keep, lams, 1.0), 0.0)
    return jnp.einsum("bij,bj,bkj->bik", V, inv, V)


def _blstsq(A: jnp.ndarray, Bv: jnp.ndarray, rcond: float = 1e-10):
    """Batched minimum-norm least squares A^+ Bv for SYMMETRIC A
    (masked-zero rows/columns fall out as rank deficiency).

    Implemented through eigh rather than SVD: for symmetric A the two
    factorizations coincide (singular values = |eigenvalues|), and
    batched f64 SVD is pathologically slow on TPU (measured 54 ms for
    (1024, 12, 6) vs 2.5 ms for the same-size eigh on v5e) — it was 60%
    of the whole Davidson+absorb cost. The only consumer is the TS-BFGS
    normal matrix ``XS_S``, which is symmetric PSD by construction.
    """
    lams, V = batched_eigh(A)
    lmax = jnp.max(jnp.abs(lams), axis=-1, keepdims=True)
    keep = jnp.abs(lams) > rcond * jnp.maximum(lmax, 1e-300)
    inv = jnp.where(keep, 1.0 / jnp.where(keep, lams, 1.0), 0.0)
    return jnp.einsum("bij,bj,bkj,bkl->bil", V, inv, V, Bv)


def ts_bfgs_update_batched(
    B: jnp.ndarray, S: jnp.ndarray, Y: jnp.ndarray, mask: jnp.ndarray,
    f32: bool = False, absb: str = "eigh",
) -> jnp.ndarray:
    """Batched multi-secant TS-BFGS (``hessian_update.py:118-125``).

    ``S, Y``: (B, d, K) secant pairs with inactive columns zeroed via
    ``mask`` (B, K). Zero columns fall out of every term (the SVD lstsq
    treats them as rank deficiency). ``absb``: how the |B| metric is
    computed — ``eigh`` (exact) or ``ns`` (Newton–Schulz matmuls, the
    TPU fast path; see :func:`_abs_ns`).
    """
    mask_f = mask.astype(B.dtype)
    S = S * mask_f[:, None, :]
    Y = Y * mask_f[:, None, :]
    J = Y - jnp.einsum("bij,bjk->bik", B, S)
    STY = jnp.einsum("bli,blj->bij", S, Y)                 # (B, K, K)
    X1 = jnp.einsum("bij,bkj->bik", STY, Y)                # X1 = S^T Y Y^T : (B, K, d)
    absB = _abs_psd(B, f32, absb)
    absBS = jnp.einsum("bij,bjk->bik", absB, S)            # (B, d, K)
    X2 = jnp.einsum("bli,blj->bij", S, absBS)              # (B, K, K)
    X2 = jnp.einsum("bij,bkj->bik", X2, absBS)             # (B, K, d)
    XS = X1 + X2                                           # (B, K, d)
    XS_S = jnp.einsum("bid,bdk->bik", XS, S)               # (B, K, K)
    U = jnp.swapaxes(_blstsq(XS_S, XS), -1, -2)            # (B, d, K)
    UJT = jnp.einsum("bik,bjk->bij", U, J)
    JTS = jnp.einsum("bdi,bdj->bij", J, S)                 # (B, K, K)
    delta = UJT + jnp.swapaxes(UJT, -1, -2) - jnp.einsum(
        "bik,bkl,bjl->bij", U, JTS, U
    )
    Bp = B + delta
    return 0.5 * (Bp + jnp.swapaxes(Bp, -1, -2))


def bfgs_update_batched(
    B: jnp.ndarray, S: jnp.ndarray, Y: jnp.ndarray, mask: jnp.ndarray,
) -> jnp.ndarray:
    """Batched multi-secant plain BFGS (``hessian_update.py:114``):
    ``B+ = B + Y (Y^T S)^+ Y^T - B S (S^T B S)^+ S^T B`` with inactive
    secant columns zeroed (they fall out as rank deficiency in the
    pseudo-inverse solves). ``Y^T S`` is symmetrized — the Ritz-rotated
    probes the diag path feeds in satisfy the multi-secant condition
    only approximately."""
    mask_f = mask.astype(B.dtype)
    S = S * mask_f[:, None, :]
    Y = Y * mask_f[:, None, :]
    YTS = jnp.einsum("bdi,bdj->bij", Y, S)
    YTS = 0.5 * (YTS + jnp.swapaxes(YTS, -1, -2))
    t1 = jnp.einsum("bdi,bij,bej->bde", Y, _sym_pinv(YTS), Y)
    BS = jnp.einsum("bij,bjk->bik", B, S)
    STBS = jnp.einsum("bdi,bdj->bij", S, BS)
    STBS = 0.5 * (STBS + jnp.swapaxes(STBS, -1, -2))
    t2 = jnp.einsum("bdi,bij,bej->bde", BS, _sym_pinv(STBS), BS)
    Bp = B + t1 - t2
    return 0.5 * (Bp + jnp.swapaxes(Bp, -1, -2))


def _pd_mask(A: jnp.ndarray) -> jnp.ndarray:
    """(B,) bool — is each (symmetric) matrix positive definite?
    Cholesky-based: NaNs in the factor mean an indefinite pivot. Much
    cheaper than a batched eigh, which is the point — BFGS_auto must
    not reintroduce the eigh the ``absb="ns"`` path removed."""
    L = jnp.linalg.cholesky(A)
    return jnp.all(jnp.isfinite(L), axis=(-2, -1))


def quasi_newton_update_batched(
    B: jnp.ndarray, S: jnp.ndarray, Y: jnp.ndarray, mask: jnp.ndarray,
    f32: bool = False, absb: str = "eigh", method: str = "TS-BFGS",
) -> jnp.ndarray:
    """Batched quasi-Newton update dispatch (``EnsembleConfig.update``).

    ``TS-BFGS`` (default, the reference's saddle recommendation),
    ``BFGS``, or ``BFGS_auto`` — the reference's recommended
    *minimization* default (``hessian_update.py:80-87``): plain BFGS
    whenever both B and the secant overlap ``S^T Y`` (in the ``S^T S``
    metric) are positive definite on a lane, TS-BFGS otherwise. The
    reference's dispatch is an eager Python branch; here it is a
    per-lane traceable select, so heterogeneous ensembles mix both
    updates inside one jitted step."""
    if method == "TS-BFGS":
        return ts_bfgs_update_batched(B, S, Y, mask, f32, absb)
    if method == "BFGS":
        return bfgs_update_batched(B, S, Y, mask)
    if method != "BFGS_auto":
        raise ValueError(f"Unknown batched update method {method}")
    mask_f = mask.astype(B.dtype)
    Sm = S * mask_f[:, None, :]
    Ym = Y * mask_f[:, None, :]
    K = S.shape[-1]
    pad = jnp.eye(K, dtype=B.dtype)[None] * (1.0 - mask_f)[:, None, :]
    STY = jnp.einsum("bdi,bdj->bij", Sm, Ym)
    STY = 0.5 * (STY + jnp.swapaxes(STY, -1, -2)) + pad
    STS = jnp.einsum("bdi,bdj->bij", Sm, Sm) + pad
    # lam(STY, STS) > 0 <=> whitened STY is PD; STS is PD after the
    # inactive-column identity padding
    Ls = jnp.linalg.cholesky(STS)
    Li = _btrisolve_lower(
        Ls, jnp.broadcast_to(jnp.eye(K, dtype=B.dtype), Ls.shape)
    )
    W = jnp.einsum("bij,bjk,blk->bil", Li, STY, Li)
    use_bfgs = _pd_mask(B) & _pd_mask(0.5 * (W + jnp.swapaxes(W, -1, -2)))
    B_bf = bfgs_update_batched(B, S, Y, mask)
    B_bf = jnp.where(jnp.isfinite(B_bf), B_bf, 0.0)
    B_ts = ts_bfgs_update_batched(B, S, Y, mask, f32, absb)
    return jnp.where(use_bfgs[:, None, None], B_bf, B_ts)


def _btrisolve_lower(L: jnp.ndarray, Bv: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-triangular solve L X = Bv."""
    return jax.scipy.linalg.solve_triangular(L, Bv, lower=True)


def eigh_maybe_f32(A: jnp.ndarray, f32: bool = False):
    """Batched symmetric eigh through the session-wide chokepoint
    (:func:`sella_tpu.ops.linalg.batched_eigh`): ``f32=True`` forces the
    cast-down fast path (the EnsembleConfig.eigh_f32 flag); otherwise
    the session default applies (native f64; ``SELLA_TPU_EIGH``
    overrides). Structurally degenerate spectra must call
    ``eigh_refined`` directly — see ``_gram_pinv``."""
    return batched_eigh(A, "f32" if f32 else None)


def _abs_ns(B: jnp.ndarray, iters: int = 24) -> jnp.ndarray:
    """|B| via the Newton–Schulz matrix-sign iteration (f32 matmuls).

    For symmetric B, |B| = sign(B) B with sign(B) = V sign(lam) V^T;
    the sign function comes from X_{k+1} = 1.5 X_k - 0.5 X_k^3 seeded
    with X_0 = B/||B||_F. Everything is batched (B, d, d) matmuls —
    MXU-resident — replacing the batched eigh that dominated the
    TS-BFGS secant update (the eigh costs ~0.9 s at (4096, 75, 75) f32
    on v5e; this runs in milliseconds). Eigenvalues smaller than
    ~1.5^-iters of the Frobenius norm come out shrunk toward zero,
    which is harmless for a quasi-Newton *metric*: their weight in
    |B| is O(|lam|) to begin with."""
    dt = B.dtype
    X = B.astype(jnp.float32)
    nrm = jnp.linalg.norm(X, axis=(-2, -1), keepdims=True)
    X = X / jnp.maximum(nrm, 1e-30)

    def body(_, Xk):
        X2 = jnp.einsum("bij,bjk->bik", Xk, Xk)
        return 1.5 * Xk - 0.5 * jnp.einsum("bij,bjk->bik", X2, Xk)

    S = jax.lax.fori_loop(0, iters, body, X)
    A = jnp.einsum("bij,bjk->bik", S, B.astype(jnp.float32))
    return (0.5 * (A + jnp.swapaxes(A, -1, -2))).astype(dt)


def _abs_psd(B: jnp.ndarray, f32: bool = False,
             method: str = "eigh") -> jnp.ndarray:
    """|B| (batched): ``eigh`` exact, ``ns`` Newton–Schulz matmuls."""
    if method == "ns":
        return _abs_ns(B)
    lams, V = eigh_maybe_f32(B, f32)
    return jnp.einsum("bik,bk,bjk->bij", V, jnp.abs(lams), V)


def bootstrap_B_batched(S, Y, mask, dim):
    """Scaled-identity bootstrap from the geometric-mean |Ritz| value
    (``hessian_update.py:59-67``), batched with masked columns."""
    STY = jnp.einsum("bli,blj->bij", S, Y)
    STY = 0.5 * (STY + jnp.swapaxes(STY, -1, -2))
    K = STY.shape[-1]
    colmask = mask
    pad = jnp.where(colmask, 0.0, 1.0)
    STY = STY + jnp.eye(K, dtype=STY.dtype)[None] * pad[:, None, :]
    thetas = batched_eigh(STY)[0]
    logs = jnp.log(jnp.maximum(jnp.abs(thetas), 1e-12))
    # average only over the active columns: padded eigenvalues are 1 -> log 0,
    # so sum(logs)/k is exactly the masked mean
    k = jnp.maximum(jnp.sum(colmask, axis=1), 1)
    lam0 = jnp.exp(jnp.sum(logs, axis=1) / k)
    return lam0[:, None, None] * jnp.eye(dim, dtype=STY.dtype)[None]


# ---------------------------------------------------------------------------
# Batched P-RFO / QN trust-region step
# ---------------------------------------------------------------------------
def _rfo_secular(gsub, d, alpha, highest: bool, niter: int = 32):
    """Batched RFO subproblem via the arrowhead secular equation,
    solved in the POLE-SHIFTED variable (LAPACK dlaed4's trick).

    The alpha-scaled augmented matrix [[a^2 D, a g], [a g^T, 0]] is an
    arrowhead with KNOWN diagonal (D comes pre-diagonalized from the
    hoisted eigh in :func:`prfo_prepare_batched`), so the one extreme
    eigenpair the step needs solves the scalar secular equation
    ``f(lam) = lam - sum_i a^2 g_i^2 / (lam - a^2 d_i) = 0`` —
    elementwise O(B q) work per iteration instead of a batched
    (B, q+1, q+1) eigh PER ALPHA EVALUATION of the trust root-find
    (which profiling showed was ~73% of the EMT ensemble step).

    Numerics: the extreme root can sit a relative distance below f64
    eps from its bracketing pole (tiny coupling g_i at the extreme
    pole), where iterating on lam itself stalls at the representation
    floor and the step components ``s_i = a^2 g_i/(lam - a^2 d_i)``
    lose all their digits. Solving for the GAP ``mu = |lam - edge|``
    instead — with exact pole offsets ``delta_i = p_i - edge`` and a
    cancellation-free quadratic initial guess — keeps full relative
    precision: validated at <= 4e-10 worst-case relative step error
    against an 80-bit reference where the old lam-space iteration was
    100% wrong, while needing 32 instead of 56 iterations. ``highest``
    reduces to the lowest-root case via d -> -d, lam -> -lam. The
    alpha derivative comes from implicit differentiation, FD-validated
    to 1e-8."""
    sign = -1.0 if highest else 1.0
    a2 = alpha[:, None] ** 2
    p = a2 * (sign * d)                # poles of the reduced problem
    num = a2 * gsub                    # a^2 g_i
    g2 = num * gsub                    # a^2 g_i^2 >= 0
    coupled = g2 > 0.0
    gnorm = jnp.sqrt(jnp.sum(g2, axis=1))      # |a g|_2

    big = jnp.asarray(BIG, gsub.dtype)
    p_eff = jnp.where(coupled, p, big)
    edge = jnp.minimum(jnp.min(p_eff, axis=1), 0.0)
    delta = p - edge[:, None]          # >= 0, exact at the edge pole
    # F(mu) = edge - mu + sum_i g2_i/(delta_i + mu): strictly
    # decreasing and convex on mu > 0 with a unique root in (0, gnorm]
    m_bind = coupled & (delta <= 0.0)
    g2_bind = jnp.sum(jnp.where(m_bind, g2, 0.0), axis=1)
    C0 = jnp.sum(
        jnp.where(m_bind | ~coupled, 0.0,
                  g2 / jnp.maximum(delta, 1e-300)),
        axis=1,
    )
    b = edge + C0
    disc = jnp.sqrt(b * b + 4.0 * g2_bind)
    # stable quadratic root of the two-term model (no b+disc
    # cancellation when b < 0 and the gap ~ g2_bind/|b| is tiny)
    mu0 = jnp.where(
        b > 0.0, 0.5 * (b + disc),
        2.0 * g2_bind / jnp.maximum(disc - b, 1e-300),
    )
    mu0 = jnp.clip(mu0, 1e-300, gnorm + 1e-30)

    def F_dF(mu):
        den = delta + mu[:, None]
        ok = den > 1e-300
        inv = jnp.where(ok & coupled, 1.0 / jnp.where(ok, den, 1.0),
                        0.0)
        F = edge - mu + jnp.sum(g2 * inv, axis=1)
        dF = -1.0 - jnp.sum(g2 * inv * inv, axis=1)
        return F, dF

    def body(_, st):
        mu, lo, hi = st
        F, dF = F_dF(mu)
        lo = jnp.where(F > 0, mu, lo)
        hi = jnp.where(F > 0, hi, mu)
        newt = mu - F / dF
        bad = ~jnp.isfinite(newt) | (newt <= lo) | (newt >= hi)
        mu_new = jnp.where(bad, 0.5 * (lo + hi), newt)
        return mu_new, lo, hi

    mu, _, _ = jax.lax.fori_loop(
        0, niter, body,
        (mu0, jnp.zeros_like(gnorm), gnorm + 1e-30),
    )

    # reduced-frame den = lam_low - p = -(delta + mu), exact at poles;
    # original frame: lowest -> identity, highest -> lam = -lam_low,
    # den_orig = -(lam_low - p) so inv flips sign
    den = -(delta + mu[:, None])
    ok = jnp.abs(den) > 1e-300
    inv = jnp.where(ok & coupled, 1.0 / jnp.where(ok, den, 1.0), 0.0)
    inv_o = -inv if highest else inv
    s = num * inv_o

    # dlam/dalpha by implicit differentiation of f(lam, alpha) = 0
    _, dF = F_dF(mu)
    df_dlam = -dF                       # = 1 + sum g2 inv^2 > 0
    a = alpha[:, None]
    df_dalpha = -jnp.sum(
        2 * a * gsub**2 * inv_o + 2 * a**3 * d * gsub**2 * inv_o * inv_o,
        axis=1,
    )
    dlam = -df_dalpha / df_dlam
    ds = (
        2 * a * gsub * inv_o
        - num * (dlam[:, None] - 2 * a * d) * inv_o * inv_o
    )
    return s, ds


def prfo_prepare_batched(g, Hproj, order: int, f32: bool = False,
                         method: str = "eigh"):
    """Alpha-independent PRFO precomputation: one batched eigh, hoisted
    out of the alpha root-find (the eigendecomposition is reused by
    every alpha evaluation). ``method="jacobi"`` routes through the
    gather/scatter parallel-order Jacobi (:func:`sella_tpu.ops.linalg.
    jacobi_eigh`) instead of the XLA eigh custom call — same f32
    accuracy class as ``f32=True``, a fraction of the cost on TPU."""
    if method == "jacobi":
        try:
            # the Pallas kernel is TPU-only ("axon" = the tunneled TPU
            # platform); any other accelerator (gpu/cuda/rocm) must take
            # the portable gather/scatter path below, not import a TPU
            # kernel it cannot lower
            on_tpu = jax.default_backend() in ("tpu", "axon")
        except Exception:
            on_tpu = False
        if on_tpu:
            from sella_tpu.ops.pallas_eigh import jacobi_eigh_tpu

            lams, V = jacobi_eigh_tpu(Hproj)
        else:
            from sella_tpu.ops.linalg import jacobi_eigh

            lams, V = jacobi_eigh(Hproj)
        lams = lams.astype(Hproj.dtype)
        V = V.astype(Hproj.dtype)
    else:
        lams, V = eigh_maybe_f32(Hproj, f32)
    gV = jnp.einsum("bij,bi->bj", V, g)
    return lams, V, gV


def prfo_step_batched(prep, order: int, alpha):
    """Batched P-RFO step in the free subspace at per-search alpha
    (``stepper.py:160-185``)."""
    lams, V, gV = prep
    if order > 0:
        smax, dsmax = _rfo_secular(
            gV[:, :order], lams[:, :order], alpha, highest=True
        )
    else:
        smax = dsmax = None
    smin, dsmin = _rfo_secular(
        gV[:, order:], lams[:, order:], alpha, highest=False
    )
    if order > 0:
        s = jnp.einsum("bij,bj->bi", V[:, :, :order], smax) + jnp.einsum(
            "bij,bj->bi", V[:, :, order:], smin
        )
        ds = jnp.einsum("bij,bj->bi", V[:, :, :order], dsmax) + jnp.einsum(
            "bij,bj->bi", V[:, :, order:], dsmin
        )
    else:
        s = jnp.einsum("bij,bj->bi", V, smin)
        ds = jnp.einsum("bij,bj->bi", V, dsmin)
    return s, ds


def qn_step_batched(prep, order: int, alpha):
    """Batched shifted quasi-Newton/MMF step (``stepper.py:58-96``)."""
    lams, V, gV = prep
    q = lams.shape[-1]
    sign = jnp.where(jnp.arange(q)[None, :] < order, -1.0, 1.0)
    L = jnp.abs(lams) * sign
    denom = L + alpha[:, None] * sign
    sproj = gV / denom
    s = -jnp.einsum("bij,bj->bi", V, sproj)
    ds = jnp.einsum("bij,bj->bi", V, sproj * sign / denom)
    return s, ds


class _RSState(NamedTuple):
    alpha: jnp.ndarray
    lower: jnp.ndarray
    upper: jnp.ndarray
    s: jnp.ndarray
    done: jnp.ndarray
    it: jnp.ndarray


def _step_norm(s_full, ds_full, rs: str, natoms: int):
    """'ras' (max per-atom displacement) or 'tr' (2-norm) with analytic
    alpha-derivative (``restricted_step.py:127-183``)."""
    if rs == "tr":
        val = jnp.linalg.norm(s_full, axis=1)
        dval = jnp.einsum("bi,bi->b", ds_full, s_full) / jnp.maximum(
            val, 1e-12
        )
        return val, dval
    s3 = s_full.reshape(-1, natoms, 3)
    ds3 = ds_full.reshape(-1, natoms, 3)
    norms = jnp.linalg.norm(s3, axis=2)
    idx = jnp.argmax(norms, axis=1)
    b = jnp.arange(s3.shape[0])
    val = norms[b, idx]
    dval = jnp.einsum("bi,bi->b", ds3[b, idx], s3[b, idx]) / jnp.maximum(
        val, 1e-12
    )
    return val, dval


def restricted_step_batched(
    g_free, Hproj, Ufree, delta, cfg: EnsembleConfig, prep=None,
    norm_fn=None, stepper_fn=None,
):
    """Map per-search trust radii to steps: masked Newton/bisection on
    ||s(alpha)|| = delta (``restricted_step.py:78-120``), all searches
    advancing one alpha-evaluation (one batched small-eigh) per loop
    iteration.

    ``norm_fn(s_full, ds_full) -> (val, dval)`` overrides the step norm
    (the internal-coordinate tier passes the weighted max-internal-step
    norm); default is cfg.rs ('ras'/'tr') on Cartesian geometry.
    ``stepper_fn(prep, order, alpha) -> (s_free, ds_free)`` overrides
    the step family (the IRC tier passes the mass-weighted qn_irc
    stepper); it uses the qn alpha schedule unless cfg.method is
    'prfo'."""
    stepper = prfo_step_batched if cfg.method == "prfo" else qn_step_batched
    if stepper_fn is not None:
        stepper = stepper_fn
    Bsz = g_free.shape[0]
    dtype = g_free.dtype

    if cfg.method == "prfo":
        alpha0, amin, amax, slope = 1.0, 0.0, 1.0, 1.0
        newton_safe = False
    else:
        alpha0, amin, amax, slope = 0.0, 0.0, jnp.inf, -1.0
        newton_safe = True

    if prep is None:
        prep = prfo_prepare_batched(g_free, Hproj, cfg.order)

    def eval_at(alpha):
        s_free, ds_free = stepper(prep, cfg.order, alpha)
        s_full = jnp.einsum("bij,bj->bi", Ufree, s_free)
        ds_full = jnp.einsum("bij,bj->bi", Ufree, ds_free)
        if norm_fn is not None:
            val, dval = norm_fn(s_full, ds_full)
        else:
            val, dval = _step_norm(s_full, ds_full, cfg.rs, cfg.natoms)
        return s_full, val, dval

    alpha = jnp.full((Bsz,), alpha0, dtype)
    s, val, dval = eval_at(alpha)
    # interior step: accept immediately
    done0 = val < delta
    smag0 = val

    st = _RSState(
        alpha,
        jnp.full((Bsz,), amin, dtype),
        jnp.full((Bsz,), amax, dtype),
        s,
        done0,
        jnp.int32(0),
    )

    # Fixed-count fori_loop, Newton allowed throughout. The earlier
    # lax.while_loop cost ~3x more PER ITERATION on TPU (its any()-
    # condition forces a device round-trip between iterations, so the
    # ~30 tiny kernels per alpha evaluation cannot pipeline), and its
    # forced post-4-iteration bisection needed ~30 iterations for
    # rs_tol where safeguarded Newton needs ~10-15 (measured: 285 ms
    # -> 47 ms for the batch=4096 LJ4 root-find at equal accuracy,
    # 4095/4096 lanes at 1e-8 in 16 iterations).
    def body(_, st: _RSState):
        s, val, dval = eval_at(st.alpha)
        err = val - delta
        newly_done = jnp.abs(err) <= cfg.rs_tol
        done = st.done | newly_done

        shrink_up = err * slope > 0
        upper = jnp.where(shrink_up, st.alpha, st.upper)
        lower = jnp.where(shrink_up, st.lower, st.alpha)

        a1 = st.alpha - err / jnp.where(dval != 0, dval, 1.0)
        newton_bad = (
            jnp.isnan(a1)
            | (a1 <= lower)
            | (a1 >= upper)
            | (dval == 0)
        )
        a2 = 0.5 * (lower + upper)
        # unbounded upper (qn): grow alpha geometrically
        a2 = jnp.where(
            jnp.isinf(a2),
            st.alpha + jnp.maximum(1.0, 0.5 * st.alpha),
            a2,
        )
        alpha_new = jnp.where(newton_bad, a2, a1)
        alpha_new = jnp.where(done, st.alpha, alpha_new)
        return _RSState(alpha_new, lower, upper,
                        jnp.where(done[:, None], st.s, s),
                        done, st.it + 1)

    st = jax.lax.fori_loop(0, cfg.rs_maxiter, body, st)
    # final evaluation at the converged alpha for not-yet-copied steps
    s_fin, val_fin, _ = eval_at(st.alpha)
    s_out = jnp.where(done0[:, None], s, s_fin)
    smag = jnp.where(done0, smag0, jnp.minimum(val_fin, delta))
    return s_out, smag


# ---------------------------------------------------------------------------
# Full batched optimizer step
# ---------------------------------------------------------------------------
def _chunk_lanes(vfn, chunk):
    """Run a vmapped-over-lanes function in ``chunk``-lane sub-batches.

    ``lax.map`` over the reshaped leading axis serializes the chunks so
    only one chunk's worth of potential intermediates is live at a time
    (the memory fix that lets EMT slabs run at 4096 lanes in 16 GB HBM).
    Falls back to the plain whole-batch call when chunking is disabled
    or the batch is not divisible by the chunk."""
    if not chunk:
        return vfn

    def run(*args):
        B = args[0].shape[0]
        if B <= chunk or B % chunk:
            return vfn(*args)
        resh = tuple(
            a.reshape((B // chunk, chunk) + a.shape[1:]) for a in args
        )
        out = jax.lax.map(lambda t: vfn(*t), resh)
        return jax.tree_util.tree_map(
            lambda o: o.reshape((B,) + o.shape[2:]), out
        )

    return run


def _batched_eval(potential, cell, chunk=0):
    def one(x):
        return jax.value_and_grad(potential.energy)(x, cell)

    return _chunk_lanes(jax.vmap(one), chunk)


def _batched_hvp_full(potential, cell, chunk=0):
    """Full-space exact HVP of the potential at x along v (batched)."""

    def one(x, v):
        gfun = lambda y: jax.grad(potential.energy)(y, cell)
        return jax.jvp(gfun, (x,), (v,))[1]

    return _chunk_lanes(jax.vmap(one), chunk)


def _davidson_and_absorb(potential, cell, cfg: EnsembleConfig, x, g, B,
                         B_init, Ufree, active, key, cons_jac=None,
                         cons_active=None, tang_proj=None):
    """Run batched Davidson at x and absorb every HVP probe into B
    (the reference's diag + full-probe TS-BFGS absorption,
    ``peswrapper.py:508-556``).

    With ``cons_jac`` the operator is the Lagrangian Hessian
    W v = H v - sum_k lam_k (d2c_k) v with least-squares multipliers
    lam = (J J^T)^{-1} J g — the batched form of the reference's
    constraint-curvature correction (``peswrapper.py:360-380`` get_Hc /
    get_HL), so curvature tangent to a curved constraint manifold is
    judged correctly. ``cons_active`` (B, m) masks inactive inequality
    rows out of the multipliers; ``tang_proj`` (B, nfree, nfree), the
    projector onto the active-constraint tangent space in free
    coordinates, confines the Davidson operator to that space and gives
    the projected-out directions a stiff positive shift (they can never
    masquerade as the negative modes being sought).

    Callers gate this behind ``lax.cond(jnp.any(active), ...)`` so steps
    where NO lane is scheduled to diagonalize skip the whole machinery
    (one batched HVP + Ritz eigh + TS-BFGS would otherwise execute and
    be masked away every step)."""
    K = cfg.subspace_max
    hvp_full = _batched_hvp_full(potential, cell, cfg.eval_chunk)
    if cons_jac is not None:
        J = jax.vmap(cons_jac)(x)                       # (B, m, d)
        if cons_active is not None:
            J = J * cons_active[:, :, None]
        JJt = jnp.einsum("bij,bkj->bik", J, J)
        lam = sym_solve(JJt, jnp.einsum("bij,bj->bi", J, g))  # (B, m)
        hvp_pot = hvp_full

        def _corr_one(x1, v1, l1):
            # directional derivative of J(x)^T lam at fixed lam
            return jax.jvp(lambda y: cons_jac(y).T @ l1, (x1,), (v1,))[1]

        def hvp_full(xb, vb):  # noqa: F811 — Lagrangian-corrected
            return hvp_pot(xb, vb) - jax.vmap(_corr_one)(xb, vb, lam)

    nfree = Ufree.shape[2]

    if tang_proj is None:
        def hvp_free(v_free):
            v_full = jnp.einsum("bij,bj->bi", Ufree, v_free)
            Av_full = hvp_full(x, v_full)
            return jnp.einsum("bij,bi->bj", Ufree, Av_full), Av_full
    else:
        def hvp_free(v_free):
            vt = jnp.einsum("bij,bj->bi", tang_proj, v_free)
            v_full = jnp.einsum("bij,bj->bi", Ufree, vt)
            Av_full = hvp_full(x, v_full)
            Av = jnp.einsum(
                "bij,bi->bj",
                tang_proj,
                jnp.einsum("bij,bi->bj", Ufree, Av_full),
            )
            # stiff shift along projected-out directions
            Av = Av + _CONS_SHIFT * (v_free - vt)
            return Av, Av_full

    # preconditioner: projected quasi-Newton B (identity when fresh)
    P = jnp.einsum("bij,bjk,bkl->bil", jnp.swapaxes(Ufree, 1, 2), B, Ufree)
    eye = jnp.eye(nfree, dtype=x.dtype)[None]
    P = jnp.where(B_init[:, None, None], P, eye)
    if tang_proj is not None:
        P = (
            jnp.einsum("bij,bjk,bkl->bil", tang_proj, P, tang_proj)
            + _CONS_SHIFT * (eye - tang_proj)
        )

    v0 = jnp.einsum("bij,bi->bj", Ufree, g)
    if tang_proj is not None:
        v0 = jnp.einsum("bij,bj->bi", tang_proj, v0)

    # seed="pmode": precompute P's eigendecomposition here (shared
    # with the loop's Olsen solves) and start from its leftmost mode.
    # The default "grad" path leaves P_eig=None so its traced graph —
    # hence the persistent-compile-cache key of every warm program —
    # is byte-identical to the historical one.
    P_eig = None
    if getattr(cfg, "davidson_seed", "grad") == "pmode":
        P_eig = batched_eigh(P)
        # leftmost P-mode for warm-Hessian lanes (reference subspace
        # init, ``eigensolvers.py:47-50``); gradient seed for
        # bootstraps where P is the identity
        v0 = jnp.where(B_init[:, None], P_eig[1][:, :, 0], v0)

    V, AVp, YF, k = _davidson_loop(
        hvp_free, P, v0, cfg.gamma, K, active, key, P_eig=P_eig,
    )

    # Rotate probes A-diagonal before the update (``peswrapper.py:546-553``)
    lams, W, colmask = _masked_ritz(V, AVp, k, K)
    Vr = jnp.einsum("bik,bkl->bil", V, W)
    YFr = jnp.einsum("bik,bkl->bil", YF, W)
    S_full = jnp.einsum("bij,bjk->bik", Ufree, Vr)
    mask = colmask

    B_boot = bootstrap_B_batched(S_full, YFr, mask, cfg.dim)
    B_base = jnp.where(B_init[:, None, None], B, B_boot)
    B_new = quasi_newton_update_batched(
        B_base, S_full, YFr, mask,
        getattr(cfg, 'eigh_f32', False), getattr(cfg, 'absb', 'eigh'),
        getattr(cfg, 'update', 'TS-BFGS'))
    B_out = jnp.where(active[:, None, None], B_new, B)
    return B_out, B_init | active, k


def _davidson_loop(hvp_free2, P, v0, gamma, K, active_in, key,
                   P_eig=None):
    """davidson_batched variant whose hvp returns (projected, full)
    actions; stores the full actions alongside for secant absorption.
    ``P_eig``: optional precomputed ``(lams, Q)`` eigendecomposition of
    the preconditioner (callers that also need it for seeding pass it
    in so it is computed once)."""
    Bsz, m = v0.shape
    dtype = v0.dtype
    d_full = None

    nrm = jnp.linalg.norm(v0, axis=1, keepdims=True)
    e0 = jnp.zeros((Bsz, m), dtype).at[:, 0].set(1.0)
    v0 = jnp.where(nrm > 1e-12, v0 / jnp.where(nrm > 0, nrm, 1.0), e0)

    Av0p, Av0f = hvp_free2(v0)
    d_full = Av0f.shape[1]

    V = jnp.zeros((Bsz, m, K), dtype).at[:, :, 0].set(v0)
    AVp = jnp.zeros((Bsz, m, K), dtype).at[:, :, 0].set(Av0p)
    YF = jnp.zeros((Bsz, d_full, K), dtype).at[:, :, 0].set(Av0f)

    class _St(NamedTuple):
        V: jnp.ndarray
        AVp: jnp.ndarray
        YF: jnp.ndarray
        k: jnp.ndarray
        running: jnp.ndarray
        it: jnp.ndarray

    def ritz(V, AVp, k):
        lams, W, colmask = _masked_ritz(V, AVp, k, K)
        Vr = jnp.einsum("bik,bkl->bil", V, W)
        AVr = jnp.einsum("bik,bkl->bil", AVp, W)
        neg = jnp.sum((lams < 0) & colmask, axis=1)
        nneg = jnp.maximum(1, neg)
        R = AVr - Vr * lams[:, None, :]
        Rnorm = jnp.linalg.norm(R, axis=1)
        conv = (Rnorm < gamma * jnp.abs(lams)) & (k[:, None] > 1)
        idx = jnp.arange(K)[None, :]
        of_interest = (idx < nneg[:, None]) & colmask
        unconv = of_interest & ~conv
        seeking = jnp.argmax(unconv, axis=1)
        any_unconv = jnp.any(unconv, axis=1)
        return lams, Vr, AVr, R, seeking, any_unconv, W

    # One eigendecomposition of the (iteration-independent) jd0
    # preconditioner per Davidson call; each iteration's augmented solve
    # [[P - theta I, v], [v^T, 0]] is then two diagonal applications via
    # the Olsen formula — saving one batched eigh per expansion (~2.6 ms
    # per iteration at batch 1024 f64 on v5e).
    lamsP, QP = P_eig if P_eig is not None else batched_eigh(P)

    def pinv_shift_apply(theta, x):
        """(P - theta I)^+ x through the precomputed eigenbasis."""
        denom = lamsP - theta[:, None]
        scale = jnp.max(jnp.abs(lamsP), axis=1, keepdims=True) + 1e-300
        keep = jnp.abs(denom) > 1e-12 * scale
        inv = jnp.where(keep, 1.0 / jnp.where(keep, denom, 1.0), 0.0)
        return jnp.einsum(
            "bij,bj,bkj,bk->bi", QP, inv, QP, x
        )

    def cond(st):
        return jnp.any(st.running) & (st.it < K - 1)

    def body(st):
        lams, Vr, AVr, R, seeking, any_unconv, W = ritz(st.V, st.AVp, st.k)
        YFr = jnp.einsum("bik,bkl->bil", st.YF, W)
        run = st.running & any_unconv & (st.k < K)

        bidx = jnp.arange(Bsz)
        theta = lams[bidx, seeking]
        r = R[bidx, :, seeking]
        vi = Vr[bidx, :, seeking]

        # Olsen/JD correction: t = -(y1 - (v^T y1 / v^T y2) y2) with
        # y1 = (P - theta)^+ r, y2 = (P - theta)^+ v; t is normalized
        # below, so the global sign is immaterial.
        y1 = pinv_shift_apply(theta, r)
        y2 = pinv_shift_apply(theta, vi)
        num = jnp.einsum("bi,bi->b", vi, y1)
        den = jnp.einsum("bi,bi->b", vi, y2)
        safe = jnp.abs(den) > 1e-300
        alpha = jnp.where(safe, num / jnp.where(safe, den, 1.0), 0.0)
        t = y1 - alpha[:, None] * y2

        tnorm = jnp.linalg.norm(t, axis=1, keepdims=True)
        bad = (~jnp.all(jnp.isfinite(t), axis=1, keepdims=True)) | (
            tnorm < 1e-300
        )
        rnorm = jnp.linalg.norm(r, axis=1, keepdims=True)
        rhat = r / jnp.where(rnorm > 0, rnorm, 1.0)
        t = jnp.where(bad, rhat, t / jnp.where(tnorm > 0, tnorm, 1.0))
        VVt = jnp.einsum("bik,bk->bi", Vr, jnp.einsum("bik,bi->bk", Vr, t))
        t = jnp.where(
            jnp.linalg.norm(t - VVt, axis=1, keepdims=True) < 1e-2, rhat, t
        )
        for _ in range(2):
            t = t - jnp.einsum(
                "bik,bk->bi", Vr, jnp.einsum("bik,bi->bk", Vr, t)
            )
        tnorm = jnp.linalg.norm(t, axis=1, keepdims=True)
        dead = tnorm[:, 0] < 1e-8
        rand = jax.random.normal(
            jax.random.fold_in(key, st.it), (Bsz, m), dtype
        )
        rand = rand - jnp.einsum(
            "bik,bk->bi", Vr, jnp.einsum("bik,bi->bk", Vr, rand)
        )
        rand = rand / jnp.maximum(
            jnp.linalg.norm(rand, axis=1, keepdims=True), 1e-12
        )
        t = jnp.where(dead[:, None], rand,
                      t / jnp.where(tnorm > 0, tnorm, 1.0))

        Atp, Atf = hvp_free2(t)

        slot = jnp.clip(st.k, 0, K - 1)
        onehot = (jnp.arange(K)[None, :] == slot[:, None]) & run[:, None]
        Vn = jnp.where(onehot[:, None, :], t[:, :, None], Vr)
        AVn = jnp.where(onehot[:, None, :], Atp[:, :, None], AVr)
        YFn = jnp.where(onehot[:, None, :], Atf[:, :, None], YFr)
        kn = st.k + run.astype(st.k.dtype)
        # Freeze finished lanes entirely: extra global iterations (driven
        # by slower searches in the batch) must not keep re-rotating a
        # finished search's subspace — that would make results depend on
        # batch composition (bitwise batch-independence guarantee).
        keep = run[:, None, None]
        Vn = jnp.where(keep, Vn, st.V)
        AVn = jnp.where(keep, AVn, st.AVp)
        YFn = jnp.where(keep, YFn, st.YF)
        return _St(Vn, AVn, YFn, kn, run, st.it + 1)

    st = _St(
        V * active_in[:, None, None],
        AVp * active_in[:, None, None],
        YF * active_in[:, None, None],
        active_in.astype(jnp.int32),
        active_in,
        jnp.int32(0),
    )
    # Chunked while_loop: the any()-condition costs a device round-trip
    # per check, which at ~25 tiny-kernel iterations dominates the
    # loop's wall clock (same pathology as the alpha root-find); running
    # CHUNK fully-masked body iterations per check keeps the early exit
    # (granularity CHUNK) at a quarter of the sync cost.
    CHUNK = 4

    def chunked(st):
        return jax.lax.fori_loop(0, CHUNK, lambda i, s: body(s), st)

    st = jax.lax.while_loop(cond, chunked, st)
    return st.V, st.AVp, st.YF, st.k


def _validate_rigid_rank(x0: np.ndarray, nproj: int) -> None:
    """Warn when the rigid generators are rank-deficient (linear/planar
    cluster): the complete-QR ``free_basis`` then silently keeps a rigid
    direction in the 'free' subspace. Host-side, init-time only."""
    if nproj != 6:
        return
    import warnings

    for b in range(x0.shape[0]):
        pos = np.asarray(x0[b]).reshape(-1, 3)
        rel = pos - pos.mean(axis=0)
        gens = [np.cross(e, rel).ravel() for e in np.eye(3)]
        rank = np.linalg.matrix_rank(np.stack(gens), tol=1e-8)
        if rank < 3:
            warnings.warn(
                f"lane {b}: rigid rotation generators are rank-{rank} "
                "(linear geometry) — free_basis will retain a rigid "
                "direction; use nproj=5 (translations + the two "
                "physical rotations) for linear geometries"
            )
            return  # one warning is enough


def batch_pspec(a):
    """PartitionSpec sharding the leading (lane) axis; P() for scalar
    leaves (e.g. ``SearchState.fmax_t``) — a named axis cannot apply to
    rank-0 values."""
    from jax.sharding import PartitionSpec as P

    if getattr(a, "ndim", 0) == 0:
        return P()
    return P(*(("batch",) + (None,) * (a.ndim - 1)))


def init_state(potential, x0: jnp.ndarray, cfg: EnsembleConfig,
               cell: Optional[jnp.ndarray] = None,
               key: Optional[jnp.ndarray] = None) -> SearchState:
    """Initialize the batched search state (pre-step, no diag yet)."""
    _validate_rigid_rank(np.asarray(x0), cfg.nproj)
    # private copy: run loops donate the state buffers (donate_argnums),
    # and aliasing the caller's x0 would invalidate it for reuse
    x0 = jnp.asarray(x0).copy()
    Bsz = x0.shape[0]
    dtype = x0.dtype
    if cell is None:
        cell = jnp.zeros((3, 3), dtype)
    # jit: un-jitted eager dispatch materializes every potential
    # intermediate unfused, which OOMs large batches that fit fine
    # once XLA fuses (observed: EMT 25-atom slab at 4096 lanes)
    f, g = jax.jit(_batched_eval(potential, cell, cfg.eval_chunk))(x0)
    d = cfg.dim
    return SearchState(
        x=x0,
        f=f,
        g=g,
        B=jnp.broadcast_to(jnp.eye(d, dtype=dtype)[None], (Bsz, d, d)).copy(),
        B_init=jnp.zeros(Bsz, bool),
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
        fmax_t=jnp.asarray(cfg.fmax, dtype),
    )


def make_step_fn(potential, cfg: EnsembleConfig,
                 cell: Optional[jnp.ndarray] = None,
                 constraints=None, comparators=None):
    """Build the jittable batched step: one full RS-P-RFO iteration for
    every search in the ensemble (``optimize.py:359-440`` as a pure
    function).

    Always wrap the returned step in ``jax.jit`` when driving it from a
    host loop (as :func:`run_ensemble` does): un-jitted calls recompile
    the inner ``lax.while_loop`` programs on every invocation, which
    leaks JIT code mappings until the process hits the mmap limit.

    ``constraints``: optional pure function ``c(x: (d,)) -> (m,)`` of
    equality-constraint residuals (m == cfg.ncons, same structure for
    every lane; each lane evaluates it at its own geometry). The batched
    analogue of the sequential tier's Constraints residual: the step is
    confined to the tangent space (null(J) minus retained rigid modes),
    a Gauss-Newton restoration step ``-J^+ c`` removes drift each
    iteration, Davidson sees the Lagrangian Hessian, and convergence
    additionally requires ``max|c| < cfg.ctol``. Constraint rows must
    stay linearly independent of each other and of the retained rigid
    modes along the trajectory (lower ``nproj`` when a constraint pins
    translation/orientation).
    """
    if cell is None:
        cell = jnp.zeros((3, 3))

    eval_fn = _batched_eval(potential, cell, cfg.eval_chunk)
    hvp_audit = (
        _batched_hvp_full(potential, cell, cfg.eval_chunk)
        if getattr(cfg, "conv_inertia", False) and cfg.order > 0
        else None
    )
    if constraints is None and cfg.ncons > 0:
        raise ValueError(
            f"cfg.ncons == {cfg.ncons} but no constraints function given"
        )
    if comparators is not None and constraints is None:
        raise ValueError("comparators given but no constraints function")
    has_ineq = False
    active_mask = None
    if constraints is not None:
        if cfg.ncons <= 0:
            raise ValueError("constraints given but cfg.ncons == 0")
        m = jax.eval_shape(
            constraints,
            jax.ShapeDtypeStruct((cfg.dim,), jnp.float64),
        ).shape
        if m != (cfg.ncons,):
            raise ValueError(
                f"constraints(x) returns shape {m}, expected"
                f" ({cfg.ncons},) to match cfg.ncons"
            )
        cons_jac = jax.jacfwd(constraints)
        if comparators is None:
            comparators = ("eq",) * cfg.ncons
        comparators = tuple(comparators)
        if len(comparators) != cfg.ncons or not all(
            c in ("eq", "lt", "gt") for c in comparators
        ):
            raise ValueError(
                f"comparators must be {cfg.ncons} of 'eq'|'lt'|'gt', got"
                f" {comparators}"
            )
        has_ineq = any(c != "eq" for c in comparators)

    if has_ineq:
        # Inequality (projector) path: the active set varies per lane and
        # per step, so a fixed-width constrained basis is impossible.
        # Work in the rigid-free basis (dim - nproj wide) and project the
        # ACTIVE constraint rows out of gradient/Hessian instead, giving
        # the projected-out directions a stiff positive curvature
        # (_CONS_SHIFT). Inequalities deactivate while satisfied and
        # re-engage on violation — the reference's disable_satisfied
        # semantics (``internal.py:2788-2823``) as pure masking.
        cfg_w = cfg._replace(ncons=0)
        _eqm = np.array([c == "eq" for c in comparators])
        _ltm = np.array([c == "lt" for c in comparators])
        _gtm = np.array([c == "gt" for c in comparators])

        def active_mask(c, J, g):
            """Active set with a boundary layer + multiplier-sign test.

            A purely violation-driven set chatters: a lane on the
            boundary deactivates, drifts out on the next tangent step,
            reactivates, and never converges. Instead an inequality in
            the |c| <= ctol layer stays active while its (row-wise)
            KKT multiplier has the binding sign — i.e. while the descent
            direction points out of the feasible region (for 'lt':
            J.g < 0 means -g increases c). Violated rows are always
            active; comfortably satisfied rows are always free.
            """
            jg = jnp.einsum("md,d->m", J, g)
            lt, gt = jnp.asarray(_ltm), jnp.asarray(_gtm)
            layer = jnp.abs(c) <= cfg.ctol
            return (
                jnp.asarray(_eqm)
                | (lt & ((c > 0.0) | (layer & (jg < 0.0))))
                | (gt & ((c < 0.0) | (layer & (jg > 0.0))))
            )

        def basis_fn(xx):
            return free_basis(xx, cfg.nproj)

    elif constraints is not None:
        cfg_w = cfg

        def basis_fn(xx):
            return constrained_free_basis(xx, cfg.nproj, cons_jac)

    else:
        cons_jac = None
        cfg_w = cfg

        def basis_fn(xx):
            return free_basis(xx, cfg.nproj)

    def tang_at(x, c, g, Ufree):
        """Active-set mask and tangent projector (inequality path)."""
        Jb0 = jax.vmap(cons_jac)(x)                          # (B, m, d)
        a = jax.vmap(active_mask)(c, Jb0, g).astype(x.dtype)
        Jb = Jb0 * a[:, :, None]
        A = jnp.einsum("bmd,bdf->bmf", Jb, Ufree)            # (B, m, f)
        G = jnp.einsum("bmf,bnf->bmn", A, A)
        Pc = jnp.einsum("bmf,bmn,bng->bfg", A, _sym_pinv(G), A)
        eye = jnp.eye(Ufree.shape[2], dtype=x.dtype)[None]
        return a, eye - Pc

    def step(state: SearchState, key) -> SearchState:
        Bsz = state.x.shape[0]
        act = ~state.converged

        Ufree = jax.vmap(basis_fn)(state.x)

        if has_ineq:
            c_cur = jax.vmap(constraints)(state.x)
            a_cur, Ip_cur = tang_at(state.x, c_cur, state.g, Ufree)
        else:
            c_cur = a_cur = Ip_cur = None

        # ---- initial diagonalization (first step only, eig mode) ----
        need_init_diag = act & (~state.B_init) & cfg.eig

        def _diag_at(x_, g_, B_, B_init_, Ufree_, active_, key_,
                     cons_active_=None, tang_proj_=None):
            def run(_):
                return _davidson_and_absorb(
                    potential, cell, cfg_w, x_, g_, B_, B_init_, Ufree_,
                    active_, key_, cons_jac=cons_jac,
                    cons_active=cons_active_, tang_proj=tang_proj_,
                )

            def skip(_):
                return B_, B_init_, jnp.zeros(
                    active_.shape[0], state.nsteps.dtype
                )

            return jax.lax.cond(jnp.any(active_), run, skip, None)

        B1, B_init1, k_init = _diag_at(
            state.x, state.g, state.B, state.B_init, Ufree,
            need_init_diag, jax.random.fold_in(key, 0),
            cons_active_=a_cur, tang_proj_=Ip_cur,
        )
        # HVP matvecs are exact jvp's, not force calls: they count in
        # nmatvec only (the reference's FD matvecs cost one force call
        # each — neval comparisons across tiers must not conflate them)
        nmv = state.nmatvec + jnp.where(need_init_diag, k_init, 0)
        neval = state.neval
        # bootstrap for non-eig (minimization) searches happens via the
        # first step's secant below (reference: ApproximateHessian.update
        # bootstrap, ``linalg.py:274-289``)

        # ---- projected quantities ----
        UT = jnp.swapaxes(Ufree, 1, 2)
        Hproj = jnp.einsum("bij,bjk,bkl->bil", UT, B1, Ufree)
        eye = jnp.eye(cfg_w.nfree, dtype=state.x.dtype)[None]
        Hproj = jnp.where(B_init1[:, None, None], Hproj, eye)
        g_free = jnp.einsum("bij,bi->bj", Ufree, state.g)
        if has_ineq:
            g_free = jnp.einsum("bij,bj->bi", Ip_cur, g_free)
            Hproj = (
                jnp.einsum("bij,bjk,bkl->bil", Ip_cur, Hproj, Ip_cur)
                + _CONS_SHIFT * (eye - Ip_cur)
            )

        # one batched eigh of the projected Hessian serves both the
        # trust-region stepper and the diag-scheduling inertia check
        prep = prfo_prepare_batched(g_free, Hproj, cfg.order,
                                    cfg.eigh_f32, cfg.prfo_eigh)

        # ---- inertia gate for convergence (see conv_inertia) ----
        if getattr(cfg, "conv_inertia", False):
            lams_c = prep[0]
            if cfg.order > 0:
                bad_i = jnp.any(lams_c[:, : cfg.order] > 0, axis=1)
                if cfg.order < cfg_w.nfree:
                    bad_i = bad_i | (lams_c[:, cfg.order] < 0)
            else:
                bad_i = lams_c[:, 0] < 0
            inertia_ok = ~bad_i
        else:
            inertia_ok = None

        # ---- trust-region step ----
        s_full, smag = restricted_step_batched(
            g_free, Hproj, Ufree, state.delta, cfg_w, prep=prep
        )
        s_full = jnp.where(act[:, None], s_full, 0.0)

        # ---- diag scheduling (``optimize.py:362-378``) ----
        if cfg.eig and cfg.order > 0:
            lams_proj = prep[0]
            # Wrong inertia: too few negatives (reference trigger) OR too
            # many (extension: an extra negative mode means the search is
            # near a higher-order saddle and the stale quasi-Newton
            # curvature traps it there — a fresh partial diag lets P-RFO
            # walk down the spurious mode).
            too_few = jnp.any(lams_proj[:, : cfg.order] > 0, axis=1)
            # bound against cfg_w.nfree (the PROJECTED width lams_proj
            # actually has — wider than cfg.nfree in the inequality
            # path), matching the conv_inertia gate above
            too_many = (
                lams_proj[:, cfg.order] < 0
                if cfg.order < cfg_w.nfree
                else jnp.zeros(Bsz, bool)
            )
            ev = act & (state.nsteps_since_diag >= cfg.nsteps_per_diag) & (
                too_few | too_many
            )
        else:
            ev = jnp.zeros(Bsz, bool)
        if cfg.diag_every_n > 0:
            ev = ev | (
                act & (state.nsteps_since_diag >= cfg.diag_every_n)
            )
        # compaction: serve at most diag_budget requests this step;
        # unserved lanes keep counting and re-request next step
        if cfg.diag_budget > 0 and cfg.diag_budget < Bsz:
            # aging: serve the longest-waiting requesters first. A
            # plain stable argsort on the request mask always picks the
            # lowest-indexed lanes, so when requests persistently
            # exceed the budget, high-index lanes starve forever;
            # nsteps_since_diag grows each unserved step, so it is
            # exactly the waiting time
            prio = jnp.where(
                ev, -state.nsteps_since_diag,
                jnp.iinfo(jnp.int32).max,
            )
            sel = jnp.argsort(prio)[: cfg.diag_budget]
            served = jnp.zeros(Bsz, bool).at[sel].set(ev[sel])
        else:
            sel = None
            served = ev
        nsd = jnp.where(
            served | need_init_diag, 0, state.nsteps_since_diag + 1
        )

        # ---- take the step ----
        if cons_jac is not None:
            # Gauss-Newton restoration toward the constraint manifold
            # (the reference folds this into its internal-coordinate
            # Newton iteration, ``peswrapper.py:700-740``); kept separate
            # here so the tangent step and the normal correction stay
            # orthogonal to first order.
            c_now = (
                c_cur if c_cur is not None
                else jax.vmap(constraints)(state.x)
            )                                               # (B, m)
            Jb = jax.vmap(cons_jac)(state.x)                # (B, m, d)
            if has_ineq:
                # restore only the ACTIVE rows (violated inequalities
                # and all equalities); satisfied inequalities are free
                Jb = Jb * a_cur[:, :, None]
                c_now = c_now * a_cur
            JJt = jnp.einsum("bij,bkj->bik", Jb, Jb)
            dx_rest = -jnp.einsum(
                "bij,bi->bj", Jb, sym_solve(JJt, c_now)
            )
            # cap restoration at the trust radius to keep the update
            # secant meaningful when starting far off the manifold
            rmag = jnp.linalg.norm(dx_rest, axis=1, keepdims=True)
            cap = state.delta[:, None]
            dx_rest = jnp.where(
                rmag > cap, dx_rest * cap / jnp.where(rmag > 0, rmag, 1.0),
                dx_rest,
            )
            s_full = s_full + jnp.where(act[:, None], dx_rest, 0.0)
        x_new = state.x + s_full
        f_new, g_new = eval_fn(x_new)
        neval = neval + act.astype(jnp.int32)

        # ---- trust ratio (``peswrapper.py:578-594``) ----
        df_pred = jnp.einsum("bi,bi->b", state.g, s_full) + 0.5 * jnp.einsum(
            "bi,bij,bj->b", s_full, B1, s_full
        )
        df_actual = f_new - state.f
        pred_ok = jnp.abs(df_pred) > cfg.pred_min
        ratio = jnp.where(pred_ok, df_actual / jnp.where(pred_ok, df_pred,
                                                         1.0), 1.0)
        # an uninitialized Hessian gives no meaningful prediction
        ratio = jnp.where(B_init1, ratio, 1.0)

        # ---- quasi-Newton update with the step secant ----
        dg = g_new - state.g
        S1 = s_full[:, :, None]
        Y1 = dg[:, :, None]
        m1 = (jnp.linalg.norm(s_full, axis=1) > 1e-8)[:, None]
        B_boot = bootstrap_B_batched(S1, Y1, m1, cfg.dim)
        B_base = jnp.where(B_init1[:, None, None], B1, B_boot)
        B2 = quasi_newton_update_batched(
            B_base, S1, Y1, m1 & act[:, None],
            cfg.eigh_f32, cfg.absb, getattr(cfg, 'update', 'TS-BFGS'))
        B2 = jnp.where((act & m1[:, 0])[:, None, None], B2, B1)
        B_init2 = B_init1 | (act & m1[:, 0])

        # ---- scheduled re-diagonalization at the new point ----
        Ufree_new = jax.vmap(basis_fn)(x_new)
        if has_ineq:
            c_new = jax.vmap(constraints)(x_new)
            a_new, Ip_new = tang_at(x_new, c_new, g_new, Ufree_new)
        else:
            c_new = a_new = Ip_new = None
        if sel is None:
            B3, B_init3, k_ev = _diag_at(
                x_new, g_new, B2, B_init2, Ufree_new, served,
                jax.random.fold_in(key, 1),
                cons_active_=a_new, tang_proj_=Ip_new,
            )
            nmv = nmv + jnp.where(served, k_ev, 0)
        else:
            # run Davidson only on the compacted sub-batch
            ev_g = ev[sel]
            B_g, B_init_g, k_g = _diag_at(
                x_new[sel], g_new[sel], B2[sel], B_init2[sel],
                Ufree_new[sel], ev_g, jax.random.fold_in(key, 1),
                cons_active_=None if a_new is None else a_new[sel],
                tang_proj_=None if Ip_new is None else Ip_new[sel],
            )
            B3 = B2.at[sel].set(
                jnp.where(ev_g[:, None, None], B_g, B2[sel])
            )
            B_init3 = B_init2.at[sel].set(B_init2[sel] | ev_g)
            k_full = jnp.zeros_like(nmv).at[sel].set(
                jnp.where(ev_g, k_g, 0)
            )
            nmv = nmv + k_full

        # ---- trust radius update (``optimize.py:412-432``) ----
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
        # no meaningful prediction without an initialized Hessian: the
        # reference returns ratio=None and SKIPS the trust update
        # (``peswrapper.py:399-402`` + ``optimize.py:412-432``)
        delta_new = jnp.where(act & B_init1, delta_new, state.delta)

        # ---- convergence: max projected per-atom force ----
        gfree_new = jnp.einsum("bij,bi->bj", Ufree_new, g_new)
        if has_ineq:
            gfree_new = jnp.einsum("bij,bj->bi", Ip_new, gfree_new)
        gp = jnp.einsum("bij,bj->bi", Ufree_new, gfree_new)
        fmax_now = jnp.max(
            jnp.linalg.norm(gp.reshape(Bsz, cfg.natoms, 3), axis=2), axis=1
        )
        conv_now = fmax_now < state.fmax_t
        if has_ineq:
            eqm = jnp.asarray(_eqm)[None, :]
            viol = jnp.where(
                eqm, jnp.abs(c_new),
                jnp.where(
                    jnp.asarray(_ltm)[None, :], c_new, -c_new
                ),
            )
            conv_now = conv_now & (jnp.max(viol, axis=1) < cfg.ctol)
        elif cons_jac is not None:
            c_new = jax.vmap(constraints)(x_new)
            conv_now = conv_now & (
                jnp.max(jnp.abs(c_new), axis=1) < cfg.ctol
            )
        if inertia_ok is not None:
            conv_now = conv_now & inertia_ok
        if hvp_audit is not None:
            # True-curvature audit (the part the quasi-Newton B cannot
            # give): at a genuine index-1 point the curvature along the
            # claimed leftmost mode is strongly negative; at a flat
            # dissociated plateau the stale mode measures either ~0 or
            # a large POSITIVE bound-cluster curvature. One exact HVP,
            # run only on steps where some lane newly satisfies the
            # force criterion.
            newly = act & conv_now
            v_free0 = prep[1][:, :, 0]
            v_aud = jnp.einsum("bij,bj->bi", Ufree, v_free0)

            def _audit(_):
                Hv = hvp_audit(x_new, v_aud)
                return jnp.einsum("bi,bi->b", v_aud, Hv)

            c_aud = jax.lax.cond(
                jnp.any(newly), _audit,
                lambda _: jnp.full(Bsz, -jnp.inf, x_new.dtype), None,
            )
            audit_ok = c_aud < -getattr(cfg, "conv_curv_min", 1e-3)
            conv_now = conv_now & audit_ok
            # A rejected lane is locally DONE-but-wrong: forces are
            # under the criterion, so further trust-region steps are
            # ~zero and the lane would sit there re-paying the audit
            # HVP every step until the stall counter drains. Hand it
            # to the restart trigger immediately instead.
            audit_fail = newly & ~audit_ok
            nmv = nmv + newly.astype(jnp.int32)
        else:
            audit_fail = None
        conv_new = state.converged | (act & conv_now)

        # ---- stagnation restart (no reference analog; see config) ----
        improved = fmax_now < 0.97 * state.best_fmax
        best2 = jnp.where(act & improved, fmax_now, state.best_fmax)
        stall2 = jnp.where(act & ~improved, state.stall + 1, 0)
        x_fin, f_fin, g_fin = x_new, f_new, g_new
        nrst = state.nrestarts
        # the restart machinery also serves the curvature-audit
        # rejection path, which must fire even with the stagnation
        # restart disabled (restart_after=0, the default): an
        # audit-rejected lane is done-but-wrong — forces under the
        # criterion, so further steps are ~zero and without a restart
        # it would re-pay the audit HVP every step to max_steps
        if cfg.restart_after > 0 or audit_fail is not None:
            if cfg.restart_after > 0:
                restart = act & ~conv_new & (stall2 >= cfg.restart_after)
            else:
                restart = jnp.zeros(Bsz, bool)
            if audit_fail is not None:
                # curvature-audit rejection: restart NOW (see above)
                restart = restart | (audit_fail & ~conv_new)
            if getattr(cfg, "dmax_restart", 0.0) > 0:
                # Immediate lost-lane detection: a cluster whose max
                # pair distance exceeds the threshold has dissociated
                # onto flat landscape — steps there are pure waste
                # (measured: ~25% of unconverged LJ4 tail at 150 steps
                # was dissociated-then-stalled). Restart from home NOW
                # rather than letting the stall counter drain first.
                pos_b = x_new.reshape(Bsz, cfg.natoms, 3)
                dvec = pos_b[:, :, None, :] - pos_b[:, None, :, :]
                dmax = jnp.sqrt(
                    jnp.max(jnp.sum(dvec * dvec, axis=-1), axis=(1, 2))
                )
                restart = restart | (
                    act & ~conv_new & (dmax > cfg.dmax_restart)
                )
            # Restart from the PRISTINE start, not the current point:
            # kicking the stalled geometry compounds across restarts and
            # dissociates clusters onto flat landscape (measured on LJ4:
            # the unconverged tail after 420 steps was dissociated
            # fragments with dmax 2-5x the bond length, fmax pinned just
            # above threshold). Independent perturbed attempts from
            # x_home — kick stddev grows with the attempt count —
            # decorrelate instead of diffusing. (A mode-following kick
            # along the surplus negative eigenvector was also measured:
            # 97.3% at 420 steps vs 93% for compounding isotropic kicks,
            # but it shares the dissociation failure; home restarts
            # subsume it.)
            # growth capped at 3x: an uncapped kick eventually exceeds
            # the bond length and flings the restarted cluster straight
            # back onto the dissociated plateau it was rescued from
            scale = cfg.restart_kick * jnp.minimum(
                1.0 + 0.5 * state.nrestarts.astype(x_new.dtype), 3.0
            )
            kick = scale[:, None] * jax.random.normal(
                jax.random.fold_in(key, 2), x_new.shape, x_new.dtype
            )
            x_fin = jnp.where(
                restart[:, None], state.x_home + kick, x_new
            )

            f_k, g_k = jax.lax.cond(
                jnp.any(restart),
                lambda _: eval_fn(x_fin),
                lambda _: (f_new, g_new),
                None,
            )
            f_fin = jnp.where(restart, f_k, f_new)
            g_fin = jnp.where(restart[:, None], g_k, g_new)
            neval = neval + restart.astype(jnp.int32)
            # reset curvature to identity but KEEP B_init: for eig
            # searches the wrong-inertia trigger (identity has no
            # negative modes) requests a re-diag through the budget-
            # compacted scheduled path — clearing B_init instead would
            # fire the FULL-BATCH bootstrap Davidson on nearly every
            # step once restarts decorrelate (measured 2x step cost at
            # batch=4096)
            eye_d = jnp.eye(cfg.dim, dtype=state.x.dtype)[None]
            B3 = jnp.where(restart[:, None, None], eye_d, B3)
            nsd = jnp.where(restart, cfg.nsteps_per_diag, nsd)
            delta_new = jnp.where(restart, cfg.delta0, delta_new)
            best2 = jnp.where(restart, jnp.inf, best2)
            stall2 = jnp.where(restart, 0, stall2)
            nrst = nrst + restart.astype(jnp.int32)

        return SearchState(
            x=jnp.where(act[:, None], x_fin, state.x),
            f=jnp.where(act, f_fin, state.f),
            g=jnp.where(act[:, None], g_fin, state.g),
            B=B3,
            B_init=B_init3,
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
            fmax_t=state.fmax_t,
        )

    return step


def refill_converged(state: SearchState, x_new: jnp.ndarray,
                     avail: jnp.ndarray, cfg: EnsembleConfig,
                     inherit_B: bool = False,
                     ) -> Tuple[SearchState, jnp.ndarray]:
    """Replace converged lanes with fresh starts from a work queue.

    ``x_new``: (B, d) replacement geometries; ``avail``: (B,) bool — which
    rows of x_new hold real work. A lane is refilled when it is converged
    AND its replacement is available; refilled lanes are fully reset
    (fresh identity Hessian, trust radius, counters). Returns the new
    state and the refill mask (so the caller can record the finished
    results before they are overwritten). Jit-friendly: shapes static,
    decisions are masks — this is the convergence-mask compaction of
    SURVEY.md §7 stage 8.

    ``inherit_B=True`` keeps the lane's converged quasi-Newton Hessian
    as the fresh search's initial Hessian (B_init stays True, so no
    bootstrap Davidson runs). For screening campaigns where the queue
    holds perturbations of ONE structure — the intended workload —
    the previous occupant's curvature is an excellent warm start: each
    refilled search skips its initial full diagonalization (~20 HVPs +
    a full Davidson), and the wrong-inertia diag trigger still fires
    if the inherited curvature misleads. Leave False when queue
    entries are unrelated structures.
    """
    take = state.converged & avail
    tk = take[:, None]
    f_new, g_new = None, None  # computed lazily by the caller's next step
    d = cfg.dim
    Bsz = state.x.shape[0]
    eye = jnp.broadcast_to(
        jnp.eye(d, dtype=state.B.dtype)[None], (Bsz, d, d)
    )
    dtype = state.x.dtype
    new_state = SearchState(
        x=jnp.where(tk, x_new, state.x),
        f=jnp.where(take, jnp.zeros_like(state.f), state.f),
        g=jnp.where(tk, jnp.zeros_like(state.g), state.g),
        B=state.B if inherit_B
        else jnp.where(take[:, None, None], eye, state.B),
        B_init=state.B_init | take if inherit_B
        else jnp.where(take, False, state.B_init),
        delta=jnp.where(take, jnp.asarray(cfg.delta0, dtype), state.delta),
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
        fmax_t=state.fmax_t,
    )
    return new_state, take


def refresh_fg(state: SearchState, potential, cfg: EnsembleConfig,
               cell: Optional[jnp.ndarray] = None,
               mask: Optional[jnp.ndarray] = None) -> SearchState:
    """Recompute (f, g) for all lanes — call once after refill.

    ``mask`` marks the lanes whose geometry actually changed (the refill
    mask): only those lanes' neval counters advance, so per-search force
    accounting stays exact."""
    if cell is None:
        cell = jnp.zeros((3, 3), state.x.dtype)
    f, g = jax.jit(_batched_eval(potential, cell, cfg.eval_chunk))(state.x)
    inc = 1 if mask is None else mask.astype(state.neval.dtype)
    return state._replace(f=f, g=g, neval=state.neval + inc)


def run_ensemble(
    potential,
    x0: jnp.ndarray,
    cfg: EnsembleConfig,
    max_steps: int = 100,
    cell: Optional[jnp.ndarray] = None,
    mesh=None,
    seed: int = 0,
    steps_per_call: int = 1,
    constraints=None,
    comparators=None,
):
    """Host loop driving the jitted batched step until all searches
    converge (or max_steps). With a mesh, the state is sharded over the
    ensemble axis ('batch'); searches are independent so no collectives
    are needed beyond the convergence reduction."""
    step = make_step_fn(potential, cfg, cell, constraints=constraints,
                        comparators=comparators)

    def multi_step(state, key):
        def body(i, st):
            return step(st, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, steps_per_call, body, state)

    state = init_state(potential, jnp.asarray(x0), cfg, cell)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(mesh, P("batch"))
        state = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, batch_pspec(a))
            ),
            state,
        )

    multi_step_jit = jax.jit(multi_step, donate_argnums=0)
    key = jax.random.PRNGKey(seed)
    n_calls = (max_steps + steps_per_call - 1) // steps_per_call
    for i in range(n_calls):
        state = multi_step_jit(state, jax.random.fold_in(key, i))
        if bool(jnp.all(state.converged)):
            break
    return state


def make_queue_fns(potential, cfg: EnsembleConfig,
                   cell: Optional[jnp.ndarray] = None,
                   constraints=None, comparators=None,
                   refill_every: int = 10, inherit_B: bool = False):
    """Jitted (steps_chunk, refill, refresh, snapshot) 4-tuple for
    :func:`run_ensemble_queue` — build once, pass to every call that
    shares the config. ``refill_every`` must match the queue call: the
    whole harvest interval runs as ONE jitted ``fori_loop`` program, so
    per-step host dispatch (tunnel latency, ~100 ms+ per call on a
    remote chip) is paid once per cycle, not once per step."""
    step1 = make_step_fn(potential, cfg, cell, constraints=constraints,
                         comparators=comparators)

    def _chunk(state, base_key):
        def body(i, st):
            return step1(st, jax.random.fold_in(base_key, i))

        return jax.lax.fori_loop(0, refill_every, body, state)

    step = jax.jit(_chunk, donate_argnums=0)
    refill = jax.jit(
        partial(refill_converged, cfg=cfg, inherit_B=inherit_B),
        donate_argnums=0,
    )
    cell_arr = jnp.zeros((3, 3)) if cell is None else cell
    eval_fn = _batched_eval(potential, cell_arr, cfg.eval_chunk)

    def _refresh(state, mask):
        f, g = eval_fn(state.x)
        return state._replace(
            f=f, g=g, neval=state.neval + mask.astype(state.neval.dtype)
        )

    refresh = jax.jit(_refresh, donate_argnums=0)

    def _snapshot(state):
        # everything the harvest loop reads, packed into ONE buffer:
        # each np.asarray(state.<leaf>) is a separate device->host
        # round trip, and through a remote-chip tunnel six of them per
        # cycle dominated the queue loop (measured ~7 s/cycle of host
        # overhead at batch=1024)
        dt = state.x.dtype
        return jnp.concatenate([
            state.converged.astype(dt),
            state.nsteps.astype(dt),
            state.f.astype(dt),
            state.nmatvec.astype(dt),
            state.neval.astype(dt),
            state.x.reshape(-1),
        ])

    snapshot = jax.jit(_snapshot)
    return step, refill, refresh, snapshot


def run_ensemble_queue(
    potential,
    x0_all: jnp.ndarray,
    cfg: EnsembleConfig,
    batch: int,
    max_steps_per_search: int = 300,
    cell: Optional[jnp.ndarray] = None,
    refill_every: int = 10,
    seed: int = 0,
    constraints=None,
    comparators=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    fns=None,
    inherit_B: bool = False,
    max_retries: int = 0,
    retry_kick: float = 0.3,
    retry_step_growth: float = 0.0,
    retry_step_cap: Optional[int] = None,
    mesh=None,
    drain_handoff: int = 0,
):
    """Process an arbitrarily large work set with a fixed device batch.

    Converged searches are harvested every ``refill_every`` steps and
    their lanes refilled from the queue (convergence-mask compaction) —
    the chip never idles on finished lanes. Returns a list of
    (x_final, f, nsteps, converged) result tuples for every input.

    ``max_retries``: a search that times out unconverged is re-enqueued
    (up to this many times) from its current geometry plus a random
    kick of stddev ``retry_kick`` per DOF, instead of being recorded as
    failed. This is the queue-mode complement of the in-step stagnation
    restart (``EnsembleConfig.restart_after``): a limit-cycling search
    goes to the BACK of the queue rather than hogging a lane while the
    rest of the batch pays full-step cost for it — the retry costs
    nothing until a lane frees up. Retried searches report cumulative
    nsteps/nmatvec/neval over all attempts.

    ``retry_step_growth``: attempt ``k`` (0 = first try) gets a step
    budget of ``max_steps_per_search * (1 + growth * k)``, capped at
    ``retry_step_cap`` if given. Measured on the LJ4 north-star sweep:
    ~2/3 of the timeout tail are SLOW searches (converge in 1-3x the
    base budget from the pristine start, no kick needed), so growing
    the budget on retry rescues them deterministically where an
    isotropic kick only re-rolls the dice.

    ``checkpoint_path`` makes the sweep preemption-safe: the device
    state plus the host bookkeeping (lane->input map, queue cursor,
    harvested results) is saved every ``checkpoint_every`` harvest
    cycles; ``resume=True`` continues from an existing checkpoint (at
    most one harvest slice of work is repeated).

    ``fns``: optional ``(step, refill, refresh, snapshot)`` 4-tuple
    from :func:`make_queue_fns` — pass it when calling repeatedly with
    the same config so the jitted programs are traced/compiled once (a
    new closure per call otherwise misses jax's jit cache and
    recompiles).

    ``drain_handoff``: once the queue is exhausted (no fresh inputs, no
    pending retries) and at most this many unconverged lanes remain
    active, harvest them immediately as UNCONVERGED results and return
    instead of paying full-batch step cost for a near-empty drain tail.
    The caller then finishes them in a smaller batch (the LJ4 composite
    mode in ``bench.py``) — the drain phase of a wide queue otherwise
    runs ~<5%-occupied lanes at 100% step cost. Handed-off searches
    report their cumulative cost so far and ``converged=False``; their
    final ``x`` is the current (mid-search) geometry.
    """
    x0_all = jnp.asarray(x0_all)
    total = x0_all.shape[0]
    # a work set smaller than the device batch: clamp (the state would
    # hold `total` lanes while origin/refill buffers held `batch` —
    # shape mismatch on the first harvest). hetero.py does the same.
    batch = min(batch, total)
    if fns is None:
        fns = make_queue_fns(potential, cfg, cell,
                             constraints=constraints,
                             comparators=comparators,
                             refill_every=refill_every,
                             inherit_B=inherit_B)
    step_chunk, refill, refresh, snapshot = fns
    x0_np = np.asarray(x0_all)   # host copy: per-lane refill slices
    #   must not round-trip the device (tunnel latency per slice)

    # resume BEFORE the initial eval and the mesh placement: loading
    # after either wastes a full batched force evaluation (init_state's
    # f/g are overwritten) or — worse — replaces a mesh-sharded state
    # with host-loaded arrays on the default device, so the resumed run
    # would proceed unsharded (single-device OOM at mesh-scale batches)
    loaded = None
    if checkpoint_path is not None and resume:
        import os as _os

        from .checkpoint import load_queue

        if _os.path.exists(checkpoint_path):
            loaded = load_queue(
                checkpoint_path, SearchState, with_retry_state=True,
                fmax_default=cfg.fmax,
            )
    # retry bookkeeping: counts per input, deferred re-starts, and the
    # step/matvec/eval totals spent by earlier attempts
    it0 = 0
    if loaded is not None:
        state, origin, next_idx, results, retry_state = loaded
        retries = retry_state["retries"]
        pending = retry_state["pending"]   # (origin_idx, x_start) FIFO
        spent = retry_state["spent"]       # origin -> (ns, nmv, nev)
        # continue the PRNG key stream where the crashed run left it
        # (replaying fold_in(key, 0..) would correlate restart kicks
        # and Davidson probes with ones already consumed)
        it0 = retry_state.get("it", 0)
    else:
        state = init_state(potential, x0_all[:batch], cfg, cell)
        origin = np.arange(batch)          # which input each lane holds
        next_idx = batch
        results = {}
        retries = {}
        pending = []
        spent = {}
    lane_sharding = None
    if mesh is not None:
        # shard the lane axis over the mesh; the jitted chunk/refill/
        # refresh programs then compile sharded executables, and refill
        # slices are placed with the same layout so no resharding
        # transfer happens inside the loop
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _shard(a):
            return jax.device_put(a, NamedSharding(mesh, batch_pspec(a)))

        state = jax.tree.map(_shard, state)
        lane_sharding = NamedSharding(mesh, P("batch", None))
    # fold the resumed step counter into the kick seed: the `it`
    # checkpoint exists to avoid replaying consumed randomness, and a
    # resumed run restarting kick_rng from the beginning would replay
    # the exact pre-crash retry-kick sequence (ADVICE r4 #4)
    kick_rng = np.random.RandomState(((seed ^ 0x5EED) + it0) % 2**32)
    key = jax.random.PRNGKey(seed)

    import os as _os_dbg
    import sys as _sys_dbg
    import time as _time_dbg
    _dbg = _os_dbg.environ.get("SELLA_TPU_QUEUE_DEBUG", "0") == "1"

    cycle = 0
    it = it0
    while len(results) < total:
        _t0 = _time_dbg.perf_counter()
        state = step_chunk(state, jax.random.fold_in(key, it))
        it += refill_every

        _t1 = _time_dbg.perf_counter()
        buf = np.asarray(snapshot(state))      # one device->host fetch
        if _dbg:
            print(
                f"[queue] cycle {cycle} dispatch={_t1 - _t0:.2f}s "
                f"snapshot={_time_dbg.perf_counter() - _t1:.2f}s "
                f"done={len(results)}/{total}",
                file=_sys_dbg.stderr, flush=True,
            )
        Bsz = state.x.shape[0]
        conv = buf[0:Bsz] != 0.0
        nsteps = buf[Bsz:2 * Bsz].astype(np.int64)
        fs = buf[2 * Bsz:3 * Bsz]
        nmv = buf[3 * Bsz:4 * Bsz].astype(np.int64)
        nev = buf[4 * Bsz:5 * Bsz].astype(np.int64)
        xs = buf[5 * Bsz:].reshape(Bsz, -1)
        if max_retries and retry_step_growth:
            budgets = np.asarray([
                max_steps_per_search
                * (1.0 + retry_step_growth * retries.get(int(o), 0))
                for o in origin
            ])
            if retry_step_cap is not None:
                budgets = np.minimum(budgets, retry_step_cap)
            done = conv | (nsteps >= budgets)
        else:
            done = conv | (nsteps >= max_steps_per_search)
        if not np.any(done):
            continue
        for lane in np.where(done)[0]:
            oi = int(origin[lane])
            if oi < 0 or oi in results:
                continue
            s0, m0, e0 = spent.get(oi, (0, 0, 0))
            if (not conv[lane]) and retries.get(oi, 0) < max_retries:
                # timed out: back of the queue. Restart from the
                # ORIGINAL geometry plus a kick that grows with the
                # attempt number — a limit-cycling search's current x
                # is the worst place to restart from (it is the cycle),
                # while independent perturbed attempts decorrelate.
                attempt = retries.get(oi, 0) + 1
                retries[oi] = attempt
                spent[oi] = (s0 + int(nsteps[lane]),
                             m0 + int(nmv[lane]), e0 + int(nev[lane]))
                # sqrt growth: a linearly growing kick passes the bond
                # length by attempt 3-4 and hands the retry a
                # dissociated/hot start whose x_home (the restart
                # anchor) is itself bad — measured on LJ4: retries with
                # attempt*0.3 kicks rescued almost nothing, while a
                # fresh modest draw succeeds at the population rate
                pending.append((
                    oi,
                    x0_np[oi]
                    + np.sqrt(attempt) * retry_kick * kick_rng.normal(
                        size=xs[lane].shape
                    ),
                ))
                continue
            results[oi] = (
                xs[lane].copy(), float(fs[lane]),
                s0 + int(nsteps[lane]), bool(conv[lane]),
                m0 + int(nmv[lane]), e0 + int(nev[lane]),
            )

        if drain_handoff and next_idx >= total and not pending:
            # queue exhausted and nothing awaiting retry: if at most
            # drain_handoff unconverged lanes remain active, hand them
            # back unconverged and return. This runs BEFORE the refill
            # below, so every still-active lane's buf row is current
            # (a post-refill check would hand off lanes already holding
            # a NEW occupant with the previous occupant's stale
            # snapshot — found by the round-5 self-review, reproduced:
            # fresh inputs returned another input's geometry with
            # nsteps at the budget despite never stepping).
            active = [
                l for l in range(Bsz)
                if origin[l] >= 0 and int(origin[l]) not in results
            ]
            if len(active) <= drain_handoff:
                for lane in active:
                    oi = int(origin[lane])
                    s0, m0, e0 = spent.get(oi, (0, 0, 0))
                    results[oi] = (
                        xs[lane].copy(), float(fs[lane]),
                        s0 + int(nsteps[lane]), False,
                        m0 + int(nmv[lane]), e0 + int(nev[lane]),
                    )
                if checkpoint_path is not None:
                    # the break skips the end-of-cycle save: persist
                    # the handed-off results first, or a resume would
                    # replay the drain this handoff just skipped
                    from .checkpoint import save_queue

                    save_queue(
                        checkpoint_path, state, origin, next_idx,
                        results,
                        retry_state=dict(pending=pending,
                                         retries=retries, spent=spent),
                        it=it,
                    )
                break

        # refill from the queue (mark timed-out lanes converged so the
        # refill mask picks them up too): retried jobs first, then
        # fresh inputs
        state = state._replace(converged=jnp.asarray(done))
        x_new = np.zeros((batch, cfg.dim))
        avail = np.zeros(batch, dtype=bool)
        lanes = np.where(done)[0]
        new_origin = origin.copy()
        for lane in lanes:
            if pending:
                oi, xstart = pending.pop(0)
                x_new[lane] = xstart
                avail[lane] = True
                new_origin[lane] = oi
            elif next_idx < total:
                x_new[lane] = x0_np[next_idx]
                avail[lane] = True
                new_origin[lane] = next_idx
                next_idx += 1
            else:
                new_origin[lane] = -1  # idle lane
        origin = new_origin

        if np.any(avail):
            x_new_j = jnp.asarray(x_new)
            if lane_sharding is not None:
                x_new_j = jax.device_put(x_new_j, lane_sharding)
            avail_j = jnp.asarray(avail)
            state, _ = refill(state, x_new_j, avail_j)
            state = refresh(state, avail_j)
        # else: queue drained — refill would be a no-op and refresh
        # would re-pay a full-batch force evaluation per harvest cycle
        # for identical (f, g); skip both through the drain tail.
        # idle lanes stay marked converged so they are skipped
        idle = jnp.asarray(origin < 0)
        state = state._replace(converged=state.converged | idle)

        cycle += 1
        if checkpoint_path is not None and cycle % checkpoint_every == 0:
            from .checkpoint import save_queue

            save_queue(
                checkpoint_path, state, origin, next_idx, results,
                retry_state=dict(pending=pending, retries=retries,
                                 spent=spent),
                it=it,
            )

    return [results[i] for i in range(total)]
