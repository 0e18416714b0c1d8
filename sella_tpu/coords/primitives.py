"""Internal-coordinate primitives as pure, differentiable jnp functions.

Coordinate layer (C9) substrate. Value functions take gathered positions
``pos`` (shape ``(k, 3)`` for a k-body coordinate) plus periodic
translation vectors ``tvec`` so they compose with jit/vmap/grad exactly
like the reference's (``/root/reference/sella/internal.py:58-80``). All
derivatives come from jax transforms — gradients ``grad``, Hessians
``jacfwd(grad)``, HVPs ``jvp(grad)`` (``internal.py:85-135``).

The quaternion-based rigid-fragment rotation coordinate is the delicate
one: naive autodiff through ``eigh`` of the 4x4 Kearsley matrix NaNs on
(near-)degenerate spectra, which the reference works around with closed
forms (``internal.py:533-798``). Here the fix is a ``custom_jvp`` on the
leading-eigenvector map with a pseudo-inverted resolvent — degenerate
directions contribute zero instead of NaN, and the rule is itself
differentiable so second derivatives work.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Two-/three-/four-body coordinates
# ---------------------------------------------------------------------------
def bond_value(pos: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """Bond length. pos (2,3); tvec (1,3) periodic offset of atom 1."""
    return jnp.linalg.norm(pos[1] - pos[0] + tvec[0])


def angle_value(pos: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """Bend angle at atom 1. pos (3,3); tvec (2,3)."""
    dx1 = -(pos[1] - pos[0] + tvec[0])
    dx2 = pos[2] - pos[1] + tvec[1]
    cosang = dx1 @ dx2 / (jnp.linalg.norm(dx1) * jnp.linalg.norm(dx2))
    return jnp.arccos(jnp.clip(cosang, -1.0, 1.0))


def dihedral_value(pos: jnp.ndarray, tvec: jnp.ndarray) -> jnp.ndarray:
    """Torsion about bond 1-2. pos (4,3); tvec (3,3). atan2 convention
    (smooth through 0/pi except the +-pi branch cut, handled by wrap)."""
    dx1 = pos[1] - pos[0] + tvec[0]
    dx2 = pos[2] - pos[1] + tvec[1]
    dx3 = pos[3] - pos[2] + tvec[2]
    c12 = jnp.cross(dx1, dx2)
    c23 = jnp.cross(dx2, dx3)
    numer = dx2 @ jnp.cross(c12, c23)
    denom = jnp.linalg.norm(dx2) * (c12 @ c23)
    return jnp.arctan2(numer, denom)


# ---------------------------------------------------------------------------
# Fragment translation
# ---------------------------------------------------------------------------
def translation_value(pos: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean position of the fragment along a Cartesian axis
    (``/root/reference/sella/internal.py:466-493``)."""
    return jnp.mean(pos[:, axis])


def displacement_value(pos: jnp.ndarray, refpos: jnp.ndarray,
                       W: jnp.ndarray) -> jnp.ndarray:
    """Weighted squared displacement from a reference geometry
    (``/root/reference/sella/internal.py:1081-1108``)."""
    dx = (pos - refpos).ravel()
    return dx @ W @ dx


# ---------------------------------------------------------------------------
# Quaternion rotation coordinate
# ---------------------------------------------------------------------------
def _kearsley_matrix(Xc: jnp.ndarray, Yc: jnp.ndarray) -> jnp.ndarray:
    """4x4 symmetric matrix whose leading eigenvector is the quaternion
    (w, x, y, z) of the rotation best mapping Yc onto Xc (both centered)."""
    M = Yc.T @ Xc
    tr = jnp.trace(M)
    K = jnp.array(
        [
            [tr, M[1, 2] - M[2, 1], M[2, 0] - M[0, 2], M[0, 1] - M[1, 0]],
            [M[1, 2] - M[2, 1], M[0, 0] - M[1, 1] - M[2, 2],
             M[0, 1] + M[1, 0], M[0, 2] + M[2, 0]],
            [M[2, 0] - M[0, 2], M[0, 1] + M[1, 0],
             M[1, 1] - M[0, 0] - M[2, 2], M[1, 2] + M[2, 1]],
            [M[0, 1] - M[1, 0], M[0, 2] + M[2, 0], M[1, 2] + M[2, 1],
             M[2, 2] - M[0, 0] - M[1, 1]],
        ],
        dtype=Xc.dtype,
    )
    return K


def _canonical_q(lams: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Branch-stable leading quaternion from an eigh of K.

    Mirrors the reference's ``_stabilize_quaternion`` with
    ``q_prev = identity`` (``internal.py:566-581``): when the leading
    eigenvalue is DEGENERATE (2-atom / linear fragments — rotation
    about the molecular axis is a gauge direction), project the
    identity quaternion onto the leading eigenspace and normalize, so
    the coordinate reads 0 at the reference orientation instead of an
    arbitrary LAPACK basis vector (observed: a diatomic fragment read
    |rotvec| = pi where the reference read 0, derailing the rigid
    cell-transport parity). Sign: w >= 0 (minimal rotation angle, the
    reference's convention), falling back to
    largest-|component|-positive for true 180-degree rotations."""
    q = V[:, -1]
    # relative gap threshold, SAME form as _resolvent_parts: an
    # absolute 1e-10 here would miss genuine degeneracy when K is
    # large-scale (eigh noise ~eps*|lam_max| exceeds it), falling back
    # to the arbitrary LAPACK basis vector this function exists to
    # avoid — and would disagree with the JVP side's classification
    scale = jnp.maximum(jnp.abs(lams[-1]), 1.0)
    mask = ((lams[-1] - lams) < 1e-10 * scale).astype(V.dtype)
    e0 = jnp.zeros(4, V.dtype).at[0].set(1.0)
    proj = V @ (mask * (V.T @ e0))
    pn = jnp.linalg.norm(proj)
    deg_use = (jnp.sum(mask) > 1.5) & (pn > 1e-7)
    q = jnp.where(deg_use, proj / jnp.where(pn > 1e-14, pn, 1.0), q)
    pick = jnp.argmax(jnp.abs(q))
    sign = jnp.where(jnp.abs(q[0]) > 1e-12, jnp.sign(q[0]),
                     jnp.sign(q[pick]))
    return q * sign


@jax.custom_jvp
def _leading_evec(K: jnp.ndarray) -> jnp.ndarray:
    """Branch-stable leading eigenvector of the symmetric 4x4 K
    (see :func:`_canonical_q`)."""
    lams, V = jnp.linalg.eigh(K)
    return _canonical_q(lams, V)


@_leading_evec.defjvp
def _leading_evec_jvp(primals, tangents):
    """dq = (lam I - K)^+ dK q — degenerate modes contribute zero.

    This is the pseudo-inverse eigenvector perturbation the reference
    encodes in its closed-form rotation Jacobian
    (``/root/reference/sella/internal.py:601-648``); expressing it as a
    jvp rule lets jacfwd build Jacobians. The tangent map ``_dq`` has
    its OWN closed-form jvp rule (below), so jacfwd(jacfwd) Hessians
    never differentiate an eigendecomposition — the route by which the
    reference's closed-form second derivative (``internal.py:706-798``)
    avoids eigh-AD NaNs on degenerate (symmetric-fragment) spectra.
    """
    (K,), (dK,) = primals, tangents
    return _leading_evec(K), _dq(K, dK)


def _resolvent_parts(K):
    """Primal spectral pieces of A = lam_max I - K: the canonical q and
    an ``apply(x) = A^+ x`` in the non-leading eigenbasis. Thresholded
    gaps make this the pseudo-inverted resolvent — smooth under interior
    (non-leading) degeneracies, which only reshuffle the eigenbasis of a
    subspace the projector sums over."""
    lams, V = jnp.linalg.eigh(K)
    q = _canonical_q(lams, V)
    gap = lams[-1] - lams[:-1]
    scale = jnp.maximum(jnp.abs(lams[-1]), 1.0)
    ok = gap > 1e-10 * scale
    inv_gap = jnp.where(ok, 1.0 / jnp.where(ok, gap, 1.0), 0.0)
    Vrest = V[:, :-1]

    def apinv(x):
        return Vrest @ (inv_gap * (Vrest.T @ x))

    return q, apinv


@jax.custom_jvp
def _dq(K: jnp.ndarray, dK: jnp.ndarray) -> jnp.ndarray:
    """First-order eigenvector perturbation dq = A^+ dK q."""
    q, apinv = _resolvent_parts(K)
    return apinv(dK @ q)


@_dq.defjvp
def _dq_jvp(primals, tangents):
    """Closed-form derivative of dq(K, dK) = A^+(K) dK q(K).

    With A = lam I - K symmetric, null(A) = span(q) (lam simple), the
    pinv differential reduces to
      dA^+ = -A^+ dA A^+ + A^+A^+ dA qq^T + qq^T dA A^+A^+,
    dA = dlam I - dK2, dlam = q^T dK2 q, and dq/dK2 = A^+ dK2 q. Every
    factor uses only primal eigh results, so nothing differentiates an
    eigendecomposition (reference closed form, ``internal.py:706-798``).
    """
    (K, dK), (dK2, ddK) = primals, tangents
    q, apinv = _resolvent_parts(K)

    y = dK @ q                       # A^+ y = primal output
    dq_p = apinv(y)

    dlam = q @ (dK2 @ q)
    dq2 = apinv(dK2 @ q)             # perturbation of q along dK2

    def dA(x):                       # (dlam I - dK2) x
        return dlam * x - dK2 @ x

    # dA^+ applied to y
    t1 = -apinv(dA(apinv(y)))
    t2 = apinv(apinv(dA(q))) * (q @ y)
    t3 = q * (q @ dA(apinv(apinv(y))))
    # product-rule remainder: A^+ d(dK q)
    t4 = apinv(ddK @ q + dK @ dq2)
    return dq_p, t1 + t2 + t3 + t4


def _quat_to_rotvec(q: jnp.ndarray) -> jnp.ndarray:
    """Log map of a unit quaternion (w, x, y, z) -> rotation vector.

    ``v = 2 atan2(|qv|, qw) * qv / |qv|`` with a series guard at small
    angle (cf. ``_asinc_np``/``_expmap_np``, ``internal.py:574-599``).
    """
    w = q[0]
    qv = q[1:]
    # NaN-safe small-angle handling: |qv| has a NaN gradient at 0, and the
    # identity rotation (value at the reference geometry) hits exactly
    # that point. Double-where guard keeps both value and all derivative
    # orders finite: for small s, 2*atan2(s, w)/s -> 2/w smoothly.
    s2 = qv @ qv
    small = s2 < 1e-16
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    w_safe = jnp.where(jnp.abs(w) > 1e-12, w, 1.0)
    theta_over_s = jnp.where(
        small, 2.0 / w_safe, 2.0 * jnp.arctan2(s, w) / s
    )
    return qv * theta_over_s


def rotation_value(pos: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (3,) of the fragment relative to reference geometry.

    ``pos``/``ref`` are the fragment positions/reference (n, 3). This is
    the TRIC rotation coordinate (``internal.py:1030-1078``): the expmap
    log of the optimal (Kabsch) rotation carrying the reference onto the
    current geometry.
    """
    Xc = pos - jnp.mean(pos, axis=0)
    Yc = ref - jnp.mean(ref, axis=0)
    K = _kearsley_matrix(Xc, Yc)
    q = _leading_evec(K)
    return _quat_to_rotvec(q)


# ---------------------------------------------------------------------------
# Generic per-coordinate derivative closures
# ---------------------------------------------------------------------------
def value_grad_hess(fn):
    """Return (f, grad f, hess f) transforms of a (pos, aux) scalar fn."""
    g = jax.grad(fn, argnums=0)
    h = jax.jacfwd(g, argnums=0)
    return fn, g, h


# All derivative closures are jitted at module level: re-tracing a
# jacfwd per call costs ~0.3 s; a jitted call after compile-cache is ~50 us.
# Shapes are fixed per coordinate kind (and per fragment size for
# rotations), so the number of distinct compilations is tiny and the
# persistent compilation cache reuses them across runs.
bond_value_jit = jax.jit(bond_value)
angle_value_jit = jax.jit(angle_value)
dihedral_value_jit = jax.jit(dihedral_value)
bond_grad = jax.jit(jax.grad(bond_value, argnums=0))
angle_grad = jax.jit(jax.grad(angle_value, argnums=0))
dihedral_grad = jax.jit(jax.grad(dihedral_value, argnums=0))
bond_hess = jax.jit(jax.jacfwd(jax.grad(bond_value, argnums=0), argnums=0))
angle_hess = jax.jit(jax.jacfwd(jax.grad(angle_value, argnums=0), argnums=0))
dihedral_hess = jax.jit(
    jax.jacfwd(jax.grad(dihedral_value, argnums=0), argnums=0)
)

rotation_value_jit = jax.jit(rotation_value)
rotation_jac = jax.jit(jax.jacfwd(rotation_value, argnums=0))   # (3, n, 3)
rotation_hess = jax.jit(
    jax.jacfwd(jax.jacfwd(rotation_value, argnums=0), argnums=0)
)  # (3, n, 3, n, 3)
