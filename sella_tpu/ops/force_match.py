"""Force-matched initial Hessian (C14 equivalent).

The reference ships a Cython utility that fits an approximate pair force
field (LJ / Buckingham / Morse / harmonic bond) to one observed gradient
and uses the analytic FF Hessian as the optimizer's initial Hessian
(``/root/reference/sella/force_match.pyx`` — dead code upstream, kept
for inventory parity). The JAX rebuild is simpler and strictly more
general: the FF is a *linear* expansion in pair basis functions, the
coefficients come from one batched least-squares solve against the
observed forces, and the Hessian is ``jax.hessian`` of the fitted
energy — no hand-derived per-kernel second derivatives.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..potentials.base import pair_distances
from .linalg import inv3


def _pair_basis(r: jnp.ndarray, r0: jnp.ndarray) -> jnp.ndarray:
    """Per-pair basis functions of the distance (stacked last axis).

    LJ repulsion/dispersion, two Buckingham exponentials, and a harmonic
    term centered at the observed distance r0 — spanning the kernels the
    reference fits (``force_match.pyx:476-714``).
    """
    return jnp.stack(
        [
            r ** -12,
            -(r ** -6),
            jnp.exp(-2.0 * r),
            jnp.exp(-1.0 * r),
            (r - r0) ** 2,
        ],
        axis=-1,
    )


NBASIS = 5


def force_match_hessian(
    atoms,
    g_obs: np.ndarray,
    rcut: float = 6.0,
    reg: float = 1e-8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit a pair FF to one observed gradient; return (H0, coeffs).

    Each unique element pair gets its own coefficient vector; the fit is
    a single regularized least-squares solve on the stacked per-atom
    force components.
    """
    x0 = jnp.asarray(atoms.positions.ravel())
    cell = jnp.asarray(atoms.cell)
    pbc = bool(np.any(atoms.pbc))
    numbers = np.asarray(atoms.numbers)
    n = len(numbers)

    # element-pair type index for every (i, j)
    uniq = sorted(set(numbers))
    zidx = np.array([uniq.index(z) for z in numbers])
    ntypes = len(uniq)
    npair_types = ntypes * (ntypes + 1) // 2

    def pair_type(i, j):
        a, b = sorted((zidx[i], zidx[j]))
        return a * ntypes - a * (a - 1) // 2 + (b - a)

    ptype = np.zeros((n, n), dtype=np.int32)
    for i in range(n):
        for j in range(n):
            ptype[i, j] = pair_type(i, j)
    ptype_j = jnp.asarray(ptype)

    r_obs = pair_distances(x0, cell, pbc)
    r0_fixed = jnp.where(jnp.isfinite(r_obs), r_obs, 1.0)
    within = np.asarray(
        np.isfinite(np.asarray(r_obs)) & (np.asarray(r_obs) < rcut)
    )
    within_j = jnp.asarray(within)

    def ff_energy(x, coeffs):
        """coeffs: (npair_types, NBASIS). Distances are masked BEFORE the
        sqrt so no inf/NaN can leak through higher derivatives."""
        pos = x.reshape(-1, 3)
        dr = pos[None, :, :] - pos[:, None, :]
        if pbc:
            inv = inv3(cell)
            frac = dr @ inv
            dr = (frac - jnp.round(frac)) @ cell
        r2 = jnp.sum(dr * dr, axis=-1)
        r = jnp.sqrt(jnp.where(within_j, r2, 1.0))
        basis = _pair_basis(r, r0_fixed)                   # (n, n, NBASIS)
        c = coeffs[ptype_j]                                # (n, n, NBASIS)
        e = jnp.sum(basis * c, axis=-1)
        return 0.5 * jnp.sum(e * within_j.astype(x.dtype))

    # gradient is linear in coeffs: build the design matrix column-wise
    ncoef = npair_types * NBASIS

    def grad_for(flat_coeffs):
        c = flat_coeffs.reshape(npair_types, NBASIS)
        return jax.grad(ff_energy)(x0, c)

    A = jax.jacfwd(grad_for)(jnp.zeros(ncoef))             # (3n, ncoef)
    A = np.asarray(A)
    b = np.asarray(g_obs, dtype=np.float64)
    AtA = A.T @ A + reg * np.eye(ncoef)
    coeffs = np.linalg.solve(AtA, A.T @ b)

    H0 = jax.hessian(ff_energy)(
        x0, jnp.asarray(coeffs.reshape(npair_types, NBASIS))
    )
    return np.asarray(H0), coeffs.reshape(npair_types, NBASIS)
