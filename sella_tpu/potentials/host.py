"""Host-calculator boundary for the BATCHED tiers.

SURVEY §7's two-tier calculator design: jax-native potentials run
on-device and vmap over the ensemble; everything else (external DFT
codes, classical FF engines, ML potentials without a jax port) stays on
the host — but the ensemble tiers must not fall back to one host call
per lane. :class:`HostBatchedCalculator` crosses the boundary ONCE per
batched evaluation: under ``vmap`` the callback receives the whole
``(B, 3n)`` position block (``jax.pure_callback`` with
``vmap_method="broadcast_all"``), so a 1024-lane ensemble step costs
one host round trip, and the host function is free to fan work out to
its own process pool / MPI ranks.

Derivative plumbing (what makes the batched tiers "just work"):

* ``energy`` carries a ``custom_jvp`` whose gradient coefficient is the
  ``grad`` primitive below — so ``jax.value_and_grad(pot.energy)``
  (the tiers' force call) works, and higher-order transforms reach the
  gradient's own rule;
* ``grad`` carries a ``custom_jvp`` implementing the Davidson/Lanczos
  matvec as a forward difference of host gradients with the
  reference's canonical displacement convention
  (``/root/reference/sella/linalg.py:50-87``):
  ``W v = (g(x + eta v/|v|) - g(x)) |v| / eta`` — one extra host
  gradient per matvec, exactly the reference ``NumericalHessian``
  economy. The FD tangent map is nonlinear in ``v`` (the ``|v|``
  normalization), so it is forward-mode only — all the tiers use.
* a small host-side LRU (the reference's ``_LRU2`` pattern at the
  calculator boundary, ``peswrapper.py:24-48``) dedupes the
  energy/gradient callbacks tracing both sides of ``value_and_grad``
  and the FD base point — one host evaluation per geometry.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import Potential


class HostBatchedCalculator(Potential):
    """Adapt a host function to the batched-ensemble Potential protocol.

    Parameters
    ----------
    func : callable ``(X: np.ndarray, cell: np.ndarray) -> (E, G)``
        Host-side evaluator. ``X`` has shape ``(B, 3n)`` (or ``(3n,)``
        unbatched); returns energies ``(B,)`` and flat gradients
        ``(B, 3n)``. Called OUTSIDE jit tracing on numpy arrays — wrap
        any external code; fan out to your own workers for parallelism.
    natoms : number of atoms (fixes the flat DOF width).
    eta : finite-difference displacement for HVPs (reference default
        1e-4, ``linalg.py:22`` — host forces are rarely cleaner; lower
        it only for analytic-quality host gradients).
    pbc : minimum-image convention hint for drivers.
    cache_size : host LRU depth (geometries remembered per process).
    stress_func : optional callable ``(X, cell) -> (B, 6)`` returning
        ASE-convention virial stress (Voigt, eV/A^3) per lane. Required
        for the batched CELL tiers: ``ensemble_cell`` /
        ``ensemble_cell_internal`` differentiate ``energy`` w.r.t. the
        per-lane cell, and without a stress source that derivative
        cannot exist for a host potential (the adapter refuses to
        silently return zero — the cell tiers raise). With it, the
        fixed-Cartesian cell derivative ``dE/dC = C^-T (V sigma + P^T F)``
        is assembled on the host and exposed through the custom AD
        rules, so reverse-mode cell gradients are exact and cell-space
        Davidson HVPs come from joint (x, cell) forward differences.
    """

    def __init__(self, func: Callable, natoms: int, eta: float = 1e-4,
                 pbc: bool = False, cache_size: int = 8,
                 stress_func: Optional[Callable] = None) -> None:
        self._func = func
        self.natoms = int(natoms)
        self.eta = float(eta)
        self.pbc = bool(pbc)
        self.has_stress = stress_func is not None
        self.ncalls = 0          # host evaluations actually performed
        d = 3 * self.natoms
        cache: OrderedDict = OrderedDict()

        def _eval_lanes(X, C):
            """One host evaluation: per-lane cells loop the user func
            (external codes serialize anyway); shared cells cross in a
            single call. Returns (E, G, D) with D = flat dE/dC at fixed
            Cartesian positions (zeros when stress_func is absent)."""
            B = X.shape[0]
            if C.ndim == 3 and bool(np.all(C == C[0])):
                # vmap broadcast_all batches even a shared cell: collapse
                # identical lanes so the host sees ONE full-batch call
                C = C[0]
            if C.ndim == 3:
                E = np.empty(B)
                G = np.empty((B, d))
                S = np.empty((B, 6)) if stress_func is not None else None
                for b in range(B):
                    e, g = func(X[b:b + 1], C[b])
                    E[b] = np.asarray(e, dtype=np.float64).reshape(1)[0]
                    G[b] = np.asarray(g, dtype=np.float64).reshape(d)
                    if S is not None:
                        S[b] = np.asarray(
                            stress_func(X[b:b + 1], C[b])
                        ).reshape(6)
            else:
                e, g = func(X, C)
                E = np.asarray(e, dtype=np.float64).reshape(B)
                G = np.asarray(g, dtype=np.float64).reshape(B, d)
                S = (np.asarray(stress_func(X, C)).reshape(B, 6)
                     if stress_func is not None else None)
            D = np.zeros((B, 9))
            if S is not None:
                for b in range(B):
                    Cb = C[b] if C.ndim == 3 else C
                    vol = abs(np.linalg.det(Cb))
                    sv = S[b]
                    sig = np.array([
                        [sv[0], sv[5], sv[4]],
                        [sv[5], sv[1], sv[3]],
                        [sv[4], sv[3], sv[2]],
                    ])
                    P = X[b].reshape(-1, 3)
                    F = -G[b].reshape(-1, 3)
                    D[b] = (np.linalg.inv(Cb.T) @ (
                        vol * sig + P.T @ F
                    )).ravel()
            return E, G, D

        def _host_eg(x, cell):
            X = np.asarray(x, dtype=np.float64)
            C = np.asarray(cell, dtype=np.float64)
            squeeze = X.ndim == 1
            if squeeze:
                X = X[None]
                if C.ndim == 3:
                    C = C[0]
            key = (X.tobytes(), C.tobytes())
            if key in cache:
                E, G, D = cache[key]
                cache.move_to_end(key)
            else:
                E, G, D = _eval_lanes(X, C)
                self.ncalls += 1
                cache[key] = (E, G, D)
                while len(cache) > cache_size:
                    cache.popitem(last=False)
            if squeeze:
                return E[0], G[0], D[0]
            return E, G, D

        def _callback_egd(x, cell):
            eshape = jax.ShapeDtypeStruct(x.shape[:-1], x.dtype)
            gshape = jax.ShapeDtypeStruct(x.shape, x.dtype)
            dshape = jax.ShapeDtypeStruct(x.shape[:-1] + (9,), x.dtype)
            return jax.pure_callback(
                _host_eg, (eshape, gshape, dshape), x, cell,
                vmap_method="broadcast_all",
            )

        eta = self.eta

        if stress_func is None:
            # x-only derivative rules (the cell tangent has no host
            # source; the batched cell tiers refuse such potentials)
            @jax.custom_jvp
            def _grad(x, cell):
                return _callback_egd(x, cell)[1]

            @_grad.defjvp
            def _grad_jvp(primals, tangents):
                x, cell = primals
                v, _ = tangents
                g0 = _grad(x, cell)
                vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
                safe = jnp.maximum(vnorm, 1e-300)
                g1 = _grad(x + eta * (v / safe), cell)
                hv = (g1 - g0) * (vnorm / eta)
                return g0, jnp.where(vnorm > 0, hv, jnp.zeros_like(g0))

            @jax.custom_jvp
            def _energy(x, cell):
                return _callback_egd(x, cell)[0]

            @_energy.defjvp
            def _energy_jvp(primals, tangents):
                x, cell = primals
                dx, _ = tangents
                e = _energy(x, cell)
                g = _grad(x, cell)  # has its own (FD) second-order rule
                return e, jnp.sum(g * dx, axis=-1)

            self._energy_fn = _energy
            self._grad_fn = _grad
        else:
            # joint (x, cell) rules: the extended gradient (G, dE/dC)
            # is one host crossing; its second-order rule is a joint
            # forward difference displacing positions AND cell together
            # (the cell-space analog of the reference's NumericalHessian
            # convention) — this is what makes cell-DOF Davidson HVPs
            # work for host potentials in the batched cell tiers.
            @jax.custom_jvp
            def _extgrad(x, cell):
                _, g, dd = _callback_egd(x, cell)
                return g, dd

            @_extgrad.defjvp
            def _extgrad_jvp(primals, tangents):
                x, cell = primals
                vx, vc = tangents
                g0, d0 = _extgrad(x, cell)
                n2 = jnp.sum(vx * vx, axis=-1)
                n2 = n2 + jnp.sum(vc * vc, axis=(-2, -1))
                unorm = jnp.sqrt(n2)
                safe = jnp.maximum(unorm, 1e-300)
                x1 = x + eta * (vx / safe[..., None])
                c1 = cell + eta * (vc / safe[..., None, None])
                g1, d1 = _extgrad(x1, c1)
                scale = (unorm / eta)[..., None]
                live = (unorm > 0)[..., None]
                dg = jnp.where(live, (g1 - g0) * scale,
                               jnp.zeros_like(g0))
                dd = jnp.where(live, (d1 - d0) * scale,
                               jnp.zeros_like(d0))
                return (g0, d0), (dg, dd)

            @jax.custom_jvp
            def _energy(x, cell):
                return _callback_egd(x, cell)[0]

            @_energy.defjvp
            def _energy_jvp(primals, tangents):
                x, cell = primals
                dx, dc = tangents
                e = _energy(x, cell)
                g, dEdC = _extgrad(x, cell)
                dc_flat = dc.reshape(dc.shape[:-2] + (9,))
                de = jnp.sum(g * dx, axis=-1) + jnp.sum(
                    dEdC * dc_flat, axis=-1
                )
                return e, de

            self._energy_fn = _energy
            self._grad_fn = lambda x, cell: _extgrad(x, cell)[0]

    def energy(self, x, cell):
        return self._energy_fn(x, cell)

    # route the protocol's derived entry points through the custom
    # rules (the base class re-derives them from energy, which also
    # works — these avoid one spurious tangent trace)
    def grad(self, x, cell):
        return self._grad_fn(x, cell)

    def energy_and_grad(self, x, cell):
        return self._energy_fn(x, cell), self._grad_fn(x, cell)

    def hvp(self, x, v, cell):
        return jax.jvp(lambda y: self._grad_fn(y, cell), (x,), (v,))[1]


def from_ase_calculator(ase_atoms, eta: float = 1e-4,
                        cache_size: int = 8,
                        stress: bool = False) -> HostBatchedCalculator:
    """Batched adapter over an ``ase.Atoms`` with attached calculator:
    the host function loops the batch through one calculator instance
    (external codes serialize anyway; swap in a pool for parallel
    backends). Pass ``stress=True`` for calculators that implement
    ``get_stress`` to enable the batched cell tiers."""
    n = len(ase_atoms)
    cell = getattr(ase_atoms, "cell", None)
    has_cell = cell is not None and bool(np.asarray(cell).any())

    def func(X, cell_rt):
        E = np.empty(X.shape[0])
        G = np.empty_like(X)
        for b in range(X.shape[0]):
            ase_atoms.positions = X[b].reshape(n, 3)
            if cell_rt.any():
                ase_atoms.cell = cell_rt
            E[b] = ase_atoms.get_potential_energy()
            G[b] = -np.asarray(ase_atoms.get_forces()).reshape(-1)
        return E, G

    stress_func = None
    if stress:
        def stress_func(X, cell_rt):
            S = np.empty((X.shape[0], 6))
            for b in range(X.shape[0]):
                ase_atoms.positions = X[b].reshape(n, 3)
                if cell_rt.any():
                    ase_atoms.cell = cell_rt
                S[b] = np.asarray(ase_atoms.get_stress()).reshape(6)
            return S

    return HostBatchedCalculator(func, n, eta=eta, pbc=has_cell,
                                 cache_size=cache_size,
                                 stress_func=stress_func)
