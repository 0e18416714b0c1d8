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
    """

    def __init__(self, func: Callable, natoms: int, eta: float = 1e-4,
                 pbc: bool = False, cache_size: int = 8) -> None:
        self._func = func
        self.natoms = int(natoms)
        self.eta = float(eta)
        self.pbc = bool(pbc)
        self.ncalls = 0          # host evaluations actually performed
        d = 3 * self.natoms
        cache: OrderedDict = OrderedDict()

        def _host_eg(x, cell):
            X = np.asarray(x, dtype=np.float64)
            squeeze = X.ndim == 1
            if squeeze:
                X = X[None]
            key = (X.tobytes(), np.asarray(cell).tobytes())
            if key in cache:
                E, G = cache[key]
                cache.move_to_end(key)
            else:
                E, G = func(X, np.asarray(cell, dtype=np.float64))
                E = np.asarray(E, dtype=np.float64).reshape(X.shape[0])
                G = np.asarray(G, dtype=np.float64).reshape(
                    X.shape[0], d
                )
                self.ncalls += 1
                cache[key] = (E, G)
                while len(cache) > cache_size:
                    cache.popitem(last=False)
            if squeeze:
                return E[0], G[0]
            return E, G

        def _callback_eg(x, cell):
            eshape = jax.ShapeDtypeStruct(x.shape[:-1], x.dtype)
            gshape = jax.ShapeDtypeStruct(x.shape, x.dtype)
            return jax.pure_callback(
                _host_eg, (eshape, gshape), x, cell,
                vmap_method="broadcast_all",
            )

        @jax.custom_jvp
        def _grad(x, cell):
            return _callback_eg(x, cell)[1]

        @_grad.defjvp
        def _grad_jvp(primals, tangents):
            x, cell = primals
            v, _ = tangents
            g0 = _grad(x, cell)
            vnorm = jnp.linalg.norm(v, axis=-1, keepdims=True)
            safe = jnp.maximum(vnorm, 1e-300)
            g1 = _grad(x + self.eta * (v / safe), cell)
            hv = (g1 - g0) * (vnorm / self.eta)
            return g0, jnp.where(vnorm > 0, hv, jnp.zeros_like(g0))

        @jax.custom_jvp
        def _energy(x, cell):
            return _callback_eg(x, cell)[0]

        @_energy.defjvp
        def _energy_jvp(primals, tangents):
            x, cell = primals
            dx, _ = tangents
            e = _energy(x, cell)
            g = _grad(x, cell)      # has its own (FD) second-order rule
            return e, jnp.sum(g * dx, axis=-1)

        self._energy_fn = _energy
        self._grad_fn = _grad

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
                        cache_size: int = 8) -> HostBatchedCalculator:
    """Batched adapter over an ``ase.Atoms`` with attached calculator:
    the host function loops the batch through one calculator instance
    (external codes serialize anyway; swap in a pool for parallel
    backends)."""
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

    return HostBatchedCalculator(func, n, eta=eta, pbc=has_cell,
                                 cache_size=cache_size)
