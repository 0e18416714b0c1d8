"""Mixed-precision potential evaluation (f32 compute, f64 interface).

TPU has no native float64 datapath: every f64 elementwise op is
emulated as several f32 ops and f64 matmuls cannot use the MXU, so the
O(n^2 * n_images) pair/density sums that dominate per-step FLOPs on
many-atom systems (EMT slabs) run an order of magnitude below the
chip's native throughput when evaluated in f64. The optimizer itself
must stay f64 — the trust-region root-finds, quasi-Newton algebra and
eigensolves carry 1e-8..1e-14 tolerances (reference:
``/root/reference/sella/optimize/restricted_step.py:64-66``) — but the
POTENTIAL does not: an f32 force carries ~1e-6 relative error, three
orders below the fmax=1e-3 convergence gate, and the trust-region
machinery absorbs it like any model error.

:class:`F32Potential` wraps any jax-native :class:`Potential`: inputs
cast to f32 at the call boundary, the inner ``energy`` computes in f32
(exp/div/mul at full VPU rate, matmuls MXU-eligible), and the scalar
result returns as f64. Because the split lives inside ``energy``
itself, every derived transform — ``grad``, the Davidson HVPs via
``jvp(grad)``, the strain gradient — inherits it automatically: the
cast's VJP/JVP re-casts the (co)tangents at the same boundary.

Caveats, measured and pinned in ``tests/test_pot_f32.py``:

* the trust ratio compares ENERGY DIFFERENCES, which near convergence
  shrink below the f32 energy noise floor (~eps_f32 * |E|). Pair the
  wrapper with ``EnsembleConfig.pred_min`` of roughly
  ``1e-6 * |E|`` so sub-noise predictions skip the ratio test (the
  reference's own ratio=None skip for meaningless predictions,
  ``/root/reference/sella/peswrapper.py:586-594``).
* parameter arrays stored on the inner potential as f64 jax arrays
  would type-promote the whole computation straight back to f64, so
  the wrapper rebuilds the inner object with every floating jax-array
  attribute cast to f32 (tuples/lists of arrays included). Python
  float attributes are weakly typed and need no handling.
"""
from __future__ import annotations

import copy

import jax.numpy as jnp

from .base import Potential

__all__ = ["F32Potential"]


def _cast_tree(v):
    if isinstance(v, jnp.ndarray) and jnp.issubdtype(v.dtype, jnp.floating):
        return v.astype(jnp.float32)
    if isinstance(v, tuple):
        return tuple(_cast_tree(e) for e in v)
    if isinstance(v, list):
        return [_cast_tree(e) for e in v]
    return v


class F32Potential(Potential):
    """Evaluate ``inner`` in float32 behind a float64 interface."""

    def __init__(self, inner: Potential) -> None:
        self.pbc = inner.pbc
        self._orig = inner
        # shallow copy with f32 parameter arrays, so dtype promotion
        # inside the inner energy stays f32 end-to-end
        cast = copy.copy(inner)
        for k, v in vars(inner).items():
            setattr(cast, k, _cast_tree(v))
        self._inner32 = cast

    def validate_cell(self, cell) -> None:
        self._orig.validate_cell(cell)

    def energy(self, x: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
        e = self._inner32.energy(
            x.astype(jnp.float32), cell.astype(jnp.float32)
        )
        return e.astype(jnp.float64)
