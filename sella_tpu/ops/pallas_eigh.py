"""Pallas TPU kernel: batched small-matrix symmetric eigendecomposition.

The ensemble tiers spend most of their step time in batched eighs of
tiny matrices — (B, 72, 72) for the EMT bench config — where XLA's
``eigh`` custom call costs ~0.9 s at B=4096 on v5e (f32). A Jacobi
sweep is trivially parallel over the batch, but any XLA-level
formulation pays per-round HBM round-trips: sweeps*(n-1) ~ 570
sequential rounds, each reading and writing the whole (B, n, n) array
(measured 3-4.4 s — worse than the custom call).

Here the whole solve runs inside ONE Pallas kernel: each grid program
holds a tile of ``T`` matrices (72x72 f32 = 20 KB each) in VMEM and
performs every round on-chip. HBM traffic is one load + one store
total, and all 570 rounds are VPU elementwise work (roll + select +
multiply/add) — no gathers, no scatters, no matmuls, no LAPACK-style
serialization.

The rotation set uses the round-robin tournament ordering in an
*interleaved layout* (pairs are always rows/cols (2i, 2i+1)):

* the n/2 simultaneous Givens rotations act on adjacent row/column
  pairs — partner rows/cols come from one circular roll each way;
* advancing to the next round's pairing is a FIXED permutation that
  decomposes into rolls with three static-position fixups (the
  tournament's top row shifts right by 2, bottom row left by 2, with
  wrap-throughs at positions 0, 2 and n-1), so no data-dependent
  indexing ever occurs.

CRITICAL environment note: this module must trace its pallas_call with
jax x64 DISABLED. The package enables x64 globally (f64 optimizer
math), and under x64 the BlockSpec index maps and in-kernel iota
arithmetic produce i64 values that Mosaic fails to legalize/lower —
the symptoms are "failed to legalize func.return (i64, ...)",
RecursionErrors in relayout inference, and layout bitwidth check
crashes. Everything here is f32 anyway, so the public wrapper runs
its pallas region under ``jax.enable_x64(False)``.

8 sweeps reach the f32 accuracy floor for n <= 128 from cold starts —
the same accuracy class as the ``eigh_f32`` fast path this replaces
(see ops/linalg.jacobi_eigh for the XLA reference implementation used
on CPU and in tests).

Replaces (TPU-native redesign, not a port): the reference offloads
dense eigh to torch-CUDA above a size threshold
(``/root/reference/sella/_gpu.py:70-84``); this kernel is the batched
TPU answer to the same bottleneck.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts folded (it requires shift >= 0)."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _jacobi_kernel(a_ref, d_ref, v_ref, *, n: int, rounds: int):
    A0 = a_ref[:]
    T = A0.shape[0]
    f32 = jnp.float32

    pos_r = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    even_r = ((pos_r % 2) == 0).astype(f32)
    even_c = ((pos_c % 2) == 0).astype(f32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye_m = (row_ids == col_ids).astype(f32)[None]
    sup_m = (row_ids + 1 == col_ids).astype(f32)[None]
    # permutation fixup weights (disjoint positions 0, 2, n-1)
    f0_r = (pos_r == 0).astype(f32)
    f1_r = ((pos_r == 2) | (pos_r == n - 1)).astype(f32)
    f0_c = (pos_c == 0).astype(f32)
    f1_c = ((pos_c == 2) | (pos_c == n - 1)).astype(f32)

    V0 = jnp.broadcast_to(eye_m, (T, n, n))

    def angles(d, s1, m, axis):
        """Rotation cosine and signed sine per position, from diagonal
        and pair-coupling vectors ((T,n,1) rows / (T,1,n) cols)."""
        app = m * d + (1.0 - m) * _roll(d, 1, axis)
        aqq = m * _roll(d, -1, axis) + (1.0 - m) * d
        apq = m * s1 + (1.0 - m) * _roll(s1, 1, axis)
        # branch-free guards: za = 1 where apq != 0 else 0
        za = jnp.abs(jnp.sign(apq))
        tau = (aqq - app) / (2.0 * apq + (1.0 - za))
        # classical Jacobi: t = sign(tau) / (|tau| + sqrt(1 + tau^2)),
        # with sign promoted to +1 at tau == 0 (45-degree rotation)
        sg = jnp.sign(tau)
        sg = sg + (1.0 - jnp.abs(sg))
        t = sg / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = t * za                           # converged pair: no-op
        c = jax.lax.rsqrt(1.0 + t * t)
        sgn = 1.0 - 2.0 * m                  # -1 on even (p), +1 on odd
        return c, t * c * sgn

    def rot(X, c, ss, m, axis):
        """X[p] <- c X[p] - s X[q]; X[q] <- s X[p] + c X[q] for all
        adjacent pairs at once (partner = blend of the two rolls)."""
        partner = m * _roll(X, -1, axis) + (1.0 - m) * _roll(X, 1, axis)
        return c * X + ss * partner

    def perm_apply(X, m, f0, f1, axis):
        """Tournament re-pairing: new[j] = old[j-2] (even j >= 4),
        old[j+2] (odd j < n-1); new[0]=old[0], new[2]=old[1],
        new[n-1]=old[n-2]. Disjoint-weight arithmetic select."""
        keep = 1.0 - f0 - f1
        base = m * _roll(X, 2, axis) + (1.0 - m) * _roll(X, -2, axis)
        return keep * base + f0 * X + f1 * _roll(X, 1, axis)

    def one_round(_, carry):
        A, V = carry
        d_r = jnp.sum(A * eye_m, axis=-1, keepdims=True)
        s1_r = jnp.sum(A * sup_m, axis=-1, keepdims=True)
        c_r, ss_r = angles(d_r, s1_r, even_r, 1)
        # column-space copies of the same pair angles (A symmetric);
        # the superdiagonal summed over rows lands at the odd member,
        # so shift it down to the even slot first
        d_c = jnp.sum(A * eye_m, axis=-2, keepdims=True)
        s1_c = _roll(jnp.sum(A * sup_m, axis=-2, keepdims=True), -1, 2)
        c_c, ss_c = angles(d_c, s1_c, even_c, 2)

        A = rot(A, c_r, ss_r, even_r, 1)     # left rotation (rows)
        A = rot(A, c_c, ss_c, even_c, 2)     # right rotation (cols)
        V = rot(V, c_c, ss_c, even_c, 2)     # eigvec columns follow

        A = perm_apply(A, even_r, f0_r, f1_r, 1)
        A = perm_apply(A, even_c, f0_c, f1_c, 2)
        V = perm_apply(V, even_c, f0_c, f1_c, 2)
        return (A, V)

    A, V = jax.lax.fori_loop(0, rounds, one_round, (A0, V0))
    # d output is (tile, 1, n): a (tile, n) block would violate the
    # sublane tiling rule for tile < 8
    d_ref[:] = jnp.sum(A * eye_m, axis=-2, keepdims=True)
    v_ref[:] = V


@functools.partial(jax.jit,
                   static_argnames=("sweeps", "tile", "interpret"))
def jacobi_eigh_tpu(A: jnp.ndarray, sweeps: int = 8, tile: int = 16,
                    interpret: bool = False):
    """Batched symmetric eigh on TPU via the Pallas parallel-Jacobi
    kernel. ``A``: (B, n, n) symmetric. Returns eigenvalues ascending
    (B, n) and eigenvector columns (B, n, n), f32 accuracy, A's dtype.

    The batch is tiled ``tile`` matrices per grid program (VMEM:
    ~6 tile n^2 f32 live values — 2.5 MB for tile=16, n=72)."""
    dt = A.dtype
    B, n = A.shape[0], A.shape[-1]
    if n % 2:
        pad = jnp.zeros((B, n + 1, n + 1), A.dtype)
        pad = pad.at[:, :n, :n].set(A)
        pad = pad.at[:, n, n].set(1e30)
        lams, V = jacobi_eigh_tpu(pad, sweeps, tile, interpret)
        return lams[:, :n], V[:, :n, :n]

    from sella_tpu.ops.linalg import _interleave_perm

    idx0, _ = _interleave_perm(n)
    inv0 = np.empty_like(idx0)
    inv0[idx0] = np.arange(n, dtype=idx0.dtype)

    Bp = -(-B // tile) * tile
    Af = A.astype(jnp.float32)
    # rebase rows+cols into the interleaved tournament layout
    Af = jnp.take(jnp.take(Af, idx0, axis=-2), idx0, axis=-1)
    if Bp != B:
        fill = jnp.broadcast_to(
            jnp.eye(n, dtype=jnp.float32)[None], (Bp - B, n, n)
        )
        Af = jnp.concatenate([Af, fill], axis=0)

    rounds = sweeps * (n - 1)
    kern = functools.partial(_jacobi_kernel, n=n, rounds=rounds)
    # The pallas region must trace with x64 OFF (see module docstring);
    # everything inside is f32, so disabling x64 changes nothing else.
    with jax.enable_x64(False):
        d, V = pl.pallas_call(
            kern,
            grid=(Bp // tile,),
            in_specs=[
                pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((tile, 1, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Bp, 1, n), jnp.float32),
                jax.ShapeDtypeStruct((Bp, n, n), jnp.float32),
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                # v5e has far more than the default 16 MB scoped-vmem
                # budget; large tiles amortize the per-op latency of
                # the 570 dependent rounds
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(Af)
    d = d[:B, 0, :]
    V = V[:B]
    # back to the original row basis, eigenvalues ascending
    V = jnp.take(V, inv0, axis=-2)
    order = jnp.argsort(d, axis=-1)
    lams = jnp.take_along_axis(d, order, axis=-1)
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return lams.astype(dt), V.astype(dt)
