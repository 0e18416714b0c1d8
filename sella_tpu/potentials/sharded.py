"""Mesh-sharded pair potential for the large-single-system path.

SURVEY.md §2 (parallelism item 3): for systems too large for one chip's
batched tier, the force field itself shards — each device owns a block
of atoms and computes that block's pair interactions against all atoms,
with one ``psum`` over the mesh per energy evaluation. Because the
sharding lives inside ``energy`` (a ``shard_map`` region), every derived
quantity scales for free: ``jax.grad`` gives sharded forces,
``jax.jvp``-of-grad gives sharded Hessian-vector products, so the
matrix-free Lanczos/Davidson machinery in
:mod:`sella_tpu.parallel.largescale` runs multi-chip without touching a
Hessian (the reference's matrix-free pattern is ``NumericalHessian``,
``/root/reference/sella/linalg.py:39-95``, host-serial FD; here matvecs
are exact HVPs sharded over ICI).

The O(n^2/ndev) dense row-block is deliberate: for n up to a few 10^4
the (blk, n) distance panel maps onto the VPU far better than gather-
heavy neighbor lists, and memory is n^2/ndev * 8 bytes — 100 MB/device
at n = 10^4 on 8 devices.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 stable API; experimental path warns on jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.linalg import inv3
from .base import Potential


class ShardedPairPotential(Potential):
    """Wrap a pair potential (anything exposing ``pair_energy(r)``) so
    its lattice sums shard over a device mesh axis.

    Positions stay replicated (they are tiny); the (blk, n) interaction
    panel is what shards. The energy is bitwise-deterministic for a
    fixed mesh size but the summation order differs from the unsharded
    potential, so compare with a tolerance.
    """

    def __init__(self, inner, mesh: Mesh, axis: str = "atoms") -> None:
        if not hasattr(inner, "pair_energy"):
            raise TypeError(
                f"{type(inner).__name__} exposes no pair_energy(r); "
                "ShardedPairPotential needs a pair potential"
            )
        if axis not in mesh.shape:
            raise ValueError(
                f"mesh has no axis {axis!r}; its axes are "
                f"{tuple(mesh.shape)}"
            )
        self.inner = inner
        self.mesh = mesh
        self.axis = axis
        self.pbc = getattr(inner, "pbc", False)

    def energy(self, x, cell):
        n = x.shape[0] // 3
        ndev = self.mesh.shape[self.axis]
        blk = -(-n // ndev)
        pbc = self.pbc
        inner = self.inner
        axis = self.axis

        def partial_energy(x_, cell_):
            d = jax.lax.axis_index(axis)
            pos = x_.reshape(n, 3)
            rows = d * blk + jnp.arange(blk)
            in_range = rows < n
            rows_c = jnp.clip(rows, 0, n - 1)
            pi = pos[rows_c]                          # (blk, 3)
            dr = pos[None, :, :] - pi[:, None, :]     # (blk, n, 3)
            if pbc:
                inv = inv3(cell_)
                frac = dr @ inv
                frac = frac - jnp.round(frac)
                dr = frac @ cell_
            r2 = jnp.sum(dr * dr, axis=-1)            # (blk, n)
            valid = in_range[:, None] & (
                rows_c[:, None] != jnp.arange(n)[None, :]
            )
            # double-where: evaluate pair_energy at a safe distance on
            # masked slots so reverse-mode sees no 0/0
            r = jnp.sqrt(jnp.where(valid, r2, 1.0))
            e = jnp.where(valid, inner.pair_energy(r), 0.0)
            return jax.lax.psum(0.5 * jnp.sum(e), axis)

        fn = shard_map(
            partial_energy,
            mesh=self.mesh,
            in_specs=(P(), P()),
            out_specs=P(),
        )
        return fn(x, cell)


class ChunkedPairPotential(Potential):
    """Single-device large-N path: the (n, n) interaction panel is
    evaluated in sequential row chunks via ``lax.map``, bounding peak
    memory at ``chunk * n`` instead of ``n^2`` — a 10k-atom dense pair
    panel (1e8 f64 entries per intermediate) neither fits comfortably
    in HBM nor compiles, while the chunked scan does. Differentiable
    end-to-end (grad and HVPs flow through the scan), so the
    matrix-free MMF driver (:mod:`sella_tpu.parallel.largescale`) runs
    at 10k+ atoms on one chip. Compose with
    :class:`ShardedPairPotential` only by choosing one or the other —
    multi-chip sharding splits rows across devices; chunking splits
    them across time."""

    def __init__(self, inner, chunk: int = 512) -> None:
        if not hasattr(inner, "pair_energy"):
            raise TypeError(
                f"{type(inner).__name__} exposes no pair_energy(r); "
                "ChunkedPairPotential needs a pair potential"
            )
        self.inner = inner
        self.chunk = int(chunk)
        self.pbc = getattr(inner, "pbc", False)

    def energy(self, x, cell):
        n = x.shape[0] // 3
        chunk = min(self.chunk, n)
        nblk = -(-n // chunk)
        pos = x.reshape(n, 3)
        pbc = self.pbc
        inner = self.inner
        inv = inv3(cell) if pbc else None
        cols = jnp.arange(n)

        def blk_energy(b):
            rows = b * chunk + jnp.arange(chunk)
            in_range = rows < n
            rows_c = jnp.clip(rows, 0, n - 1)
            pi = pos[rows_c]                          # (chunk, 3)
            dr = pos[None, :, :] - pi[:, None, :]     # (chunk, n, 3)
            if pbc:
                frac = dr @ inv
                dr = (frac - jnp.round(frac)) @ cell
            r2 = jnp.sum(dr * dr, axis=-1)
            valid = in_range[:, None] & (rows_c[:, None] != cols[None])
            r = jnp.sqrt(jnp.where(valid, r2, 1.0))
            e = jnp.where(valid, inner.pair_energy(r), 0.0)
            return 0.5 * jnp.sum(e)

        return jnp.sum(jax.lax.map(blk_energy, jnp.arange(nblk)))


class ShardedBinnedPotential(Potential):
    """Shard a cell-binned potential's row evaluation over a mesh axis
    — the multi-chip O(N) path for 100k+-atom systems.

    Wraps a :class:`~sella_tpu.potentials.binned.BinnedPairPotential`
    or :class:`~sella_tpu.potentials.emt.BinnedEMT`: positions stay
    replicated (tiny), every device builds the bucket table (O(n log n)
    integer work, negligible) and evaluates its contiguous block of
    atom rows' candidate panel, with one ``psum`` per energy. Combines
    with the inner potential's ``chunk`` contract by construction:
    per-device work is ``n / ndev`` rows, so memory scales down with
    the mesh. Gradients and Lanczos/Davidson HVPs shard for free
    because the sharding lives inside ``energy``.
    """

    def __init__(self, binned, mesh: Mesh, axis: str = "atoms") -> None:
        if not hasattr(binned, "_rows_energy"):
            raise TypeError(
                f"{type(binned).__name__} exposes no _rows_energy; "
                "ShardedBinnedPotential needs a cell-binned potential"
            )
        if axis not in mesh.shape:
            raise ValueError(
                f"mesh has no axis {axis!r}; its axes are "
                f"{tuple(mesh.shape)}"
            )
        self.binned = binned
        self.mesh = mesh
        self.axis = axis
        self.pbc = getattr(binned, "pbc", False)
        self.n = binned.n

    def max_occupancy(self, x) -> int:
        return self.binned.max_occupancy(x)

    def energy(self, x, cell):
        n = self.n
        ndev = self.mesh.shape[self.axis]
        blk = -(-n // ndev)
        axis = self.axis
        binned = self.binned

        def partial_energy(x_, cell_):
            d = jax.lax.axis_index(axis)
            pos = x_.reshape(n, 3)
            table = binned._bins.bucket_table(pos, cell_)
            rows = d * blk + jnp.arange(blk)
            rows = jnp.where(rows < n, rows, n)   # sentinel padding
            e = binned._rows_energy(pos, cell_, table, rows)
            return jax.lax.psum(e, axis)

        fn = shard_map(
            partial_energy,
            mesh=self.mesh,
            in_specs=(P(), P()),
            out_specs=P(),
        )
        return fn(x, cell)
