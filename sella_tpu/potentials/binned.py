"""O(N) cell-binned potentials — the large-system fast path.

The dense pair panel (:mod:`sella_tpu.potentials.pair`) and its
chunked/sharded variants do O(N^2) work per force call; at 10k atoms
that is 1e8 pair evaluations of which only ~1e6 are inside any
physically-relevant cutoff. This module bins atoms into a static grid
of rc-sized cells ON DEVICE with fixed shapes (the jax-md cell-list
pattern) and evaluates only the 27-cell neighborhoods:

1. bin index per atom (fractional coords for PBC, a static bounding
   box otherwise — clipping is 1-Lipschitz, so two atoms within rc can
   never land more than one bin apart and neighbors are never missed);
2. ``argsort`` by bin id; rank-within-bin via ``searchsorted``;
3. scatter into a ``(ncells, capacity)`` bucket table (out-of-capacity
   ranks scatter out of bounds and are dropped — see
   :meth:`CellBins.max_occupancy`);
4. every atom gathers the 27 neighboring buckets' candidates,
   computes masked distances (minimum image for PBC) and sums the
   per-pair terms under the cutoff.

Everything is jit/vmap/jvp-compatible: the integer binning carries no
gradient, positions enter only through the final gather, so forces and
the exact Lanczos HVPs of the matrix-free large-system driver
(:mod:`sella_tpu.parallel.largescale`) are O(N) too. This replaces the
role the reference delegates to neighbor-listed calculators (its force
calls are ASE's problem, ``/root/reference/sella/peswrapper.py:413-418``)
with a TPU-resident equivalent.

The grid machinery is shared: :class:`CellBins` produces per-atom
candidate lists; :class:`BinnedPairPotential` sums a pair energy over
them, and :class:`sella_tpu.potentials.emt.BinnedEMT` evaluates the
many-body EMT density/pair sums over the same lists.

Unlike the dense panel, a cutoff ``rc`` is imposed (with an energy
shift for C0 continuity by default in the pair case) — the physical
model is "``inner`` truncated at rc", the standard large-N contract.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.linalg import inv3
from .base import Potential


class CellBins:
    """Static cell-list grid + on-device candidate gather.

    Parameters
    ----------
    x0 : (3n,) or (n, 3) initial positions — fixes the static grid
        (bounding box for free boundaries) and the default capacity.
    rc : float — interaction cutoff; also the bin edge length.
    cell : (3, 3) or None — periodic cell. When given, binning uses
        fractional coordinates of the RUNTIME cell (mild cell changes
        are fine), but the static bin counts come from this
        construction-time cell, which must keep every periodic height
        >= 3 rc (so only the nearest image of any neighbor is in
        range).
    capacity : atoms per bin (static). Default: 2x the initial max
        occupancy, rounded up to a multiple of 4.
    margin : free-boundary bounding-box padding in units of rc —
        headroom for atoms drifting outside the initial extent
        (clipped binning stays correct regardless; the margin just
        keeps edge bins from crowding).
    """

    def __init__(self, x0, rc: float, cell=None,
                 capacity: Optional[int] = None,
                 margin: float = 2.0) -> None:
        self.rc = float(rc)
        self.pbc = cell is not None
        pos = np.asarray(x0, dtype=np.float64).reshape(-1, 3)
        self.n = pos.shape[0]

        if self.pbc:
            cell = np.asarray(cell, dtype=np.float64)
            self._cell_np = cell
            vol = abs(np.linalg.det(cell))
            heights = np.array([
                vol / np.linalg.norm(np.cross(cell[(a + 1) % 3],
                                              cell[(a + 2) % 3]))
                for a in range(3)
            ])
            nbins = np.floor(heights / rc).astype(int)
            if np.any(nbins < 3):
                raise ValueError(
                    f"periodic axes must satisfy height >= 3 rc for "
                    f"the binned path (heights {heights}, rc {rc}); "
                    "use the dense/chunked potential for small cells"
                )
            self._lo = np.zeros(3)
            self._w = 1.0 / nbins           # fractional bin widths
        else:
            self._cell_np = None
            lo = pos.min(axis=0) - margin * rc
            hi = pos.max(axis=0) + margin * rc
            nbins = np.maximum(
                np.ceil((hi - lo) / rc).astype(int), 1
            )
            self._lo = lo
            self._w = np.full(3, rc)
        self.nbins = tuple(int(b) for b in nbins)
        self.ncells = int(np.prod(nbins))

        if capacity is None:
            occ = int(self._host_max_occupancy(pos))
            capacity = max(((2 * occ + 3) // 4) * 4, 4)
        self.capacity = int(capacity)

        # precomputed 27 neighbor-cell offsets
        off = np.stack(np.meshgrid(*[[-1, 0, 1]] * 3,
                                   indexing="ij"), -1).reshape(27, 3)
        self._offsets = jnp.asarray(off)

    # -- host-side diagnostics ------------------------------------------
    def _host_max_occupancy(self, pos: np.ndarray) -> int:
        if self.pbc:
            frac = pos @ np.linalg.inv(self._cell_np)
            frac -= np.floor(frac)
            b3 = np.clip((frac / self._w).astype(int), 0,
                         np.array(self.nbins) - 1)
        else:
            b3 = np.clip(((pos - self._lo) / self._w).astype(int), 0,
                         np.array(self.nbins) - 1)
        ids = np.ravel_multi_index(b3.T, self.nbins)
        return int(np.bincount(ids, minlength=self.ncells).max())

    def max_occupancy(self, x) -> int:
        """Current max atoms-per-bin (host-side); call after large
        moves to confirm ``capacity`` still holds — overflowing atoms
        silently drop out of everyone's candidate lists."""
        return self._host_max_occupancy(
            np.asarray(x, dtype=np.float64).reshape(-1, 3)
        )

    # -- device-side diagnostics ----------------------------------------
    def overflow_count(self, pos, cell):
        """Jittable count of atoms beyond their bin's capacity.

        Overflowing atoms silently drop out of every candidate list, so
        a nonzero count means the energy is wrong — check after large
        moves (device-side analog of :meth:`max_occupancy`)."""
        n = self.n
        nbins = jnp.asarray(self.nbins)
        if self.pbc:
            frac = pos @ inv3(cell)
            frac = frac - jnp.floor(frac)
            b3 = jnp.clip(
                (frac / jnp.asarray(self._w)).astype(jnp.int32), 0,
                nbins - 1,
            )
        else:
            b3 = jnp.clip(
                ((pos - jnp.asarray(self._lo))
                 / jnp.asarray(self._w)).astype(jnp.int32),
                0, nbins - 1,
            )
        binid = (b3[:, 0] * nbins[1] + b3[:, 1]) * nbins[2] + b3[:, 2]
        sbin = jnp.sort(binid)
        rank = jnp.arange(n) - jnp.searchsorted(sbin, sbin, side="left")
        return jnp.sum(rank >= self.capacity)

    # -- device-side candidate gather -----------------------------------
    def candidates(self, pos, cell):
        """Per-atom neighbor candidates with masked distances.

        Returns ``(cand, r2, valid)``: ``cand`` is (n, 27K) candidate
        atom indices (fill value = n — index a padded per-atom array),
        ``r2`` the squared distances (minimum image under PBC; garbage
        on invalid entries), and ``valid`` the boolean mask
        (not-self AND real atom AND r < rc). Callers must overwrite
        masked distances BEFORE any sqrt/divide (NaN-adjoint rule).
        """
        table = self.bucket_table(pos, cell)
        return self.gather_rows(pos, cell, table,
                                jnp.arange(self.n))

    def bucket_table(self, pos, cell):
        """Stage 1: bin ids + the (ncells+1, K) bucket scatter.

        Returns an opaque ``(bucket, b3, inv)`` tuple consumed by
        :meth:`gather_rows` — split out so large systems can gather
        row-chunks under rematerialization instead of materializing
        the full (n, 27K) panel."""
        n = self.n
        K = self.capacity
        nbins = jnp.asarray(self.nbins)
        ncells = self.ncells

        if self.pbc:
            inv = inv3(cell)
            frac = pos @ inv
            frac = frac - jnp.floor(frac)
            b3 = jnp.clip(
                (frac / jnp.asarray(self._w)).astype(jnp.int32), 0,
                nbins - 1,
            )
        else:
            b3 = jnp.clip(
                ((pos - jnp.asarray(self._lo))
                 / jnp.asarray(self._w)).astype(jnp.int32),
                0, nbins - 1,
            )
        binid = (b3[:, 0] * nbins[1] + b3[:, 1]) * nbins[2] + b3[:, 2]

        order = jnp.argsort(binid)
        sbin = binid[order]
        first = jnp.searchsorted(sbin, sbin, side="left")
        rank = jnp.arange(n) - first
        # bucket table with one sentinel row of fill slots at the end;
        # over-capacity ranks target one-past-the-sentinel and DROP
        slot = jnp.where(rank < K, sbin * K + rank, (ncells + 1) * K)
        bucket = jnp.full(((ncells + 1) * K,), n, jnp.int32).at[
            slot
        ].set(order.astype(jnp.int32), mode="drop")
        inv = inv3(cell) if self.pbc else None
        return bucket, b3, inv

    def gather_rows(self, pos, cell, table, rows):
        """Stage 2: candidates/distances for the atoms in ``rows``.

        ``rows`` may contain the sentinel value n (chunk padding);
        those rows come back fully masked. Shapes: cand/r2/valid are
        (len(rows), 27K)."""
        n = self.n
        K = self.capacity
        nbins = jnp.asarray(self.nbins)
        ncells = self.ncells
        bucket, b3_all, inv = table

        real = rows < n
        rows_c = jnp.minimum(rows, n - 1)
        b3 = b3_all[rows_c]                       # (m, 3)

        # neighbor bins per row atom: (m, 27); invalid -> sentinel row
        nb3 = b3[:, None, :] + self._offsets[None, :, :]
        if self.pbc:
            nb3 = jnp.mod(nb3, nbins[None, None, :])
            nbid = (nb3[..., 0] * nbins[1] + nb3[..., 1]) * nbins[2] \
                + nb3[..., 2]
        else:
            valid_bin = jnp.all(
                (nb3 >= 0) & (nb3 < nbins[None, None, :]), axis=-1
            )
            nb3c = jnp.clip(nb3, 0, nbins[None, None, :] - 1)
            nbid = (nb3c[..., 0] * nbins[1] + nb3c[..., 1]) * nbins[2] \
                + nb3c[..., 2]
            nbid = jnp.where(valid_bin, nbid, ncells)

        # candidates: (m, 27K) atom indices, fill = n
        m = rows.shape[0]
        cand = bucket[
            (nbid[..., None] * K
             + jnp.arange(K)[None, None, :]).reshape(m, 27 * K)
        ]
        # pad row: value is irrelevant (fully masked downstream; masked
        # distances must be overwritten BEFORE sqrt — NaN-adjoint rule)
        pos_pad = jnp.concatenate(
            [pos, jnp.zeros((1, 3), pos.dtype)], axis=0
        )
        pj = pos_pad[cand]                       # (m, 27K, 3)
        dr = pj - pos[rows_c][:, None, :]
        if self.pbc:
            fr = dr @ inv
            dr = (fr - jnp.round(fr)) @ cell
        r2 = jnp.sum(dr * dr, axis=-1)
        valid = (cand != rows[:, None]) & (cand < n) & real[:, None] & (
            r2 < self.rc * self.rc
        )
        return cand, r2, valid


class BinnedPairPotential(Potential):
    """Cell-binned O(N) evaluation of a pair potential.

    Parameters
    ----------
    inner : pair potential exposing ``pair_energy(r)``
    rc : float — interaction cutoff; also the bin edge length.
    x0 : (3n,) initial flat positions — fixes the static grid.
    cell : (3, 3) or None — periodic cell (see :class:`CellBins`).
    capacity, margin : see :class:`CellBins`.
    shift : subtract ``pair_energy(rc)`` so the energy is continuous
        at the cutoff (default True).
    """

    def __init__(self, inner, rc: float, x0, cell=None,
                 capacity: Optional[int] = None, margin: float = 2.0,
                 shift: bool = True,
                 chunk: Optional[int] = None) -> None:
        if not hasattr(inner, "pair_energy"):
            raise TypeError(
                f"{type(inner).__name__} exposes no pair_energy(r); "
                "BinnedPairPotential needs a pair potential"
            )
        self.inner = inner
        self.rc = float(rc)
        self.shift = bool(shift)
        self.pbc = bool(getattr(inner, "pbc", False) or cell is not None)
        if self.pbc and cell is None:
            raise ValueError("pbc pair potential needs a cell")
        self._bins = CellBins(x0, rc, cell=cell if self.pbc else None,
                              capacity=capacity, margin=margin)
        self.n = self._bins.n
        # chunk: evaluate `chunk` atom rows at a time under lax.map +
        # jax.checkpoint — peak memory drops to one chunk's (chunk,
        # 27K) panel (derivatives recompute it per chunk)
        self.chunk = chunk

    def max_occupancy(self, x) -> int:
        """Current max atoms-per-bin; see :meth:`CellBins.max_occupancy`."""
        return self._bins.max_occupancy(x)

    # kept for backward compatibility with existing capacity checks
    @property
    def capacity(self) -> int:
        return self._bins.capacity

    @property
    def nbins(self):
        return self._bins.nbins

    @property
    def ncells(self) -> int:
        return self._bins.ncells

    def _rows_energy(self, pos, cell, table, rows):
        """Partial energy owned by the atoms in ``rows`` (their half of
        the pair sum); sentinel rows (== n) contribute zero."""
        _, r2, valid = self._bins.gather_rows(pos, cell, table, rows)
        r = jnp.sqrt(jnp.where(valid, r2, 1.0))
        e = self.inner.pair_energy(r)
        if self.shift:
            e = e - self.inner.pair_energy(jnp.asarray(self.rc))
        return 0.5 * jnp.sum(jnp.where(valid, e, 0.0))

    def energy(self, x, cell):
        import jax

        n = self.n
        pos = x.reshape(n, 3)
        table = self._bins.bucket_table(pos, cell)

        def rows_energy(rows):
            return self._rows_energy(pos, cell, table, rows)

        if self.chunk is None:
            return rows_energy(jnp.arange(n))

        C = int(self.chunk)
        nchunks = -(-n // C)
        rows_all = jnp.concatenate(
            [jnp.arange(n),
             jnp.full(nchunks * C - n, n, jnp.int32)]
        ).reshape(nchunks, C)
        es = jax.lax.map(jax.checkpoint(rows_energy), rows_all)
        return jnp.sum(es)
