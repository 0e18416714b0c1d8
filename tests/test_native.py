"""Native C++ kernel equivalence tests: the ctypes kernels must return
exactly what the numpy reference path returns."""
import numpy as np
import pytest

from sella_tpu.utils.elements import covalent_radii
from sella_tpu.utils.native import (
    find_candidate_bonds_native,
    flood_fill_native,
    get_lib,
)

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no g++)"
)


def _numpy_candidates(positions, cell, pbc, labels, scale, rcov):
    # import the pure-numpy branch by calling the module function with
    # the native path disabled
    from sella_tpu.coords import topology as t
    import sella_tpu.utils.native as native_mod

    orig = native_mod.find_candidate_bonds_native
    native_mod.find_candidate_bonds_native = lambda *a, **k: None
    try:
        return t._candidate_bonds(positions, cell, pbc, labels, scale, rcov)
    finally:
        native_mod.find_candidate_bonds_native = orig


@pytest.mark.parametrize("pbc", [False, True])
def test_candidate_bonds_equivalence(pbc):
    rng = np.random.RandomState(0)
    n = 24
    cell = np.diag([7.0, 8.0, 9.0]) + 0.3 * rng.normal(size=(3, 3))
    positions = rng.uniform(0, 6, size=(n, 3))
    numbers = rng.choice([6, 8, 29], size=n)
    rcov = covalent_radii[numbers]
    labels = -np.ones(n, dtype=np.int64)
    labels[:4] = 0  # a pre-labeled fragment to skip
    pbc_arr = np.array([pbc] * 3)

    native = find_candidate_bonds_native(
        positions, cell, pbc_arr.astype(np.int64), rcov, labels, 1.25
    )
    ref = _numpy_candidates(positions, cell, pbc_arr, labels, 1.25, rcov)

    def norm(items):
        return sorted(
            (min(i, j), max(i, j))
            + tuple(ts if i <= j else -np.asarray(ts))
            for i, j, ts in [
                (i, j, tuple(int(c) for c in ts)) for i, j, ts in items
            ]
        )

    def canon(items):
        out = []
        for i, j, ts in items:
            ts = tuple(int(c) for c in np.asarray(ts))
            if (j, tuple(-c for c in ts)) < (i, ts):
                i, j, ts = j, i, tuple(-c for c in ts)
            out.append((i, j, ts))
        return sorted(out)

    assert canon(native) == canon(ref)


def test_flood_fill_equivalence():
    bonds = np.array([[0, 1], [1, 2], [4, 5], [6, 6]], dtype=np.int64)
    labels, nlab = flood_fill_native(bonds, 8)
    # components: {0,1,2}, {3}, {4,5}, {6}, {7}
    assert nlab == 5
    assert labels[0] == labels[1] == labels[2]
    assert labels[4] == labels[5]
    assert len({labels[0], labels[3], labels[4], labels[6], labels[7]}) == 5


@pytest.mark.parametrize(
    "kind", ["bulk", "slab", "molecule", "triclinic_wrapped"]
)
def test_cell_list_equivalence(kind):
    """n >= 512 dispatches to the linked-cell O(n) search; its output
    must match the numpy pair-loop exactly (same pairs, same image
    offsets) on bulk / slab / molecular / far-out-of-cell geometries."""
    rng = np.random.RandomState(42)
    n = 540
    if kind == "bulk":
        cell = np.eye(3) * 18.0
        positions = rng.uniform(0, 18.0, size=(n, 3))
        pbc = np.array([1, 1, 1])
    elif kind == "slab":
        cell = np.diag([16.0, 16.0, 40.0])
        positions = np.hstack([
            rng.uniform(0, 16, (n, 2)), rng.uniform(0, 7, (n, 1))
        ])
        pbc = np.array([1, 1, 0])
    elif kind == "molecule":
        cell = np.zeros((3, 3))
        positions = rng.normal(size=(n, 3)) * 7.0
        pbc = np.array([0, 0, 0])
    else:  # triclinic, atoms far outside the unit cell
        cell = np.array([[11.0, 0, 0], [3.0, 10.0, 0], [1.0, 2.0, 12.0]])
        positions = rng.uniform(-1.5, 2.5, size=(n, 3)) @ cell
        pbc = np.array([1, 1, 1])

    numbers = rng.choice([1, 6, 29], size=n)
    rcov = covalent_radii[numbers]
    labels = -np.ones(n, dtype=np.int64)

    native = find_candidate_bonds_native(
        positions, cell, pbc, rcov, labels, 1.25
    )
    assert native is not None
    ref = _numpy_candidates(
        positions, np.asarray(cell, float), pbc.astype(bool), labels,
        1.25, rcov,
    )

    def canon(items):
        out = []
        for i, j, ts in items:
            ts = tuple(int(c) for c in np.asarray(ts))
            if (j, tuple(-c for c in ts)) < (i, ts):
                i, j, ts = j, i, tuple(-c for c in ts)
            out.append((i, j, ts))
        return sorted(out)

    assert canon(native) == canon(ref)
