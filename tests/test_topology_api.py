"""Topology API parity: forbid_* surface, MIC-resolving add_*, and
Minkowski-reduced image search in bond discovery (reference
``internal.py:2634-2691, 3190-3245``)."""
import numpy as np
import pytest

from sella_tpu import Atoms
from sella_tpu.coords.internals import DuplicateInternalError, Internals
from sella_tpu.utils.lattice import mic_ncvec, reduce_cell_basis


def _ethanolish():
    # a CH3-CH2-OH-like chain (geometry only; species irrelevant here)
    pos = np.array([
        [0.0, 0.0, 0.0], [1.5, 0.0, 0.0], [2.2, 1.2, 0.0],
        [-0.5, 0.9, 0.0], [-0.5, -0.9, 0.3],
    ])
    return Atoms(["C", "C", "O", "H", "H"], pos)


def test_forbid_bond_blocks_discovery_and_add():
    atoms = _ethanolish()
    ints = Internals(atoms)
    ints.forbid_bond((0, 1))
    ints.find_all_bonds()
    assert all({i, j} != {0, 1} for i, j, _ in ints.bonds)
    with pytest.raises(DuplicateInternalError):
        ints.add_bond((0, 1))
    # forbidding an existing bond removes it
    ints2 = Internals(atoms)
    ints2.find_all_bonds()
    assert any({i, j} == {0, 1} for i, j, _ in ints2.bonds)
    ints2.forbid_bond((1, 0))  # order-insensitive
    assert all({i, j} != {0, 1} for i, j, _ in ints2.bonds)


def test_forbid_angle_dihedral():
    atoms = _ethanolish()
    ints = Internals(atoms)
    ints.find_all_bonds()
    ints.find_all_angles()
    ints.find_all_dihedrals()
    assert any((a, j, b) in ((0, 1, 2), (2, 1, 0))
               for a, j, b, _ in ints.angles)
    some_dihedral = ints.dihedrals[0][:4]

    ints3 = Internals(atoms)
    ints3.forbid_angle((0, 1, 2))
    ints3.forbid_dihedral(some_dihedral)
    ints3.find_all_bonds()
    ints3.find_all_angles()
    ints3.find_all_dihedrals()
    assert all((a, j, b) not in ((0, 1, 2), (2, 1, 0))
               for a, j, b, _ in ints3.angles)
    assert all(
        d[:4] != some_dihedral and d[:4] != some_dihedral[::-1]
        for d in ints3.dihedrals
    )
    with pytest.raises(DuplicateInternalError):
        ints3.add_angle((2, 1, 0))  # reversal-invariant


def test_add_bond_mic_resolves_image():
    # two atoms near opposite faces: the bond crosses the boundary
    cell = np.array([[8.0, 0, 0], [0, 8.0, 0], [0, 0, 8.0]])
    atoms = Atoms(["C", "C"], [[0.4, 4, 4], [7.6, 4, 4]],
                  cell=cell, pbc=[True] * 3)
    ints = Internals(atoms)
    ints.add_bond((0, 1), mic=True)
    (i, j, nc), = ints.bonds
    d = np.linalg.norm(
        atoms.positions[j] - atoms.positions[i] + nc @ cell
    )
    assert d == pytest.approx(0.8)
    with pytest.raises(ValueError):
        ints.add_bond((0, 1), ncvec=(1, 0, 0), mic=True)


def test_mic_ncvec_skewed_cell():
    """In a heavily skewed cell the naive round() offset misses the
    true minimum image; the reduced-basis search must find it."""
    rng = np.random.RandomState(2)
    cell = np.array([[10.0, 0, 0], [9.0, 3.0, 0], [1.0, 2.0, 9.0]])
    for _ in range(50):
        dx = rng.uniform(-12, 12, size=3)
        n = mic_ncvec(dx, cell, [True] * 3)
        d = np.linalg.norm(dx + n @ cell)
        # brute force over a generous image range
        best = min(
            np.linalg.norm(dx + np.array([a, b, c]) @ cell)
            for a in range(-7, 8) for b in range(-7, 8)
            for c in range(-7, 8)
        )
        assert d == pytest.approx(best, abs=1e-10)


def test_bond_discovery_skewed_cell_matches_bruteforce():
    """Bond search through the reduced basis finds every image bond a
    brute-force all-images search finds (reference reduces the cell
    before the image search, ``internal.py:2638,3274``)."""
    from sella_tpu.coords import topology as topo_mod
    from sella_tpu.utils.elements import covalent_radii

    # skewed cell whose naive +-1 shell misses images
    cell = np.array([[4.0, 0, 0], [3.6, 1.8, 0], [0.5, 0.8, 4.0]])
    rng = np.random.RandomState(0)
    pos = rng.uniform(0, 1, size=(4, 3)) @ cell
    numbers = np.array([6, 6, 6, 6])
    scale = 1.25

    t = topo_mod.find_bonds(numbers, pos, cell, np.array([True] * 3),
                            scale=scale, allow_fragments=True)
    found = {topo_mod._bond_key(i, j, n) for i, j, n in t.bonds}

    rcov = covalent_radii[numbers]
    brute = set()
    for i in range(4):
        for j in range(i, 4):
            for a in range(-3, 4):
                for b in range(-3, 4):
                    for c in range(-3, 4):
                        n = np.array([a, b, c])
                        if i == j and not n.any():
                            continue
                        d = np.linalg.norm(pos[j] - pos[i] + n @ cell)
                        if d <= scale * (rcov[i] + rcov[j]):
                            brute.add(topo_mod._bond_key(i, j, n))
    assert brute <= found, brute - found


def test_reduce_cell_basis_respects_pbc():
    cell = np.array([[6.0, 0, 0], [5.0, 6.0, 0], [0, 0, 30.0]])
    new_cell, M = reduce_cell_basis(cell, pbc=[True, True, False])
    # the non-periodic axis is untouched
    np.testing.assert_allclose(new_cell[2], cell[2])
    assert np.all(M[2] == [0, 0, 1])
    np.testing.assert_allclose(M @ cell, new_cell)
    assert np.linalg.norm(new_cell[1]) < np.linalg.norm(cell[1])
