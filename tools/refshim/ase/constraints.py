"""ASE constraints shim.

The reference imports these classes for isinstance dispatch in
``Constraints.merge_ase_constraint``
(``/root/reference/sella/internal.py:2981-3030``); the attribute surface
below matches what that table reads.
"""
from __future__ import annotations

import numpy as np


class FixConstraint:
    pass


class FixAtoms(FixConstraint):
    def __init__(self, indices=None, mask=None):
        if mask is not None:
            indices = np.flatnonzero(np.asarray(mask))
        self.index = np.asarray(indices, dtype=np.int64)


class FixCom(FixConstraint):
    pass


class FixBondLengths(FixConstraint):
    def __init__(self, pairs, tolerance=1e-13, bondlengths=None):
        self.pairs = np.asarray(pairs, dtype=np.int64)
        self.bondlengths = bondlengths


class FixBondLength(FixBondLengths):
    def __init__(self, a1, a2):
        super().__init__([(a1, a2)])


class FixCartesian(FixConstraint):
    def __init__(self, a, mask=(True, True, True)):
        self.index = np.atleast_1d(np.asarray(a, dtype=np.int64))
        # ASE stores the mask negated internally as ``self.mask``
        self.mask = np.asarray(mask, dtype=bool)


class FixInternals(FixConstraint):
    def __init__(self, bonds=None, angles_deg=None, dihedrals_deg=None,
                 **kwargs):
        self.bonds = bonds or []
        self.angles = angles_deg or []
        self.dihedrals = dihedrals_deg or []
