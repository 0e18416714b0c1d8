"""Import the real reference package with the shim ASE + math kernels.

A meta-path finder serves ``sella.utilities.math`` (normally a compiled
Cython module) from :mod:`tools.refshim.selutil_math`; the shim ``ase``
package directory is prepended to ``sys.path`` ahead of the reference
root.
"""
from __future__ import annotations

import importlib.abc
import importlib.util
import os
import sys

_REFERENCE_ROOT = "/root/reference"
_SHIM_DIR = os.path.dirname(os.path.abspath(__file__))


class _CythonShimFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    _TARGET = "sella.utilities.math"

    def find_spec(self, fullname, path=None, target=None):
        if fullname == self._TARGET:
            return importlib.util.spec_from_loader(fullname, self)
        return None

    def create_module(self, spec):
        import selutil_math  # resolved from _SHIM_DIR on sys.path

        return selutil_math

    def exec_module(self, module):
        pass


def import_reference_sella(reference_root: str = _REFERENCE_ROOT):
    """Returns the imported reference ``sella`` package (cached)."""
    if "sella" in sys.modules:
        return sys.modules["sella"]
    # sella_tpu must initialize first (x64, element tables used by shim)
    import sella_tpu  # noqa: F401

    for p in (reference_root, _SHIM_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    if not any(isinstance(f, _CythonShimFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _CythonShimFinder())
    import sella

    return sella
