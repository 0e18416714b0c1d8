from .cartesian import PES
from .internal import InternalPES


def __getattr__(name):
    if name in ("CellCartesianPES", "CellInternalPES"):
        from . import cell

        return getattr(cell, name)
    raise AttributeError(name)


__all__ = ["PES", "InternalPES", "CellCartesianPES", "CellInternalPES"]
