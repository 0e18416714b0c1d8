from .base import ASECalculatorWrapper, Potential, get_potential
from .binned import BinnedPairPotential, CellBins
from .emt import EMT, BinnedEMT
from .host import HostBatchedCalculator
from .mixed import F32Potential
from .mlff import MLPotential
from .pair import Harmonic, LennardJones, MorsePotential
from .sharded import (
    ChunkedPairPotential,
    ShardedBinnedPotential,
    ShardedPairPotential,
)
from .sw import StillingerWeber
from .tip3p import TIP3P

__all__ = [
    "EMT",
    "TIP3P",
    "BinnedEMT",
    "BinnedPairPotential",
    "CellBins",
    "ChunkedPairPotential",
    "F32Potential",
    "HostBatchedCalculator",
    "MLPotential",
    "ShardedBinnedPotential",
    "ShardedPairPotential",
    "StillingerWeber",
    "ASECalculatorWrapper",
    "Potential",
    "get_potential",
    "Harmonic",
    "LennardJones",
    "MorsePotential",
]
