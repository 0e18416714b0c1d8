from .base import ASECalculatorWrapper, Potential, get_potential
from .binned import BinnedPairPotential
from .emt import EMT
from .host import HostBatchedCalculator
from .pair import Harmonic, LennardJones, MorsePotential
from .sharded import ChunkedPairPotential, ShardedPairPotential
from .sw import StillingerWeber
from .tip3p import TIP3P

__all__ = [
    "EMT",
    "TIP3P",
    "BinnedPairPotential",
    "ChunkedPairPotential",
    "HostBatchedCalculator",
    "ShardedPairPotential",
    "StillingerWeber",
    "ASECalculatorWrapper",
    "Potential",
    "get_potential",
    "Harmonic",
    "LennardJones",
    "MorsePotential",
]
