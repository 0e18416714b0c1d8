from .base import ASECalculatorWrapper, Potential, get_potential
from .emt import EMT
from .pair import Harmonic, LennardJones, MorsePotential
from .sharded import ShardedPairPotential

__all__ = [
    "EMT",
    "ShardedPairPotential",
    "ASECalculatorWrapper",
    "Potential",
    "get_potential",
    "Harmonic",
    "LennardJones",
    "MorsePotential",
]
