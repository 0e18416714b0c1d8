from .base import ASECalculatorWrapper, Potential, get_potential
from .pair import Harmonic, LennardJones, MorsePotential
from .sharded import ShardedPairPotential

__all__ = [
    "ShardedPairPotential",
    "ASECalculatorWrapper",
    "Potential",
    "get_potential",
    "Harmonic",
    "LennardJones",
    "MorsePotential",
]
