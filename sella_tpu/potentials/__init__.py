from .base import ASECalculatorWrapper, Potential, get_potential
from .pair import Harmonic, LennardJones, MorsePotential

__all__ = [
    "ASECalculatorWrapper",
    "Potential",
    "get_potential",
    "Harmonic",
    "LennardJones",
    "MorsePotential",
]
