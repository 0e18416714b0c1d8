"""ASE optimize shim."""
from .optimize import Optimizer  # noqa: F401
