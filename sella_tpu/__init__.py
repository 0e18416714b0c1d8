"""sella_tpu — TPU-native saddle-point / minimum optimizer framework.

A ground-up JAX/XLA rebuild of the capabilities of zadorlab/sella
(reference at ``/root/reference``): RS-PRFO trust-region saddle search,
Davidson-type iterative partial Hessian diagonalization with full reuse
of every gradient evaluation, TS-BFGS multi-secant Hessian updates,
constrained optimization via nullspace projection, internal coordinates,
IRC, and coupled atom+cell optimization — plus what the reference cannot
do: thousands of concurrent vmapped searches per chip, sharded over a
device mesh (``sella_tpu.parallel``).

Public API mirrors the reference exports
(``/root/reference/sella/__init__.py:17-30``).
"""
from . import config  # noqa: F401  (must run first: x64, cache setup)

from .atoms import Atoms, as_atoms, from_ase  # noqa: E402
from .coords.constraints import Constraints  # noqa: E402
from .optimize.sella import Sella  # noqa: E402

__all__ = [
    "Atoms",
    "Constraints",
    "Sella",
    "IRC",
    "Internals",
    "as_atoms",
    "from_ase",
]

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for subsystems with heavier import costs
    if name == "IRC":
        from .optimize.irc import IRC

        return IRC
    if name == "Internals":
        from .coords.internals import Internals

        return Internals
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
