"""ASE units shim: re-export sella_tpu's constants (identical values)."""
from sella_tpu.utils.units import Bohr, Hartree, fs, kB  # noqa: F401
