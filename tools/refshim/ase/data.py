"""ASE data shim: covalent radii / masses from sella_tpu's tables
(identical to ASE's Cordero-2008 values)."""
from sella_tpu.utils.elements import (  # noqa: F401
    atomic_masses,
    chemical_symbols,
    covalent_radii,
)
