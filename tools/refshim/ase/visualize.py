"""ASE visualize shim: ``view`` is only reached from a debug branch of
the reference; it must import, never run."""


def view(*args, **kwargs):
    raise RuntimeError("ase.visualize.view is not available in the shim")
