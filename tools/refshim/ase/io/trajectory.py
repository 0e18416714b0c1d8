"""ASE trajectory shim: in-memory recorder (the reference writes one
frame per force call, ``/root/reference/sella/peswrapper.py:409-411``)."""
from __future__ import annotations

import numpy as np


class TrajectoryWriter:
    def __init__(self, filename=None, mode="w", atoms=None, master=None):
        self.filename = filename
        self.frames = []

    def write(self, atoms=None, **kwargs):
        if atoms is not None:
            self.frames.append(
                dict(
                    positions=np.array(atoms.positions, copy=True),
                    cell=np.array(atoms.cell.array, copy=True),
                    **{k: np.asarray(v) for k, v in kwargs.items()},
                )
            )

    def close(self):
        pass


def Trajectory(filename, mode="r", atoms=None, master=None):
    return TrajectoryWriter(filename, mode=mode, atoms=atoms, master=master)
