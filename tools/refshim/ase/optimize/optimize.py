"""ASE ``Optimizer`` base shim.

The run loop reproduces ASE's Dynamics.irun ordering — initial forces,
log, converged-check before each step, ``step()`` then ``nsteps += 1``
— which is also exactly `sella_tpu.optimize.driver.Optimizer.irun`, so
fixture traces and sella_tpu traces share loop semantics by
construction.
"""
from __future__ import annotations

import sys


class Optimizer:
    def __init__(self, atoms, restart=None, logfile="-", trajectory=None,
                 master=None, **kwargs):
        self.atoms = atoms
        if master is False:
            logfile = None
        if logfile == "-":
            self.logfile = sys.stdout
        elif isinstance(logfile, str):
            self.logfile = open(logfile, "w")
        else:
            self.logfile = logfile
        self.nsteps = 0
        self.max_steps = 100_000_000
        if not hasattr(self, "fmax") or self.fmax is None:
            self.fmax = None
        self.observers = []

    def closelater(self, obj):
        if not hasattr(self, "_closelater"):
            self._closelater = []
        self._closelater.append(obj)

    def attach(self, function, interval=1, *args, **kwargs):
        self.observers.append((function, int(interval), args, kwargs))

    def call_observers(self):
        for function, interval, args, kwargs in self.observers:
            call = (
                self.nsteps % interval == 0 if interval > 0
                else self.nsteps == -interval
            )
            if call:
                function(*args, **kwargs)

    def irun(self, fmax=0.05, steps=None):
        self.fmax = fmax
        if steps is not None:
            self.max_steps = self.nsteps + steps
        converged = self.converged()
        self.log()
        self.call_observers()
        yield converged
        while not converged and self.nsteps < self.max_steps:
            self.step()
            self.nsteps += 1
            self.log()
            self.call_observers()
            converged = self.converged()
            yield converged

    def run(self, fmax=0.05, steps=None):
        converged = False
        for converged in self.irun(fmax, steps):
            pass
        return converged

    def step(self):
        raise NotImplementedError

    def converged(self, forces=None):
        raise NotImplementedError

    def log(self, forces=None):
        pass
