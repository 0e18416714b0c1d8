"""Optimizer run-loop base (replaces ase.optimize.optimize.Optimizer).

ASE is not a dependency; this base provides the same run/irun/step
protocol the reference's drivers inherit, so ``Sella(atoms).run(fmax)``
reads identically to upstream (``/root/reference/README.md:32-38``).
"""
from __future__ import annotations

import sys
from typing import Optional


class Optimizer:
    def __init__(
        self,
        atoms,
        logfile: str = "-",
        trajectory=None,
        master: Optional[bool] = None,
    ) -> None:
        self.atoms = atoms
        if logfile == "-":
            self.logfile = sys.stdout
        elif isinstance(logfile, str):
            self.logfile = open(logfile, "w")
        else:
            self.logfile = logfile
        self.nsteps = 0
        self.max_steps = 100_000_000
        self.fmax: Optional[float] = None
        self.observers = []

    def attach(self, function, interval: int = 1, *args, **kwargs):
        """Register an observer callback (the ASE Optimizer protocol):
        called every ``interval`` steps, or exactly once at step
        ``-interval`` when ``interval`` is negative."""
        self.observers.append((function, int(interval), args, kwargs))

    def insert_observer(self, function, position: int = 0,
                        interval: int = 1, *args, **kwargs):
        self.observers.insert(
            position, (function, int(interval), args, kwargs)
        )

    def call_observers(self) -> None:
        for function, interval, args, kwargs in self.observers:
            call = (
                self.nsteps % interval == 0 if interval > 0
                else self.nsteps == -interval
            )
            if call:
                function(*args, **kwargs)

    def irun(self, fmax: float = 0.05, steps: Optional[int] = None):
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

    def run(self, fmax: float = 0.05, steps: Optional[int] = None) -> bool:
        converged = False
        for converged in self.irun(fmax, steps):
            pass
        return converged

    def step(self) -> None:
        raise NotImplementedError

    def converged(self, forces=None) -> bool:
        raise NotImplementedError

    def log(self, forces=None) -> None:
        pass
