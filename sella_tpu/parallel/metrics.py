"""Metrics / profiling for the batched ensemble (SURVEY.md §5).

The reference's observability is counters (``PES.neval``,
``NumericalHessian.calls``) plus log lines; here the counters live in
the SearchState pytree (``neval``, ``nmatvec``, ``nsteps`` per search)
and this module aggregates them, tracks wall-clock throughput, and wraps
the JAX profiler for trace capture.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np


@dataclass
class EnsembleMetrics:
    """Aggregated view of a SearchState's counters."""

    n_total: int
    n_converged: int
    steps_mean: float
    steps_max: int
    neval_total: int
    nmatvec_total: int
    wall_s: Optional[float] = None

    @property
    def searches_per_sec(self) -> Optional[float]:
        if not self.wall_s:
            return None
        return self.n_converged / self.wall_s

    def as_dict(self) -> dict:
        out = {
            "n_total": self.n_total,
            "n_converged": self.n_converged,
            "steps_mean": round(self.steps_mean, 2),
            "steps_max": self.steps_max,
            "neval_total": self.neval_total,
            "nmatvec_total": self.nmatvec_total,
        }
        if self.wall_s is not None:
            out["wall_s"] = round(self.wall_s, 3)
            out["searches_per_sec"] = round(self.searches_per_sec, 3)
        return out


def summarize(state, wall_s: Optional[float] = None) -> EnsembleMetrics:
    conv = np.asarray(state.converged)
    nsteps = np.asarray(state.nsteps)
    return EnsembleMetrics(
        n_total=int(conv.size),
        n_converged=int(conv.sum()),
        steps_mean=float(nsteps.mean()),
        steps_max=int(nsteps.max()),
        neval_total=int(np.asarray(state.neval).sum()),
        nmatvec_total=int(np.asarray(state.nmatvec).sum()),
        wall_s=wall_s,
    )


class Timer:
    """Wall-clock timer that blocks on device work at stop()."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0

    def stop(self, *arrays) -> float:
        for a in arrays:
            jax.block_until_ready(a)
        self.elapsed = time.perf_counter() - self.t0
        return self.elapsed


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a JAX profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
