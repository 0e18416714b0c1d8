from .ensemble import (
    EnsembleConfig,
    SearchState,
    free_basis,
    init_state,
    make_step_fn,
    refill_converged,
    run_ensemble,
    run_ensemble_queue,
)
from .metrics import EnsembleMetrics, summarize

__all__ = [
    "EnsembleConfig",
    "SearchState",
    "free_basis",
    "init_state",
    "make_step_fn",
    "refill_converged",
    "run_ensemble",
    "run_ensemble_queue",
    "EnsembleMetrics",
    "summarize",
]
