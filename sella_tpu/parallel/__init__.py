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
from .ensemble_internal import (
    InternalEnsembleConfig,
    InternalSearchState,
    bad_internals_mask,
    init_internal_state,
    make_internal_step_fn,
    run_internal_ensemble,
)
from .metrics import EnsembleMetrics, summarize

__all__ = [
    "InternalEnsembleConfig",
    "InternalSearchState",
    "bad_internals_mask",
    "init_internal_state",
    "make_internal_step_fn",
    "run_internal_ensemble",
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
