"""Checkpoint/resume for the batched ensemble (orbax-backed).

The reference's checkpointing is minimal (trajectory files + an
initial-Hessian .npy, ``SURVEY.md`` §5); here the full ensemble
SearchState pytree is saved/restored with orbax, making long sweeps
preemption-safe.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .ensemble import SearchState


def save_state(path: str, state, step: Optional[int] = None):
    """Save an ensemble state pytree with orbax. Works for every tier's
    NamedTuple state (SearchState, InternalSearchState, CellSearchState,
    IRCState, ...)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = state._asdict()
    if step is not None:
        payload = dict(payload, _step=np.asarray(step))
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_state(path: str, state_cls=SearchState) -> tuple:
    """Restore (state, step) saved by :func:`save_state`; pass the
    tier's state class via ``state_cls``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    step = payload.pop("_step", None)
    state = state_cls(**{k: payload[k] for k in state_cls._fields})
    return state, (int(step) if step is not None else None)
