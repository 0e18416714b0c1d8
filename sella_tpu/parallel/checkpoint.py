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


def save_state(path: str, state: SearchState, step: Optional[int] = None):
    """Save the ensemble state pytree with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = state._asdict()
    if step is not None:
        payload = dict(payload, _step=np.asarray(step))
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_state(path: str) -> tuple:
    """Restore (state, step) saved by :func:`save_state`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    step = payload.pop("_step", None)
    state = SearchState(**{k: payload[k] for k in SearchState._fields})
    return state, (int(step) if step is not None else None)
