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


def _rebuild_state(payload, state_cls, fmax_default=1e-3):
    """Reconstruct a tier state NamedTuple from an orbax payload,
    tolerating payloads written before late-added fields existed.

    ``SearchState.fmax_t`` (the runtime convergence gate, added after
    the first checkpointed sweeps shipped) defaults to ``fmax_default``
    when absent — callers that know the run's gate pass ``cfg.fmax``
    (ADVICE r4 #2: a pre-fmax_t checkpoint from an fmax=0.02 sweep
    resumed under the hard-coded 1e-3 silently applied a 20x stricter
    gate and lanes burned to max_steps). Any other missing field is a
    genuine version mismatch and raises with the field name."""
    kw = {}
    for k in state_cls._fields:
        if k in payload:
            kw[k] = payload[k]
        elif k == "fmax_t":
            kw[k] = np.asarray(
                fmax_default, dtype=np.asarray(payload["x"]).dtype
            )
        else:
            raise KeyError(
                f"checkpoint payload is missing field {k!r} required by "
                f"{state_cls.__name__}: written by an incompatible "
                "version"
            )
    return state_cls(**kw)


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


def load_state(path: str, state_cls=SearchState,
               fmax_default=1e-3) -> tuple:
    """Restore (state, step) saved by :func:`save_state`; pass the
    tier's state class via ``state_cls``. ``fmax_default``: gate
    applied if the payload predates the ``fmax_t`` field — pass the
    run's ``cfg.fmax`` (same ADVICE r4 #2 contract as
    :func:`load_queue`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    step = payload.pop("_step", None)
    state = _rebuild_state(payload, state_cls,
                           fmax_default=fmax_default)
    return state, (int(step) if step is not None else None)


# ---------------------------------------------------------------------------
# Work-queue checkpointing (preemption-safe sweeps)
# ---------------------------------------------------------------------------
def save_queue(path: str, state, origin: np.ndarray, next_idx: int,
               results: dict, retry_state: dict = None,
               it: Optional[int] = None):
    """Checkpoint a work queue: the device state pytree plus the host
    bookkeeping (lane->input map, queue cursor, harvested results).
    Everything is arrays, so it rides the same orbax payload as
    :func:`save_state`.

    ``retry_state``: optional dict with keys ``pending`` (list of
    (origin, x_start)), ``retries`` and ``spent`` (dicts by origin) —
    the unconverged-retry bookkeeping of
    :func:`~sella_tpu.parallel.ensemble.run_ensemble_queue`; a resumed
    sweep with ``max_retries > 0`` would deadlock without it (the
    retried origins would never produce results).

    ``it``: the driver's global step counter — checkpointed so a
    resumed sweep continues the PRNG key stream (``fold_in(key, it)``)
    instead of replaying the kicks and probe vectors already consumed
    before the crash."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    idxs = np.asarray(sorted(results), dtype=np.int64)
    if len(idxs):
        res_x = np.stack([np.asarray(results[i][0]) for i in idxs])
        res_f = np.asarray([results[i][1] for i in idxs])
        res_ns = np.asarray([results[i][2] for i in idxs],
                            dtype=np.int64)
        res_cv = np.asarray([results[i][3] for i in idxs], dtype=bool)
        # matvec/force counters (6-tuple results); absent in payloads
        # written before these counters existed
        res_mv = np.asarray(
            [results[i][4] if len(results[i]) > 4 else -1
             for i in idxs], dtype=np.int64)
        res_ne = np.asarray(
            [results[i][5] if len(results[i]) > 5 else -1
             for i in idxs], dtype=np.int64)
    payload = dict(
        state._asdict(),
        _origin=np.asarray(origin, dtype=np.int64),
        _next_idx=np.asarray(int(next_idx)),
    )
    if len(idxs):
        # orbax refuses zero-size arrays: no harvested results yet is
        # encoded by the keys' ABSENCE (load_queue restores {})
        payload.update(
            _res_idx=idxs, _res_x=res_x, _res_f=res_f,
            _res_nsteps=res_ns, _res_conv=res_cv,
            _res_nmatvec=res_mv, _res_neval=res_ne,
        )
    if it is not None:
        payload["_it"] = np.asarray(int(it))
    if retry_state is not None:
        # orbax refuses zero-size arrays — empty retry state is encoded
        # by the keys' ABSENCE (load_queue treats missing keys as empty)
        pend = retry_state.get("pending", [])
        if pend:
            payload["_pend_idx"] = np.asarray(
                [p[0] for p in pend], dtype=np.int64)
            payload["_pend_x"] = np.stack(
                [np.asarray(p[1]) for p in pend])
        rt = retry_state.get("retries", {})
        sp = retry_state.get("spent", {})
        keys = np.asarray(sorted(set(rt) | set(sp)), dtype=np.int64)
        if keys.size:
            payload["_retry_idx"] = keys
            payload["_retry_n"] = np.asarray(
                [rt.get(int(k), 0) for k in keys], dtype=np.int64)
            payload["_retry_spent"] = np.asarray(
                [sp.get(int(k), (0, 0, 0)) for k in keys],
                dtype=np.int64,
            ).reshape(len(keys), 3)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_queue(path: str, state_cls=SearchState,
               with_retry_state: bool = False, fmax_default=1e-3):
    """Restore ``(state, origin, next_idx, results)`` saved by
    :func:`save_queue`; with ``with_retry_state=True`` a fifth element
    (the retry bookkeeping dict, possibly empty) is appended.
    ``fmax_default``: gate applied if the payload predates the
    ``fmax_t`` field — queue drivers pass their ``cfg.fmax``."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    state = _rebuild_state(payload, state_cls, fmax_default=fmax_default)
    origin = np.asarray(payload["_origin"], dtype=np.int64)
    next_idx = int(payload["_next_idx"])
    # counter columns may be absent in payloads written before they
    # were checkpointed; negative values are the save-side sentinel for
    # results that never carried counters — restore those as 4-tuples
    # rather than inventing (-1, -1) counters that a consumer would
    # silently average in
    mv = payload.get("_res_nmatvec")
    ne = payload.get("_res_neval")
    results = {
        int(i): (
            np.asarray(payload["_res_x"][k]),
            float(payload["_res_f"][k]),
            int(payload["_res_nsteps"][k]),
            bool(payload["_res_conv"][k]),
        ) + ((int(mv[k]), int(ne[k]))
             if mv is not None and ne is not None
             and int(mv[k]) >= 0 and int(ne[k]) >= 0 else ())
        for k, i in enumerate(np.asarray(payload["_res_idx"]))
    } if "_res_idx" in payload else {}
    if not with_retry_state:
        return state, origin, next_idx, results
    retry_state = {"pending": [], "retries": {}, "spent": {}}
    if "_pend_idx" in payload:
        retry_state["pending"] = [
            (int(i), np.asarray(payload["_pend_x"][k]))
            for k, i in enumerate(np.asarray(payload["_pend_idx"]))
        ]
    if "_retry_idx" in payload:
        rk = np.asarray(payload["_retry_idx"])
        rn = np.asarray(payload["_retry_n"])
        rs = np.asarray(payload["_retry_spent"]).reshape(len(rk), 3)
        retry_state["retries"] = {
            int(i): int(rn[k]) for k, i in enumerate(rk)
        }
        retry_state["spent"] = {
            int(i): tuple(int(v) for v in rs[k])
            for k, i in enumerate(rk)
        }
    # PRNG continuation point (absent in payloads written before it
    # was checkpointed — those resume from 0 as they always did)
    retry_state["it"] = int(payload.get("_it", 0))
    return state, origin, next_idx, results, retry_state
