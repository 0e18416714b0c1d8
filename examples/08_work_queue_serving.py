"""Work-queue serving: stream a large search campaign through a fixed
device batch with convergence-mask compaction and preemption-safe
checkpointing.

The fixed-ensemble mode (example 02) pays a straggler tail: the whole
batch waits for its slowest lane. In queue mode, converged lanes are
harvested every ``refill_every`` steps and refilled from the queue, so
the chip never idles — this is the production metric for screening
campaigns (see ``bench.py`` BENCH_CONFIG=queue). ``inherit_B=True``
warm-starts refilled lanes with the previous occupant's converged
Hessian, the right prior when the queue holds perturbations of one
structure.

The run is preemption-safe: kill it mid-sweep and run again — it
resumes from the checkpoint, repeating at most one harvest slice.

Run: python examples/08_work_queue_serving.py
"""
import os as _os
import sys as _sys
import tempfile

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running without pip install
import jax.numpy as jnp
import numpy as np

from sella_tpu.parallel.ensemble import (
    EnsembleConfig,
    make_queue_fns,
    run_ensemble_queue,
)
from sella_tpu.potentials import LennardJones

tet = np.array(
    [[0, 0, 0], [1, 0, 0], [0.5, np.sqrt(3) / 2, 0],
     [0.5, np.sqrt(3) / 6, np.sqrt(2.0 / 3)]]
) * 1.12
rng = np.random.RandomState(7)
# SELLA_TPU_EXAMPLES_FAST=1: CI smoke-test sizes (tests/test_examples.py)
FAST = _os.environ.get("SELLA_TPU_EXAMPLES_FAST", "0") == "1"
total, batch = (24, 8) if FAST else (96, 32)  # searches / device lanes
x0_all = jnp.asarray(
    (tet[None] + 0.1 * rng.normal(size=(total, 4, 3))).reshape(total, 12)
)

cfg = EnsembleConfig(natoms=4, order=1, fmax=1e-3, gamma=1e-3,
                     restart_after=50)
pot = LennardJones()

# Build the jitted (step, refill, refresh, snapshot) programs once —
# every queue call sharing this config reuses the compiled executables.
fns = make_queue_fns(pot, cfg, refill_every=5, inherit_B=True)

# Parameter-derived path: a stale checkpoint from a *different* queue
# configuration (or another user on a shared host) must not be resumed
# into this one — run_ensemble_queue trusts the payload's lane count.
ckpt = _os.path.join(
    tempfile.gettempdir(),
    f"sella_tpu_queue_demo_ckpt_t{total}_b{batch}_u{_os.getuid()}",
)
results = run_ensemble_queue(
    pot, x0_all, cfg, batch,
    max_steps_per_search=300, refill_every=5, fns=fns, inherit_B=True,
    checkpoint_path=ckpt, checkpoint_every=1, resume=True,
)
if _os.path.exists(ckpt):           # orbax writes a directory
    import shutil

    shutil.rmtree(ckpt)

nconv = sum(1 for r in results if r[3])
steps = [r[2] for r in results if r[3]]
# counters live in 6-tuple results; resumed legacy payloads may hold
# counter-less 4-tuples — skip those rather than averaging sentinels
matvecs = [r[4] for r in results if len(r) >= 6]
msg = f"{nconv}/{total} saddles converged through {batch} lanes"
if steps:
    msg += f", mean steps {np.mean(steps):.1f}"
if matvecs:
    msg += f", mean Davidson matvecs {np.mean(matvecs):.1f}"
print(msg)
