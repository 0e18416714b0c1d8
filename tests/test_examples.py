"""Smoke-test every ``examples/*.py`` script (VERDICT r4 item 6).

The examples are the product's front door — the reference keeps its
README example runnable via its integration suite
(``/root/reference/README.md:10-39``); here each script runs as a real
subprocess (the exact user invocation) with
``SELLA_TPU_EXAMPLES_FAST=1`` shrinking batch/size/step knobs to CI
scale, asserting exit 0. Import errors, API drift, and shape bugs in
the examples all surface here instead of rotting silently.
"""
import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
)
SCRIPTS = sorted(
    f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
)

# larger even at FAST sizes (internal tier / large-scale slabs /
# work-queue compile sets): keep them out of the default non-slow lane
SLOW = {
    "03_internal_coordinates.py",
    "06_largescale_emt.py",
    "07_largescale_saddle.py",
    "08_work_queue_serving.py",
    "09_heterogeneous_sweep.py",
}


def _run(script):
    env = dict(os.environ)
    env["SELLA_TPU_EXAMPLES_FAST"] = "1"
    # examples must run on the test CPU topology, never grab a TPU.
    # JAX_PLATFORMS alone is NOT enough: the harness sitecustomize
    # force-updates jax_platforms at interpreter start, so a plain
    # subprocess still grabs the tunnel TPU (observed: this test ran
    # 01_saddle_search on the chip, queued behind a running benchmark,
    # and hit the 900 s timeout). SELLA_TPU_PLATFORM is applied by
    # sella_tpu.config at package import, which wins.
    env["JAX_PLATFORMS"] = "cpu"
    env["SELLA_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, script)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr ---\n{proc.stderr[-2000:]}"
    )
    return proc


@pytest.mark.parametrize(
    "script", [s for s in SCRIPTS if s not in SLOW]
)
def test_example_fast(script):
    _run(script)


@pytest.mark.slow
@pytest.mark.parametrize("script", [s for s in SCRIPTS if s in SLOW])
def test_example_slow(script):
    _run(script)


def test_all_examples_covered():
    """Every example script is in exactly one lane (a new example
    cannot silently dodge the smoke test)."""
    assert SLOW <= set(SCRIPTS)
    assert SCRIPTS, "examples directory is empty?"
