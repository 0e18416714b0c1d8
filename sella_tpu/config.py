"""Global configuration for sella_tpu.

The reference implementation pins JAX to CPU and enables x64
(``/root/reference/sella/__init__.py:9-20``). Here JAX *is* the compute
backend, so we never pin the platform; we do enable x64 by default because
the trust-region / Davidson machinery relies on tolerances down to 1e-15
(e.g. ``/root/reference/sella/optimize/restricted_step.py:64-66``). On TPU
f64 is emulated, but every f64 op in this framework acts on tiny (d x d)
ensemble-batched matrices, so the cost is acceptable; individual
potentials are free to compute internally in f32/bf16 and cast at their
``energy`` boundary.

Set ``SELLA_TPU_X64=0`` to disable f64 (the batched ensemble path is
validated in f32 as well).
"""
from __future__ import annotations

import os

import jax

_X64 = os.environ.get("SELLA_TPU_X64", "1") != "0"

if _X64:
    jax.config.update("jax_enable_x64", True)

# Optional platform pin. ``JAX_PLATFORMS`` alone is not enough on hosts
# whose sitecustomize force-updates ``jax_platforms`` at interpreter
# start (the axon TPU-tunnel image does); this knob wins because it is
# applied at package import, after any sitecustomize. Used by the
# examples smoke test to keep example subprocesses off the TPU; users
# can set ``SELLA_TPU_PLATFORM=cpu`` for a guaranteed-CPU run the same
# way the reference pins its platform (``sella/__init__.py:9-13``).
_plat = os.environ.get("SELLA_TPU_PLATFORM")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception as _e:  # pragma: no cover - late import only
        # do NOT swallow silently: the knob exists to guarantee the
        # platform, and the one way it can fail is a backend already
        # initialized before sella_tpu was imported — the caller
        # should hear about that instead of silently running on a TPU
        import warnings

        warnings.warn(
            f"SELLA_TPU_PLATFORM={_plat!r} could not be applied "
            f"(JAX backend already initialized?): {_e}"
        )

# Persistent compilation cache: mirrors the reference's startup-time saving
# (``/root/reference/sella/__init__.py:3-13``) but via JAX's native cache.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir is None:
    _cache_dir = os.path.join(
        os.path.expanduser("~"), ".cache", "sella_tpu", "jax_cache"
    )
try:  # pragma: no cover - depends on jax version details
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
except Exception:
    pass


def default_dtype():
    """Return the default floating dtype (f64 if enabled, else f32)."""
    import jax.numpy as jnp

    return jnp.float64 if _X64 else jnp.float32


def x64_enabled() -> bool:
    return _X64
