"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh; the real
TPU is reserved for benchmarks (driver-run). Must set XLA flags before
jax initializes.
"""
import os

# The harness pre-sets JAX_PLATFORMS=axon (the TPU tunnel) and its
# sitecustomize force-updates jax_platforms at interpreter start; tests
# must force CPU both in the env and in jax.config (below).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import sella_tpu  # noqa: E402,F401  (enables x64 before any jnp use)

assert jax.default_backend() == "cpu", jax.default_backend()
