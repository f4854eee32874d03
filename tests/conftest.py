"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic
is exercised without TPU hardware (the strategy SURVEY.md §4 prescribes:
``xla_force_host_platform_device_count`` + single-process multi-device mesh
with CPU collectives).  Must be set before JAX initializes its backends.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform
# (the harness exports JAX_PLATFORMS=axon; tests must stay host-only).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient TPU plugin (axon) force-merges itself into jax_platforms even
# when the env var says "cpu", silently routing "CPU" compiles through the
# TPU tunnel (40-300s per jit, huge variance).  The explicit config update
# is the only reliable override.
jax.config.update("jax_platforms", "cpu")
