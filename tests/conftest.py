"""Test harness: run everything on 8 virtual CPU devices so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment registers a TPU PJRT plugin from sitecustomize and
imports jax at interpreter startup, so setting JAX_PLATFORMS in os.environ
here is too late — we update the live jax config instead (backends
initialize lazily, on first ``jax.devices()``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
