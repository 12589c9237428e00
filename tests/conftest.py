"""Test harness: run everything on 8 virtual CPU devices so sharding/pjit
paths are exercised without TPU hardware (SURVEY.md §4).

The ambient environment registers a TPU PJRT plugin from sitecustomize and
imports jax at interpreter startup, so setting JAX_PLATFORMS in os.environ
here is too late — we update the live jax config instead (backends
initialize lazily, on first ``jax.devices()``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the Pallas kernels live (interpret mode) in tests even though the
# backend is CPU — off-TPU the production default routes to the plain-JAX
# composition for speed (ops/integral_pallas.py:_use_pallas).
os.environ.setdefault("IHPR_PALLAS", "interpret")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
