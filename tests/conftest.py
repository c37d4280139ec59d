"""Test configuration: force an 8-device virtual CPU mesh so sharding
tests run without TPU hardware (SURVEY §4 tier-2 equivalent).

Note: this environment's axon sitecustomize registers the TPU platform at
interpreter start and overrides the JAX_PLATFORMS env var, so the CPU
platform must be forced via jax.config *after* import (before any
backend is initialized)."""

import os

TPU_SMOKE = os.environ.get("MML_TPU_SMOKE") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_SMOKE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not TPU_SMOKE:
    jax.config.update("jax_platforms", "cpu")
# MML_TPU_SMOKE=1 keeps the real TPU backend for tests/test_tpu_smoke.py
# (run it alone: MML_TPU_SMOKE=1 pytest tests/test_tpu_smoke.py); the
# rest of the suite is written for the virtual CPU mesh.
