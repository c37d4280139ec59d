"""Test configuration: force an 8-device virtual CPU mesh so sharding
tests run without TPU hardware (SURVEY §4 tier-2 equivalent).

Note: this environment's axon sitecustomize registers the TPU platform at
interpreter start and overrides the JAX_PLATFORMS env var, so the CPU
platform must be forced via jax.config *after* import (before any
backend is initialized)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
