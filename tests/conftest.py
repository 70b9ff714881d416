"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference's tests were CUDA-only scripts (SURVEY.md §4); here every test
is CPU-runnable, and multi-device sharding tests use XLA's host-platform
device-count override.

NOTE: the environment's sitecustomize registers the axon TPU plugin and sets
``jax_platforms="axon,cpu"`` programmatically at interpreter startup, which
overrides the JAX_PLATFORMS env var — so the platform must be forced back to
CPU via jax.config here, before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
