"""Test harness: force an 8-device virtual CPU mesh so the data/model-parallel
paths are exercised without TPU hardware (SURVEY.md §4).

Note: this container's sitecustomize registers an `axon` TPU-tunnel PJRT
backend in every interpreter and pins JAX_PLATFORMS, so plain env vars are
not enough — we override via jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
