"""Test harness: run everything on an 8-device virtual CPU mesh.

Mirrors the reference's CPU-only CI (.github/workflows/main.yml) while also
exercising multi-device sharding, per SURVEY.md §4: the same invariant checks
run under jax.sharding on a forced multi-device CPU backend so partitioned
aggregation is testable without TPUs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container boot hook (sitecustomize) registers a remote-TPU backend at
# interpreter startup regardless of JAX_PLATFORMS; override it back so the
# suite runs on the local 8-device CPU mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
