"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-node without a cluster" (SURVEY.md §4):
sharding/collective tests exercise real pjit partitioning on host devices.
Must set flags before jax initialises its backends.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session's sitecustomize registers an `axon` TPU platform and overrides
# JAX_PLATFORMS, so plain env vars don't stick — force CPU via jax.config
# (before any backend initialisation).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
