"""Test config: force CPU with 8 virtual devices BEFORE jax initializes, so
multi-chip sharding paths are exercised without TPU hardware (the standard
JAX fake-multi-device mechanism, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

# The hosted environment pins jax_platforms to "axon,cpu" (the TPU tunnel),
# which overrides the JAX_PLATFORMS env var — force CPU via the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
