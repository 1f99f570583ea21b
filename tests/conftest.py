"""Test config: run everything on a virtual 8-device CPU mesh.

The sandbox's sitecustomize force-registers the tunneled TPU backend
("axon") and overrides JAX_PLATFORMS, so we must flip the config knob after
importing jax — before any backend is initialized (SURVEY.md §4: multi-chip
tests on CPU via the device-count override).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
