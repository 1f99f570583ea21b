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


# Build the native text pipeline if missing (the .so is intentionally not
# committed — ADVICE r1: a checked-in binary can ship stale behavior).
def _ensure_native_text():
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parents[1]
    so = root / "cosdata_tpu" / "text" / "_native.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(root / "csrc")],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            pass  # tests skip gracefully when the toolchain is unavailable


_ensure_native_text()
