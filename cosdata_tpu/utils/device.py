"""Device/session warmup.

The tunneled TPU this framework is benchmarked on charges a large,
variable one-time cost (~200-900 s measured) to the FIRST
device-compute -> host-download round trip of each process — session
establishment / queue admission on the shared remote device, independent
of transfer size (a 512-byte download of a program output stalls just as
long as a 4 MB one) and of program content. Every subsequent sync is
milliseconds. Locally-attached TPUs do not behave this way.

Long-lived entry points (REST/gRPC server, benchmarks, bulk loaders)
call :func:`warmup_device` once at startup so the cost lands outside any
user-visible request or timed measurement. A plain ``jnp.zeros`` fetch
is NOT sufficient — the array must be the output of an executed program.
"""

from __future__ import annotations

_done = False


def warmup_device() -> float:
    """Run a tiny device program and download its result, absorbing the
    per-process first-sync cost. Returns the wall seconds it took.
    Idempotent; cheap (<0.5 s) on healthy backends."""
    global _done
    if _done:
        return 0.0
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    try:
        np.asarray(jnp.arange(128, dtype=jnp.int32) * 2 + 1)
        # also pay the one-time wire-bandwidth probe here (16 MB upload)
        # rather than on the first user search (ship_queries reads it)
        from cosdata_tpu.ops.storage import wire_bandwidth_mbps

        wire_bandwidth_mbps()
    except Exception:  # no device available — nothing to warm
        pass
    _done = True
    return time.time() - t0
