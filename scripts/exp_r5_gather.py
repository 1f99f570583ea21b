"""Gather-grain micro-benchmark (r5): the sparse kernels gather posting
slots at 4-8 B grain (16.8M random-ish elements per b256 dispatch). If
TPU gathers are latency-bound at small grain (the rerank tier was), a
128-lane ROW-gather formulation (postings reshaped (P/128, 128), segment
starts 128-aligned) should be ~2 orders faster for the same bytes.

Times, at the b256 sparse dispatch shape:
- scalar-grain gather: 16.8M int32 elements by arbitrary index
- row-grain gather: 131k rows of (128,) int32 (same total elements)
- row-grain gather of (128,) f32 pairs (ids+vals together: 1 KB rows)

Usage: python scripts/exp_r5_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

P = 32 * (1 << 20)  # 32M postings
rng = np.random.default_rng(0)
post = jnp.asarray(rng.integers(0, 1 << 20, size=P).astype(np.int32))
post2d = post.reshape(-1, 128)
n_el = 16_777_216  # 16.8M slots per dispatch
idx_el = jnp.asarray(rng.integers(0, P, size=n_el).astype(np.int32))
n_rows = n_el // 128
idx_row = jnp.asarray(
    rng.integers(0, P // 128, size=n_rows).astype(np.int32)
)
jax.block_until_ready((post, idx_el, idx_row))


def timed(label, fn, reps=3):
    fn()
    jax.block_until_ready(jnp.zeros(()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.device_get(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return dt


@jax.jit
def g_scalar(idx):
    return post[idx].astype(jnp.int64).sum()


@jax.jit
def g_rows(idx):
    return post2d[idx].astype(jnp.int64).sum()


@jax.jit
def g_rows_contig(idx):
    # contiguous rows: pure-bandwidth reference point
    return post2d[jnp.arange(n_rows)].astype(jnp.int64).sum()


timed("scalar-grain 16.8M el", lambda: g_scalar(idx_el))
timed("row-grain 131k x 128", lambda: g_rows(idx_row))
timed("row-grain contiguous", lambda: g_rows_contig(idx_row))
