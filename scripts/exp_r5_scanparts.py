"""Decompose the flat codes BINS engine's stage-1 (r5): the whole sweep
measures ~100 ms @b1024 / ~400 ms @b4096 device-side on BOTH selection
engines. Times, with device-resident inputs:

- Pallas u8_bin_max kernel alone (per 64k-row slice x 16, as the engine
  invokes it)
- global approx_max_k over the (B, C/group) bin maxima
- window expansion + quantized rescore of the winners
- plain per-chunk matmul WITHOUT selection (scores materialized, summed)
- approx_max_k alone on a resident (B, 65536) f32 block

Usage: python scripts/exp_r5_scanparts.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import numpy as np

import jax
import jax.numpy as jnp

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.ops.topk import NEG_INF
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
d, k = 768, 10
z = np.load(f"/tmp/cosdata_bench_{n}x{d}_1024_0.npz", mmap_mode="r")
x = np.ascontiguousarray(z["x"])
q1024 = np.ascontiguousarray(z["q"])
os.environ["COSDATA_FLAT_ENGINE"] = "codes"
flat = FlatIndex(dim=d, kind="u8", range_=tune_dense_range(x[:1000]),
                 initial_capacity=n, ship_dtype="auto", raw_dtype="f16")
for s in range(0, n, 131072):
    flat.add(x[s : s + 131072])
jax.block_until_ready(flat.store._arrays.data)
print("built", flush=True)

from cosdata_tpu.ops import distance as D
from cosdata_tpu.ops.pallas.u8_scan import u8_bin_max_from_store
from cosdata_tpu.ops.storage import _scores_gathered

st = flat.store
cap = st.capacity
group, kf = 32, 5 * k
k_bins = max(64, -(-kf // group) * 2)
mask = flat._mask()


def timed(label, fn, reps=5):
    fn()
    jax.block_until_ready(jnp.zeros(()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.device_get(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return dt


@functools.partial(jax.jit, static_argnames=("qb",))
def bins_all(q, store, valid, qb):
    pc = 1 << 16
    parts = []
    for s0 in range(0, cap, pc):
        from cosdata_tpu.ops.flat_scan import _slice_store

        sl = _slice_store(store, "u8", s0, pc)
        v = jax.lax.dynamic_slice_in_dim(valid, s0, pc)
        parts.append(u8_bin_max_from_store(
            "cosine", group, q, sl, v, st.dim_pad, qb=qb, bc=2048))
    return jnp.concatenate(parts, axis=0).T  # (B, C/group)


@jax.jit
def select_bins(bins):
    return jax.lax.approx_max_k(bins, k_bins, recall_target=0.99)


@jax.jit
def expand_rescore(q, store, valid, bin_ids):
    b = bin_ids.shape[0]
    nb = 2048 // group
    safe = jnp.maximum(bin_ids, 0)
    jblk = safe // nb
    off = safe % nb
    rows = ((jblk * 2048 + off)[:, :, None]
            + jnp.arange(group)[None, None, :] * nb).reshape(b, -1)
    live = (bin_ids[:, :, None] >= 0).repeat(group, 2).reshape(b, -1)
    live = live & valid[rows]
    sc = _scores_gathered("cosine", "u8", st.dim_pad, q, store, rows)
    sc = jnp.where(live, sc, NEG_INF)
    return jax.lax.top_k(sc, kf)


@jax.jit
def matmul_only(q, store, valid):
    from cosdata_tpu.ops.flat_scan import _slice_store

    acc = jnp.zeros((q.data.shape[0],), jnp.float32)

    def body(c, acc):
        sl = _slice_store(store, "u8", c * 65536, 65536)
        sc = D.score("cosine", "u8", q, sl, st.dim_pad)
        return acc + sc.sum(axis=1)

    return jax.lax.fori_loop(0, cap // 65536, body, acc)


@jax.jit
def amk_only(scores):
    return jax.lax.approx_max_k(scores, kf, recall_target=0.99)


for bsz in (1024, 4096):
    qn = np.concatenate([q1024] * (bsz // 1024))[:bsz]
    qc = st.ship_query_codes(qn)
    jax.block_until_ready(qc.data)
    qb = min(512, bsz)
    print(f"--- b{bsz} ---", flush=True)
    bins = jax.block_until_ready(bins_all(qc, st._arrays, mask, qb))
    timed(f"b{bsz} pallas bins (16 slices)", lambda: bins_all(qc, st._arrays, mask, qb))
    bs, bi = jax.block_until_ready(select_bins(bins))
    timed(f"b{bsz} select top-{k_bins} bins", lambda: select_bins(bins))
    timed(f"b{bsz} expand+rescore", lambda: expand_rescore(qc, st._arrays, mask, bi))
    timed(f"b{bsz} matmul-only sweep", lambda: matmul_only(qc, st._arrays, mask))
    blk = jax.block_until_ready(
        jnp.asarray(np.random.default_rng(0).normal(
            size=(bsz, 65536)).astype(np.float32))
    )
    timed(f"b{bsz} approx_max_k on (B,65536) x1", lambda: amk_only(blk))
