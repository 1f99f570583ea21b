"""Stage-level profile of the flat codes engine at the bench shape.

VERDICT r4 ask #6: explain (or fix) flat_qps_b4096 < flat_qps_b1024 and
find the headroom between the measured ~19k qps and the >10x compute
ceiling. Times, per batch size:

- dispatch-only floor (empty program round trip)
- query upload (u8 codes wire)
- stage-1 matmul+select sweep (no expansion/rerank: rerank=False path)
- full pipeline (rerank=True)

Usage: python scripts/prof_flat_stages.py [n] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
d, k = 768, 10

bench_cache = f"/tmp/cosdata_bench_{n}x{d}_1024_0.npz"
z = np.load(bench_cache, mmap_mode="r")
x = np.ascontiguousarray(z["x"])
q1024 = np.ascontiguousarray(z["q"])
print("data ready", flush=True)

os.environ["COSDATA_FLAT_ENGINE"] = "codes"
rng_tuned = tune_dense_range(x[:1000])
flat = FlatIndex(dim=d, kind="u8", range_=rng_tuned, initial_capacity=n,
                 ship_dtype="auto", raw_dtype="f16")
t0 = time.time()
for s in range(0, n, 131072):
    flat.add(x[s : s + 131072])
jax.block_until_ready(flat.store._arrays.data)
print(f"build: {time.time() - t0:.1f}s", flush=True)


def timed(label, fn, reps=reps):
    fn()  # compile/warm
    jax.block_until_ready(jnp.zeros(()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.device_get(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms/call", flush=True)
    return dt


# dispatch floor: trivial program, same sync discipline
tiny = jax.jit(lambda v: v * 2 + 1)
timed("dispatch floor (tiny program)", lambda: tiny(jnp.arange(8)))

for bsz in (1024, 4096):
    q = np.concatenate([q1024] * (bsz // 1024))[:bsz]
    dt_full = timed(
        f"b{bsz} full (rerank)", lambda: flat.search_device(q, top_k=k, rerank=True)
    )
    dt_s1 = timed(
        f"b{bsz} stage1 (no rerank)",
        lambda: flat.search_device(q, top_k=k, rerank=False),
    )
    # query wire: ship codes only (host quantize + upload + tiny reduce)
    qc = flat.store.ship_query_codes(q)

    def wire():
        qq = flat.store.ship_query_codes(q)
        return jnp.sum(qq.data.astype(jnp.int32))

    dt_w = timed(f"b{bsz} query wire", wire)
    print(
        f"b{bsz}: qps_full={bsz/dt_full:.0f} qps_stage1={bsz/dt_s1:.0f} "
        f"wire={dt_w*1000:.1f}ms rerank_tier={(dt_full-dt_s1)*1000:.1f}ms",
        flush=True,
    )

# pipelined throughput both sizes (the bench's own measurement shape)
for bsz in (1024, 4096):
    q = np.concatenate([q1024] * (bsz // 1024))[:bsz]
    flat.search_device(q, top_k=k, rerank=True)
    t0 = time.time()
    outs = [flat.search_device(q, top_k=k, rerank=True) for _ in range(reps)]
    jax.device_get(outs)
    qps = reps * bsz / (time.time() - t0)
    print(f"b{bsz} pipelined: {qps:.0f} qps", flush=True)
