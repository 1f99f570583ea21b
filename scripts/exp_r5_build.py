"""1M HNSW build decomposition + build-to-build graph variance (r5 asks
#2/#3): two full builds (different seeds) with COSDATA_BUILD_LOG per-stage
timing, each followed by an ef128/ef256 recall+qps ladder — quantifies
what r4 could not reconcile (A/B claimed 0.998@ef128, captured bench said
0.9941; nobody separated build variance from contention variance).

Usage: python scripts/exp_r5_build.py [n] [builds]
"""

import os
import sys
import time

os.environ.setdefault("COSDATA_BUILD_LOG", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
n_builds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
d, k = 768, 10

bench_cache = f"/tmp/cosdata_bench_{n}x{d}_1024_0.npz"
z = np.load(bench_cache, mmap_mode="r")
x = np.ascontiguousarray(z["x"])
q = np.ascontiguousarray(z["q"])
truth_cache = f"/tmp/cosdata_truth_{n}x{d}_1024_0.npz"
true_ids = np.load(truth_cache)["true_ids"]
rng_tuned = tune_dense_range(x[:1000])
print("data ready", flush=True)


def recall_of(true, got, k):
    hits = sum(
        len(set(map(int, true[i, :k])) & set(map(int, got[i, :k])))
        for i in range(len(true))
    )
    return hits / (len(true) * k)


for b_i in range(n_builds):
    idx = HNSWIndex(
        dim=d, kind="u8", range_=rng_tuned, params=HNSWParams(),
        seed=3 + 10 * b_i, initial_capacity=n, keep_raw="host",
        ship_dtype="auto",
    )
    t0 = time.time()
    idx.add(x[:n])
    total = time.time() - t0
    st = idx.last_build_stats or {}
    print(
        f"build[{b_i}]: {total:.1f}s = ingest {st.get('ingest_s')}s "
        f"+ graph {st.get('graph_s')}s -> {n/total:.0f} vps",
        flush=True,
    )
    for ef in (128, 256):
        got, _ = idx.search(q, top_k=k, ef=ef)
        rec = recall_of(true_ids, got, k)
        laps = []
        for _ in range(5):
            t1 = time.time()
            idx.search(q, top_k=k, ef=ef)
            laps.append(len(q) / (time.time() - t1))
        print(
            f"build[{b_i}] ef{ef}: recall10={rec:.4f} "
            f"qps median={np.median(laps):.1f} "
            f"min={min(laps):.1f} max={max(laps):.1f}",
            flush=True,
        )
    del idx
