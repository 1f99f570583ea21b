"""Dense-path TPU benchmark: flat fused scan + HNSW bulk build + fused search.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_dense.py [N]
"""

import sys
import time

import numpy as np

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, NQ, K = 768, 256, 10
rng = np.random.default_rng(0)
nc = max(N // 100, 16)
centers = rng.normal(size=(nc, D)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
noise = 0.5 / np.sqrt(D)
x = centers[rng.integers(0, nc, N)] + noise * rng.normal(size=(N, D)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
q = centers[rng.integers(0, nc, NQ)] + noise * rng.normal(size=(NQ, D)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
true = np.argsort(-(q @ x.T), axis=1)[:, :K]


def recall(got):
    return np.mean(
        [len(set(map(int, t)) & set(map(int, g))) / K for t, g in zip(true, got)]
    )


rt = tune_dense_range(x[:1000])
print("range:", rt, flush=True)

flat = FlatIndex(dim=D, kind="u8", range_=rt, initial_capacity=N)
t0 = time.time()
flat.add(x)
print(f"flat add: {time.time()-t0:.1f}s", flush=True)
got, _ = flat.search(q, top_k=K, rerank=True)
for _ in range(3):
    t0 = time.time()
    got, _ = flat.search(q, top_k=K, rerank=True)
    print(
        f"flat fused scan: {(time.time()-t0)*1000:.1f}ms -> "
        f"{NQ/(time.time()-t0):.0f} qps recall={recall(got):.4f}",
        flush=True,
    )

idx = HNSWIndex(dim=D, kind="u8", range_=rt, params=HNSWParams(), seed=3,
                initial_capacity=N)
t0 = time.time()
idx.add(x)
bt = time.time() - t0
print(f"hnsw BULK build: {bt:.1f}s = {N/bt:.0f} vps", flush=True)
for ef in [64, 128, 256]:
    got, _ = idx.search(q, top_k=K, ef=ef)
    t0 = time.time()
    got, _ = idx.search(q, top_k=K, ef=ef)
    print(
        f"hnsw fused ef={ef}: {(time.time()-t0)*1000:.1f}ms -> "
        f"{NQ/(time.time()-t0):.0f} qps recall={recall(got):.4f}",
        flush=True,
    )
