"""End-to-end drive of the public API on the real TPU backend.

Builds a u8-quantized HNSW index over 20k x 768-d unit vectors, searches a
batch of queries, and reports recall@10 vs the FlatIndex exact oracle plus
build/search throughput. Also probes edge cases (empty index, delete,
single-vector query).
"""

import time

import numpy as np

import jax

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

N, D, NQ, K = 20_000, 768, 256, 10
rng = np.random.default_rng(0)
x = rng.normal(size=(N, D)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
q = rng.normal(size=(NQ, D)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)

print("== exact oracle (FlatIndex f32) ==", flush=True)
flat = FlatIndex(dim=D, kind="f32", initial_capacity=N)
t0 = time.time()
flat.add(x)
print(f"flat add: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
true_ids, _ = flat.search(q, top_k=K)
print(f"flat search (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
true_ids, _ = flat.search(q, top_k=K)
print(f"flat search (cached): {time.time()-t0:.3f}s -> {NQ/(time.time()-t0):.0f} qps exact", flush=True)

print("== HNSW u8 ==", flush=True)
from cosdata_tpu.core.collection import tune_dense_range

rng_tuned = tune_dense_range(x[:1000])
print("tuned u8 range:", rng_tuned, flush=True)
idx = HNSWIndex(
    dim=D, kind="u8", params=HNSWParams(), seed=3, initial_capacity=N,
    range_=rng_tuned,
)
t0 = time.time()
idx.add(x)
dt = time.time() - t0
print(f"hnsw build: {dt:.1f}s -> {N/dt:.0f} vec/s (incl compile)", flush=True)
t0 = time.time()
got_ids, got_scores = idx.search(q, top_k=K)
print(f"hnsw search (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
got_ids, got_scores = idx.search(q, top_k=K)
dt = time.time() - t0
print(f"hnsw search (cached): {dt:.3f}s -> {NQ/dt:.0f} qps", flush=True)

hits = sum(
    len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true_ids, got_ids)
)
recall = hits / (NQ * K)
print(f"recall@{K} vs brute force: {recall:.4f}", flush=True)

# high-recall operating point: uniformly random 768-d unit vectors are the
# adversarial geometry for every graph-ANN method (near-equidistant points);
# ef=512 is the documented setting for >=0.95 recall on such data. The
# recall gate below uses this point; the default-ef number above tracks the
# reference's default operating point (config.toml ef_search).
got_ids2, _ = idx.search(q, top_k=K, ef=512)
t0 = time.time()
got_ids2, _ = idx.search(q, top_k=K, ef=512)
dt = time.time() - t0
hits2 = sum(
    len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true_ids, got_ids2)
)
recall = hits2 / (NQ * K)
print(
    f"recall@{K} at ef=512: {recall:.4f} ({dt:.3f}s -> {NQ/dt:.0f} qps)",
    flush=True,
)

print("== probes ==", flush=True)
empty = HNSWIndex(dim=D, kind="u8", initial_capacity=1024)
ids, _ = empty.search(q[:2], top_k=5)
print("empty index search ->", ids.tolist(), flush=True)

ids1, s1 = idx.search(x[42], top_k=1)  # 1-D single query
print("single self query -> id", ids1[0, 0], "score", f"{s1[0,0]:.4f}", flush=True)

idx.delete(int(ids1[0, 0]))
ids2, _ = idx.search(x[42], top_k=3)
print("after delete, self id present:", int(ids1[0, 0]) in ids2[0].tolist(), flush=True)

assert recall >= 0.9, f"RECALL TOO LOW: {recall}"
print("VERIFY_OK", flush=True)
