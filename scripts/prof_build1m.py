"""Time the full 1M HNSW build (warm XLA cache) — the VERDICT #3 metric."""
import faulthandler
import os, sys, time

faulthandler.dump_traceback_later(180, repeat=True, file=sys.stderr)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu
import numpy as np, jax
from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

n, d = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000, 768
cache = f"/tmp/xc_{n}_{d}.npy"
bench_cache = f"/tmp/cosdata_bench_{n}x{d}_1024_0.npz"
if os.path.exists(bench_cache):
    # reuse the bench's corpus: same shape, skips ~15 min of 1-core gen
    x = np.ascontiguousarray(np.load(bench_cache, mmap_mode="r")["x"])
elif os.path.exists(cache):
    x = np.load(cache, mmap_mode="r")
    x = np.ascontiguousarray(x)
else:
    rng = np.random.default_rng(0)
    nc = max(n // 100, 1)
    centers = rng.normal(size=(nc, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise = 0.5 / np.sqrt(d)
    x = np.empty((n, d), np.float32)
    for s in range(0, n, 131072):
        e = min(s + 131072, n)
        x[s:e] = centers[rng.integers(0, nc, e - s)] + noise * rng.normal(
            size=(e - s, d)
        ).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    np.save(cache, x)
r = tune_dense_range(x[:1000])
print("data ready", flush=True)

# A/B knobs for build-quality/throughput trades (class attrs, compile-keyed)
if os.environ.get("COSDATA_RT"):
    HNSWIndex.LEAF_RECALL_TARGET = float(os.environ["COSDATA_RT"])
if os.environ.get("COSDATA_NNSAMPLE"):
    HNSWIndex.NN_SAMPLE = int(os.environ["COSDATA_NNSAMPLE"])
if os.environ.get("COSDATA_ROUNDS"):
    HNSWIndex.NN_DESCENT_ROUNDS = int(os.environ["COSDATA_ROUNDS"])
if os.environ.get("COSDATA_TREES"):
    HNSWIndex.RP_TREES = int(os.environ["COSDATA_TREES"])
print(f"rt={HNSWIndex.LEAF_RECALL_TARGET} sample={HNSWIndex.NN_SAMPLE} "
      f"rounds={HNSWIndex.NN_DESCENT_ROUNDS} trees={HNSWIndex.RP_TREES}",
      flush=True)

idx = HNSWIndex(dim=d, kind="u8", range_=r, params=HNSWParams(), seed=3,
                initial_capacity=n, keep_raw="host", ship_dtype="auto")
t0 = time.time()
idx.add(x)
dt = time.time() - t0
print(f"build {n} in {dt:.1f}s = {n/dt:.0f} vec/s", flush=True)

# recall check: 128 queries; exact truth via numpy, cached across A/B runs
nq, k = 128, 10
rng = np.random.default_rng(1)
q = x[rng.integers(0, n, nq)] + 0.02 * rng.normal(size=(nq, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
tcache = f"/tmp/xc_true_{n}_{d}.npy"
if os.path.exists(tcache):
    true = np.load(tcache)
else:
    s = q @ x.T
    true = np.argpartition(-s, k, axis=1)[:, :k]
    np.save(tcache, true)
for ef in (64, 128, 256):
    got, _ = idx.search(q, top_k=k, ef=ef)
    hits = np.mean([len(set(map(int, got[i])) & set(map(int, true[i]))) / k
                    for i in range(nq)])
    print(f"recall@10 ef={ef}: {hits:.4f}", flush=True)
