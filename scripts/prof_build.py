"""Profile the 1M x 768 HNSW build on the real chip (COSDATA_BUILD_LOG=1)."""
import os, sys, time
os.environ.setdefault("COSDATA_BUILD_LOG", "1")
import numpy as np
sys.path.insert(0, "/root/repo")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
z = np.load(f"/tmp/cosdata_bench_{1_000_000}x768_1024_0.npz", mmap_mode="r")
x = np.ascontiguousarray(z["x"][:n]); q = np.ascontiguousarray(z["q"])

from cosdata_tpu.utils.device import warmup_device
print(f"warmup {warmup_device():.1f}s", file=sys.stderr, flush=True)

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
rng_tuned = tune_dense_range(x[:1000])
idx = HNSWIndex(dim=768, kind="u8", range_=rng_tuned, params=HNSWParams(),
                seed=3, initial_capacity=n, keep_raw="host", ship_dtype="auto")
t0 = time.time()
idx.add(x)
build_s = time.time() - t0
print(f"build {build_s:.1f}s = {n/build_s:.0f} vps, split={idx.last_build_stats}", flush=True)

# quick recall check at ef=128
k = 10
true = np.load(f"/tmp/cosdata_truth_{1_000_000}x768_1024_0.npz")["true_ids"] if n == 1_000_000 else None
got, _ = idx.search(q, top_k=k, ef=128)
if true is not None:
    hits = sum(len(set(map(int,t[:k])) & set(map(int,g[:k]))) for t,g in zip(true, got))
    print(f"recall@10 ef128 = {hits/(len(true)*k):.4f}", flush=True)
t0 = time.time()
for _ in range(3):
    idx.search(q, top_k=k, ef=128)
print(f"qps ef128 = {3*len(q)/(time.time()-t0):.0f}", flush=True)
