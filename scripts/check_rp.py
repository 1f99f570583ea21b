import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("FORCE_CPU"):
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
    import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
d = int(sys.argv[2]) if len(sys.argv) > 2 else 128
HNSWIndex.RP_THRESHOLD = int(os.environ.get("RP_THRESHOLD", HNSWIndex.RP_THRESHOLD))
HNSWIndex.RP_LEAF = int(os.environ.get("RP_LEAF", HNSWIndex.RP_LEAF))
rng = np.random.default_rng(0)
nc = max(n // 100, 16)
centers = rng.normal(size=(nc, d)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
noise = 0.5 / np.sqrt(d)
x = centers[rng.integers(0, nc, n)] + noise * rng.normal(size=(n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
r = tune_dense_range(x[:1000])
idx = HNSWIndex(dim=d, kind="u8", range_=r, params=HNSWParams(), seed=3, initial_capacity=n)
t0 = time.time()
idx.add(x)
bt = time.time() - t0
print(f"build n={n} d={d}: {bt:.1f}s = {n/bt:.0f} vps", flush=True)
nq, k = 256, 10
q = centers[rng.integers(0, nc, nq)] + noise * rng.normal(size=(nq, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
true = np.argpartition(-(q @ x.T), k, axis=1)[:, :k]
for ef in (128, 256):
    got, _ = idx.search(q, top_k=k, ef=ef)
    rec = sum(len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true, got)) / (nq * k)
    print(f"recall@10 ef={ef}: {rec:.4f}", flush=True)
