import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
d = 768

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes import hnsw as H
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
from cosdata_tpu.ops import hnsw_kernels as HK

# monkeypatch timers around stages
_orig_rp_order = HNSWIndex._rp_order
def timed_rp_order(self, members, leaf, seed):
    t0 = time.time(); out = _orig_rp_order(self, members, leaf, seed)
    print(f"  rp_order n={len(members)} leaf={leaf}: {time.time()-t0:.2f}s", flush=True)
    return out
HNSWIndex._rp_order = timed_rp_order

_orig_leaf_knn = HK.leaf_knn
def timed_leaf_knn(*a, **k):
    t0 = time.time(); out = HK.leaf_knn(*a, **k) if False else _orig_leaf_knn(*a, **k)
    jax.block_until_ready(out)
    print(f"  leaf_knn order={a[5].shape} chunk={a[4]}: {time.time()-t0:.2f}s", flush=True)
    return out
HK.leaf_knn = timed_leaf_knn

_orig_prune = H._prune_candidates
def timed_prune(*a, **k):
    t0 = time.time(); out = _orig_prune(*a, **k)
    jax.block_until_ready(out)
    print(f"  prune n={a[6].shape if hasattr(a[6],chr(39)+"shape"+chr(39)) else len(a)}: {time.time()-t0:.2f}s", flush=True)
    return out
H._prune_candidates = timed_prune

_orig_rev = HK.apply_reverse_edges
def timed_rev(*a, **k):
    t0 = time.time(); out = _orig_rev(*a, **k)
    jax.block_until_ready(out)
    print(f"  reverse_edges mem={a[2].shape}: {time.time()-t0:.2f}s", flush=True)
    return out
HK.apply_reverse_edges = timed_rev

_orig_nnd = HK.nn_descent_round
def timed_nnd(*a, **k):
    t0 = time.time(); out = _orig_nnd(*a, **k)
    jax.block_until_ready(out)
    print(f"  nn_descent mem={len(a)}: {time.time()-t0:.2f}s", flush=True)
    return out
HK.nn_descent_round = timed_nnd

_orig_bulk_level_rp = HNSWIndex._bulk_level_rp
def timed_blrp(self, members, m_l, level):
    t0 = time.time()
    out = _orig_bulk_level_rp(self, members, m_l, level)
    print(f" bulk_level_rp level={level} n={len(members)}: {time.time()-t0:.2f}s", flush=True)
    return out
HNSWIndex._bulk_level_rp = timed_blrp

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
print(f"TOTAL bulk_build {n}: {bt:.1f}s = {n/bt:.0f} vps", flush=True)

nq, k = 256, 10
q = centers[rng.integers(0, nc, nq)] + noise * rng.normal(size=(nq, d)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
true = np.argpartition(-(q @ x.T), k, axis=1)[:, :k]
got, _ = idx.search(q, top_k=k, ef=128)
rec = sum(len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true, got)) / (nq * k)
print(f"recall@10 ef=128: {rec:.4f}", flush=True)
