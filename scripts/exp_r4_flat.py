"""Flat codes-engine operating-point sweep (r4): selection dtype x rerank
depth at 1M x 768, plus the b4096-vs-b1024 inversion check.

Reuses the bench's cached corpus + truth (/tmp) so the sweep costs scan
time only. Run: python scripts/exp_r4_flat.py [n]
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu  # noqa: F401  (XLA cache config)
import jax
import numpy as np

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
d, nq, k = 768, 1024, 10

bench_cache = f"/tmp/cosdata_bench_{n}x{d}_{nq}_0.npz"
truth_cache = f"/tmp/cosdata_truth_{n}x{d}_{nq}_0.npz"
dat = np.load(bench_cache, mmap_mode="r")
x = np.ascontiguousarray(dat["x"])
q = np.ascontiguousarray(dat["q"])
true_ids = np.load(truth_cache)["true_ids"]
print("corpus loaded", flush=True)

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.utils.device import warmup_device

print(f"warmup {warmup_device():.1f}s", flush=True)
os.environ["COSDATA_FLAT_ENGINE"] = "codes"
rng_tuned = tune_dense_range(x[:1000])


def recall_of(true, got, k):
    hits = 0
    for i in range(len(true)):
        hits += len(set(map(int, true[i, :k])) & set(map(int, got[i, :k])))
    return hits / (len(true) * k)


flat = FlatIndex(dim=d, kind="u8", range_=rng_tuned, initial_capacity=n,
                 ship_dtype="auto", raw_dtype="f16")
t0 = time.time()
for s in range(0, n, 131072):
    flat.add(x[s : s + 131072])
jax.block_until_ready(flat.store._arrays.data)
print(f"build {time.time()-t0:.1f}s", flush=True)

for sel in ("f32",):
    os.environ["COSDATA_SCAN_SEL"] = sel
    for rf in (5,):
        got, _ = flat.search(q, top_k=k, rerank=True, rerank_factor=rf)
        rec = recall_of(true_ids, got, k)
        t0 = time.time()
        outs = [flat.search_device(q, top_k=k, rerank=True, rerank_factor=rf)
                for _ in range(5)]
        outs = jax.device_get(outs)
        qps = 5 * nq / (time.time() - t0)
        print(f"sel={sel} rf={rf}: recall@10={rec:.4f} qps={qps:.0f}",
              flush=True)

# b4096 inversion: dispatch-chain profile at the winning config
os.environ["COSDATA_SCAN_SEL"] = "f32"
qbig = np.tile(q, (4, 1))
jax.device_get(flat.search_device(qbig, top_k=k, rerank=True))  # compile
t0 = time.time()
outs = [flat.search_device(qbig, top_k=k, rerank=True) for _ in range(3)]
outs = jax.device_get(outs)
print(f"b4096: qps={3 * len(qbig) / (time.time() - t0):.0f}", flush=True)
t0 = time.time()
outs = [flat.search_device(q, top_k=k, rerank=True) for _ in range(5)]
outs = jax.device_get(outs)
print(f"b1024: qps={5 * nq / (time.time() - t0):.0f}", flush=True)
