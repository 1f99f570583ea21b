"""One-process TPU measurement pass for the serving-side r5 asks:

- sparse b=1 / b=8 / b=64 / b=256 operating points (ask #7) after the
  right-sized dispatch fix
- BM25 b=64 / b=256
- hybrid through Collection.hybrid_search_batch (ask #5)

Batched into a single process because each process pays a 200-960 s
first-sync stall on the tunneled chip.

Usage: python scripts/exp_r5_serving.py [sparse_n] [bm25_n] [hybrid_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

sn = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
bn = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
hn = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
k = 10
SECTIONS = set(
    (os.environ.get("COSDATA_EXP_SECTIONS") or "sparse,bm25,hybrid").split(",")
)

# ---------------- sparse ----------------
from cosdata_tpu.indexes.inverted import InvertedIndex

if "sparse" not in SECTIONS:
    sn = 0
vocab, nnz_doc, nnz_q = 30_000, 64, 24
rng = np.random.default_rng(7)
dims_pool = (rng.pareto(1.2, size=max(sn, 1) * nnz_doc) * 50).astype(np.int64) % vocab
vals_pool = rng.gamma(2.0, 0.8, size=max(sn, 1) * nnz_doc).astype(np.float32)
inv = InvertedIndex(quantization=64, sample_threshold=256)
for i in range(min(256, sn)):
    lo = i * nnz_doc
    inv.add(i, dims_pool[lo : lo + nnz_doc], vals_pool[lo : lo + nnz_doc])
t0 = time.time()
for s0 in range(256, sn, 65536):
    e0 = min(s0 + 65536, sn)
    inv.add_batch(
        np.arange(s0, e0),
        dims_pool[s0 * nnz_doc : e0 * nnz_doc],
        vals_pool[s0 * nnz_doc : e0 * nnz_doc],
        np.full(e0 - s0, nnz_doc),
    )
inv.flush()
print(f"sparse ingest: {time.time()-t0:.1f}s ({sn} docs)", flush=True)
queries = []
for j in range(64 if sn else 0):
    dd = dims_pool[j * nnz_doc : (j + 1) * nnz_doc]
    vv = vals_pool[j * nnz_doc : (j + 1) * nnz_doc]
    pick = np.argsort(dd)[-nnz_q:]
    queries.append(list(zip(dd[pick].tolist(), vv[pick].tolist())))

for b, reps in (((1, 8), (8, 5), (64, 3), (256, 3)) if sn else ()):
    qs = (queries * ((b + 63) // 64))[:b]
    inv.search(qs, top_k=k)  # compile
    lats = []
    for _ in range(reps):
        t0 = time.time()
        inv.search(qs, top_k=k)
        lats.append(time.time() - t0)
    lat = float(np.median(lats))
    print(
        f"sparse b={b}: {lat*1000:.1f} ms/batch = {b/lat:.1f} qps",
        flush=True,
    )
del inv

# ---------------- BM25 ----------------
from cosdata_tpu.indexes.tf_idf import TFIDFIndex

if "bm25" not in SECTIONS:
    bn = 0
rng = np.random.default_rng(9)
vocab_words = [f"w{i}" for i in range(20_000)]
zipf = (rng.pareto(1.1, size=bn * 40).astype(np.int64)) % 20_000
tfi = TFIDFIndex(sample_threshold=256)
t0 = time.time()
for i in range(bn):
    words = zipf[i * 40 : (i + 1) * 40]
    tfi.add(i, " ".join(vocab_words[w] for w in words))
tfi.flush()
print(f"bm25 ingest: {time.time()-t0:.1f}s ({bn} docs)", flush=True)
bq = [] if not bn else [
    " ".join(vocab_words[w] for w in np.sort(zipf[j * 40 : (j + 1) * 40])[-6:])
    for j in range(64)
]
for b, reps in (((1, 8), (64, 3), (256, 3)) if bn else ()):
    qs = (bq * ((b + 63) // 64))[:b]
    tfi.search(qs, top_k=k)
    lats = []
    for _ in range(reps):
        t0 = time.time()
        tfi.search(qs, top_k=k)
        lats.append(time.time() - t0)
    lat = float(np.median(lats))
    print(f"bm25 b={b}: {lat*1000:.1f} ms/batch = {b/lat:.1f} qps", flush=True)
del tfi

# ---------------- hybrid through the collection ----------------
if "hybrid" not in SECTIONS:
    sys.exit(0)
import bench as _bench

bench_cache = f"/tmp/cosdata_bench_1000000x768_1024_0.npz"
if os.path.exists(bench_cache):
    z = np.load(bench_cache, mmap_mode="r")
    x = np.ascontiguousarray(z["x"][:hn])
    q1024 = np.ascontiguousarray(z["q"])
else:
    rng = np.random.default_rng(0)
    x = rng.normal(size=(hn, 768)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q1024 = x[:1024].copy()
from cosdata_tpu.core.collection import tune_dense_range

out = {}
_bench.run_hybrid_section(out, x, q1024, hn, 768, k,
                          tune_dense_range(x[:1000]), jax)
print("hybrid:", out, flush=True)
