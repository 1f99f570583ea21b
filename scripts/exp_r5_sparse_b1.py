"""Profile the sparse b=1 / b=64 light-load path (VERDICT r5 ask #7).

r4 captured sparse b1 latency 574.5 ms and b64 110 QPS; the batch-256
engine is fine (403 qps). This decomposes a small dispatch into
host-allocator time (_segments_batch at the batch-elevated budget),
query translation, and the device call, on the bench corpus shape.

Runs on CPU (host costs are identical; device kernel cost differs but is
reported separately). Usage: python scripts/exp_r5_sparse_b1.py [n_docs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("JAX_PLATFORMS", "") != "tpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np

from cosdata_tpu.indexes import inverted as inv_mod
from cosdata_tpu.indexes.inverted import InvertedIndex

sn = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
vocab, nnz_doc, nnz_q = 30_000, 64, 24
rng = np.random.default_rng(7)
dims_pool = (rng.pareto(1.2, size=sn * nnz_doc) * 50).astype(np.int64) % vocab
vals_pool = rng.gamma(2.0, 0.8, size=sn * nnz_doc).astype(np.float32)
inv = InvertedIndex(quantization=64, sample_threshold=256)
for i in range(256):
    lo = i * nnz_doc
    inv.add(i, dims_pool[lo : lo + nnz_doc], vals_pool[lo : lo + nnz_doc])
t0 = time.time()
bs = 65536
for s0 in range(256, sn, bs):
    e0 = min(s0 + bs, sn)
    inv.add_batch(
        np.arange(s0, e0),
        dims_pool[s0 * nnz_doc : e0 * nnz_doc],
        vals_pool[s0 * nnz_doc : e0 * nnz_doc],
        np.full(e0 - s0, nnz_doc),
    )
inv.flush()
print(f"ingest: {time.time()-t0:.1f}s ({sn} docs)", flush=True)

queries = []
for j in range(64):
    dd = dims_pool[j * nnz_doc : (j + 1) * nnz_doc]
    vv = vals_pool[j * nnz_doc : (j + 1) * nnz_doc]
    pick = np.argsort(dd)[-nnz_q:]
    queries.append(list(zip(dd[pick].tolist(), vv[pick].tolist())))

inv._build_csr()
k = 10

for b in (1, 8, 64):
    qs = queries[:b]
    budget = inv._effective_budget(b)
    # warm all compiled shapes
    inv.search(qs, top_k=k)
    t0 = time.time()
    s_, l_, m_ = inv._segments_batch(qs, budget, exclude_head=True)
    seg_s = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        inv.search(qs, top_k=k)
    total = (time.time() - t0) / 3
    print(
        f"b={b}: budget={budget} maxd={s_.shape[1]} total={total*1000:.1f}ms "
        f"segments={seg_s*1000:.1f}ms rest={(total-seg_s)*1000:.1f}ms",
        flush=True,
    )

# head-engine internals timing via profiler hooks
import cProfile
import pstats

pr = cProfile.Profile()
pr.enable()
for _ in range(3):
    inv.search(queries[:1], top_k=k)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative")
st.print_stats(18)
