"""Device-side decomposition of the flat codes engine at b1024/b4096
(r5): with queries PRE-RESIDENT, flat_device_qps measured 14.5k (b1024)
vs 10.0k (b4096) — per-query cost RISES with batch even with zero wire.
Times each program separately: the f16q scan (quantize in-program), the
codes-input scan, and the standalone sorted rerank.

Usage: python scripts/exp_r5_flatdev.py [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
d, k = 768, 10
z = np.load(f"/tmp/cosdata_bench_{n}x{d}_1024_0.npz", mmap_mode="r")
x = np.ascontiguousarray(z["x"])
q1024 = np.ascontiguousarray(z["q"])
os.environ["COSDATA_FLAT_ENGINE"] = "codes"
flat = FlatIndex(dim=d, kind="u8", range_=tune_dense_range(x[:1000]),
                 initial_capacity=n, ship_dtype="auto", raw_dtype="f16")
for s in range(0, n, 131072):
    flat.add(x[s : s + 131072])
jax.block_until_ready(flat.store._arrays.data)
print("built", flush=True)

from cosdata_tpu.ops.flat_scan import (
    exact_rerank_sorted,
    fused_flat_search_codes,
    fused_flat_search_codes_f16q,
)

st = flat.store
lo, hi = st.range
group, kf = 32, 5 * k
k_bins = max(32, -(-kf // group) * 2)
mask = flat._mask()


def timed(label, fn, reps=5):
    fn()
    jax.block_until_ready(jnp.zeros(()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.device_get(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return dt


for bsz in (1024, 4096):
    qn = np.concatenate([q1024] * (bsz // 1024))[:bsz]
    q_f16 = st._pad_dims(qn, ship_f16=True)
    qc = st.ship_query_codes(qn)
    jax.block_until_ready((q_f16, qc.data))

    select = os.environ.get("COSDATA_SCAN_SELECT", "approx")

    def scan_f16q():
        return fused_flat_search_codes_f16q(
            st.metric, st.dim, st.dim_pad, k_bins, group, kf, kf,
            flat.SCAN_CHUNK, q_f16, lo, hi, st._arrays, mask,
            select=select,
        )

    def scan_codes():
        return fused_flat_search_codes(
            st.metric, st.dim, st.dim_pad, k_bins, group, kf, kf,
            flat.SCAN_CHUNK, False, qc, st._arrays, qc.data, qc.mags,
            mask,
        )

    ids, vals = jax.block_until_ready(scan_f16q())

    def rerank():
        return exact_rerank_sorted(
            st.metric, st.dim, st.dim_pad, k, q_f16, st._raw, ids, vals
        )

    print(f"--- b{bsz} ---", flush=True)
    timed(f"b{bsz} scan f16q", scan_f16q)
    timed(f"b{bsz} scan codes-input", scan_codes)
    timed(f"b{bsz} rerank sorted", rerank)

# recall through the served path (flat.search) for whichever engine the
# env selected — guards bins-mode recall claims
truth = np.load(f"/tmp/cosdata_truth_{n}x{d}_1024_0.npz")["true_ids"]
got, _ = flat.search(q1024, top_k=k, rerank=True)
hits = sum(
    len(set(map(int, truth[i, :k])) & set(map(int, got[i, :k])))
    for i in range(len(truth))
)
print(f"recall@10 via flat.search: {hits/(len(truth)*k):.4f}", flush=True)
