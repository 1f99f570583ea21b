"""Headline benchmark (driver contract: prints ONE JSON line).

Measures the BASELINE.json north-star shape at a per-round-friendly size:
batched HNSW search QPS over a u8-quantized index (768-d, cosine) with
recall@10 vs exact brute force, plus build throughput. vs_baseline is the
ratio to single-thread CPU (numpy) brute-force QPS measured on this host —
the honest stand-in while the Rust reference can't be built in this image
(no cargo); BASELINE.md records that the reference publishes no numbers.
"""

import json
import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    d, nq, k = 768, 256, 10
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.normal(size=(nq, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    # CPU brute-force baseline (single numpy matmul pipeline)
    t0 = time.time()
    scores = q[:64] @ x.T
    np.argpartition(-scores, k, axis=1)
    cpu_qps = 64 / (time.time() - t0)
    true_scores = q @ x.T
    true_ids = np.argpartition(-true_scores, k, axis=1)[:, :k]

    from cosdata_tpu.core.collection import tune_dense_range
    from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

    rng_tuned = tune_dense_range(x[:1000])
    idx = HNSWIndex(
        dim=d, kind="u8", range_=rng_tuned, params=HNSWParams(),
        seed=3, initial_capacity=n,
    )
    t0 = time.time()
    idx.add(x)
    build_s = time.time() - t0
    # steady-state build rate: re-time the last-wave path on fresh data
    # (same shapes -> no compile)
    extra = rng.normal(size=(idx.params.wave_size, d)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    # NOTE: appending would grow capacity; measure via a second same-size index
    idx2 = HNSWIndex(
        dim=d, kind="u8", range_=rng_tuned, params=HNSWParams(),
        seed=4, initial_capacity=n,
    )
    t0 = time.time()
    idx2.add(x[: 4 * idx.params.wave_size])
    build_vps = 4 * idx.params.wave_size / (time.time() - t0)

    got, _ = idx.search(q, top_k=k)  # compile
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        got, _ = idx.search(q, top_k=k)
    qps = reps * nq / (time.time() - t0)

    hits = sum(
        len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true_ids, got)
    )
    recall = hits / (nq * k)

    print(
        json.dumps(
            {
                "metric": f"hnsw_u8_qps_at_recall10_{n//1000}k_768d",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / cpu_qps, 3),
                "recall10": round(recall, 4),
                "build_vps": round(build_vps, 1),
                "build_total_s": round(build_s, 1),
                "cpu_bruteforce_qps": round(cpu_qps, 1),
                "n": n,
                "d": d,
            }
        )
    )


if __name__ == "__main__":
    main()
