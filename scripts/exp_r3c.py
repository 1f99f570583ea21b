"""Round-3 experiment batch 3 (on-chip): graph quality post reverse-edge
fix + bitmask visited set.

  uni    — uniform 100k (adversarial geometry) build + ef ladder
  tune   — NN_SAMPLE/rounds table re-verify at 1M clustered (VERDICT #10)
  beam2  — 1M clustered beam ladder with the bitmask visited set

EXP_SECTIONS=uni,beam2 python scripts/exp_r3c.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = os.environ.get("EXP_SECTIONS", "uni,beam2").split(",")
OUT = {}


def log(msg):
    print(f"[exp3 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from bench import gen_clustered, brute_topk, recall_of

    d, k = 768, 10

    import jax

    from cosdata_tpu.utils.device import warmup_device

    OUT["warmup_s"] = round(warmup_device(), 1)
    log("device warm")

    from cosdata_tpu.core.collection import tune_dense_range
    from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

    def timeit(fn, reps=3):
        fn()
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.time() - t0) / reps

    if "uni" in SECTIONS:
        sec = {}
        un = 100_000
        rngu = np.random.default_rng(11)
        ux = rngu.uniform(-1, 1, size=(un, d)).astype(np.float32)
        ux /= np.linalg.norm(ux, axis=1, keepdims=True)
        uq = rngu.uniform(-1, 1, size=(256, d)).astype(np.float32)
        uq /= np.linalg.norm(uq, axis=1, keepdims=True)
        u_true = brute_topk(uq, ux, k)
        u_rng = tune_dense_range(ux[:1000])
        uidx = HNSWIndex(dim=d, kind="u8", range_=u_rng, params=HNSWParams(),
                         seed=5, initial_capacity=un, ship_dtype="auto")
        t0 = time.time()
        uidx.add(ux)
        sec["build_s"] = round(time.time() - t0, 1)
        log(f"uniform 100k built {sec['build_s']}s")
        for ef in (128, 256, 512, 1024):
            ugot, _ = uidx.search(uq, top_k=k, ef=ef)
            urec = recall_of(u_true, ugot, k)
            dt = timeit(lambda: uidx.search_device(uq, top_k=k, ef=ef))
            sec[f"ef{ef}"] = {"recall10": round(urec, 4),
                              "qps": round(len(uq) / dt, 1)}
            log(f"uniform ef{ef}: rec {urec:.4f} qps {len(uq)/dt:.0f}")
        OUT["uni"] = sec

    if "tune" in SECTIONS or "beam2" in SECTIONS:
        n, nq = 1_000_000, 1024
        x, q = gen_clustered(n, d, nq)
        tr_path = f"/tmp/cosdata_truth_{n}x{d}_{nq}_0.npz"
        true_ids = (np.load(tr_path)["true_ids"]
                    if os.path.exists(tr_path) else brute_topk(q, x, k))
        rng_tuned = tune_dense_range(x[:1000])
        log("clustered corpus ready")

    if "tune" in SECTIONS:
        sec = {}
        for sample, rounds in ((8, 1), (16, 1), (8, 2)):
            idx = HNSWIndex(dim=d, kind="u8", range_=rng_tuned,
                            params=HNSWParams(), seed=7,
                            initial_capacity=n, ship_dtype="auto")
            idx.NN_SAMPLE, idx.NN_DESCENT_ROUNDS = sample, rounds
            t0 = time.time()
            idx.add(x)
            bs = round(time.time() - t0, 1)
            row = {"build_s": bs, **(idx.last_build_stats or {})}
            for ef in (64, 128, 256):
                got, _ = idx.search(q[:256], top_k=k, ef=ef)
                row[f"recall_ef{ef}"] = round(
                    recall_of(true_ids[:256], got, k), 4)
            sec[f"s{sample}_r{rounds}"] = row
            log(f"tune s{sample} r{rounds}: {row}")
            del idx
        OUT["tune"] = sec

    if "beam2" in SECTIONS:
        sec = {}
        idx = HNSWIndex(dim=d, kind="u8", range_=rng_tuned,
                        params=HNSWParams(), seed=7,
                        initial_capacity=n, ship_dtype="auto")
        t0 = time.time()
        idx.add(x)
        sec["build_s"] = round(time.time() - t0, 1)
        sec["build_split"] = idx.last_build_stats
        log(f"1M built {sec['build_s']}s ({idx.last_build_stats})")
        for ef in (128, 256, 512):
            got, _ = idx.search(q, top_k=k, ef=ef)
            rec = recall_of(true_ids, got, k)
            dt = timeit(lambda: idx.search_device(q, top_k=k, ef=ef))
            sec[f"ef{ef}"] = {"recall10": round(rec, 4),
                              "qps": round(nq / dt, 1)}
            log(f"beam2 ef{ef}: rec {rec:.4f} qps {nq/dt:.0f}")
        # small-batch latency (b=64): the crossover vs flat depends on it
        q64 = q[:64]
        idx.search_device(q64, top_k=k, ef=128)
        dt = timeit(lambda: idx.search_device(q64, top_k=k, ef=128))
        sec["b64_ef128_latency_ms"] = round(dt * 1e3, 1)
        OUT["beam2"] = sec

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
