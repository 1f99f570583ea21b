"""Round-3 experiment batch 2 (on-chip).

  flat2   — codes engine (jnp + pallas) QPS/recall, b=1024/4096, group 32/64
  prims   — build-primitive timings: 64M-update scatter-max, 64M sort,
            reverse-edges body, NN-descent body, upper_level_exact (warm)
  sparse2 — gather-rescore QPS/recall across budgets
  bm252   — same for BM25

EXP_SECTIONS=flat2,prims,sparse2,bm252 python scripts/exp_r3b.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = os.environ.get("EXP_SECTIONS", "flat2,prims,sparse2,bm252").split(",")
OUT = {}


def log(msg):
    print(f"[exp2 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from bench import gen_clustered, brute_topk, recall_of

    n, d, nq, k = 1_000_000, 768, 1024, 10
    x, q = gen_clustered(n, d, nq)
    log("corpus ready")
    true_ids = np.load(f"/tmp/cosdata_truth_{n}x{d}_{nq}_0.npz")["true_ids"] \
        if os.path.exists(f"/tmp/cosdata_truth_{n}x{d}_{nq}_0.npz") else None

    import jax
    import jax.numpy as jnp

    from cosdata_tpu.utils.device import warmup_device

    OUT["warmup_s"] = round(warmup_device(), 1)
    log("device warm")

    from cosdata_tpu.core.collection import tune_dense_range

    rng_tuned = tune_dense_range(x[:1000])

    def timeit(fn, reps=4):
        fn()
        t0 = time.time()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.time() - t0) / reps

    if "flat2" in SECTIONS:
        from cosdata_tpu.indexes.flat import FlatIndex
        from cosdata_tpu.ops.flat_scan import fused_flat_search_codes

        sec = {}
        flat = FlatIndex(dim=d, kind="u8", range_=rng_tuned,
                         initial_capacity=n, ship_dtype="auto")
        t0 = time.time()
        for s in range(0, n, 131072):
            flat.add(x[s : s + 131072])
        jax.block_until_ready(flat.store._arrays.data)
        sec["build_s"] = round(time.time() - t0, 1)
        log(f"store built {sec['build_s']}s")
        store = flat.store
        valid = store.valid_mask()
        if true_ids is None:
            true_ids = brute_topk(q[:64], x, k)
            tr = true_ids
        else:
            tr = true_ids[:64]

        for group, k_bins in ((32, 64), (64, 64), (32, 128)):
            qc = store.ship_query_codes(q)
            ids, _ = jax.device_get(fused_flat_search_codes(
                "cosine", d, store.dim_pad, k_bins, group, 50, k, 1 << 16,
                True, qc, store._arrays, store._raw, valid))
            rec = recall_of(tr, ids[:64], k)
            dt = timeit(lambda: fused_flat_search_codes(
                "cosine", d, store.dim_pad, k_bins, group, 50, k, 1 << 16,
                True, store.ship_query_codes(q), store._arrays, store._raw,
                valid))
            sec[f"qps_g{group}_kb{k_bins}"] = round(nq / dt, 1)
            sec[f"recall_g{group}_kb{k_bins}"] = round(rec, 4)
            log(f"codes g{group} kb{k_bins}: {nq/dt:.0f} qps rec {rec:.4f}")
        # big batch
        qbig = np.tile(q, (4, 1))
        dt = timeit(lambda: fused_flat_search_codes(
            "cosine", d, store.dim_pad, 64, 32, 50, k, 1 << 16, True,
            store.ship_query_codes(qbig), store._arrays, store._raw, valid),
            reps=3)
        sec["qps_b4096_g32"] = round(4 * nq / dt, 1)
        log(f"codes b4096: {4*nq/dt:.0f} qps")
        # serving-path engine (FlatIndex.search_device with codes engine)
        os.environ["COSDATA_FLAT_ENGINE"] = "codes"
        got, _ = flat.search(q, top_k=k, rerank=True)
        sec["serving_recall"] = round(recall_of(true_ids, got, k), 4) \
            if true_ids is not None and len(true_ids) == nq else None
        dt = timeit(lambda: flat.search_device(q, top_k=k, rerank=True))
        sec["serving_qps_b1024"] = round(nq / dt, 1)
        log(f"serving codes: {nq/dt:.0f} qps rec {sec['serving_recall']}")
        del os.environ["COSDATA_FLAT_ENGINE"]
        OUT["flat2"] = sec

    if "prims" in SECTIONS:
        sec = {}
        N, m = 1_000_000, 64
        rng = np.random.default_rng(0)
        tgt = jnp.asarray(rng.integers(0, N, size=N * m, dtype=np.int32))
        src = jnp.asarray(
            np.repeat(np.arange(N, dtype=np.int32), m)
        )
        dvals = jnp.asarray(rng.random(N * m).astype(np.float32))

        @jax.jit
        def scatter_max(tgt, src, dvals):
            col = src % m
            acc = jnp.full((N, m), -3e38, jnp.float32)
            return acc.at[tgt, col].max(dvals)

        sec["scatter_max_64M_s"] = round(
            timeit(lambda: scatter_max(tgt, src, dvals), 2), 2)
        log(f"scatter_max 64M: {sec['scatter_max_64M_s']}s")

        @jax.jit
        def sort64(tgt, src):
            return jax.lax.sort_key_val(tgt, src)

        t0 = time.time()
        sort64(tgt, src)[0].block_until_ready()
        sec["sort_64M_compile_s"] = round(time.time() - t0, 1)
        sec["sort_64M_s"] = round(timeit(lambda: sort64(tgt, src), 2), 2)
        log(f"sort 64M: {sec['sort_64M_s']}s (compile {sec['sort_64M_compile_s']}s)")

        from cosdata_tpu.ops import hnsw_kernels as HK
        from cosdata_tpu.ops.storage import VectorStore

        vs = VectorStore(dim=d, kind="u8", range=rng_tuned,
                         initial_capacity=N, keep_raw=False, ship_dtype="u8")
        for s in range(0, N, 262144):
            vs.add(x[s : s + 262144])
        log("prim store built")
        adj = jnp.asarray(rng.integers(0, N, size=(vs.capacity, m), dtype=np.int32))
        dist = jnp.asarray(rng.random((vs.capacity, m)).astype(np.float32))
        mem = jnp.asarray(np.arange(vs.capacity, dtype=np.int32))
        fwd = adj[:N] if N == vs.capacity else adj
        fwd_d = dist

        rev = jax.jit(lambda a, dd, mm, f, fd: HK._reverse_edges_body(
            a, dd, mm, f, fd, m, m))
        sec["reverse_edges_s"] = round(
            timeit(lambda: rev(adj, dist, mem, fwd, fwd_d), 2), 2)
        log(f"reverse_edges: {sec['reverse_edges_s']}s")

        nnd = jax.jit(lambda mm, a, dd, st: HK._nn_descent_body(
            "cosine", "u8", vs.dim_pad, m, 8, 256, mm, a, dd, st))
        sec["nn_descent_s"] = round(
            timeit(lambda: nnd(mem, adj, dist, vs._arrays), 2), 2)
        log(f"nn_descent: {sec['nn_descent_s']}s")

        # upper-level exact at the 12288 bucket (L2 of a 1M build), warm
        mp = 12288
        mem_u = jnp.asarray(np.arange(mp, dtype=np.int32))
        slots = jnp.asarray(np.arange(mp, dtype=np.int32))
        up_slot = jnp.asarray(
            np.pad(np.arange(mp, dtype=np.int32),
                   (0, vs.capacity - mp), constant_values=-1))
        adj_l = jnp.full((mp, 32), -1, jnp.int32)
        dist_l = jnp.full((mp, 32), -3e38, jnp.float32)
        ue = lambda: HK.upper_level_exact(
            "cosine", "u8", vs.dim_pad, 32, True, mem_u, slots, up_slot,
            adj_l, dist_l, vs._arrays)
        t0 = time.time()
        jax.block_until_ready(ue())
        sec["upper12288_first_s"] = round(time.time() - t0, 1)
        sec["upper12288_warm_s"] = round(timeit(ue, 2), 2)
        log(f"upper12288: warm {sec['upper12288_warm_s']}s "
            f"(first {sec['upper12288_first_s']}s)")
        OUT["prims"] = sec

    if "sparse2" in SECTIONS:
        from cosdata_tpu.indexes.inverted import InvertedIndex

        sec = {}
        sn, vocab, nnz_doc, nnz_q = 500_000, 30_000, 64, 24
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
            inv.add_batch(np.arange(s0, e0),
                          dims_pool[s0 * nnz_doc : e0 * nnz_doc],
                          vals_pool[s0 * nnz_doc : e0 * nnz_doc],
                          np.full(e0 - s0, nnz_doc))
        inv.flush()
        sec["ingest_dps"] = round((sn - 256) / (time.time() - t0), 1)
        queries = []
        for j in range(64):
            dd = dims_pool[j * nnz_doc : (j + 1) * nnz_doc]
            vv = vals_pool[j * nnz_doc : (j + 1) * nnz_doc]
            pick = np.argsort(dd)[-nnz_q:]
            queries.append(np.stack([dd[pick], vv[pick]], axis=1))
        saved = (inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL)
        inv.SCAN_BUDGET = 1 << 30
        t0 = time.time()
        ids_ex, _ = inv.search(queries, top_k=k)
        sec["oracle_s"] = round(time.time() - t0, 1)
        inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL = saved
        log("rescore oracle done")
        for budget in (131072, 262144, 524288, 1 << 20):
            inv.SCAN_BUDGET = budget
            inv.SCAN_BUDGET_TOTAL = budget * 64
            ids, _ = inv.search(queries, top_k=k)
            t0 = time.time()
            for _ in range(3):
                inv.search(queries, top_k=k)
            qps64 = 3 * 64 / (time.time() - t0)
            rec = np.mean([
                len(set(map(int, ids[j])) & set(map(int, ids_ex[j]))) / k
                for j in range(64)])
            sec[f"budget{budget}"] = {
                "recall_vs_exact_b64": round(float(rec), 3),
                "qps_b64": round(qps64, 1),
            }
            log(f"rescore budget {budget}: b64 {qps64:.0f} qps rec {rec:.3f}")
        inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL = saved
        inv.search([queries[0]], top_k=k)
        t0 = time.time()
        for q1 in queries[:8]:
            inv.search([q1], top_k=k)
        sec["b1_latency_ms"] = round((time.time() - t0) / 8 * 1e3, 1)
        log(f"b1 latency {sec['b1_latency_ms']}ms")
        OUT["sparse2"] = sec

    if "bm252" in SECTIONS:
        from cosdata_tpu.indexes.tf_idf import TFIDFIndex

        sec = {}
        bn = 100_000
        rng = np.random.default_rng(9)
        vocab_words = [f"w{i}" for i in range(20_000)]
        zipf = (rng.pareto(1.1, size=bn * 40).astype(np.int64)) % 20_000
        tfi = TFIDFIndex(sample_threshold=256)
        t0 = time.time()
        for i in range(bn):
            words = zipf[i * 40 : (i + 1) * 40]
            tfi.add(i, " ".join(vocab_words[w] for w in words))
        tfi.flush()
        sec["ingest_dps"] = round(bn / (time.time() - t0), 1)
        bq = [" ".join(vocab_words[w]
                       for w in np.sort(zipf[j * 40 : (j + 1) * 40])[-6:])
              for j in range(64)]
        saved = (tfi.SCAN_BUDGET, tfi.SCAN_BUDGET_TOTAL, tfi.MAX_TERM_POSTINGS)
        tfi.SCAN_BUDGET, tfi.MAX_TERM_POSTINGS = 1 << 30, 1 << 30
        ids_ex, _ = tfi.search(bq, top_k=k)
        tfi.SCAN_BUDGET, tfi.SCAN_BUDGET_TOTAL, tfi.MAX_TERM_POSTINGS = saved
        log("bm25 oracle done")
        for budget in (131072, 262144, 524288):
            tfi.SCAN_BUDGET = budget
            tfi.SCAN_BUDGET_TOTAL = budget * 64
            ids, _ = tfi.search(bq, top_k=k)
            t0 = time.time()
            for _ in range(3):
                tfi.search(bq, top_k=k)
            qps64 = 3 * 64 / (time.time() - t0)
            rec = np.mean([
                len(set(map(int, ids[j])) & set(map(int, ids_ex[j]))) / k
                for j in range(64)])
            sec[f"budget{budget}"] = {
                "recall_vs_exact_b64": round(float(rec), 3),
                "qps_b64": round(qps64, 1),
            }
            log(f"bm25 rescore budget {budget}: b64 {qps64:.0f} qps rec {rec:.3f}")
        tfi.SCAN_BUDGET, tfi.SCAN_BUDGET_TOTAL, tfi.MAX_TERM_POSTINGS = saved
        OUT["bm252"] = sec

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
