"""Round-3 on-chip experiments (not part of the shipped framework).

Measures, on the real TPU:
  flat    — fused flat-scan variants (chunk sizes, bf16 scores, big batch,
            per-component timings) to find the ≥30k QPS operating point
  build   — 1M HNSW bulk-build stage breakdown (COSDATA_BUILD_LOG)
  beam    — graph search expand/ef ladder at 1M (post reverse-edge fix)
  sparse  — vectorized-allocator QPS + recall-vs-exact across budgets
  bm25    — same for BM25

Run: EXP_SECTIONS=flat,sparse python scripts/exp_r3.py
Writes progress to stderr; prints one JSON line at the end.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = os.environ.get("EXP_SECTIONS", "flat,sparse,bm25").split(",")
OUT = {}


def log(msg):
    print(f"[exp {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    from bench import gen_clustered, brute_topk, recall_of

    n, d, nq, k = 1_000_000, 768, 1024, 10
    t0 = time.time()
    x, q = gen_clustered(n, d, nq)
    log(f"corpus ready in {time.time()-t0:.0f}s")

    import jax
    import jax.numpy as jnp

    from cosdata_tpu.utils.device import warmup_device

    OUT["warmup_s"] = round(warmup_device(), 1)
    log("device warm")

    from cosdata_tpu.core.collection import tune_dense_range
    from cosdata_tpu.indexes.flat import FlatIndex

    rng_tuned = tune_dense_range(x[:1000])

    def timeit(fn, reps=3, pipelined=True):
        fn()  # compile/warm
        t0 = time.time()
        if pipelined:
            outs = [fn() for _ in range(reps)]
            jax.block_until_ready(outs)
        else:
            for _ in range(reps):
                jax.block_until_ready(fn())
        return (time.time() - t0) / reps

    if "flat" in SECTIONS or "beam" in SECTIONS or "build" in SECTIONS:
        flat = FlatIndex(dim=d, kind="u8", range_=rng_tuned,
                         initial_capacity=n, ship_dtype="auto")
        t0 = time.time()
        for s in range(0, n, 131072):
            flat.add(x[s : s + 131072])
        jax.block_until_ready(flat.store._arrays.data)
        OUT["flat_build_s"] = round(time.time() - t0, 1)
        log(f"flat store built {OUT['flat_build_s']}s")

    if "flat" in SECTIONS:
        sec = {}
        store = flat.store

        # ---- component timings at the current operating point ----
        from cosdata_tpu.ops import distance as D
        from cosdata_tpu.ops.flat_scan import fused_flat_search, _slice_store
        from cosdata_tpu.ops.topk import NEG_INF

        qq = store.quantize_queries(q)
        chunk0 = 1 << 16

        @jax.jit
        def score_one_chunk(qq, arrays):
            sl = _slice_store(arrays, "u8", 0, chunk0)
            return D.score("cosine", "u8", qq, sl, store.dim_pad)

        sc = score_one_chunk(qq, store._arrays)
        jax.block_until_ready(sc)
        sec["t_matmul_chunk_ms"] = round(
            timeit(lambda: score_one_chunk(qq, store._arrays), 10) * 1e3, 2)

        @jax.jit
        def approx_one(sc):
            return jax.lax.approx_max_k(sc, 50, recall_target=0.99)

        sec["t_approx_chunk_ms"] = round(
            timeit(lambda: approx_one(sc), 10) * 1e3, 2)

        @jax.jit
        def matmul_sweep(qq, arrays, valid):
            def body(c, acc):
                sl = _slice_store(arrays, "u8", c * chunk0, chunk0)
                s = D.score("cosine", "u8", qq, sl, store.dim_pad)
                v = jax.lax.dynamic_slice_in_dim(valid, c * chunk0, chunk0)
                s = jnp.where(v[None, :], s, NEG_INF)
                return jnp.maximum(acc, s.max(axis=1))
            acc = jnp.full((qq.data.shape[0],), NEG_INF)
            return jax.lax.fori_loop(0, store.capacity // chunk0, body, acc)

        valid = store.valid_mask()
        sec["t_matmul_sweep_ms"] = round(
            timeit(lambda: matmul_sweep(qq, store._arrays, valid), 3) * 1e3, 1)

        # ---- the shipped engine across chunk sizes and batch sizes ----
        for chunk in (1 << 14, 1 << 15, 1 << 16, 1 << 17):
            if store.capacity % chunk:
                continue
            dt = timeit(lambda: fused_flat_search(
                "cosine", "u8", d, store.dim_pad, 2, 50, k, chunk, True,
                store.ship_queries(q), store.range[0], store.range[1],
                store._arrays, store._raw, valid), 4)
            sec[f"qps_b1024_chunk{chunk}"] = round(nq / dt, 1)
            log(f"chunk {chunk}: {nq/dt:.0f} qps")
        qbig = np.tile(q, (4, 1))
        for chunk in (1 << 14, 1 << 16):
            if store.capacity % chunk:
                continue
            dt = timeit(lambda: fused_flat_search(
                "cosine", "u8", d, store.dim_pad, 2, 50, k, chunk, True,
                store.ship_queries(qbig), store.range[0], store.range[1],
                store._arrays, store._raw, valid), 3)
            sec[f"qps_b4096_chunk{chunk}"] = round(4 * nq / dt, 1)
            log(f"b4096 chunk {chunk}: {4*nq/dt:.0f} qps")

        # ---- bf16-score variant (halve the (B, chunk) HBM traffic) ----
        @functools.partial(jax.jit, static_argnames=("chunk", "kk"))
        def scan_bf16(qq, arrays, valid, raw, q_raw, chunk: int, kk: int):
            def body(c, carry):
                top_s, top_i = carry
                start = c * chunk
                sl = _slice_store(arrays, "u8", start, chunk)
                s = D.score("cosine", "u8", qq, sl, store.dim_pad)
                v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
                s = jnp.where(v[None, :], s, NEG_INF).astype(jnp.bfloat16)
                c_s, c_i = jax.lax.approx_max_k(s, kk, recall_target=0.99)
                c_i = c_i + start
                all_s = jnp.concatenate([top_s, c_s.astype(jnp.float32)], axis=1)
                all_i = jnp.concatenate([top_i, c_i], axis=1)
                top_s, pos = jax.lax.top_k(all_s, kk)
                top_i = jnp.take_along_axis(all_i, pos, axis=1)
                return top_s, top_i
            b = qq.data.shape[0]
            init = (jnp.full((b, kk), NEG_INF, jnp.float32),
                    jnp.full((b, kk), -1, jnp.int32))
            top_s, top_i = jax.lax.fori_loop(0, store.capacity // chunk, body, init)
            from cosdata_tpu.ops.storage import _rerank
            re = _rerank("cosine", q_raw, raw, top_i)
            re = jnp.where(top_s > NEG_INF / 2, re, NEG_INF)
            vals, pos = jax.lax.top_k(re, k)
            ids = jnp.take_along_axis(top_i, pos, axis=1)
            return ids, vals

        q_raw = store.ship_queries(q)
        true_sub = brute_topk(q[:64], x, k)
        for chunk in (1 << 14, 1 << 16):
            ids, _ = jax.device_get(scan_bf16(
                qq, store._arrays, valid, store._raw, q_raw, chunk, 50))
            rec = recall_of(true_sub, ids[:64], k)
            dt = timeit(lambda: scan_bf16(
                qq, store._arrays, valid, store._raw, q_raw, chunk, 50), 4)
            sec[f"qps_bf16_chunk{chunk}"] = round(nq / dt, 1)
            sec[f"recall_bf16_chunk{chunk}"] = round(rec, 4)
            log(f"bf16 chunk {chunk}: {nq/dt:.0f} qps rec {rec:.4f}")

        try:
            st = jax.local_devices()[0].memory_stats()
            if st:
                sec["hbm_gb"] = round(st.get("bytes_in_use", 0) / (1 << 30), 2)
        except Exception:
            pass
        OUT["flat"] = sec

    if "build" in SECTIONS or "beam" in SECTIONS:
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        os.environ["COSDATA_BUILD_LOG"] = "1"
        idx = HNSWIndex(dim=d, kind="u8", range_=rng_tuned, params=HNSWParams(),
                        seed=3, initial_capacity=n, keep_raw="host",
                        ship_dtype="auto")
        t0 = time.time()
        idx.add(x)
        OUT["hnsw_build_s"] = round(time.time() - t0, 1)
        OUT["hnsw_build_split"] = idx.last_build_stats
        log(f"hnsw built {OUT['hnsw_build_s']}s split {idx.last_build_stats}")

    if "beam" in SECTIONS:
        sec = {}
        true_ids = brute_topk(q[:256], x, k)
        p = idx.params
        for ef in (128, 256):
            for expand in (None, 16, 32, 64):
                if expand is not None:
                    p.expand = expand
                else:
                    p.expand = 4  # default: max(4, ef//64) applied inside
                got, _ = idx.search(q[:256], top_k=k, ef=ef)
                rec = recall_of(true_ids, got, k)
                t0 = time.time()
                for _ in range(3):
                    idx.search(q[:256], top_k=k, ef=ef)
                qps = 3 * 256 / (time.time() - t0)
                key = f"ef{ef}_exp{expand or 'auto'}"
                sec[key] = {"recall10": round(rec, 4), "qps": round(qps, 1)}
                log(f"beam {key}: {qps:.0f} qps rec {rec:.4f}")
        OUT["beam"] = sec

    if "sparse" in SECTIONS:
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
        # oracle once
        saved = (inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL)
        inv.SCAN_BUDGET = 1 << 30
        t0 = time.time()
        ids_ex, _ = inv.search(queries, top_k=k)
        sec["oracle_s"] = round(time.time() - t0, 1)
        inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL = saved
        log("sparse oracle done")
        for budget in (65536, 131072, 262144, 524288):
            inv.SCAN_BUDGET = budget
            inv.SCAN_BUDGET_TOTAL = budget * 64
            ids, _ = inv.search(queries, top_k=k)  # compile
            t0 = time.time()
            for _ in range(3):
                inv.search(queries, top_k=k)
            qps64 = 3 * 64 / (time.time() - t0)
            rec = np.mean([
                len(set(map(int, ids[j])) & set(map(int, ids_ex[j]))) / k
                for j in range(64)])
            qbig = queries * 4
            inv.search(qbig, top_k=k)
            t0 = time.time()
            for _ in range(3):
                inv.search(qbig, top_k=k)
            qps256 = 3 * 256 / (time.time() - t0)
            sec[f"budget{budget}"] = {
                "recall_vs_exact_b64": round(float(rec), 3),
                "qps_b64": round(qps64, 1), "qps_b256": round(qps256, 1),
            }
            log(f"sparse budget {budget}: b64 {qps64:.0f} qps rec {rec:.3f}, "
                f"b256 {qps256:.0f} qps")
        inv.SCAN_BUDGET, inv.SCAN_BUDGET_TOTAL = saved
        # b=1 latency with the vectorized allocator
        inv.search([queries[0]], top_k=k)
        t0 = time.time()
        for q1 in queries[:8]:
            inv.search([q1], top_k=k)
        sec["b1_latency_ms"] = round((time.time() - t0) / 8 * 1e3, 1)
        OUT["sparse"] = sec

    if "bm25" in SECTIONS:
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
        for budget in (65536, 131072, 262144):
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
            bqbig = bq * 4
            tfi.search(bqbig, top_k=k)
            t0 = time.time()
            for _ in range(3):
                tfi.search(bqbig, top_k=k)
            qps256 = 3 * 256 / (time.time() - t0)
            sec[f"budget{budget}"] = {
                "recall_vs_exact_b64": round(float(rec), 3),
                "qps_b64": round(qps64, 1), "qps_b256": round(qps256, 1),
            }
            log(f"bm25 budget {budget}: b64 {qps64:.0f} qps rec {rec:.3f}, "
                f"b256 {qps256:.0f} qps")
        tfi.SCAN_BUDGET, tfi.SCAN_BUDGET_TOTAL, tfi.MAX_TERM_POSTINGS = saved
        OUT["bm25"] = sec

    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
