"""Profile sparse + BM25 batch search at the bench shapes (r4): where do
2.4 s (sparse b64) / 24 s (BM25 b64) actually go? cProfile on the host +
wall timers around the reps.

Run: python scripts/exp_r4_sparse.py [sparse|bm25|both]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu  # noqa: F401
import numpy as np

which = sys.argv[1] if len(sys.argv) > 1 else "both"

from cosdata_tpu.utils.device import warmup_device

print(f"warmup {warmup_device():.1f}s", flush=True)


def prof(fn, label, reps=3):
    fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.0f} ms/call", flush=True)
    pr = cProfile.Profile()
    pr.enable()
    fn()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue(), flush=True)


if which in ("sparse", "both"):
    from cosdata_tpu.indexes.inverted import InvertedIndex

    sn, vocab, nnz_doc, nnz_q, k = 500_000, 30_000, 64, 24, 10
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
    print(f"sparse ingest {time.time()-t0:.1f}s", flush=True)
    queries = []
    for j in range(64):
        dd = dims_pool[j * nnz_doc : (j + 1) * nnz_doc]
        vv = vals_pool[j * nnz_doc : (j + 1) * nnz_doc]
        pick = np.argsort(dd)[-nnz_q:]
        queries.append(np.stack([dd[pick], vv[pick]], axis=1))
    prof(lambda: inv.search(queries, top_k=k), "sparse b64")
    qbig = queries * 4
    prof(lambda: inv.search(qbig, top_k=k), "sparse b256")
    ids, _ = inv.search(queries, top_k=k)
    saved = inv.SCAN_BUDGET
    inv.SCAN_BUDGET = 1 << 30
    os.environ["COSDATA_SPARSE_EXHAUSTIVE"] = "1"
    ids_ex, _ = inv.search(queries, top_k=k)
    os.environ.pop("COSDATA_SPARSE_EXHAUSTIVE", None)
    inv.SCAN_BUDGET = saved
    rec = np.mean([
        len(set(map(int, ids[j])) & set(map(int, ids_ex[j]))) / k
        for j in range(len(queries))
    ])
    print(f"sparse recall_vs_exact: {rec:.3f}", flush=True)

if which in ("bm25", "both"):
    from cosdata_tpu.indexes.tf_idf import TFIDFIndex

    bn, k = 100_000, 10
    rng = np.random.default_rng(9)
    vocab_words = [f"w{i}" for i in range(20_000)]
    zipf = (rng.pareto(1.1, size=bn * 40).astype(np.int64)) % 20_000
    tfi = TFIDFIndex(sample_threshold=256)
    t0 = time.time()
    for i in range(bn):
        words = zipf[i * 40 : (i + 1) * 40]
        tfi.add(i, " ".join(vocab_words[w] for w in words))
    tfi.flush()
    print(f"bm25 ingest {time.time()-t0:.1f}s", flush=True)
    bq = [
        " ".join(vocab_words[w] for w in np.sort(zipf[j * 40 : (j + 1) * 40])[-6:])
        for j in range(64)
    ]
    prof(lambda: tfi.search(bq, top_k=k), "bm25 b64")
    bqbig = bq * 4
    prof(lambda: tfi.search(bqbig, top_k=k), "bm25 b256")
    ids, _ = tfi.search(bq, top_k=k)
    saved = (tfi.SCAN_BUDGET, tfi.MAX_TERM_POSTINGS)
    tfi.SCAN_BUDGET, tfi.MAX_TERM_POSTINGS = 1 << 30, 1 << 30
    os.environ["COSDATA_SPARSE_EXHAUSTIVE"] = "1"
    ids_ex, _ = tfi.search(bq, top_k=k)
    os.environ.pop("COSDATA_SPARSE_EXHAUSTIVE", None)
    tfi.SCAN_BUDGET, tfi.MAX_TERM_POSTINGS = saved
    rec = np.mean([
        len(set(map(int, ids[j])) & set(map(int, ids_ex[j]))) / k
        for j in range(len(bq))
    ])
    print(f"bm25 recall_vs_exact: {rec:.3f}", flush=True)
