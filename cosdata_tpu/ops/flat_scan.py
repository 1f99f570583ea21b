"""Chunked brute-force scan with fused running top-k.

The TPU-native fast path for dense search at <= few-million vectors: one
int8 MXU matmul per HBM-resident chunk with a (B, k) running top-k carried
through `lax.fori_loop` — never materializing the full (B, N) score matrix.
At 1M x 768 u8 this is HBM-bandwidth-bound (~0.8 GB per sweep), which beats
graph traversal on this hardware; the HNSW index remains the structure for
feature parity and for beyond-HBM scale (SURVEY.md §7 step 10 sharding).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from cosdata_tpu.ops import quantize as Q
from cosdata_tpu.ops.topk import NEG_INF


def _slice_store(store, kind: str, start, chunk: int):
    if kind == "subbyte":
        return store._replace(
            planes=jax.lax.dynamic_slice_in_dim(store.planes, start, chunk, axis=1),
            sums=jax.lax.dynamic_slice_in_dim(store.sums, start, chunk),
            mags=jax.lax.dynamic_slice_in_dim(store.mags, start, chunk),
        )
    if kind == "u8":
        return store._replace(
            data=jax.lax.dynamic_slice_in_dim(store.data, start, chunk),
            sums=jax.lax.dynamic_slice_in_dim(store.sums, start, chunk),
            mags=jax.lax.dynamic_slice_in_dim(store.mags, start, chunk),
        )
    return store._replace(
        data=jax.lax.dynamic_slice_in_dim(store.data, start, chunk),
        mags=jax.lax.dynamic_slice_in_dim(store.mags, start, chunk),
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "kind", "d", "k", "chunk", "exact")
)
def flat_scan_topk(
    metric: str,
    kind: str,
    d: int,
    k: int,
    chunk: int,
    q,  # quantized query pytree (B rows)
    store,  # quantized store pytree (capacity rows, capacity % chunk == 0)
    valid,  # (capacity,) bool — rows in [0, n) and alive
    exact: bool = False,
):
    """Returns (scores (B, k), ids (B, k)) over the whole store.

    ``exact=True`` selects per-chunk with a full lax.top_k sort instead of
    the hardware approx_max_k shortlist — required when nothing reranks the
    shortlist downstream (the exact-oracle contract)."""
    from cosdata_tpu.ops import distance as D

    if kind == "u8":
        b = q.data.shape[0]
        capacity = store.data.shape[0]
    elif kind == "subbyte":
        b = q.planes.shape[1]
        capacity = store.planes.shape[1]
    else:
        b = q.data.shape[0]
        capacity = store.data.shape[0]
    num_chunks = capacity // chunk

    def body(c, carry):
        top_s, top_i = carry
        start = c * chunk
        sl = _slice_store(store, kind, start, chunk)
        scores = D.score(metric, kind, q, sl, d)  # (B, chunk)
        v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
        scores = jnp.where(v[None, :], scores, NEG_INF)
        if exact:
            c_s, c_i = jax.lax.top_k(scores, min(k, chunk))
        else:
            # hardware approximate top-k: per-chunk shortlist selection is
            # recall-uncritical (the shortlist is exact-reranked downstream)
            # and the full sort of lax.top_k dominates the sweep otherwise.
            # bf16 halves the score-matrix HBM traffic through the
            # selection (u8 path; measured selection overlap 1.0, and the
            # f32 selection cost dominated the sweep — BENCH.md r3)
            if kind == "u8":
                scores = scores.astype(jnp.bfloat16)
            c_s, c_i = jax.lax.approx_max_k(
                scores, min(k, chunk), recall_target=0.99
            )
            c_s = c_s.astype(jnp.float32)
        c_i = c_i + start
        all_s = jnp.concatenate([top_s, c_s], axis=1)
        all_i = jnp.concatenate([top_i, c_i], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    top_s, top_i = jax.lax.fori_loop(0, num_chunks, body, init)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "d_true", "d_pad", "k_bins", "group", "k_fetch", "k",
        "chunk", "rerank", "select",
    ),
)
def fused_flat_search_codes(
    metric: str,
    d_true: int,
    d_pad: int,
    k_bins: int,
    group: int,
    k_fetch: int,
    k: int,
    chunk: int,
    rerank: bool,
    q,  # quantized u8 query pytree (B rows) — codes shipped 1 byte/dim
    store,  # quantized u8 store pytree
    raw,  # (cap, d_pad) f32/f16 raw rows (dummy when rerank=False)
    q_re,  # (B, d_pad) f16/f32 exact queries for the rerank (dummy when
    #       rerank=False). Scanning quantizes both sides; the RERANK must
    #       not: a dequantized-u8 query reorders near-ties and caps
    #       recall@10 at ~0.95 on clustered 1M x 768 no matter how wide
    #       the shortlist (measured, scripts/exp_r4_flat.py) — while f16
    #       queries cost 1.5 MB per 1024-batch next to the 768 MB scan.
    valid,  # (cap,) bool
    select: str = "approx",  # STATIC selection strategy (see below) —
    #       resolved by the caller; an env read inside the trace would
    #       not key the jit cache and flips would reuse stale programs
):
    """u8 flat scan tuned for wire and selection cost (the r3 headline
    engine; measured against `fused_flat_search` in scripts/exp_r3.py):

    - queries arrive PRE-QUANTIZED as u8 codes (1 byte/dim on the wire —
      4x less than f32; stage-1 scoring is quantized either way, and the
      exact rerank recovers full-precision ordering on the shortlist).
    - chunk scores drop to bf16 before selection (halves the score-matrix
      HBM traffic; measured overlap 1.0 with f32 selection at this shape).
    - selection is BIN-MAX: scores reduce to per-`group`-row bin maxima
      (a cheap reduction XLA fuses into the matmul epilogue) and only the
      (B, bins) maxima go through the running top-k; the top k_bins bins
      expand to group-width candidate windows rescored exactly (quantized)
      afterwards — the same windowed-max principle as approx_max_k but
      amortized across the whole sweep, with the expansion priced as one
      gather+einsum instead of a per-chunk sort.
    - rerank (when raw rows are device-resident) runs f32 math against
      the dequantized query codes: no f32 query upload exists at all.
    """
    from cosdata_tpu.ops import distance as D
    from cosdata_tpu.ops.storage import (
        _cos_or_dot,
        _diag_dot as _Sdiag,
        _scores_gathered,
    )

    b = q.data.shape[0]
    capacity = store.data.shape[0]
    num_chunks = capacity // chunk
    bins_per_chunk = chunk // group

    # stage-1 selection strategy:
    #   "approx" (default) — per-chunk bf16 approx_max_k shortlists merged
    #     through the sweep, candidates rerank directly
    #   "bins"  — GLOBAL bin-max: per-chunk group-max reductions write one
    #     (B, capacity/group) maxima table (no per-chunk sort — the
    #     per-chunk approx_max_k calls were ~90% of stage-1, measured
    #     16 x 16.3 ms vs a 12.6 ms matmul sweep at b1024,
    #     scripts/exp_r5_scanparts.py), then ONE approx_max_k over the
    #     maxima + window expansion + quantized rescore. The Pallas
    #     bin-max variant was removed from this path: the kernel measured
    #     ~360 ms per 64k slice on-chip — ~100x off its own module-doc
    #     claim (it survives for interpret-mode tests and the explicit
    #     streamed opt-in).
    if select == "bins" and b * (capacity // group) > (1 << 28):
        # the (B, capacity/group) maxima table would exceed ~1 GB f32
        # (e.g. b4096 x a 32M-row store): fall back to the per-chunk
        # approx engine rather than risk an HBM blowout
        select = "approx"
    if select != "bins":
        # u8 dot scores are integer-valued sums: bf16's 8-bit mantissa
        # collapses them into ties above ~256 and approx_max_k breaks the
        # ties arbitrarily, so tie-dense (clustered) corpora lose true
        # top-k rows out of the shortlist before the exact rerank can save
        # them (measured 0.9499 recall@10 at 1M x 768 vs 0.95+ required).
        # f32 selection doubles the (B, chunk) score write; the "bf16"
        # select value restores the cheaper cast for tie-sparse corpora.
        sel_dtype = jnp.bfloat16 if select == "bf16" else jnp.float32

        def abody(c, carry):
            top_s, top_i = carry
            start = c * chunk
            sl = _slice_store(store, "u8", start, chunk)
            scores = D.score(metric, "u8", q, sl, d_pad)  # (B, chunk)
            v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
            scores = jnp.where(v[None, :], scores, NEG_INF).astype(sel_dtype)
            c_s, c_i = jax.lax.approx_max_k(
                scores, min(k_fetch, chunk), recall_target=0.99
            )
            c_i = c_i + start
            all_s = jnp.concatenate([top_s, c_s.astype(jnp.float32)], axis=1)
            all_i = jnp.concatenate([top_i, c_i], axis=1)
            top_s, pos = jax.lax.top_k(all_s, k_fetch)
            top_i = jnp.take_along_axis(all_i, pos, axis=1)
            return top_s, top_i

        init = (
            jnp.full((b, k_fetch), NEG_INF, jnp.float32),
            jnp.full((b, k_fetch), -1, jnp.int32),
        )
        vals, ids = jax.lax.fori_loop(0, num_chunks, abody, init)
        if rerank:
            lanes = jnp.arange(d_pad) < d_true
            q_deq = jnp.where(lanes[None, :], q_re.astype(jnp.float32), 0.0)
            safe = jnp.maximum(ids, 0)
            cand = raw[safe].astype(jnp.float32)
            dot = _Sdiag(q_deq, cand, int8=False)
            qm = jnp.linalg.norm(q_deq, axis=-1)
            cm = jnp.linalg.norm(cand, axis=-1)
            m = "euclidean" if metric == "hamming" else metric
            re = _cos_or_dot(m, dot, qm, cm)
            re = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
            vals, pos = jax.lax.top_k(re, k)
            ids = jnp.take_along_axis(ids, pos, axis=1)
        else:
            vals, ids = vals[:, :k], ids[:, :k]
        ids = jnp.where(vals > NEG_INF / 2, ids, -1)
        return ids, vals
    # per-chunk group-max reductions fill ONE global maxima table; the
    # bf16 cast halves the reduce's read traffic, maxima stored f32
    def bbody(c, bins):
        start = c * chunk
        sl = _slice_store(store, "u8", start, chunk)
        scores = D.score(metric, "u8", q, sl, d_pad)  # (B, chunk)
        v = jax.lax.dynamic_slice_in_dim(valid, start, chunk)
        scores = jnp.where(v[None, :], scores, NEG_INF).astype(jnp.bfloat16)
        bin_max = scores.reshape(b, bins_per_chunk, group).max(axis=2)
        return jax.lax.dynamic_update_slice(
            bins, bin_max.astype(jnp.float32), (0, c * bins_per_chunk)
        )

    bins = jax.lax.fori_loop(
        0, num_chunks, bbody,
        jnp.full((b, capacity // group), NEG_INF, jnp.float32),
    )
    k_bins = min(k_bins, capacity // group)  # small stores: fewer bins
    # 0.999 target: selection over maxima is 32x smaller than over
    # scores, so the tighter shortlist is nearly free — and a bin lost
    # here loses `group` candidate rows at once (recall@10 measured
    # 0.9984 -> parity with the exact-selection engine)
    bin_s, bin_ids = jax.lax.approx_max_k(
        bins, k_bins, recall_target=0.999
    )
    bin_ids = jnp.where(bin_s > NEG_INF / 2, bin_ids, -1)
    # expand the winning bins and rescore exactly (quantized). Bins are
    # CONTIGUOUS row groups, so candidates gather as ONE (group*D)-byte
    # BLOCK row per bin via a reshaped view — 24 KB block gathers instead
    # of `group` separate row gathers (gather cost is per-row
    # latency-bound on TPU, scripts/exp_r5_gather.py). Chunked over bins
    # to keep the (B, ch*group, D) working set bounded.
    p_total = k_bins * group
    kf = min(k_fetch, p_total)
    kb_ch = max(1, min(k_bins, 1024 // group))
    while k_bins % kb_ch:
        kb_ch -= 1
    cap_g = capacity // group
    data_blk = store.data.reshape(cap_g, group * d_pad)
    sums_blk = store.sums.reshape(cap_g, group)
    mags_blk = store.mags.reshape(cap_g, group)
    valid_blk = valid.reshape(cap_g, group)
    uq = (q.sums + 128 * d_pad).astype(jnp.float32)

    def exp_body(cc, carry):
        top_s, top_i = carry
        bsel = jax.lax.dynamic_slice_in_dim(bin_ids, cc * kb_ch, kb_ch, 1)
        safe_b = jnp.maximum(bsel, 0)
        cw = kb_ch * group
        cdata = data_blk[safe_b].reshape(b, cw, d_pad)
        csums = sums_blk[safe_b].reshape(b, cw)
        cmags = mags_blk[safe_b].reshape(b, cw)
        live_c = valid_blk[safe_b].reshape(b, cw) & (
            (bsel[:, :, None] >= 0).repeat(group, 2).reshape(b, cw)
        )
        cc_dot = _Sdiag(q.data, cdata, int8=True)
        code_dot = (
            cc_dot + 128 * (q.sums[:, None] + csums) + d_pad * 128 * 128
        ).astype(jnp.float32)
        uc = (csums + 128 * d_pad).astype(jnp.float32)
        dot = (
            q.a * q.a * code_dot + q.a * q.b * (uq[:, None] + uc)
            + q.b * q.b * q.dtrue
        )
        sc = _cos_or_dot(metric, dot, q.mags, cmags)
        rows_c = (
            safe_b[:, :, None] * group + jnp.arange(group)[None, None, :]
        ).reshape(b, cw)
        sc = jnp.where(live_c, sc, NEG_INF)
        c_s, c_pos = jax.lax.top_k(sc, min(kf, cw))
        c_i = jnp.take_along_axis(rows_c, c_pos, axis=1)
        all_s = jnp.concatenate([top_s, c_s], axis=1)
        all_i = jnp.concatenate([top_i, c_i], axis=1)
        top_s, pos = jax.lax.top_k(all_s, kf)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    init = (
        jnp.full((b, kf), NEG_INF, jnp.float32),
        jnp.full((b, kf), -1, jnp.int32),
    )
    vals, ids = jax.lax.fori_loop(0, k_bins // kb_ch, exp_body, init)
    if rerank:
        # exact rerank against raw rows with the EXACT (f16-wire) queries
        lanes = jnp.arange(d_pad) < d_true
        q_deq = jnp.where(lanes[None, :], q_re.astype(jnp.float32), 0.0)
        safe = jnp.maximum(ids, 0)
        cand = raw[safe].astype(jnp.float32)  # (B, kf, D)
        dot = _Sdiag(q_deq, cand, int8=False)
        qm = jnp.linalg.norm(q_deq, axis=-1)
        cm = jnp.linalg.norm(cand, axis=-1)
        m = "euclidean" if metric == "hamming" else metric
        re = _cos_or_dot(m, dot, qm, cm)
        re = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
        vals, pos = jax.lax.top_k(re, k)
        ids = jnp.take_along_axis(ids, pos, axis=1)
    else:
        vals, ids = vals[:, :k], ids[:, :k]
    ids = jnp.where(vals > NEG_INF / 2, ids, -1)
    return ids, vals


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "d_true", "d_pad", "k_bins", "group", "k_fetch", "k",
        "chunk", "select",
    ),
)
def fused_flat_search_codes_f16q(
    metric: str,
    d_true: int,
    d_pad: int,
    k_bins: int,
    group: int,
    k_fetch: int,
    k: int,
    chunk: int,
    q_f16,  # (B, d_pad) f16 exact queries — the ONLY query upload
    lo,
    hi,
    store,
    valid,
    select: str = "approx",
):
    """Codes-engine stage 1 fed by ONE f16 query upload.

    The two-upload shape (u8 codes for the scan + f16 exact rows for the
    rerank) paid the wire twice on a link where transfers never overlap
    compute (measured: pipelined == blocking; BENCH.md tunnel notes). One
    f16 tensor serves both stages: the scan quantizes it to u8 codes
    in-program (scan-side quantization is semantics-preserving — only the
    RERANK must see exact queries, flat_scan.fused_flat_search_codes doc)
    and the rerank consumes it directly. Wire: 2 B/dim total vs 3 B/dim.
    """
    from cosdata_tpu.ops.storage import _quantize_batch

    q = _quantize_batch(
        q_f16.astype(jnp.float32), lo, hi, "u8", 2, d_true
    )
    return fused_flat_search_codes(
        metric, d_true, d_pad, k_bins, group, k_fetch, k, chunk,
        False, q, store, q.data, q.mags, valid, select=select,
    )


@functools.partial(
    jax.jit, static_argnames=("metric", "d_true", "d_pad", "k")
)
def exact_rerank_sorted(metric, d_true, d_pad, k, q_re, raw, ids, vals):
    """Exact f32 rerank of a (B, kf) shortlist as its OWN program.

    Measured on-chip (scripts/exp_r5_rerank.py, 1M x 768 f16 raw, kf=50):
    the same ops INSIDE the fused scan program cost 52 ms (b1024) /
    353 ms (b4096) — the monolithic program's rerank tail scheduled
    pathologically at wide batches (the whole r4 b4096 < b1024
    inversion) — while dispatched standalone they run 14.2 / 34.8 ms.
    Sorting candidate ids before the row gather (and inverting after)
    adds locality worth another ~3.7x at b1024 (53.5 -> 14.2 ms) with
    bit-identical f32 math.
    """
    from cosdata_tpu.ops.storage import _cos_or_dot, _diag_dot

    b, kf = ids.shape
    lanes = jnp.arange(d_pad) < d_true
    q_deq = jnp.where(lanes[None, :], q_re.astype(jnp.float32), 0.0)
    flat = jnp.maximum(ids, 0).reshape(-1)
    order = jnp.argsort(flat)
    cand_s = raw[flat[order]].astype(jnp.float32)
    inv = jnp.argsort(order)
    cand = cand_s[inv].reshape(b, kf, d_pad)
    dot = _diag_dot(q_deq, cand, int8=False)
    qm = jnp.linalg.norm(q_deq, axis=-1)
    cm = jnp.linalg.norm(cand, axis=-1)
    m = "euclidean" if metric == "hamming" else metric
    re = _cos_or_dot(m, dot, qm, cm)
    re = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
    vals_k, pos = jax.lax.top_k(re, min(k, kf))
    ids_k = jnp.take_along_axis(ids, pos, axis=1)
    ids_k = jnp.where(vals_k > NEG_INF / 2, ids_k, -1)
    return ids_k, vals_k


@functools.partial(jax.jit, static_argnames=("metric", "kind", "d", "k"))
def _streamed_chunk_merge(
    metric: str, kind: str, d: int, k: int, q, chunk_store, valid, base,
    top_s, top_i,
):
    """Merge one host-streamed quantized code chunk into the running top-k."""
    from cosdata_tpu.ops import distance as D

    scores = D.score(metric, kind, q, chunk_store, d)
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    c_s, c_i = jax.lax.approx_max_k(
        scores, min(k, scores.shape[1]), recall_target=0.99
    )
    c_i = c_i + base
    all_s = jnp.concatenate([top_s, c_s], axis=1)
    all_i = jnp.concatenate([top_i, c_i], axis=1)
    top_s, pos = jax.lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, pos, axis=1)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=("metric", "d_pad", "group", "k", "interpret"),
)
def _streamed_chunk_merge_codes(
    metric: str, d_pad: int, group: int, k: int, q, chunk_store, valid,
    base, top_s, top_i, interpret: bool = False,
):
    """Fused-codes variant of the streamed-chunk merge (VERDICT r4
    missing #4, second half: spilled u8 stores keep the fused engine):
    the Pallas bin-max kernel scores the chunk with the (B, chunk) score
    matrix VMEM-only, the top-k bins per query expand to group-width
    windows, and only those rows get the quantized rescore gather —
    identical results to the plain merge (the k-bin window max guarantees
    the true chunk top-k survives: each of the top-k rows bounds its own
    bin's max, so at most k-1 bins outrank it)."""
    from cosdata_tpu.ops.pallas.u8_scan import u8_bin_max_from_store
    from cosdata_tpu.ops.storage import _scores_gathered

    b = q.data.shape[0]
    chunk = chunk_store.data.shape[0]
    bc = 2048
    nb = bc // group
    bins = u8_bin_max_from_store(
        metric, group, q, chunk_store, valid, d_pad,
        qb=min(512, b), bc=bc, interpret=interpret,
    ).T  # (B, chunk/group), STRIDED bins (u8_scan module doc)
    kb = min(k, bins.shape[1])
    bin_s, bin_ids = jax.lax.approx_max_k(bins, kb, recall_target=0.99)
    bin_ids = jnp.where(bin_s > NEG_INF / 2, bin_ids, -1)
    safe_bins = jnp.maximum(bin_ids, 0)
    jblk = safe_bins // nb
    off = safe_bins % nb
    rows = (
        (jblk * bc + off)[:, :, None]
        + jnp.arange(group)[None, None, :] * nb
    ).reshape(b, kb * group)
    live = (
        (bin_ids[:, :, None] >= 0).repeat(group, axis=2).reshape(b, -1)
        & valid[rows]
    )
    sc = _scores_gathered(metric, "u8", d_pad, q, chunk_store, rows)
    sc = jnp.where(live, sc, NEG_INF)
    c_s, c_pos = jax.lax.top_k(sc, min(k, kb * group))
    c_i = jnp.take_along_axis(rows, c_pos, axis=1) + base
    all_s = jnp.concatenate([top_s, c_s], axis=1)
    all_i = jnp.concatenate([top_i, c_i], axis=1)
    top_s, pos = jax.lax.top_k(all_s, k)
    top_i = jnp.take_along_axis(all_i, pos, axis=1)
    return top_s, top_i


def _stream_codes_eligible(store) -> bool:
    """Gate for the fused-codes streamed merge — EXPLICIT OPT-IN
    (COSDATA_STREAM_CODES=1, or =interpret for CPU tests): the Pallas
    bin-max kernel measured ~360 ms per 64k-row slice on-chip
    (scripts/exp_r5_scanparts.py) vs ~4 ms for the plain XLA chunk merge;
    the streamed tier is wire-bound anyway, so the default stays plain."""
    if store.kind != "u8" or store.metric not in ("cosine", "dot"):
        return False
    env = os.environ.get("COSDATA_STREAM_CODES", "")
    if env == "interpret":
        return True
    return env == "1" and STREAM_CHUNK % 2048 == 0


#: rows per streamed chunk (x dim bytes = h2d transfer per dispatch)
STREAM_CHUNK = 1 << 16


def streamed_flat_topk(metric, store, q_np, k_fetch, valid_np):
    """Beyond-HBM scan: quantized codes live in HOST RAM (VectorStore spill
    tier, the role of the reference's lazy cache_loader.rs); chunks stream
    host->device through a pipeline of async dispatches with a running
    device top-k. Returns device (scores (B, k), ids (B, k)). Handles both
    u8 codes and packed subbyte planes (the DEEP-100M 2-bit config — planes
    are 4-16x smaller than u8, so streaming them is cheaper still).

    ``valid_np``: host bool mask over capacity rows (tombstones+filters)."""
    import numpy as np

    from cosdata_tpu.ops import quantize as Q

    a = store._arrays  # numpy-backed QuantizedU8 / QuantizedSubByte
    b = len(q_np)
    bp = max(8, 1 << int(np.ceil(np.log2(b))))
    if bp != b:
        q_np = np.concatenate([q_np, np.repeat(q_np[-1:], bp - b, 0)])
    # query codes quantized on HOST: minimal wire, and stage-1 scoring is
    # quantized either way
    if store.kind == "subbyte":
        qp, qsums, qmags = store._host_quantize_subbyte(
            store._pad_dims_np(q_np)
        )
        q = Q.QuantizedSubByte(
            jnp.asarray(qp), jnp.asarray(qsums), jnp.asarray(qmags),
            jnp.float32(a.a), jnp.float32(a.b), jnp.float32(a.dtrue),
        )
    else:
        qi8 = store._host_quantize_u8(store._pad_dims_np(q_np))
        sums = qi8.sum(axis=1, dtype=np.int32)
        lo, hi = store.range
        aa = (np.float32(hi) - np.float32(lo)) / np.float32(255.0)
        deq = aa * (qi8.astype(np.float32) + 128.0) + np.float32(lo)
        deq[:, store.dim :] = 0.0
        mags = np.sqrt((deq * deq).sum(axis=1))
        q = Q.QuantizedU8(
            jnp.asarray(qi8), jnp.asarray(sums), jnp.asarray(mags),
            jnp.float32(a.a), jnp.float32(a.b), jnp.float32(a.dtrue),
        )
    k = min(k_fetch, store.capacity)
    top_s = jnp.full((bp, k), NEG_INF, jnp.float32)
    top_i = jnp.full((bp, k), -1, jnp.int32)
    codes_merge = _stream_codes_eligible(store)
    interpret = os.environ.get("COSDATA_STREAM_CODES", "") == "interpret"
    n_rows = store.n
    for base in range(0, n_rows, STREAM_CHUNK):
        end = min(base + STREAM_CHUNK, store.capacity)
        short = STREAM_CHUNK - (end - base)
        sums_c, mags_c = a.sums[base:end], a.mags[base:end]
        valid_c = valid_np[base:end]
        if store.kind == "subbyte":
            planes_c = a.planes[:, base:end]
            if short:  # pad the tail chunk: ONE compiled shape for the sweep
                planes_c = np.pad(planes_c, ((0, 0), (0, short), (0, 0)))
                sums_c = np.pad(sums_c, (0, short))
                mags_c = np.pad(mags_c, (0, short))
                valid_c = np.pad(valid_c, (0, short))
            chunk = Q.QuantizedSubByte(
                jnp.asarray(planes_c), jnp.asarray(sums_c),
                jnp.asarray(mags_c),
                jnp.float32(a.a), jnp.float32(a.b), jnp.float32(a.dtrue),
            )
        else:
            data_c = a.data[base:end]
            if short:
                data_c = np.pad(data_c, ((0, short), (0, 0)), constant_values=-128)
                sums_c = np.pad(sums_c, (0, short))
                mags_c = np.pad(mags_c, (0, short))
                valid_c = np.pad(valid_c, (0, short))
            chunk = Q.QuantizedU8(
                jnp.asarray(data_c), jnp.asarray(sums_c), jnp.asarray(mags_c),
                jnp.float32(a.a), jnp.float32(a.b), jnp.float32(a.dtrue),
            )
        valid = jnp.asarray(valid_c)
        if codes_merge and store.kind == "u8":
            # fused codes engine per streamed chunk: scores stay VMEM-only
            # through the Pallas bin-max, winners rescored while the chunk
            # is still device-resident
            group = 8
            top_s, top_i = _streamed_chunk_merge_codes(
                metric, store.dim_pad, group, k, q, chunk, valid, base,
                top_s, top_i, interpret=interpret,
            )
        else:
            top_s, top_i = _streamed_chunk_merge(
                metric, store.kind, store.dim_pad, k, q, chunk, valid, base,
                top_s, top_i,
            )
    return top_s[:b], top_i[:b]


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "kind", "d_true", "d_pad", "resolution", "k_fetch", "k",
        "chunk", "rerank",
    ),
)
def fused_flat_search(
    metric: str,
    kind: str,
    d_true: int,
    d_pad: int,
    resolution: int,
    k_fetch: int,
    k: int,
    chunk: int,
    rerank: bool,
    q_raw,  # (B, d_pad) f32
    lo,
    hi,
    store,
    raw,  # (cap, d_pad) f32 (dummy when rerank=False)
    valid,  # (cap,) bool
):
    """Quantize queries + chunked scan + exact rerank + final top-k, all in
    ONE device program (dispatch round-trips dominate batch latency)."""
    from cosdata_tpu.ops.storage import _quantize_batch, _rerank

    q = _quantize_batch(q_raw, lo, hi, kind, resolution, d_true)
    # no rerank downstream -> the scan itself must select exactly
    vals, ids = flat_scan_topk(
        metric, kind, d_pad, k_fetch, chunk, q, store, valid, exact=not rerank
    )
    if rerank:
        re = _rerank(metric, q_raw, raw, ids)
        re = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
        vals, pos = jax.lax.top_k(re, k)
        ids = jnp.take_along_axis(ids, pos, axis=1)
    else:
        vals, ids = vals[:, :k], ids[:, :k]
    ids = jnp.where(vals > NEG_INF / 2, ids, -1)
    return ids, vals
