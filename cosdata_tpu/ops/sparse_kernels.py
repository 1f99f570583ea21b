"""Sparse scoring kernels: gather + scatter-accumulate + top-k.

The reference accumulates per-query dot products in a FxHashMap while
walking posting lists (/root/reference/src/models/sparse_ann_query.rs:89-126)
and BM25 scores via a BinaryHeap k-way merge (:182-232). TPU-native both
become one kernel: the host ships (start, len, mult) posting-segment
descriptors; the device gathers the HBM-resident postings, scatter-adds
into per-query dense score rows, and runs top-k. Accumulation order differs
from the k-way merge but the sums are identical up to f32 association.

Memory is bounded by query-chunking in the caller: a (chunk, n_cap) f32
score block plus the gathered postings. A sort+segment-sum variant was
tried for large n_cap and rejected: a single-axis sort over the gathered
width (10^5-10^6) takes tens of minutes to compile for TPU and executes no
faster than the scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cosdata_tpu.ops.topk import NEG_INF

#: posting-gather lane width: CSR uploads pad every list start to this
#: boundary so kernels fetch postings as (LANE,)-wide ROWS. TPU gathers
#: are latency-bound at element grain — 16.8M int32 slots measured
#: 232.6 ms scalar-grain vs 14.1 ms as 131k x 128 rows (16.5x,
#: scripts/exp_r5_gather.py)
GATHER_LANE = 128


def _score_doc_rows(dd, dv, q_dim_idx, q_weights):
    """Exact score Σ_j qv[dim_j]·val_j for gathered candidate doc rows
    WITHOUT the per-element qdense lookup: `take_along_axis` over the
    (B, vocab_pad) dense query rows is an element-grain gather (8.4M
    lookups per 256x512x64 rescore — the same latency-bound class as the
    posting gathers, scripts/exp_r5_gather.py). Instead accumulate over
    the <=QD query dims with broadcast compares — pure VPU elementwise,
    QD x (B, C, R) ops, no gather at all.

    dd: (B, C, R) int32 compact doc-dim ids (0-padded rows);
    dv: (B, C, R) f32 doc values (0-padded);
    q_dim_idx: (B, QD) int32 (-1 pad); q_weights: (B, QD) f32.
    Duplicate query dims sum, matching the qdense scatter-add semantics.
    Returns (B, C) f32 scores."""
    b, c, _r = dd.shape
    qd = q_dim_idx.shape[1]

    def body(t, acc):
        qi = jax.lax.dynamic_slice_in_dim(q_dim_idx, t, 1, axis=1)
        qw = jax.lax.dynamic_slice_in_dim(q_weights, t, 1, axis=1)
        live = qi[:, :, None] >= 0
        m = (dd == qi[:, :, None]) & live
        contrib = jnp.sum(jnp.where(m, dv, 0.0), axis=-1)  # (B, C)
        return acc + qw * contrib

    return jax.lax.fori_loop(0, qd, body, jnp.zeros((b, c), jnp.float32))


def _gather_segments(starts, lens, post_ids, post_vals, segcap: int,
                     aligned: bool):
    """Gather (B, MAXD, segcap) posting ids+vals for segment descriptors.

    ``aligned=True`` (the index built a 128-aligned CSR: every list start
    is a GATHER_LANE multiple and padding slots carry id -1 / val 0)
    fetches at row grain — the 16.5x path above; otherwise falls back to
    the element-grain gather. Returns (ids, vals, valid), each
    (B, MAXD, segcap); ids/vals are garbage where ~valid."""
    b, maxd = starts.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, segcap), 2)
    valid = (iota < lens[:, :, None]) & (starts[:, :, None] >= 0)
    p = post_ids.shape[0]
    lane = GATHER_LANE
    if aligned and segcap % lane == 0 and p % lane == 0:
        nrow = segcap // lane
        riota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nrow), 2)
        rows = jnp.clip(
            starts[:, :, None] // lane + riota, 0, p // lane - 1
        )
        ids = post_ids.reshape(-1, lane)[rows].reshape(b, maxd, segcap)
        vals = (
            post_vals.reshape(-1, lane)[rows].reshape(b, maxd, segcap)
            if post_vals is not None else None
        )
        return ids, vals, valid
    idx = starts[:, :, None] + iota
    safe = jnp.clip(idx, 0, p - 1)
    return (
        post_ids[safe],
        post_vals[safe] if post_vals is not None else None,
        valid,
    )


@functools.partial(
    jax.jit, static_argnames=("n_cap", "k", "segcap", "aligned")
)
def csr_accumulate_topk(
    starts: jax.Array,  # (B, MAXD) int32 posting offsets (-1 = unused slot)
    lens: jax.Array,  # (B, MAXD) int32 segment lengths (<= segcap)
    mults: jax.Array,  # (B, MAXD) f32 per-segment multiplier (qqv or idf)
    post_ids: jax.Array,  # (P,) int32 device-resident posting vector ids
    post_vals: jax.Array,  # (P,) f32 device-resident posting values
    alive: jax.Array,  # (n_cap,) bool tombstone mask
    n_cap: int,
    k: int,
    segcap: int,
    aligned: bool = False,
):
    """Returns (scores (B, k), ids (B, k)) — ids are -1 where no candidate."""
    b, maxd = starts.shape
    g_ids, g_vals, valid = _gather_segments(
        starts, lens, post_ids, post_vals, segcap, aligned
    )
    ids = jnp.where(valid, g_ids, -1).reshape(b, maxd * segcap)
    contrib = jnp.where(valid, mults[:, :, None] * g_vals, 0.0)
    contrib = contrib.reshape(b, maxd * segcap)
    scores = jnp.zeros((b, n_cap), jnp.float32)
    safe_ids = jnp.maximum(ids, 0)
    vals = jnp.where(ids >= 0, contrib, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 0)
    scores = scores.at[rows, safe_ids].add(vals)
    # hit-count via add (a scatter-set with mixed True/False duplicates would
    # be nondeterministic for the padded id-0 lanes)
    hits = jnp.zeros((b, n_cap), jnp.int32).at[rows, safe_ids].add(
        (ids >= 0).astype(jnp.int32)
    )
    masked = jnp.where((hits > 0) & alive[None, :], scores, NEG_INF)
    chunk = 1 << 16
    if n_cap <= chunk:
        top_s, top_i = jax.lax.top_k(masked, k)
    else:
        # chunked running top-k: lax.top_k over a 10^5-10^6-wide row is
        # seconds on TPU (full-sort lowering); per-chunk approx_max_k +
        # exact merge is the flat_scan pattern and runs in milliseconds.
        # n_cap is always a power of two (see _grow_cap), so it divides.
        def body(c, carry):
            t_s, t_i = carry
            start = c * chunk
            blk = jax.lax.dynamic_slice_in_dim(masked, start, chunk, axis=1)
            c_s, c_i = jax.lax.approx_max_k(blk, min(k, chunk),
                                            recall_target=0.99)
            c_i = c_i + start
            all_s = jnp.concatenate([t_s, c_s], axis=1)
            all_i = jnp.concatenate([t_i, c_i], axis=1)
            t_s, pos = jax.lax.top_k(all_s, k)
            t_i = jnp.take_along_axis(all_i, pos, axis=1)
            return t_s, t_i

        init = (
            jnp.full((b, k), NEG_INF, jnp.float32),
            jnp.full((b, k), -1, jnp.int32),
        )
        top_s, top_i = jax.lax.fori_loop(0, n_cap // chunk, body, init)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_pad", "k_fetch", "nom", "segcap", "slot_chunk", "aligned",
    ),
)
def nominate_rescore_topk(
    starts: jax.Array,  # (B, MAXD) int32 posting-segment offsets (-1 unused)
    lens: jax.Array,  # (B, MAXD) int32 segment lengths (<= segcap)
    mults: jax.Array,  # (B, MAXD) f32 per-segment multiplier (qqv or idf)
    post_ids: jax.Array,  # (P,) int32 posting doc ids
    post_vals: jax.Array,  # (P,) f32 posting values (bucketed/tf)
    doc_dims: jax.Array,  # (n_cap, R) int32 COMPACT dim idx per doc, 0-pad
    doc_vals: jax.Array,  # (n_cap, R) f32 raw values per doc, 0-padded
    q_dim_idx: jax.Array,  # (B, QD) int32 compact idx of query dims (-1 pad)
    q_weights: jax.Array,  # (B, QD) f32 query weight per dim (qv / idf)
    alive: jax.Array,  # (n_cap,) bool
    vocab_pad: int,
    k_fetch: int,
    nom: int,
    segcap: int,
    slot_chunk: int,
    aligned: bool = False,
):
    """Contribution-nominated candidate set + EXACT raw-row rescore.

    candidates_rescore_topk gathers a full (R-wide, ~0.5 KB) doc row for
    EVERY budgeted posting slot — ~2 GB of sub-cacheline random gathers
    per 64-query dispatch at the 65536-posting budget, measured 2.2 s
    (sparse) / 24 s (BM25) per batch on-chip (scripts/exp_r4_sparse.py).
    This kernel nominates first and gathers rows only for the winners:

    1. per-slot contribution = mult * post_val (8 B of gather per slot —
       the impact ordering the budget allocator already truncates by,
       sparse_ann_query.rs:89-126's early-termination weight);
    2. global top-`nom` contributions per query select candidate docs
       (their posting lists are value-descending, so this is exactly a
       WAND-style merge of list prefixes at threshold = the nom-th best
       contribution);
    3. only those `nom` docs get the (R-wide) exact raw-row rescore —
       score = Σ_j qdense[dim_j]·val_j, identical to the exhaustive
       kernel for every nominated doc.

    A true top-k doc is missed only if ALL its per-posting contributions
    rank below the nom-th best while its sum still makes top-k; `nom` >>
    k*dup_slack absorbs that (duplicates: a doc nominated by several dims
    occupies that many nomination slots; the caller dedups after).

    Returns (scores (B, k_fetch), ids (B, k_fetch)).
    """
    b, maxd = starts.shape
    g_ids, g_vals, valid = _gather_segments(
        starts, lens, post_ids, post_vals, segcap, aligned
    )
    ids = jnp.where(valid, g_ids, -1).reshape(b, maxd * segcap)
    contrib = jnp.where(
        valid, mults[:, :, None] * g_vals, NEG_INF
    ).reshape(b, maxd * segcap)
    contrib = jnp.where(
        (ids >= 0) & alive[jnp.maximum(ids, 0)], contrib, NEG_INF
    )
    p = ids.shape[1]
    pad = (-p) % slot_chunk
    if pad:
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        contrib = jnp.pad(contrib, ((0, 0), (0, pad)), constant_values=NEG_INF)
    n_chunks = ids.shape[1] // slot_chunk
    nom_eff = min(nom, slot_chunk)

    def body(c, carry):
        top_s, top_i = carry
        c_contrib = jax.lax.dynamic_slice_in_dim(
            contrib, c * slot_chunk, slot_chunk, axis=1
        )
        c_ids = jax.lax.dynamic_slice_in_dim(
            ids, c * slot_chunk, slot_chunk, axis=1
        )
        if jax.default_backend() == "tpu":
            c_s, c_pos = jax.lax.approx_max_k(
                c_contrib, nom_eff, recall_target=0.99
            )
        else:
            # approx_max_k compiles pathologically slowly on XLA:CPU
            c_s, c_pos = jax.lax.top_k(c_contrib, nom_eff)
        c_i = jnp.take_along_axis(c_ids, c_pos, axis=1)
        all_s = jnp.concatenate([top_s, c_s], axis=1)
        all_i = jnp.concatenate([top_i, c_i], axis=1)
        top_s, pos = jax.lax.top_k(all_s, nom_eff)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    init = (
        jnp.full((b, nom_eff), NEG_INF, jnp.float32),
        jnp.full((b, nom_eff), -1, jnp.int32),
    )
    _nom_s, nom_ids = jax.lax.fori_loop(0, n_chunks, body, init)
    # exact rescore of the nominated docs only (broadcast-compare — see
    # _score_doc_rows; the qdense take_along_axis was gather-latency-bound)
    safe_c = jnp.maximum(nom_ids, 0)
    dd = doc_dims[safe_c]  # (B, nom, R)
    dv = doc_vals[safe_c]
    sc = _score_doc_rows(dd, dv, q_dim_idx, q_weights)
    ok = (nom_ids >= 0) & alive[safe_c]
    sc = jnp.where(ok, sc, NEG_INF)
    kf = min(k_fetch, nom_eff)
    top_s, pos = jax.lax.top_k(sc, kf)
    top_i = jnp.take_along_axis(nom_ids, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    if kf < k_fetch:
        top_i = jnp.pad(
            top_i, ((0, 0), (0, k_fetch - kf)), constant_values=-1
        )
        top_s = jnp.pad(top_s, ((0, 0), (0, k_fetch - kf)))
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_pad", "k_fetch", "segcap", "cand_chunk", "aligned",
    ),
)
def candidates_rescore_topk(
    starts: jax.Array,  # (B, MAXD) int32 posting-segment offsets (-1 unused)
    lens: jax.Array,  # (B, MAXD) int32 segment lengths (<= segcap)
    post_ids: jax.Array,  # (P,) int32 posting doc ids (candidate source)
    doc_dims: jax.Array,  # (n_cap, R) int32 COMPACT dim idx per doc, 0-pad
    doc_vals: jax.Array,  # (n_cap, R) f32 raw values per doc, 0-padded
    q_dim_idx: jax.Array,  # (B, QD) int32 compact idx of query dims (-1 pad)
    q_weights: jax.Array,  # (B, QD) f32 query weight per dim (qv / idf)
    alive: jax.Array,  # (n_cap,) bool
    vocab_pad: int,
    k_fetch: int,
    segcap: int,
    cand_chunk: int,
    aligned: bool = False,
):
    """Candidate gather + EXACT raw-row rescore + top-k, no scatter.

    The r2 scatter-accumulate kernel throttled at ~4-8M scatter-adds/s on
    TPU (scatter lowers to serialized updates) AND scored in quantized
    buckets. This formulation inverts the access pattern: the budgeted
    posting prefixes only *nominate candidates*; each candidate doc's
    score is computed exactly as Σ_j qdense[dim_j] · val_j over its OWN
    raw row — two gathers and a multiply-reduce, fully parallel on the
    VPU, with scores equal to the unquantized oracle for every candidate
    (the reference's rerank_sparse_with_raw_values, inverted/mod.rs:331-381,
    promoted to the only scoring path). Duplicate candidates (a doc
    nominated by several dims) carry identical scores; the caller fetches
    k*dup_slack and dedups on host.

    Returns (scores (B, k_fetch), ids (B, k_fetch)).
    """
    b, maxd = starts.shape
    # candidate ids from the budgeted posting prefixes
    g_ids, _g_vals, valid = _gather_segments(
        starts, lens, post_ids, None, segcap, aligned
    )
    cand = jnp.where(valid, g_ids, -1).reshape(b, maxd * segcap)
    p = cand.shape[1]
    pad = (-p) % cand_chunk
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
    n_chunks = cand.shape[1] // cand_chunk
    r = doc_dims.shape[1]

    def body(c, carry):
        top_s, top_i = carry
        ids_c = jax.lax.dynamic_slice_in_dim(
            cand, c * cand_chunk, cand_chunk, axis=1
        )
        safe_c = jnp.maximum(ids_c, 0)
        dd = doc_dims[safe_c]  # (B, PC, R)
        dv = doc_vals[safe_c]  # (B, PC, R)
        # exact raw score, broadcast-compare (see _score_doc_rows)
        sc = _score_doc_rows(dd, dv, q_dim_idx, q_weights)
        ok = (ids_c >= 0) & alive[safe_c]
        sc = jnp.where(ok, sc, NEG_INF)
        if jax.default_backend() == "tpu":
            # dropped candidates here are FINAL losses (no later rerank
            # widens the set), so select at 0.99 — the caller's k*dup_slack
            # over-fetch absorbs the remainder (ADVICE r3)
            c_s, c_pos = jax.lax.approx_max_k(
                sc, min(k_fetch, cand_chunk), recall_target=0.99
            )
        else:
            # approx_max_k compiles pathologically slowly on XLA:CPU
            # (same reason head_matmul_topk gates it)
            c_s, c_pos = jax.lax.top_k(sc, min(k_fetch, cand_chunk))
        c_i = jnp.take_along_axis(ids_c, c_pos, axis=1)
        all_s = jnp.concatenate([top_s, c_s], axis=1)
        all_i = jnp.concatenate([top_i, c_i], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k_fetch)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    init = (
        jnp.full((b, k_fetch), NEG_INF, jnp.float32),
        jnp.full((b, k_fetch), -1, jnp.int32),
    )
    top_s, top_i = jax.lax.fori_loop(0, n_chunks, body, init)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "segcap", "aligned"))
def csr_segment_topk(
    starts: jax.Array,  # (B, MAXD) int32 posting offsets (-1 = unused slot)
    lens: jax.Array,  # (B, MAXD) int32 segment lengths (<= segcap)
    mults: jax.Array,  # (B, MAXD) f32 per-segment multiplier
    post_ids: jax.Array,  # (P,) int32
    post_vals: jax.Array,  # (P,) f32
    alive: jax.Array,  # (n_cap,) bool
    k: int,
    segcap: int,
    aligned: bool = False,
):
    """Sort + segment-sum CSR scoring for SMALL gathered widths (the router
    caps pad at 65536): O(B x gathered) with no n_cap-sized buffers and no
    scatter — the fast route for discriminative (rare-dim) queries, where
    the budgeted gather is a few thousand postings. Wide pads must use the
    scatter kernel instead: a 10^5+-wide single-axis sort takes tens of
    minutes to compile for TPU."""
    b, maxd = starts.shape
    g_ids, g_vals, valid = _gather_segments(
        starts, lens, post_ids, post_vals, segcap, aligned
    )
    ids = jnp.where(valid, g_ids, -1).reshape(b, maxd * segcap)
    contrib = jnp.where(valid, mults[:, :, None] * g_vals, 0.0)
    contrib = contrib.reshape(b, maxd * segcap)
    pad = ids.shape[1]
    # group equal ids per row (-1 padding sorts first)
    ids_s, contrib_s = jax.lax.sort((ids, contrib), dimension=1, num_keys=1)
    csum = jnp.cumsum(contrib_s, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, ids_s.shape, 1)
    first = jnp.concatenate(
        [jnp.ones((b, 1), bool), ids_s[:, 1:] != ids_s[:, :-1]], axis=1
    )
    last = jnp.concatenate(
        [ids_s[:, :-1] != ids_s[:, 1:], jnp.ones((b, 1), bool)], axis=1
    )
    # cummax, not associative_scan: same inclusive running max, but
    # associative_scan's traced log-depth network compiles pathologically
    # on the TPU backend (never finished at 4.2M in the hnsw reverse pass,
    # scripts/probe_compile.py; this one is only B x 65536 but the same
    # lowering) — cummax uses the dedicated cumulative-op path
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0), axis=1)
    before = jnp.where(
        seg_start > 0,
        jnp.take_along_axis(csum, jnp.maximum(seg_start - 1, 0), axis=1),
        0.0,
    )
    total = csum - before
    ok = last & (ids_s >= 0) & alive[jnp.maximum(ids_s, 0)]
    scores = jnp.where(ok, total, NEG_INF)
    top_s, pos2 = jax.lax.top_k(scores, min(k, pad))
    top_i = jnp.take_along_axis(ids_s, pos2, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    if top_i.shape[1] < k:
        top_i = jnp.pad(top_i, ((0, 0), (0, k - top_i.shape[1])), constant_values=-1)
        top_s = jnp.pad(top_s, ((0, 0), (0, k - top_s.shape[1])))
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def head_matmul_topk(
    q_head: jax.Array,  # (B, Dh) f32 query weights over head dims (0 absent)
    head_codes: jax.Array,  # (Dh, n_cap) u8 dense head matrix (0 = no posting)
    alive: jax.Array,  # (n_cap,) bool
    k: int,
    chunk: int,
):
    """Candidate nomination over the DENSE HEAD of the inverted index.

    High-document-frequency dims are exactly the ones whose posting lists
    blow any scan budget (the reference truncates them via early
    termination, sparse_ann_query.rs:89-126, trading recall). TPU-native
    they become a dense (Dh, n_cap) u8 matrix scanned by MXU matmul —
    every posting of every head dim is scored on every query with NO
    budget, no gather, no scatter: scores = q_head @ head_codes, chunked
    along n_cap with a running exact top-k merge (the flat_scan pattern).

    Returns (scores (B, k) f32, ids (B, k) int32) — head-part scores only;
    the caller rescores nominated candidates exactly from raw rows.
    """
    b = q_head.shape[0]
    dh, n_cap = head_codes.shape
    qh = q_head.astype(jnp.bfloat16)

    def body(c, carry):
        top_s, top_i = carry
        blk = jax.lax.dynamic_slice(head_codes, (0, c * chunk), (dh, chunk))
        sc = jax.lax.dot_general(
            qh,
            blk.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, chunk)
        al = jax.lax.dynamic_slice(alive, (c * chunk,), (chunk,))
        # score 0 = no overlap with any head dim (buckets >= 0, weights
        # >= 0): not a candidate, same "contributes nothing" semantics as
        # the posting walk
        sc = jnp.where(al[None, :] & (sc > 0), sc, NEG_INF)
        if jax.default_backend() == "tpu":
            # hardware windowed-max shortlist; recall-uncritical (the
            # shortlist is exact-reranked downstream)
            c_s, c_pos = jax.lax.approx_max_k(
                sc, min(k, chunk), recall_target=0.95
            )
        else:
            # approx_max_k compiles pathologically slowly on XLA:CPU
            # (~2 min at chunk 4096 — the flat_scan router avoids it off-
            # TPU for the same reason)
            c_s, c_pos = jax.lax.top_k(sc, min(k, chunk))
        c_i = c_pos.astype(jnp.int32) + c * chunk
        all_s = jnp.concatenate([top_s, c_s], axis=1)
        all_i = jnp.concatenate([top_i, c_i], axis=1)
        top_s, pos = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    init = (
        jnp.full((b, k), NEG_INF, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    top_s, top_i = jax.lax.fori_loop(0, n_cap // chunk, body, init)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    return top_s, top_i


@functools.partial(jax.jit, static_argnames=("vocab_pad", "k"))
def rescore_ids_topk(
    cand: jax.Array,  # (B, C) int32 candidate doc ids (-1 = empty slot)
    doc_dims: jax.Array,  # (n_cap, R) int32 compact dim idx per doc, 0-pad
    doc_vals: jax.Array,  # (n_cap, R) f32 raw values per doc, 0-padded
    q_dim_idx: jax.Array,  # (B, QD) int32 compact idx of query dims (-1 pad)
    q_weights: jax.Array,  # (B, QD) f32 query weight per dim (qv / idf)
    alive: jax.Array,  # (n_cap,) bool
    vocab_pad: int,
    k: int,
):
    """EXACT raw-row rescore of an explicit (small) candidate set.

    score(doc) = sum_j qdense[dim_j] * val_j over the doc's own row —
    the reference's rerank_sparse_with_raw_values (inverted/mod.rs:331-381)
    applied to the union of head-matmul and tail-gather nominations.
    Duplicate candidate ids carry identical scores; the caller dedups.

    Returns (scores (B, k) f32, ids (B, k) int32).
    """
    b, c = cand.shape
    safe_c = jnp.maximum(cand, 0)
    dd = doc_dims[safe_c]  # (B, C, R)
    dv = doc_vals[safe_c]  # (B, C, R)
    # exact raw score, broadcast-compare (see _score_doc_rows)
    sc = _score_doc_rows(dd, dv, q_dim_idx, q_weights)
    ok = (cand >= 0) & alive[safe_c]
    sc = jnp.where(ok, sc, NEG_INF)
    top_s, pos = jax.lax.top_k(sc, min(k, c))
    top_i = jnp.take_along_axis(cand, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    if top_i.shape[1] < k:
        top_i = jnp.pad(
            top_i, ((0, 0), (0, k - top_i.shape[1])), constant_values=-1
        )
        top_s = jnp.pad(top_s, ((0, 0), (0, k - top_s.shape[1])))
    return top_s, top_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "vocab_pad", "top_k", "nom_out", "nom_width", "segcap",
        "slot_chunk", "head_chunk", "aligned",
    ),
)
def head_tail_union_rescore(
    starts: jax.Array,  # (B, MAXD) int32 tail posting-segment offsets
    lens: jax.Array,  # (B, MAXD) int32
    mults: jax.Array,  # (B, MAXD) f32
    post_ids: jax.Array,  # (P,) int32
    post_vals: jax.Array,  # (P,) f32
    doc_dims: jax.Array,  # (n_cap, R) int32
    doc_vals: jax.Array,  # (n_cap, R) f32
    q_dim_idx: jax.Array,  # (B, QD) int32
    q_weights: jax.Array,  # (B, QD) f32
    q_head: jax.Array,  # (B, Dh) f32
    head_codes: jax.Array,  # (Dh, n_cap) u8
    alive: jax.Array,  # (n_cap,) bool
    vocab_pad: int,
    top_k: int,
    nom_out: int,
    nom_width: int,
    segcap: int,
    slot_chunk: int,
    head_chunk: int,
    aligned: bool,
):
    """ONE program for the dense-head + CSR-tail engine: head matmul
    nomination, tail contribution nomination + exact rescore, union, and
    the final exact raw-row rescore — all device-side. The previous
    3-program shape DOWNLOADED both nomination id sets to the host,
    concatenated, and re-uploaded: two extra sync round trips (~33 ms
    each on the tunnel) that dominated the b<=64 light-load latencies
    (VERDICT r5 ask #7). Tail duplicates in the union carry identical
    exact scores; the caller's host dedup collapses them.

    Returns (scores (B, min(2*top_k, 2*nom_out)), ids (..)) — fused-
    nomination union ranked by exact score.
    """
    _h_sc, h_ids = head_matmul_topk(
        q_head, head_codes, alive, nom_out, head_chunk
    )
    _t_sc, t_ids = nominate_rescore_topk(
        starts, lens, mults, post_ids, post_vals, doc_dims, doc_vals,
        q_dim_idx, q_weights, alive, vocab_pad, nom_out, nom_width,
        segcap, slot_chunk, aligned=aligned,
    )
    cand = jnp.concatenate([h_ids, t_ids], axis=1)
    fetch = min(2 * top_k, cand.shape[1])
    return rescore_ids_topk(
        cand, doc_dims, doc_vals, q_dim_idx, q_weights, alive,
        vocab_pad, fetch,
    )
