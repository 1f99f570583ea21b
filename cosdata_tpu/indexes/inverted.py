"""Sparse (SPLADE-style) inverted index.

Re-design of the reference's power-of-4 trie of per-dimension quantized
posting lists (/root/reference/src/models/inverted_index.rs:39-367,
src/indexes/inverted/mod.rs) as flat host CSR arrays + device scoring
kernels:

- postings live in one flat array sorted by (dim asc, quantized bucket
  **desc**), so the reference's early-termination rule — low-valued query
  dims only scan the top buckets (sparse_ann_query.rs:89-126) — becomes a
  prefix slice of the dim's range.
- ingest is vectorized: adds only append numpy buffers (O(1) python work
  per document); the CSR folds pending postings in with one stable sort +
  two-run merge at flush/search time — never a per-(dim,value) python loop.
- value quantization: ``clamp((v / upper_bound) * maxval, 0, maxval)``
  truncated to u8 (inverted_index.rs:168-172).
- the values_upper_bound is auto-tuned from a sample histogram: smallest
  integer bound in 1..10 with <= clamp_margin_percent of values above it
  (inverted/mod.rs:194-247).
- scoring: sum of (quantized query value × stored bucket) per matching dim,
  exactly the reference's u32 dot product accumulation. Small collections
  use the dense scatter-add kernel; large ones the segment-sum kernel with
  O(B × gathered) memory (never O(B × n_cap)).
- optional exact re-rank against raw sparse pairs
  (inverted/mod.rs:296-381), factor × k candidates, vectorized over each
  query's candidates via searchsorted on the padded raw arrays.
- deletes are tombstones; postings of dead documents are compacted out at
  flush once they exceed a threshold.
"""

from __future__ import annotations

import math
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np


_PAD_MIN = 256

#: query-batch chunk for the segment-sum route (bounds the (B, PAD) sort)
SEG_QUERY_CHUNK = 256

#: below this capacity the nominate engine has no dense head to back it up
#: (HEAD_MIN_CAP) and measured recall_vs_exact drops to ~0.91; the
#: exhaustive rescore kernel is cheap here, so small corpora route to it
EXHAUSTIVE_MAX_CAP = 32768


def _next_pow2(x: int) -> int:
    return 1 << max(int(math.ceil(math.log2(max(x, 1)))), 0)


def tune_upper_bound(values: np.ndarray, clamp_margin_percent: float = 1.0) -> float:
    """Smallest bound in 1..10 with <= margin%% of sampled values above it
    (inverted/mod.rs:194-247)."""
    values = np.asarray(values, np.float32)
    n = max(values.size, 1)
    for bound in range(1, 10):
        above = float((values > bound).sum()) / n * 100.0
        if above <= clamp_margin_percent:
            return float(bound)
    return 10.0


def impact_segments_batch(
    b: int,
    qi: np.ndarray,  # (P,) int64 query index per pair, sorted ascending
    list_start: np.ndarray,  # (P,) int64 posting offset of each pair's list
    weights: np.ndarray,  # (P,) f32 impact weight == emission multiplier
    caps: np.ndarray,  # (P,) int64 max postings takeable from this pair
    cnt: np.ndarray,  # (L, NB+2) int32 cum table: cnt[l, t] = #vals bucket>=t
    cidx: np.ndarray,  # (P,) int64 row of each pair in `cnt`
    units: np.ndarray,  # (P,) f32 value width of one bucket (sparse: 1.0)
    nb: int,
    budget: int,
    segcap: int,
    conservative: bool,  # True: ceil (exact for integer values);
    #                      False: floor+1 (strict undercount, float values)
    pad_min: int = 16,
):
    """Vectorized impact-threshold scan-budget allocation + segment
    emission for a WHOLE query batch (VERDICT r2 weak #9: the per-query
    python bisection with per-iteration searchsorted dominated sparse/BM25
    dispatch time on the 1-core host).

    Keeps postings with impact ``weight_i * value >= T`` where T is
    bisected per query to the largest budget-feasible threshold — the
    greedy-optimal truncation frontier (sparse_ann_query.rs:89-126's
    early-termination principle made exact). Per-list cut counts come from
    precomputed per-list cumulative bucket-count tables, so each bisection
    step is one gather + one bincount over all (query, list) pairs at
    once. Leftover budget is spent greedily in pair order (pairs arrive
    sorted best-weight-first within each query).

    Returns (starts, lens, mults) as (B, maxd) arrays, -1/-0 padded.
    """
    P = len(qi)
    maxd0 = max(pad_min, 1)
    if P == 0:
        return (
            np.full((b, maxd0), -1, np.int32),
            np.zeros((b, maxd0), np.int32),
            np.zeros((b, maxd0), np.float32),
        )
    caps = caps.astype(np.int64)
    w = np.maximum(weights.astype(np.float64), 1e-30)
    units64 = np.maximum(units.astype(np.float64), 1e-30)
    # bisect T per query: feasible(T) = total cut postings <= budget,
    # monotone in T; the smallest feasible T keeps the most postings
    lo = np.zeros(b, np.float64)
    hi = np.full(b, float(np.max(w * units64 * nb)) + 1.0, np.float64)
    alloc = np.zeros(P, np.int64)  # cut at T=hi is 0: always feasible
    rows = cnt[cidx]  # (P, NB+2) gathered once
    for _ in range(36):
        mid = 0.5 * (lo + hi)
        x = mid[qi] / w / units64  # threshold in bucket units
        if conservative:
            t_idx = np.ceil(x)
        else:
            t_idx = np.floor(x) + 1.0
        t_idx = np.clip(t_idx, 0, nb + 1).astype(np.int64)
        cut = np.minimum(rows[np.arange(P), t_idx], caps)
        tot = np.bincount(qi, weights=cut, minlength=b)
        feas = tot <= budget
        fp = feas[qi]
        alloc = np.where(fp, cut, alloc)
        hi = np.where(feas, mid, hi)
        lo = np.where(feas, lo, mid)
    # spend leftover budget greedily in pair order (structural guarantee:
    # sum(alloc) <= budget per query both before and after the fill)
    room = caps - alloc
    cum_prev = np.cumsum(room) - room  # exclusive prefix over ALL pairs
    qstart = np.searchsorted(qi, np.arange(b))
    base = np.concatenate([cum_prev, [0]])[np.minimum(qstart, P - 1)]
    prev_in_q = cum_prev - base[qi]
    rem = budget - np.bincount(qi, weights=alloc, minlength=b)
    extra = np.clip(rem[qi] - prev_in_q, 0, room).astype(np.int64)
    alloc = alloc + extra
    # ---- segment emission (segcap-wide slices of each kept prefix) ----
    nseg = -(-alloc // segcap)
    per_q = np.bincount(qi, weights=nseg, minlength=b).astype(np.int64)
    maxd = max(pad_min, _next_pow2(int(per_q.max()) if len(per_q) else 1))
    total_segs = int(nseg.sum())
    starts_out = np.full((b, maxd), -1, np.int32)
    lens_out = np.zeros((b, maxd), np.int32)
    mults_out = np.zeros((b, maxd), np.float32)
    if total_segs == 0:
        return starts_out, lens_out, mults_out
    pair_idx = np.repeat(np.arange(P), nseg)
    within = np.arange(total_segs) - np.repeat(np.cumsum(nseg) - nseg, nseg)
    qi_seg = qi[pair_idx]
    qseg_first = np.searchsorted(qi_seg, np.arange(b))
    col = np.arange(total_segs) - qseg_first[qi_seg]
    starts_out[qi_seg, col] = (
        list_start[pair_idx] + within * segcap
    ).astype(np.int32)
    lens_out[qi_seg, col] = np.minimum(
        segcap, alloc[pair_idx] - within * segcap
    ).astype(np.int32)
    mults_out[qi_seg, col] = weights[pair_idx].astype(np.float32)
    return starts_out, lens_out, mults_out


def rescore_dispatch(
    starts, lens, csr_ids, doc_dims_dev, doc_vals_dev, q_idx, q_w,
    alive_dev, vocab_pad: int, top_k: int, segcap: int, dup_slack: int,
    n_cap: int, mults=None, csr_vals=None, aligned: bool = False,
):
    """Query-chunked dispatch of the candidate nominate+rescore kernel +
    host duplicate-collapse (shared by the sparse and BM25 indexes).

    Default engine: contribution nomination + exact rescore of the `nom`
    winners only (ops/sparse_kernels.nominate_rescore_topk) — 8 B of
    gather per budgeted posting instead of a full R-wide doc row per slot
    (the exhaustive kernel moved ~2 GB of sub-cacheline gathers per
    64-query dispatch: 2.2-24 s/batch measured, scripts/exp_r4_sparse.py).
    COSDATA_SPARSE_EXHAUSTIVE=1 restores the rescore-every-slot kernel
    (requires no mults/csr_vals); nomination width: COSDATA_SPARSE_NOM."""
    from cosdata_tpu.ops.sparse_kernels import (
        candidates_rescore_topk,
        nominate_rescore_topk,
    )

    b = len(starts)
    fetch = min(top_k * dup_slack, n_cap)
    r = doc_dims_dev.shape[1]
    maxd = starts.shape[1]
    exhaustive = (
        mults is None
        or csr_vals is None
        or os.environ.get("COSDATA_SPARSE_EXHAUSTIVE", "") == "1"
        # below the dense-head gate nothing restores accumulation recall
        # (contribution nomination alone measured 0.91-0.92 recall_vs_exact
        # at 8k-15k docs) while the exhaustive kernel is cheap at this
        # scale — its measured 2-24 s/batch cost only appears at 100k+ docs
        or n_cap < EXHAUSTIVE_MAX_CAP
    )
    # nomination width: every duplicate nomination (one doc hit by several
    # query dims) burns a slot, so scale nom with fetch (4x, not 2x: a doc
    # nominated by many query dims can burn that many slots) with a 512
    # floor; the final host dedup collapses the duplicates
    nom = int(os.environ.get("COSDATA_SPARSE_NOM", "0")) or min(
        max(4 * fetch, 512), n_cap
    )
    # right-size the dispatch to the batch: a fixed 256-row chunk made
    # every small dispatch pay the full (256, maxd*segcap) slot workspace
    # — measured b=1 at 574 ms and b=64 at 110 qps vs b=256 at 403 qps,
    # all three the SAME device cost (VERDICT r4 weak #5). Power-of-two
    # sizing keeps the compiled-shape set small (8..256 per maxd).
    chunk_q = min(SEG_QUERY_CHUNK, max(_next_pow2(b), 8))
    # bound BOTH workspaces: the (chunk_q, maxd*segcap) candidate-id
    # expansion (an unbounded-budget oracle at maxd=64k segments built
    # multi-GB iota intermediates and crashed the TPU worker) and the
    # (chunk_q, cand_chunk, R) gather blocks
    while chunk_q > 1 and chunk_q * maxd * segcap > (1 << 25):
        chunk_q //= 2
    gather_w = nom if not exhaustive else 16384
    while chunk_q > 8 and chunk_q * gather_w * r > (1 << 27):
        chunk_q //= 2
    cand_chunk = max(2048, min(16384, (1 << 27) // max(chunk_q * r, 1)))
    if b % chunk_q:
        grow = chunk_q - b % chunk_q
        starts = np.pad(starts, ((0, grow), (0, 0)), constant_values=-1)
        lens = np.pad(lens, ((0, grow), (0, 0)))
        q_idx = np.pad(q_idx, ((0, grow), (0, 0)), constant_values=-1)
        q_w = np.pad(q_w, ((0, grow), (0, 0)))
        if mults is not None:
            mults = np.pad(mults, ((0, grow), (0, 0)))
    outs = []
    for s in range(0, len(starts), chunk_q):
        e = s + chunk_q
        if exhaustive:
            outs.append(candidates_rescore_topk(
                jnp.asarray(starts[s:e]), jnp.asarray(lens[s:e]),
                csr_ids, doc_dims_dev, doc_vals_dev,
                jnp.asarray(q_idx[s:e]), jnp.asarray(q_w[s:e]),
                alive_dev, vocab_pad, fetch, segcap, cand_chunk,
                aligned=aligned,
            ))
        else:
            outs.append(nominate_rescore_topk(
                jnp.asarray(starts[s:e]), jnp.asarray(lens[s:e]),
                jnp.asarray(mults[s:e]), csr_ids, csr_vals,
                doc_dims_dev, doc_vals_dev,
                jnp.asarray(q_idx[s:e]), jnp.asarray(q_w[s:e]),
                alive_dev, vocab_pad, fetch, nom, segcap, 1 << 16,
                aligned=aligned,
            ))
    scores = np.concatenate([np.asarray(o[0]) for o in outs])[:b]
    ids = np.concatenate([np.asarray(o[1], np.int64) for o in outs])[:b]
    return _dedup_topk(ids, scores, top_k)


def _dedup_topk(ids: np.ndarray, scores: np.ndarray, top_k: int):
    """Collapse duplicate ids per row (identical exact scores from multi-
    dim nomination), keep rank order, return (ids, scores) at top_k.

    Sort-based O(b·k log k): the previous pairwise (b, k, k) matrix cost
    ~26M boolean cells per call at the head engine's 640-wide shortlists
    and dominated sparse/BM25 batch latency on the 1-core host."""
    b, kk = ids.shape
    rank = np.broadcast_to(np.arange(kk, dtype=np.int64), (b, kk))
    # sort by (id, rank): duplicates become adjacent, first occurrence first
    order_id = np.argsort(ids * np.int64(kk + 1) + rank, axis=1, kind="stable")
    ids_s = np.take_along_axis(ids, order_id, axis=1)
    dup_s = np.zeros((b, kk), bool)
    dup_s[:, 1:] = (ids_s[:, 1:] == ids_s[:, :-1]) & (ids_s[:, 1:] >= 0)
    keep = np.ones((b, kk), bool)
    np.put_along_axis(keep, order_id, ~dup_s, axis=1)
    order = np.argsort(~keep, axis=1, kind="stable")[:, :top_k]
    out_i = np.take_along_axis(ids, order, axis=1)
    out_s = np.take_along_axis(scores, order, axis=1)
    kept = np.take_along_axis(keep, order, axis=1)
    out_i = np.where(kept, out_i, -1)
    out_s = np.where(kept & (out_i >= 0), out_s, 0.0).astype(np.float32)
    if out_i.shape[1] < top_k:
        out_i = np.pad(out_i, ((0, 0), (0, top_k - out_i.shape[1])), constant_values=-1)
        out_s = np.pad(out_s, ((0, 0), (0, top_k - out_s.shape[1])))
    return out_i, out_s


def _merge_sorted(a_keys, a_vals: list, b_keys, b_vals: list):
    """Merge two key-sorted runs (stable: a before b on ties). Returns
    (keys, [vals...]) — O(n) placement + one searchsorted."""
    na, nb = len(a_keys), len(b_keys)
    if na == 0:
        return b_keys, b_vals
    if nb == 0:
        return a_keys, a_vals
    pos_a = np.arange(na) + np.searchsorted(b_keys, a_keys, side="left")
    pos_b = np.arange(nb) + np.searchsorted(a_keys, b_keys, side="right")
    out_keys = np.empty(na + nb, a_keys.dtype)
    out_keys[pos_a] = a_keys
    out_keys[pos_b] = b_keys
    outs = []
    for av, bv in zip(a_vals, b_vals):
        o = np.empty(na + nb, av.dtype)
        o[pos_a] = av
        o[pos_b] = bv
        outs.append(o)
    return out_keys, outs


class InvertedIndex:
    """Sparse index over (dim u32, value f32) pairs keyed by internal id."""

    COMPACT_THRESHOLD = 0.25

    def __init__(
        self,
        quantization: int = 64,  # 16|32|64|128|256 -> 4..8 bits (dtos.rs:98-128)
        sample_threshold: int = 1000,
        early_terminate_threshold: float = 0.0,  # config.toml:33
        clamp_margin_percent: float = 1.0,
        values_upper_bound: float | None = None,  # fixed -> skips sampling
        keep_raw: bool = True,
        scan_budget: int | None = None,
        scan_budget_total: int | None = None,
    ):
        if quantization not in (16, 32, 64, 128, 256):
            raise ValueError("quantization must be one of 16/32/64/128/256")
        self.bits = int(math.log2(quantization))
        self.maxval = (1 << self.bits) - 1
        self.sample_threshold = sample_threshold
        self.early_terminate_threshold = early_terminate_threshold
        self.clamp_margin_percent = clamp_margin_percent
        self.keep_raw = keep_raw
        self.is_configured = values_upper_bound is not None
        self.values_upper_bound = float(values_upper_bound or 1.0)
        self._sample: list[tuple[int, np.ndarray, np.ndarray]] = []
        #: guards the pending buffers AND the dirty flag: ingest appends
        #: under the collection lock while searches fold under the engine
        #: dispatch lock — two different lock domains, so the buffers need
        #: their own mutex (an unsynchronized read-then-clear in the fold
        #: would drop postings; a flag cleared after an unsynchronized fold
        #: would hide a concurrent append's postings until the next write).
        #: RLock: _build_csr holds it across fold + upload + flag clear.
        self._pend_lock = threading.RLock()
        # pending ingest buffers (vectorized; folded into the CSR at build)
        self._pend_docs: list[np.ndarray] = []
        self._pend_dims: list[np.ndarray] = []
        self._pend_buckets: list[np.ndarray] = []
        # host CSR sorted by key = dim*256 + (255 - bucket)
        self._h_keys = np.zeros(0, np.int64)
        self._h_ids = np.zeros(0, np.int32)
        self._h_buckets = np.zeros(0, np.int32)
        self._csr_range: dict[int, tuple[int, int]] = {}
        self.n_cap = 1024
        self._alive = np.ones(self.n_cap, bool)
        self._has_doc = np.zeros(self.n_cap, bool)
        self._alive_dev = None
        self.n = 0  # max internal id + 1 seen
        self.n_docs = 0
        self.live_docs = 0
        # raw pairs for exact rerank, padded (n_cap, max_nnz)
        self._raw_nnz = np.zeros(self.n_cap, np.int32)
        self._raw_max = 16
        self._raw_dims = np.zeros((self.n_cap, self._raw_max), np.int64)
        self._raw_vals = np.zeros((self.n_cap, self._raw_max), np.float32)
        # device CSR mirrors (built lazily at search/flush time)
        self._csr_dirty = True
        self._csr_ids = None  # (P,) int32 device
        self._csr_vals = None  # (P,) f32 device (bucket values)
        from cosdata_tpu.store.chunked import DirtyTracker

        #: dirty epochs: "raw" = per-doc raw rows, "csr" = flat CSR arrays
        self.tracker = DirtyTracker()
        #: per-(query, dim) device gather segment width
        self.SEGCAP = 512
        # operator-pinned budgets (ADVICE r2: the batch-adaptive budget
        # makes result quality depend on dispatch batch size — pinning
        # scan_budget == scan_budget_total/1 makes served results
        # deterministic under load at that operating point)
        if scan_budget is not None:
            self.SCAN_BUDGET = int(scan_budget)
        if scan_budget_total is not None:
            self.SCAN_BUDGET_TOTAL = int(scan_budget_total)
        # vectorized allocator tables (filled by _rebuild_ranges)
        self._dim_uniq = np.zeros(0, np.int64)
        self._dim_start = np.zeros(0, np.int64)
        self._dim_len = np.zeros(0, np.int64)
        self._dim_cnt = np.zeros((0, self.maxval + 2), np.int32)
        # dense-head engine state (filled by _rebuild_ranges/_ensure_head)
        self._head_col = np.zeros(0, np.int32)
        self._head_didx = np.zeros(0, np.int64)
        self._head_codes_dev = None
        self._head_gen = None

    # ----------------------------------------------------------------- write

    def quantize(self, v: np.ndarray) -> np.ndarray:
        """inverted_index.rs:168-172 (truncating cast, clamped)."""
        q = np.clip((v / self.values_upper_bound) * self.maxval, 0.0, self.maxval)
        return np.minimum(q.astype(np.int32), self.maxval)

    def add(self, internal_id: int, dims: np.ndarray, values: np.ndarray) -> None:
        dims = np.asarray(dims, np.int64)
        values = np.asarray(values, np.float32)
        if not self.is_configured:
            self._sample.append((internal_id, dims, values))
            if len(self._sample) >= self.sample_threshold:
                self._finalize_sampling()
            return
        self._insert(internal_id, dims, values)

    def add_batch(
        self,
        internal_ids: np.ndarray,
        flat_dims: np.ndarray,
        flat_values: np.ndarray,
        nnz: np.ndarray,
    ) -> None:
        """Vectorized bulk ingest: ``flat_dims/values`` are the concatenated
        per-doc pairs, ``nnz[i]`` the count of doc ``internal_ids[i]``. One
        quantize + one buffer append for the whole batch (the per-doc path
        costs ~0.2 ms of numpy small-op overhead per document; the reference
        fans docs across rayon workers instead — indexing_manager.rs:95-169)."""
        internal_ids = np.asarray(internal_ids, np.int64)
        flat_dims = np.asarray(flat_dims, np.int64)
        flat_values = np.asarray(flat_values, np.float32)
        nnz = np.asarray(nnz, np.int64)
        if not self.is_configured:
            off = 0
            for i, c in zip(internal_ids, nnz):
                self.add(int(i), flat_dims[off : off + c], flat_values[off : off + c])
                off += c
            return
        doc_of = np.repeat(internal_ids, nnz).astype(np.int32)
        q = self.quantize(flat_values)
        with self._pend_lock:
            self._pend_docs.append(doc_of)
            self._pend_dims.append(flat_dims)
            self._pend_buckets.append(q.astype(np.int32))
            self._csr_dirty = True
        hi = int(internal_ids.max()) if len(internal_ids) else -1
        if hi >= self.n:
            self.n = hi + 1
        if hi >= self.n_cap:
            self._grow_cap(hi + 1)
        if self.keep_raw:
            max_nnz = int(nnz.max()) if len(nnz) else 0
            if max_nnz > self._raw_max:
                new_max = _next_pow2(max_nnz)
                self._raw_dims = np.pad(
                    self._raw_dims, ((0, 0), (0, new_max - self._raw_max))
                )
                self._raw_vals = np.pad(
                    self._raw_vals, ((0, 0), (0, new_max - self._raw_max))
                )
                self._raw_max = new_max
            # padded (B, raw_max) rows, dim-sorted per row (pad key = +inf)
            bsz = len(internal_ids)
            dpad = np.full((bsz, self._raw_max), np.iinfo(np.int64).max, np.int64)
            vpad = np.zeros((bsz, self._raw_max), np.float32)
            rows = np.repeat(np.arange(bsz), nnz)
            offs = np.concatenate([[0], np.cumsum(nnz)[:-1]])
            cols = np.arange(len(flat_dims)) - np.repeat(offs, nnz)
            dpad[rows, cols] = flat_dims
            vpad[rows, cols] = flat_values
            order = np.argsort(dpad, axis=1, kind="stable")
            dpad = np.take_along_axis(dpad, order, axis=1)
            vpad = np.take_along_axis(vpad, order, axis=1)
            dpad[dpad == np.iinfo(np.int64).max] = 0
            self._raw_nnz[internal_ids] = nnz
            self._raw_dims[internal_ids] = dpad
            self._raw_vals[internal_ids] = vpad
            self.tracker.bump()
            self.tracker.mark_rows("raw", internal_ids)
        # count UNIQUE ids: a duplicate id in one batch would be counted
        # twice (both occurrences read _has_doc before either writes it),
        # permanently skewing the live/total ratio compaction keys on
        uniq = np.unique(internal_ids)
        new_doc = ~self._has_doc[uniq]
        revived = (~new_doc) & (~self._alive[uniq])
        self.n_docs += int(new_doc.sum())
        self.live_docs += int(new_doc.sum() + revived.sum())
        self._has_doc[uniq] = True
        self._alive[uniq] = True
        self._alive_dev = None

    def _finalize_sampling(self):
        if not self._sample:
            # nothing sampled yet: do NOT lock in the default upper bound —
            # a warm-up search or a sparse-less commit before the first
            # sparse upsert would otherwise permanently disable auto-tuning
            # (SPLADE values > 1.0 would all clamp to the top bucket)
            return
        all_vals = np.concatenate([v for _, _, v in self._sample])
        self.values_upper_bound = tune_upper_bound(all_vals, self.clamp_margin_percent)
        self.is_configured = True
        pending, self._sample = self._sample, []
        for iid, d, v in pending:
            self._insert(iid, d, v)

    def flush(self):
        """Index whatever is buffered even if the sample threshold wasn't hit
        (the reference configures on pre-commit as well, indexes/mod.rs:85-118),
        and compact tombstoned postings past the threshold."""
        if not self.is_configured:
            self._finalize_sampling()
        self._maybe_compact()

    def _grow_cap(self, need: int):
        new_cap = _next_pow2(need)
        grow = new_cap - self.n_cap
        self._alive = np.concatenate([self._alive, np.ones(grow, bool)])
        self._has_doc = np.concatenate([self._has_doc, np.zeros(grow, bool)])
        self._raw_nnz = np.concatenate([self._raw_nnz, np.zeros(grow, np.int32)])
        self._raw_dims = np.concatenate(
            [self._raw_dims, np.zeros((grow, self._raw_max), np.int64)]
        )
        self._raw_vals = np.concatenate(
            [self._raw_vals, np.zeros((grow, self._raw_max), np.float32)]
        )
        self.n_cap = new_cap
        self._alive_dev = None

    def _insert(self, internal_id: int, dims: np.ndarray, values: np.ndarray):
        internal_id = int(internal_id)
        nnz = len(dims)
        q = self.quantize(values)
        with self._pend_lock:
            self._pend_docs.append(np.full(nnz, internal_id, np.int32))
            self._pend_dims.append(dims.astype(np.int64))
            self._pend_buckets.append(q.astype(np.int32))
            self._csr_dirty = True
        if internal_id >= self.n:
            self.n = internal_id + 1
        if internal_id >= self.n_cap:
            self._grow_cap(internal_id + 1)
        if self.keep_raw:
            if nnz > self._raw_max:
                new_max = _next_pow2(nnz)
                self._raw_dims = np.pad(
                    self._raw_dims, ((0, 0), (0, new_max - self._raw_max))
                )
                self._raw_vals = np.pad(
                    self._raw_vals, ((0, 0), (0, new_max - self._raw_max))
                )
                self._raw_max = new_max
            order = np.argsort(dims, kind="stable")
            self._raw_nnz[internal_id] = nnz
            self._raw_dims[internal_id, :nnz] = dims[order]
            self._raw_vals[internal_id, :nnz] = values[order]
            self.tracker.bump()
            self.tracker.mark_range("raw", internal_id, internal_id + 1)
        if not self._has_doc[internal_id]:
            self._has_doc[internal_id] = True
            self.n_docs += 1
            self.live_docs += 1
        elif not self._alive[internal_id]:
            self.live_docs += 1
        if not self._alive[internal_id]:
            self._alive[internal_id] = True
            self._alive_dev = None

    def raw_pairs(self, internal_id: int) -> list | None:
        """Stored (dim, value) pairs of one live document (serves GET
        /vectors/{id} reconstruction; the host no longer duplicates them)."""
        internal_id = int(internal_id)
        if (
            not self.keep_raw
            or internal_id >= self.n_cap
            or not self._has_doc[internal_id]
            or not self._alive[internal_id]
        ):
            return None
        nnz = int(self._raw_nnz[internal_id])
        if nnz == 0:
            return None
        return [
            [int(d), float(v)]
            for d, v in zip(
                self._raw_dims[internal_id, :nnz],
                self._raw_vals[internal_id, :nnz],
            )
        ]

    def delete(self, internal_id: int) -> None:
        # the doc may still sit in the sampling buffer: purge it there too,
        # or _finalize_sampling would resurrect it as an undeletable ghost
        # (its external-id mapping is already gone)
        if self._sample:
            self._sample = [
                rec for rec in self._sample if rec[0] != internal_id
            ]
        if internal_id < self.n_cap:
            if self._has_doc[internal_id] and self._alive[internal_id]:
                self.live_docs -= 1
            self._alive[internal_id] = False
            self._alive_dev = None
            self._raw_nnz[internal_id] = 0

    def _maybe_compact(self):
        """Drop dead documents' postings from the CSR (vectorized filter)."""
        dead = self.n_docs - self.live_docs
        if self.n_docs == 0 or dead / self.n_docs < self.COMPACT_THRESHOLD:
            return
        self._fold_pending()
        keep = self._alive[self._h_ids]
        if not keep.all():
            self._h_keys = self._h_keys[keep]
            self._h_ids = self._h_ids[keep]
            self._h_buckets = self._h_buckets[keep]
            self.tracker.bump()
            self.tracker.mark_all("csr", max(len(self._h_keys), 1))
            self._rebuild_ranges()
            self._csr_ids = None  # force device re-upload
        self.n_docs = self.live_docs

    # ---------------------------------------------------------------- search

    def _fold_pending(self):
        """Merge pending postings into the sorted host CSR: one stable sort
        of the delta + a two-run merge — no per-dim python loops."""
        with self._pend_lock:
            if not self._pend_docs:
                return
            docs = np.concatenate(self._pend_docs)
            dims = np.concatenate(self._pend_dims)
            buckets = np.concatenate(self._pend_buckets)
            self._pend_docs, self._pend_dims, self._pend_buckets = [], [], []
        keys = dims * 256 + (255 - buckets)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        docs = docs[order]
        buckets = buckets[order]
        self._h_keys, (self._h_ids, self._h_buckets) = _merge_sorted(
            self._h_keys, [self._h_ids, self._h_buckets],
            keys, [docs, buckets],
        )
        self.tracker.bump()
        self.tracker.mark_all("csr", len(self._h_keys))
        self._rebuild_ranges()
        self._csr_ids = None

    def _rebuild_ranges(self):
        dims_sorted = self._h_keys >> 8
        uniq, starts, counts = np.unique(
            dims_sorted, return_index=True, return_counts=True
        )
        self._csr_range = {
            int(d): (int(s), int(c)) for d, s, c in zip(uniq, starts, counts)
        }
        # vectorized lookup arrays + per-dim cumulative bucket-count tables
        # (cnt[d, t] = postings of dim d with bucket >= t): the batch scan-
        # budget allocator cuts lists by impact threshold with one table
        # gather instead of per-query searchsorted bisections
        self._dim_uniq = uniq.astype(np.int64)
        self._dim_start = starts.astype(np.int64)
        self._dim_len = counts.astype(np.int64)
        nb = self.maxval + 1
        d_idx = np.repeat(np.arange(len(uniq), dtype=np.int64), counts)
        hist = np.bincount(
            d_idx * nb + self._h_buckets, minlength=len(uniq) * nb
        ).reshape(len(uniq), nb)
        cum = np.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        self._dim_cnt = np.concatenate(
            [cum, np.zeros((len(uniq), 1), cum.dtype)], axis=1
        ).astype(np.int32)
        self._select_head()

    #: dense-head engine knobs. Dims with df >= HEAD_MIN_DF become columns
    #: of a device-resident (Dh, n_cap) u8 matrix scored by MXU matmul —
    #: every posting of every head dim scanned with NO budget (the zipf
    #: heads are exactly the lists any scan budget truncates, VERDICT r2
    #: weak #4). Rare dims stay in the CSR; their short lists are gathered
    #: and rescored exactly. The head engages once the corpus is big
    #: enough for budget truncation to matter at all.
    HEAD_MIN_DF = 64
    HEAD_MIN_CAP = 32768
    HEAD_BYTES_MAX = 1 << 30
    HEAD_DH_MAX = 8192

    def _select_head(self):
        """Pick head dims from the df tables (called by _rebuild_ranges)."""
        uniq = self._dim_uniq
        self._head_col = np.full(len(uniq), -1, np.int32)
        self._head_didx = np.zeros(0, np.int64)
        if not self.keep_raw or self.n_cap < self.HEAD_MIN_CAP:
            return
        dh_cap = min(self.HEAD_DH_MAX, self.HEAD_BYTES_MAX // max(self.n_cap, 1))
        if dh_cap < 128:
            return
        cand = np.nonzero(self._dim_len >= self.HEAD_MIN_DF)[0]
        if len(cand) > dh_cap:
            top = cand[np.argsort(-self._dim_len[cand], kind="stable")[:dh_cap]]
            cand = np.sort(top)
        if not len(cand):
            return
        self._head_col[cand] = np.arange(len(cand), dtype=np.int32)
        self._head_didx = cand.astype(np.int64)

    def _ensure_head(self):
        """Build/refresh the device (Dh, n_cap) u8 dense head matrix."""
        gen = (
            self.tracker._epoch, len(self._dim_uniq), self.n_cap,
            len(self._h_keys),
        )
        if self._head_gen == gen:
            return
        hd = self._head_didx
        if not len(hd):
            self._head_codes_dev = None
            self._head_gen = gen
            return
        dh_pad = max(_next_pow2(len(hd)), 128)
        mat = np.zeros((dh_pad, self.n_cap), np.uint8)
        # requantize the RAW values at the full 255-level u8 range: the
        # head matrix is a nomination structure of this design, not a
        # parity surface — the index's own maxval (as low as 15) wastes
        # 4-16x of the byte's precision and measurably costs nomination
        # recall on tie-dense corpora. Same clamp semantics as quantize().
        docs = np.repeat(
            np.arange(self.n_cap, dtype=np.int64), self._raw_nnz
        )
        rmask = (
            np.arange(self._raw_max)[None, :] < self._raw_nnz[:, None]
        )
        rdims = self._raw_dims[rmask]
        rvals = np.maximum(self._raw_vals[rmask], 0.0)
        pos = np.searchsorted(self._dim_uniq, rdims)
        safe = np.minimum(pos, max(len(self._dim_uniq) - 1, 0))
        cols = self._head_col[safe]
        sel = (cols >= 0) & (self._dim_uniq[safe] == rdims)
        # a doc may repeat a dim (scoring sums the contributions — same
        # np.add.at semantics as the exact rescore): group-sum duplicate
        # (col, doc) cells before quantizing, a plain assignment would
        # keep only the last value
        keys = cols[sel].astype(np.int64) * self.n_cap + docs[sel]
        uk, inv_idx = np.unique(keys, return_inverse=True)
        sums = np.bincount(inv_idx, weights=rvals[sel].astype(np.float64))
        q255 = np.minimum(
            (sums / self.values_upper_bound) * 255.0, 255.0
        ).astype(np.uint8)
        mat.reshape(-1)[uk] = q255
        self._head_codes_dev = jnp.asarray(mat)
        self._head_gen = gen

    #: duplicate-candidate slack for the gather-rescore kernel: a doc
    #: nominated by several query dims occupies that many shortlist slots
    #: (identical exact scores) before the host dedup
    DUP_SLACK = 8

    def _ensure_doc_rows(self):
        """Device copies of the padded raw rows for the gather-rescore
        scoring path: dims translated to compact CSR indices (searchsorted
        against _dim_uniq) so the kernel's dense query rows stay vocab-
        compact regardless of raw dim-id range."""
        if getattr(self, "_doc_rows_gen", None) == (
            self.tracker._epoch, len(self._dim_uniq)
        ):
            return
        dd = np.minimum(
            np.searchsorted(self._dim_uniq, self._raw_dims),
            max(len(self._dim_uniq) - 1, 0),
        ).astype(np.int32)
        self._doc_dims_dev = jnp.asarray(dd)
        # negatives clip to 0: the reference's sparse space is non-negative
        # (quantize clamps at 0, inverted_index.rs:168-172) — raw rescore
        # keeps that semantic while restoring full value precision
        self._doc_vals_dev = jnp.asarray(
            np.maximum(self._raw_vals, 0.0).astype(np.float32)
        )
        self._doc_rows_gen = (self.tracker._epoch, len(self._dim_uniq))

    def _build_csr(self):
        """Fold pending postings and upload the device CSR if stale."""
        if not (self._csr_dirty or self._csr_ids is None):
            return
        # hold the pend lock across fold + upload + flag clear: an append
        # landing between an unlocked fold and the flag clear would be
        # hidden (flag overwritten False with data still pending)
        with self._pend_lock:
            if self._csr_dirty or self._csr_ids is None:
                self._fold_pending()
                if len(self._h_ids) == 0:
                    self._csr_ids = None
                else:
                    # 128-ALIGNED device layout: every dim's list starts
                    # at a GATHER_LANE multiple (pad id -1 / val 0), so
                    # the kernels fetch postings at row grain — a
                    # scalar-grain gather of the same slots measured
                    # 232.6 ms vs 14.1 ms as 128-wide rows
                    # (scripts/exp_r5_gather.py); <=12% upload overhead
                    from cosdata_tpu.ops.sparse_kernels import GATHER_LANE

                    lane = GATHER_LANE
                    counts = self._dim_len
                    padc = -(-counts // lane) * lane
                    starts_pad = np.concatenate(
                        [[0], np.cumsum(padc)]
                    )[:-1].astype(np.int64)
                    total = int(padc.sum())
                    ids_pad = np.full(total, -1, np.int32)
                    vals_pad = np.zeros(total, np.float32)
                    within = np.arange(len(self._h_ids)) - np.repeat(
                        self._dim_start, counts
                    )
                    dst = np.repeat(starts_pad, counts) + within
                    ids_pad[dst] = self._h_ids
                    vals_pad[dst] = self._h_buckets.astype(np.float32)
                    self._dim_start_dev = starts_pad
                    self._csr_ids = jnp.asarray(ids_pad)
                    self._csr_vals = jnp.asarray(vals_pad)
                    self._csr_aligned = True
                self._csr_dirty = False

    #: per-query total posting-scan budget, distributed over the query's
    #: present dims (each dim gets >= one segment, <= MAX_DIM_POSTINGS).
    #: Postings are stored value-bucket descending, so truncation keeps the
    #: highest-contribution postings — the reference's early-termination
    #: principle (sparse_ann_query.rs:68-147) applied unconditionally:
    #: without a bound a zipf-head dim (hundreds of thousands of postings)
    #: blows the gathered-workspace bound for the whole batch. 64k postings
    #: per query keeps the device kernel in the sub-100 ms class at 500k
    #: docs; raise it (or enable rerank_sparse_with_raw_values) for
    #: maximum-fidelity scoring.
    SCAN_BUDGET = 65536
    #: total postings per DISPATCH — small batches split this among fewer
    #: queries, so a lone REST query scans up to 4M postings (near-oracle)
    #: at the same device workspace as a 64-query batch at 64k each
    SCAN_BUDGET_TOTAL = 64 * 65536
    MAX_DIM_POSTINGS = 16384

    @staticmethod
    def _impact_alloc(weights, sorted_vals, lengths, budget, segcap, maxper):
        """Budget-feasible per-list prefix lengths keeping the globally
        highest-IMPACT postings.

        A posting's score contribution is weight_i * value (qqv*bucket for
        sparse, idf*tf for BM25); `sorted_vals[i]` is descending, so
        "impact >= T" is a per-list prefix cut at value >= T/weight_i.
        Binary-search the largest budget-feasible threshold T — the
        greedy-optimal truncation frontier across lists (the reference's
        early-termination principle, sparse_ann_query.rs:89-126, made
        exact) — instead of allocating per-list LENGTHS blind to query
        weights. Leftover budget is spent round-robin in list order, one
        segcap chunk at a time."""
        if sum(min(l, maxper) for l in lengths) <= budget:
            return [min(l, maxper) for l in lengths]
        heads = [
            w * float(v[0]) for w, v in zip(weights, sorted_vals) if len(v)
        ]
        lo, hi = 0.0, (max(heads) if heads else 0.0) + 1.0
        # negate ONCE outside the bisection (ADVICE r2: -v inside the loop
        # materialized every list 24x per query)
        neg_vals = [np.negative(v) for v in sorted_vals]
        # initialize with the most restrictive cut so the returned alloc is
        # structurally budget-feasible even if no probed mid lands feasible
        alloc = [0 for _ in lengths]
        for _ in range(24):
            mid = (lo + hi) / 2
            total = 0
            cuts = []
            for w, nv, l in zip(weights, neg_vals, lengths):
                if w <= 0.0:
                    cuts.append(0)
                    continue
                c = int(np.searchsorted(nv, -(mid / w), side="right"))
                c = min(c, l, maxper)
                cuts.append(c)
                total += c
            if total <= budget:
                alloc = cuts
                hi = mid
            else:
                lo = mid
        rem = budget - sum(alloc)
        while rem >= 1:
            grew = False
            for i in range(len(alloc)):
                cap = min(lengths[i], maxper)
                if alloc[i] < cap:
                    step = min(segcap, cap - alloc[i], rem)
                    if step > 0:
                        alloc[i] += step
                        rem -= step
                        grew = True
                if rem < 1:
                    break
            if not grew:
                break
        return alloc

    def _effective_budget(self, batch: int) -> int:
        """Per-query scan budget for a dispatch of `batch` queries.

        The device workspace is batch x budget postings (the scoring
        kernel query-chunks to a fixed footprint either way), so what is
        actually bounded is the TOTAL scan per dispatch. Small dispatches
        — the REST single-query path above all — can therefore afford a
        far larger per-query budget at the same device cost: a lone query
        scans near-oracle while a 64-query batch keeps today's per-query
        bound. SCAN_BUDGET stays the floor so large batches are unchanged."""
        return max(self.SCAN_BUDGET, self.SCAN_BUDGET_TOTAL // max(batch, 1))

    def _query_segments(self, pairs, budget=None) -> list[tuple[int, int, float]]:
        """One query -> [(start, len, multiplier)] segment descriptors
        (back-compat/test shim over the vectorized batch path)."""
        starts, lens, mults = self._segments_batch([pairs], budget or self.SCAN_BUDGET)
        return [
            (int(s), int(l), float(m))
            for s, l, m in zip(starts[0], lens[0], mults[0])
            if s >= 0 and l > 0
        ]

    def _segments_batch(self, queries, budget: int, exclude_head: bool = False):
        """All queries' segment descriptors in one vectorized numpy pass
        (per-query python loops measured as the sparse dispatch bottleneck
        on the 1-core host — VERDICT r2 weak #9). Dims are ranked by query
        value within each query; the scan budget is a HARD per-query bound
        allocated by impact thresholding (see impact_segments_batch)."""
        b = len(queries)
        counts = np.asarray([len(q) for q in queries], np.int64)
        if counts.sum() == 0 or len(self._dim_uniq) == 0:
            maxd = max(_PAD_MIN // 16, 1)
            return (
                np.full((b, maxd), -1, np.int32),
                np.zeros((b, maxd), np.int32),
                np.zeros((b, maxd), np.float32),
            )
        qi = np.repeat(np.arange(b), counts)
        flat = np.concatenate(
            [np.asarray(q, np.float64).reshape(-1, 2) for q in queries if len(q)]
        )
        dims = flat[:, 0].astype(np.int64)
        vals = flat[:, 1].astype(np.float32)
        qqv = self.quantize(vals).astype(np.int64)
        pos = np.searchsorted(self._dim_uniq, dims)
        safe = np.minimum(pos, len(self._dim_uniq) - 1)
        # zero-multiplier pairs contribute nothing to any score (the
        # reference accumulates qv*bucket too) — drop rather than spend
        # budget gathering postings multiplied by 0
        ok = (self._dim_uniq[safe] == dims) & (qqv > 0)
        if exclude_head and len(self._head_col):
            # head dims are scanned in FULL by the dense-head matmul; their
            # postings must not consume (or blow) the tail scan budget
            ok &= self._head_col[safe] < 0
        if not ok.any():
            maxd = max(_PAD_MIN // 16, 1)
            return (
                np.full((b, maxd), -1, np.int32),
                np.zeros((b, maxd), np.int32),
                np.zeros((b, maxd), np.float32),
            )
        qi, didx, qqv = qi[ok], safe[ok], qqv[ok]
        # early termination: low-valued query dims only scan the top value
        # buckets (sparse_ann_query.rs:89-126); thresholds scale by the
        # actual max bucket (maxval), not 2^bits
        low_threshold = int(self.early_terminate_threshold * self.maxval)
        etv = min(int(self.maxval * self.early_terminate_threshold), self.maxval)
        base_len = self._dim_len[didx]
        eff = np.where(
            qqv <= low_threshold,
            np.minimum(base_len, self._dim_cnt[didx, etv]),
            base_len,
        )
        # the per-dim cap scales with the budget: at an elevated
        # (small-batch) budget a fixed ceiling would silently keep the
        # scan truncated even with budget to spare
        maxper = max(self.MAX_DIM_POSTINGS, budget // 8)
        caps = np.minimum(eff, maxper)
        order = np.lexsort((-qqv, qi))  # best query value first per query
        qi, didx, qqv, caps = qi[order], didx[order], qqv[order], caps[order]
        # emitted segment offsets address the ALIGNED device CSR
        dev_start = getattr(self, "_dim_start_dev", None)
        if dev_start is None:
            dev_start = self._dim_start
        return impact_segments_batch(
            b, qi, dev_start[didx], qqv.astype(np.float32), caps,
            self._dim_cnt, didx, np.ones(len(qi), np.float32),
            self.maxval, budget, self.SEGCAP, conservative=True,
            pad_min=_PAD_MIN // 16,
        )

    def search(
        self,
        queries: list[list[tuple[int, float]]],
        top_k: int = 10,
        rerank: bool = False,
        rerank_factor: int = 5,  # config.toml:5 sparse_raw_values_reranking_factor
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch search. Returns (ids (B, k), scores (B, k)), -1 padded."""
        b = len(queries)
        if b == 0:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        # finalize BEFORE the emptiness check: docs buffered below the
        # sample threshold keep self.n == 0 until sampling finalizes
        if not self.is_configured:
            self._finalize_sampling()
        if self.n == 0:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        self._build_csr()
        if self._csr_ids is None:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        if self._alive_dev is None:
            self._alive_dev = jnp.asarray(self._alive)
        k_fetch = min(top_k * (rerank_factor if rerank else 1), self.n_cap)
        budget = self._effective_budget(b)
        use_head = bool(len(self._head_didx))
        starts, lens, mults = self._segments_batch(
            queries, budget, exclude_head=use_head
        )
        if use_head:
            # dense-head + CSR-tail engine: head dims scanned fully on the
            # MXU, tail candidates gathered + rescored, union rescored
            # exactly from raw rows (see _search_head)
            return self._search_head(queries, starts, lens, mults, top_k)
        if self.keep_raw:
            # gather-rescore path: budgeted prefixes nominate candidates,
            # each scored EXACTLY from its raw row — no scatter, and the
            # optional raw rerank is subsumed (scores already exact)
            out_ids, scores = self._rescore_csr(
                queries, starts, lens, mults, top_k
            )
            return out_ids, scores
        out_ids, scores = _score_csr(
            starts, lens, mults, self._csr_ids, self._csr_vals,
            self._alive_dev, self.n_cap, k_fetch, self.SEGCAP,
            aligned=getattr(self, "_csr_aligned", False),
        )
        out_ids, scores = out_ids[:, :top_k], scores[:, :top_k]
        return out_ids, scores

    def _rescore_csr(self, queries, starts, lens, mults, top_k):
        """Device dispatch of the candidate gather-rescore kernel, query-
        chunked to a bounded workspace, + host duplicate-collapse."""
        self._ensure_doc_rows()
        b = len(queries)
        vocab_pad = max(_next_pow2(len(self._dim_uniq)), 128)
        # query dim translation + raw weights (exact scoring uses RAW
        # query values — quantization exists only for posting layout)
        counts = np.asarray([len(q) for q in queries], np.int64)
        qd_max = max(_next_pow2(int(counts.max()) if len(counts) else 1), 8)
        q_idx = np.full((b, qd_max), -1, np.int32)
        q_w = np.zeros((b, qd_max), np.float32)
        for i, q in enumerate(queries):
            if not len(q):
                continue
            arr = np.asarray(q, np.float64).reshape(-1, 2)
            dims = arr[:, 0].astype(np.int64)
            vals = arr[:, 1].astype(np.float32)
            pos = np.searchsorted(self._dim_uniq, dims)
            safe = np.minimum(pos, len(self._dim_uniq) - 1)
            ok = self._dim_uniq[safe] == dims
            kk = min(int(ok.sum()), qd_max)
            q_idx[i, :kk] = safe[ok][:kk]
            q_w[i, :kk] = np.maximum(vals[ok][:kk], 0.0)  # non-neg space
        return rescore_dispatch(
            starts, lens, self._csr_ids, self._doc_dims_dev,
            self._doc_vals_dev, q_idx, q_w, self._alive_dev, vocab_pad,
            top_k, self.SEGCAP, self.DUP_SLACK, self.n_cap,
            mults=mults, csr_vals=self._csr_vals,
            aligned=getattr(self, "_csr_aligned", False),
        )

    #: nomination width multiplier: each source (head matmul, tail gather)
    #: contributes max(NOMINATE*k, 64) candidates to the exact final rescore.
    #: 8x: nomination ranks in QUANTIZED space (u8 head codes / bucketed
    #: postings), and tie-dense zipf corpora need slack for quantized
    #: near-ties to survive into the exact rescore (measured: 4x lost
    #: ~1/10 of oracle top-10 at 1.5k docs; the rescore is exact, so extra
    #: width costs only gather rows)
    NOMINATE = 8

    def _search_head(self, queries, starts, lens, mults, top_k):
        """Dense-head + CSR-tail search.

        1. Head nomination: q_head @ head_codes on the MXU — every posting
           of every high-df dim scored, no budget (quantized semantics:
           qqv x bucket, inverted_index.rs:168-172 / sparse_ann_query.rs).
        2. Tail nomination: budgeted short-list gather + EXACT raw-row
           rescore (candidates_rescore_topk) — tail candidates arrive
           already exactly ranked.
        3. Final: exact raw rescore of the union, host dedup, top-k.
        """
        from cosdata_tpu.ops.sparse_kernels import (
            head_matmul_topk,
            rescore_ids_topk,
        )

        self._ensure_doc_rows()
        self._ensure_head()
        b = len(queries)
        bp = max(_next_pow2(b), 8)  # compile-shape stability
        if self._alive_dev is None:
            self._alive_dev = jnp.asarray(self._alive)
        dh_pad = self._head_codes_dev.shape[0]
        vocab_pad = max(_next_pow2(len(self._dim_uniq)), 128)
        counts = np.asarray([len(q) for q in queries], np.int64)
        qd_max = max(_next_pow2(int(counts.max()) if len(counts) else 1), 8)
        q_idx = np.full((bp, qd_max), -1, np.int32)
        q_w = np.zeros((bp, qd_max), np.float32)
        q_head = np.zeros((bp, dh_pad), np.float32)
        for i, q in enumerate(queries):
            if not len(q):
                continue
            arr = np.asarray(q, np.float64).reshape(-1, 2)
            dims = arr[:, 0].astype(np.int64)
            vals = np.maximum(arr[:, 1].astype(np.float32), 0.0)
            pos = np.searchsorted(self._dim_uniq, dims)
            safe = np.minimum(pos, max(len(self._dim_uniq) - 1, 0))
            ok = self._dim_uniq[safe] == dims
            kk = min(int(ok.sum()), qd_max)
            q_idx[i, :kk] = safe[ok][:kk]
            q_w[i, :kk] = vals[ok][:kk]
            hc = self._head_col[safe[ok]]
            hsel = hc >= 0
            # RAW query values (not qqv): the doc side is already bucketed,
            # quantizing the query too would double the nomination error
            # for free — exactness of the final rescore is unaffected
            np.add.at(q_head[i], hc[hsel], vals[ok][hsel])
        if bp > b:
            starts = np.pad(starts, ((0, bp - b), (0, 0)), constant_values=-1)
            lens = np.pad(lens, ((0, bp - b), (0, 0)))
            mults = np.pad(mults, ((0, bp - b), (0, 0)))
        nom = int(min(max(self.NOMINATE * top_k, 64), self.n_cap))
        chunk = min(self.n_cap, 1 << 16)
        aligned = getattr(self, "_csr_aligned", False)
        maxd = starts.shape[1]
        r = self._doc_dims_dev.shape[1]
        nom_width = min(max(4 * nom, 512), self.n_cap)
        exhaustive = os.environ.get("COSDATA_SPARSE_EXHAUSTIVE", "") == "1"
        fits_one = (
            not exhaustive
            and bp <= SEG_QUERY_CHUNK
            and bp * maxd * self.SEGCAP <= (1 << 25)
            and bp * nom_width * r <= (1 << 27)
        )
        if fits_one:
            # ONE device program: head matmul + tail nomination + union +
            # exact rescore (the 3-program shape host-hopped the id sets —
            # 2 extra sync round trips per search, the b<=64 latency floor)
            from cosdata_tpu.ops.sparse_kernels import (
                head_tail_union_rescore,
            )

            f_sc, f_ids = head_tail_union_rescore(
                jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(mults),
                self._csr_ids, self._csr_vals, self._doc_dims_dev,
                self._doc_vals_dev, jnp.asarray(q_idx), jnp.asarray(q_w),
                jnp.asarray(q_head), self._head_codes_dev, self._alive_dev,
                vocab_pad, top_k, nom, nom_width, self.SEGCAP, 1 << 16,
                chunk, aligned,
            )
            out_i, out_s = _dedup_topk(
                np.asarray(f_ids, np.int64), np.asarray(f_sc), top_k
            )
            return out_i[:b], out_s[:b]
        h_sc, h_ids = head_matmul_topk(
            jnp.asarray(q_head), self._head_codes_dev, self._alive_dev,
            nom, chunk,
        )
        t_ids, _t_sc = rescore_dispatch(
            starts, lens, self._csr_ids, self._doc_dims_dev,
            self._doc_vals_dev, q_idx, q_w, self._alive_dev, vocab_pad,
            nom, self.SEGCAP, self.DUP_SLACK, self.n_cap,
            mults=mults, csr_vals=self._csr_vals,
            aligned=aligned,
        )
        cand = np.concatenate(
            [np.asarray(h_ids, np.int64), t_ids], axis=1
        ).astype(np.int32)
        fetch = min(2 * top_k, cand.shape[1])
        f_sc, f_ids = rescore_ids_topk(
            jnp.asarray(cand), self._doc_dims_dev, self._doc_vals_dev,
            jnp.asarray(q_idx), jnp.asarray(q_w), self._alive_dev,
            vocab_pad, fetch,
        )
        out_i, out_s = _dedup_topk(
            np.asarray(f_ids, np.int64), np.asarray(f_sc), top_k
        )
        return out_i[:b], out_s[:b]

    def _rerank(self, queries, cand_ids, top_k):
        """Exact dot on raw sparse pairs (inverted/mod.rs:331-381) —
        vectorized per query over all its candidates (raw dims are stored
        sorted, so the sparse dot is one searchsorted + masked sum)."""
        b, kk = cand_ids.shape
        out_i = np.full((b, top_k), -1, np.int64)
        out_s = np.zeros((b, top_k), np.float32)
        for qi, q in enumerate(queries):
            if not len(q):
                continue
            qd = np.asarray([int(d) for d, _ in q], np.int64)
            qv = np.asarray([float(v) for _, v in q], np.float32)
            qo = np.argsort(qd, kind="stable")
            qd, qv = qd[qo], qv[qo]
            cids = cand_ids[qi]
            cids = cids[cids >= 0]
            if not len(cids):
                continue
            cd = self._raw_dims[cids]  # (C, MAXNNZ) sorted per row
            cv = self._raw_vals[cids]
            nnz = self._raw_nnz[cids][:, None]
            pos = np.searchsorted(qd, cd)
            pos_c = np.minimum(pos, len(qd) - 1)
            hit = (qd[pos_c] == cd) & (
                np.arange(cd.shape[1])[None, :] < nnz
            )
            scores = (np.where(hit, qv[pos_c], 0.0) * cv).sum(axis=1)
            order = np.argsort(-scores, kind="stable")[:top_k]
            out_i[qi, : len(order)] = cids[order]
            out_s[qi, : len(order)] = scores[order]
        return out_i, out_s


def _score_csr(starts, lens, mults, csr_ids, csr_vals, alive_dev,
               n_cap: int, k_fetch: int, segcap: int,
               aligned: bool = False):
    """Route by gathered width, query-chunked so one kernel's footprint
    stays bounded. Narrow gathers (rare/discriminative query dims, the
    realistic retrieval shape) take the sort+segment-sum kernel: no
    n_cap-sized buffers, no scatter. Wide gathers (zipf-head dims at the
    scan budget) take scatter-accumulate into (chunk, n_cap) score rows at
    ~2^26 elements. Both are the reference's FxHashMap walk
    (sparse_ann_query.rs:89-126) batched onto the device."""
    from cosdata_tpu.ops.sparse_kernels import (
        csr_accumulate_topk,
        csr_segment_topk,
    )

    b, maxd = starts.shape
    pad = maxd * segcap
    # sort+segment-sum only off-TPU: lax.sort along a 16k+ axis takes tens
    # of minutes to compile for TPU, while XLA:CPU handles it instantly;
    # on TPU the scatter kernel wins at every width
    segment_route = pad <= (1 << 16) and jax.default_backend() != "tpu"
    chunk = min(SEG_QUERY_CHUNK, _next_pow2(b))
    while chunk > 8 and (chunk * pad > (1 << 25) or (
        not segment_route and chunk * n_cap > (1 << 26)
    )):
        chunk //= 2
    if b % chunk:  # pad to a chunk multiple: one compiled shape per maxd
        grow = chunk - b % chunk
        starts = np.pad(starts, ((0, grow), (0, 0)), constant_values=-1)
        lens = np.pad(lens, ((0, grow), (0, 0)))
        mults = np.pad(mults, ((0, grow), (0, 0)))
    outs = []
    for s in range(0, len(starts), chunk):
        e = s + chunk
        if segment_route:
            outs.append(
                csr_segment_topk(
                    jnp.asarray(starts[s:e]), jnp.asarray(lens[s:e]),
                    jnp.asarray(mults[s:e]), csr_ids, csr_vals, alive_dev,
                    k_fetch, segcap, aligned=aligned,
                )
            )
            continue
        outs.append(
            csr_accumulate_topk(
                jnp.asarray(starts[s:e]), jnp.asarray(lens[s:e]),
                jnp.asarray(mults[s:e]), csr_ids, csr_vals, alive_dev,
                n_cap, k_fetch, segcap, aligned=aligned,
            )
        )
    scores = np.concatenate([np.asarray(o[0]) for o in outs])[:b]
    out_ids = np.concatenate([np.asarray(o[1], np.int64) for o in outs])[:b]
    return out_ids, scores
