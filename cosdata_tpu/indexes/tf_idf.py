"""TF-IDF / BM25 full-text index.

Re-design of the reference's hash-sharded trie of term postings
(/root/reference/src/indexes/tf_idf/mod.rs:48-389,
src/models/tf_idf_index.rs) as host postings + the device
scatter-accumulate/top-k kernel:

- documents: tokenize → stopword → snowball stem → xxhash32 term ids, BM25
  term frequency with k1/b precomputed at index time (mod.rs:310-371).
- average document length auto-tuned by sampling (mod.rs:177-207).
- query scoring: score(doc) = Σ_t idf(t) × tf_stored(doc, t) with
  idf = ln1p((N - df + 0.5)/(df + 0.5)) (sparse_ann_query.rs:298-302).
  The reference approximates top-k through 512 doc-id buckets
  (sparse_ann_query.rs:182-232); we compute the exact dense top-k — same
  scores, strictly better candidate retention.
"""

from __future__ import annotations

import math
import os

import jax.numpy as jnp
import numpy as np

from dataclasses import dataclass, field

from cosdata_tpu.indexes.inverted import _next_pow2, _PAD_MIN
from cosdata_tpu.text.processing import count_tokens, process_text, process_text_query


@dataclass
class _Postings:
    """Per-term posting list (doc ids, appended in insert order)."""

    ids: list = field(default_factory=list)


def get_idf(documents_count: int, documents_containing_term: int) -> float:
    """sparse_ann_query.rs:298-302 (ln_1p form)."""
    return math.log1p(
        (documents_count - documents_containing_term + 0.5)
        / (documents_containing_term + 0.5)
    )


class TFIDFIndex:
    def __init__(
        self,
        k1: float = 1.2,
        b: float = 0.75,
        sample_threshold: int = 1000,
        max_token_len: int = 40,
        average_document_length: float | None = None,  # fixed -> skip sampling
        scan_budget: int | None = None,
        scan_budget_total: int | None = None,
    ):
        self.k1 = float(k1)
        self.b = float(b)
        self.max_token_len = max_token_len
        self.sample_threshold = sample_threshold
        self.is_configured = average_document_length is not None
        self.average_document_length = float(average_document_length or 1.0)
        self._sample: list[tuple[int, str]] = []
        self._sample_len_sum = 0
        self._postings: dict[int, _Postings] = {}  # term -> (doc_ids, tf-bits)
        self._tfs: dict[int, list[float]] = {}
        self.total_documents = 0
        # live accounting so idf doesn't drift under churn (deletes/upserts):
        # df and N in get_idf must count live documents only
        self.live_documents = 0
        self.n_cap = 1024
        self._alive = np.ones(self.n_cap, bool)
        self._has_doc = np.zeros(self.n_cap, bool)
        self._alive_dev = None
        self.n = 0
        # device-resident CSR of (doc_id, tf) postings
        self._csr_dirty = True
        self._df_dirty = False
        self._csr_ids = None
        self._h_tfs = np.zeros(0, np.float32)
        self._csr_vals = None
        self._csr_range: dict[int, tuple[int, int]] = {}
        self._live_df: dict[int, int] = {}
        self.SEGCAP = 512
        #: per-query total and per-term posting-scan budgets (see
        #: _build_csr: postings are tf-descending so the cut keeps the
        #: strongest candidates)
        self.SCAN_BUDGET = 65536
        #: total postings per DISPATCH (see InvertedIndex._effective_budget
        #: — small batches split this among fewer queries)
        self.SCAN_BUDGET_TOTAL = 64 * 65536
        self.MAX_TERM_POSTINGS = 16384
        # operator-pinned budgets (see InvertedIndex: pinning both makes
        # served quality independent of dispatch batch size)
        if scan_budget is not None:
            self.SCAN_BUDGET = int(scan_budget)
        if scan_budget_total is not None:
            self.SCAN_BUDGET_TOTAL = int(scan_budget_total)
        # vectorized allocator tables (filled by _build_csr)
        self._term_sorted = np.zeros(0, np.int64)
        self._term_start = np.zeros(0, np.int64)
        self._term_len = np.zeros(0, np.int64)
        self._term_heads = np.zeros(0, np.float32)
        self._live_df_arr = np.zeros(0, np.int64)
        self._tf_cnt = np.zeros((0, self.TF_BUCKETS + 2), np.int32)
        self._csr_term_idx = np.zeros(0, np.int64)
        self._h_ids_sorted = np.zeros(0, np.int32)
        #: dead fraction that triggers posting compaction at flush
        COMPACT = 0.25
        self.COMPACT_THRESHOLD = COMPACT

    # ----------------------------------------------------------------- write

    def add(self, internal_id: int, text: str) -> None:
        if not self.is_configured:
            self._sample.append((internal_id, text))
            self._sample_len_sum += count_tokens(text, self.max_token_len)
            if len(self._sample) >= self.sample_threshold:
                self._finalize_sampling()
            return
        self._insert(internal_id, text)

    def _finalize_sampling(self):
        if not self._sample:
            # nothing sampled: do NOT lock avgdl at the 1.0 default — a
            # warm-up search or a text-less commit before the first text
            # upsert would permanently deflate every later document's
            # BM25 tf (avgdl is baked into stored tfs at insert time)
            return
        self.average_document_length = self._sample_len_sum / len(self._sample)
        self.is_configured = True
        pending, self._sample = self._sample, []
        for iid, text in pending:
            self._insert(iid, text)

    def flush(self):
        if not self.is_configured:
            self._finalize_sampling()
        self._maybe_compact()

    def _insert(self, internal_id: int, text: str):
        internal_id = int(internal_id)
        pairs = process_text(
            text, self.max_token_len, self.average_document_length, self.k1, self.b
        )
        for term, tf in pairs:
            p = self._postings.get(term)
            if p is None:
                p = self._postings[term] = _Postings()
                self._tfs[term] = []
            p.ids.append(internal_id)
            self._tfs[term].append(tf)
        self._csr_dirty = True
        if internal_id >= self.n:
            self.n = internal_id + 1
        if internal_id >= self.n_cap:
            new_cap = _next_pow2(internal_id + 1)
            self._alive = np.concatenate(
                [self._alive, np.ones(new_cap - self.n_cap, bool)]
            )
            self._has_doc = np.concatenate(
                [self._has_doc, np.zeros(new_cap - self.n_cap, bool)]
            )
            self.n_cap = new_cap
            self._alive_dev = None
        # document accounting: don't double-count a re-added id, and
        # resurrect its alive bit (a deleted-then-readded id was masked
        # out of results forever while still counted live). NB: the
        # collection always allocates a FRESH internal id per upsert;
        # re-adding a previously deleted id through this low-level API
        # leaves its stale postings until the next compaction.
        new_doc = not self._has_doc[internal_id]
        if new_doc:
            self.total_documents += 1
            self.live_documents += 1
        elif not self._alive[internal_id]:
            self.live_documents += 1
        if not self._alive[internal_id]:
            self._alive[internal_id] = True
            self._alive_dev = None
            self._df_dirty = True
        self._has_doc[internal_id] = True

    def delete(self, internal_id: int) -> None:
        # purge from the sampling buffer too — _finalize_sampling would
        # otherwise resurrect the doc as an undeletable ghost
        if self._sample:
            kept = []
            for rec in self._sample:
                if rec[0] == internal_id:
                    self._sample_len_sum -= count_tokens(
                        rec[1], self.max_token_len
                    )
                else:
                    kept.append(rec)
            self._sample = kept
        if internal_id < self.n_cap:
            if self._has_doc[internal_id] and self._alive[internal_id]:
                self.live_documents -= 1
                self._df_dirty = True
            self._alive[internal_id] = False
            self._alive_dev = None

    def _maybe_compact(self):
        """Drop dead entries from the host postings once they exceed the
        threshold (runs at flush, like the dense index's maybe_compact)."""
        dead = self.total_documents - self.live_documents
        if self.total_documents == 0 or dead / self.total_documents < self.COMPACT_THRESHOLD:
            return
        for term in list(self._postings):
            p = self._postings[term]
            ids = np.asarray(p.ids, np.int64)
            keep = self._alive[ids]
            if keep.all():
                continue
            if not keep.any():
                del self._postings[term]
                del self._tfs[term]
                continue
            p.ids = ids[keep].tolist()
            self._tfs[term] = [
                t for t, k in zip(self._tfs[term], keep) if k
            ]
        self.total_documents = self.live_documents
        self._csr_dirty = True

    # ---------------------------------------------------------------- search

    def _build_csr(self):
        """Upload postings as one flat device CSR; rebuilt per indexed txn.

        Per-term postings are ordered tf-descending (one global lexsort) so
        the per-term scan budget keeps the highest-tf documents — the same
        cut-the-tail principle as the sparse index's bucket-descending
        layout (sparse_ann_query.rs early termination)."""
        if not self._csr_dirty:
            return
        ids_parts, val_parts, term_lens = [], [], []
        terms = sorted(self._postings.keys())  # sorted: vectorized lookup
        self._csr_range = {}
        for term in terms:
            p = self._postings[term]
            ids = np.asarray(p.ids, np.int32)
            ids_parts.append(ids)
            val_parts.append(np.asarray(self._tfs[term], np.float32))
            term_lens.append(len(ids))
        if not ids_parts or sum(term_lens) == 0:
            self._csr_ids = None
            self._csr_dirty = False
            self._live_df = {}
            self._term_sorted = np.zeros(0, np.int64)
            return
        flat_ids = np.concatenate(ids_parts)
        flat_tfs = np.concatenate(val_parts)
        term_idx = np.repeat(np.arange(len(terms)), term_lens)
        order = np.lexsort((-flat_tfs, term_idx))
        pos = 0
        for t, term in enumerate(terms):
            self._csr_range[term] = (pos, term_lens[t])
            pos += term_lens[t]
        # host copy of the per-term tf-descending values + vectorized
        # lookup arrays for the batch scan-budget allocator
        self._h_tfs = flat_tfs[order]
        self._h_ids_sorted = flat_ids[order]
        self._term_sorted = np.asarray(terms, np.int64)
        self._term_len = np.asarray(term_lens, np.int64)
        self._term_start = np.concatenate(
            [[0], np.cumsum(self._term_len)[:-1]]
        ).astype(np.int64)
        self._csr_term_idx = term_idx[order]
        # per-term cumulative tf-bucket counts: cnt[t, i] = postings with
        # tf-bucket >= i, bucket = floor(tf / head * NB). The allocator
        # cuts lists at tf >= T/idf via one table gather (undercounting
        # inside the boundary bucket keeps the budget bound structural)
        NB = self.TF_BUCKETS
        heads = np.maximum(self._h_tfs[self._term_start], 1e-30)
        self._term_heads = heads
        buckets = np.minimum(
            (self._h_tfs / heads[self._csr_term_idx] * NB).astype(np.int64),
            NB,
        )
        hist = np.bincount(
            self._csr_term_idx * (NB + 1) + buckets,
            minlength=len(terms) * (NB + 1),
        ).reshape(len(terms), NB + 1)
        cum = np.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        self._tf_cnt = np.concatenate(
            [cum, np.zeros((len(terms), 1), cum.dtype)], axis=1
        ).astype(np.int32)
        self._refresh_live_df()
        # 128-ALIGNED device layout (see inverted._build_csr): per-term
        # list starts land on GATHER_LANE multiples so the kernels fetch
        # postings at row grain (16.5x vs element grain, exp_r5_gather)
        from cosdata_tpu.ops.sparse_kernels import GATHER_LANE

        lane = GATHER_LANE
        padc = -(-self._term_len // lane) * lane
        starts_pad = np.concatenate(
            [[0], np.cumsum(padc)]
        )[:-1].astype(np.int64)
        total = int(padc.sum())
        ids_pad = np.full(total, -1, np.int32)
        tfs_pad = np.zeros(total, np.float32)
        within = np.arange(len(self._h_ids_sorted)) - np.repeat(
            self._term_start, self._term_len
        )
        dst = np.repeat(starts_pad, self._term_len) + within
        ids_pad[dst] = self._h_ids_sorted
        tfs_pad[dst] = self._h_tfs
        self._term_start_dev = starts_pad
        self._csr_ids = jnp.asarray(ids_pad)
        self._csr_vals = jnp.asarray(tfs_pad)
        self._csr_aligned = True
        # per-doc (compact term idx, tf) padded rows for the gather-rescore
        # scoring path (see inverted.candidates_rescore_topk): score(doc) =
        # Σ idf[term] * tf over the doc's OWN row — exact BM25, no scatter
        order_d = np.argsort(flat_ids, kind="stable")
        docs_sorted = flat_ids[order_d]
        terms_sorted = term_idx[order_d].astype(np.int32)
        tfs_sorted = flat_tfs[order_d]
        uniq_d, starts_d, counts_d = np.unique(
            docs_sorted, return_index=True, return_counts=True
        )
        r_max = max(_next_pow2(int(counts_d.max())), 8)
        doc_terms = np.zeros((self.n_cap, r_max), np.int32)
        doc_tfs = np.zeros((self.n_cap, r_max), np.float32)
        cols = np.arange(len(docs_sorted)) - np.repeat(starts_d, counts_d)
        keep = cols < r_max
        doc_terms[docs_sorted[keep], cols[keep]] = terms_sorted[keep]
        doc_tfs[docs_sorted[keep], cols[keep]] = tfs_sorted[keep]
        self._doc_terms_dev = jnp.asarray(doc_terms)
        self._doc_tfs_dev = jnp.asarray(doc_tfs)
        self._csr_gen = getattr(self, "_csr_gen", 0) + 1
        self._select_head()
        self._csr_dirty = False

    #: tf-bucket resolution of the allocator's per-term count tables
    TF_BUCKETS = 128

    #: dense-head engine knobs (mirrors InvertedIndex): terms with df >=
    #: HEAD_MIN_DF become columns of a device (Dh, n_cap) u8 tf matrix
    #: scored by one MXU matmul — every posting of every head term, no
    #: budget. BM25's true top-k accumulates Σ idf·tf across terms, so
    #: per-posting contribution nomination alone loses docs whose mass is
    #: spread over common terms (measured 0.622 recall_vs_exact at 100k
    #: docs, scripts/exp_r4_sparse.py); the head matmul restores exact
    #: (quantized) accumulation for exactly those tie-dense head lists.
    HEAD_MIN_DF = 64
    HEAD_MIN_CAP = 32768
    HEAD_BYTES_MAX = 1 << 30
    HEAD_DH_MAX = 8192
    #: nomination width multiplier into the exact final rescore
    NOMINATE = 8

    def _select_head(self):
        """Pick head terms from the df tables (called by _build_csr)."""
        nt = len(self._term_sorted)
        self._head_col = np.full(nt, -1, np.int32)
        self._head_tidx = np.zeros(0, np.int64)
        if self.n_cap < self.HEAD_MIN_CAP or nt == 0:
            return
        dh_cap = min(self.HEAD_DH_MAX, self.HEAD_BYTES_MAX // max(self.n_cap, 1))
        if dh_cap < 128:
            return
        cand = np.nonzero(self._term_len >= self.HEAD_MIN_DF)[0]
        if len(cand) > dh_cap:
            top = cand[np.argsort(-self._term_len[cand], kind="stable")[:dh_cap]]
            cand = np.sort(top)
        if not len(cand):
            return
        self._head_col[cand] = np.arange(len(cand), dtype=np.int32)
        self._head_tidx = cand.astype(np.int64)

    def _ensure_head(self):
        """Build/refresh the device (Dh, n_cap) u8 dense tf head matrix."""
        gen = (self._csr_gen, self.n_cap)
        if getattr(self, "_head_gen", None) == gen:
            return
        hd = self._head_tidx
        if not len(hd):
            self._head_codes_dev = None
            self._head_scale = 1.0
            self._head_gen = gen
            return
        dh_pad = max(_next_pow2(len(hd)), 128)
        mat = np.zeros((dh_pad, self.n_cap), np.uint8)
        cols = self._head_col[self._csr_term_idx]
        sel = cols >= 0
        # global tf scale: BM25 tf is bounded by k1+1, so one scale keeps
        # relative order across terms; nomination only (exact rescore after)
        tf_max = float(self._h_tfs.max()) if len(self._h_tfs) else 1.0
        self._head_scale = max(tf_max, 1e-30)
        q255 = np.minimum(
            self._h_tfs[sel] / self._head_scale * 255.0, 255.0
        ).astype(np.uint8)
        flat = cols[sel].astype(np.int64) * self.n_cap + self._h_ids_sorted[sel]
        mat.reshape(-1)[flat] = q255
        self._head_codes_dev = jnp.asarray(mat)
        self._head_gen = gen

    def _refresh_live_df(self):
        """Vectorized live-document-frequency recount (idf must track only
        live docs under churn)."""
        self._live_df_arr = np.bincount(
            self._csr_term_idx,
            weights=self._alive[self._h_ids_sorted].astype(np.float64),
            minlength=len(self._term_sorted),
        ).astype(np.int64)
        self._live_df = {
            int(t): int(df)
            for t, df in zip(self._term_sorted, self._live_df_arr)
        }
        self._df_dirty = False

    def search(self, queries: list[str], top_k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        b = len(queries)
        if b == 0:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        # flush BEFORE the emptiness check: documents buffered below the
        # sample threshold have live_documents == 0 until _finalize_sampling
        # runs — checking first made them unsearchable forever
        self.flush()
        if self.live_documents <= 0:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        self._build_csr()
        if self._csr_ids is None:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        if self._df_dirty:
            # deletes since the last CSR build: refresh live per-term df
            self._refresh_live_df()
        # tokenize (host text pipeline), then allocate the whole batch's
        # scan budgets in one vectorized pass: per-query scan budget over
        # the present terms, allocated by IMPACT (idf * tf) thresholding —
        # rare high-idf terms keep their full short lists, head-term lists
        # are cut at the globally weakest contributions (see
        # inverted.impact_segments_batch), not at a uniform budget//n cap.
        # Batch-adaptive budget: a lone query affords the whole dispatch
        # workspace (InvertedIndex._effective_budget semantics).
        from cosdata_tpu.indexes.inverted import impact_segments_batch

        budget = max(self.SCAN_BUDGET, self.SCAN_BUDGET_TOTAL // max(b, 1))
        term_lists = [
            process_text_query(text, self.max_token_len) for text in queries
        ]
        counts = np.asarray([len(t) for t in term_lists], np.int64)
        qi = np.repeat(np.arange(b), counts)
        flat_terms = np.asarray(
            [t for terms in term_lists for t in terms], np.int64
        )
        if len(flat_terms) and len(self._term_sorted):
            pos = np.searchsorted(self._term_sorted, flat_terms)
            safe = np.minimum(pos, len(self._term_sorted) - 1)
            ok = self._term_sorted[safe] == flat_terms
            ok &= self._live_df_arr[safe] > 0
        else:
            safe = np.zeros(0, np.int64)
            ok = np.zeros(len(flat_terms), bool)
        qi, tidx = qi[ok], safe[ok]
        df = self._live_df_arr[tidx]
        N_live = self.live_documents
        idf = np.log1p((N_live - df + 0.5) / (df + 0.5)).astype(np.float32)
        pos_w = idf > 0.0
        qi, tidx, idf = qi[pos_w], tidx[pos_w], idf[pos_w]
        # dense-head split: head terms are scanned in full by one MXU
        # matmul (no budget); only tail terms go through the budgeted
        # posting-prefix nomination (see _select_head)
        self._ensure_head()
        use_head = self._head_codes_dev is not None
        if use_head:
            is_head = self._head_col[tidx] >= 0
            qi_h, tidx_h, idf_h = qi[is_head], tidx[is_head], idf[is_head]
            qi, tidx, idf = qi[~is_head], tidx[~is_head], idf[~is_head]
        maxper = max(self.MAX_TERM_POSTINGS, budget // 8)
        caps = np.minimum(self._term_len[tidx], maxper)
        order = np.lexsort((-idf, qi))  # highest-idf terms first per query
        qi, tidx, idf, caps = qi[order], tidx[order], idf[order], caps[order]
        units = (self._term_heads[tidx] / self.TF_BUCKETS).astype(np.float32)
        # emitted segment offsets address the ALIGNED device CSR
        dev_start = getattr(self, "_term_start_dev", None)
        if dev_start is None:
            dev_start = self._term_start
        starts, lens, mults = impact_segments_batch(
            b, qi, dev_start[tidx], idf, caps,
            self._tf_cnt, tidx, units, self.TF_BUCKETS, budget,
            self.SEGCAP, conservative=False, pad_min=_PAD_MIN // 16,
        )
        if self._alive_dev is None:
            self._alive_dev = jnp.asarray(self._alive)
        # gather-rescore: budgeted tf-descending prefixes nominate
        # candidates; each is scored EXACTLY as Σ idf*tf over its own doc
        # row (same sums as search_bm25's k-way merge up to f32
        # association, sparse_ann_query.rs:149-233 — no 512-bucket top-k
        # approximation, no scatter)
        from cosdata_tpu.indexes.inverted import (
            _dedup_topk,
            _next_pow2 as _np2,
            rescore_dispatch,
        )

        # the EXACT rescore scores the full query (head + tail terms): its
        # dense idf rows carry every present term regardless of the split
        if use_head:
            qi_all = np.concatenate([qi, qi_h])
            tidx_all = np.concatenate([tidx, tidx_h])
            idf_all = np.concatenate([idf, idf_h])
            order_all = np.argsort(qi_all, kind="stable")
            qi_all = qi_all[order_all]
            tidx_all, idf_all = tidx_all[order_all], idf_all[order_all]
        else:
            qi_all, tidx_all, idf_all = qi, tidx, idf
        qt_max = max(
            _np2(int(np.bincount(qi_all, minlength=b).max())
                 if len(qi_all) else 1), 8
        )
        q_idx_arr = np.full((b, qt_max), -1, np.int32)
        q_w_arr = np.zeros((b, qt_max), np.float32)
        if len(qi_all):
            qstart = np.searchsorted(qi_all, np.arange(b))
            cols = np.arange(len(qi_all)) - qstart[qi_all]
            q_idx_arr[qi_all, cols] = tidx_all.astype(np.int32)
            q_w_arr[qi_all, cols] = idf_all
        vocab_pad = max(_np2(len(self._term_sorted)), 128)
        if not use_head:
            return rescore_dispatch(
                starts, lens, self._csr_ids, self._doc_terms_dev,
                self._doc_tfs_dev, q_idx_arr, q_w_arr, self._alive_dev,
                vocab_pad, min(top_k, self.n_cap), self.SEGCAP, 8, self.n_cap,
                mults=mults, csr_vals=self._csr_vals,
                aligned=getattr(self, "_csr_aligned", False),
            )
        # ---- dense-head + tail union, exact final rescore ----
        from cosdata_tpu.ops.sparse_kernels import (
            head_matmul_topk,
            rescore_ids_topk,
        )

        nom = int(min(max(self.NOMINATE * top_k, 64), self.n_cap))
        bp_f = max(_np2(b), 8)
        aligned_f = getattr(self, "_csr_aligned", False)
        r_f = self._doc_terms_dev.shape[1]
        nom_width = min(max(4 * nom, 512), self.n_cap)
        from cosdata_tpu.indexes.inverted import SEG_QUERY_CHUNK as _SQC

        exhaustive = os.environ.get("COSDATA_SPARSE_EXHAUSTIVE", "") == "1"
        fits_one = (
            not exhaustive
            and bp_f <= _SQC
            and bp_f * starts.shape[1] * self.SEGCAP <= (1 << 25)
            and bp_f * nom_width * r_f <= (1 << 27)
        )
        if fits_one:
            # ONE device program (see inverted._search_head: the
            # 3-program shape host-hopped both nomination id sets)
            from cosdata_tpu.ops.sparse_kernels import (
                head_tail_union_rescore,
            )

            dh_pad = self._head_codes_dev.shape[0]
            q_head = np.zeros((bp_f, dh_pad), np.float32)
            np.add.at(q_head, (qi_h, self._head_col[tidx_h]), idf_h)
            if bp_f > b:
                starts = np.pad(starts, ((0, bp_f - b), (0, 0)),
                                constant_values=-1)
                lens = np.pad(lens, ((0, bp_f - b), (0, 0)))
                mults = np.pad(mults, ((0, bp_f - b), (0, 0)))
                q_idx_arr = np.pad(q_idx_arr, ((0, bp_f - b), (0, 0)),
                                   constant_values=-1)
                q_w_arr = np.pad(q_w_arr, ((0, bp_f - b), (0, 0)))
            f_sc, f_ids = head_tail_union_rescore(
                jnp.asarray(starts), jnp.asarray(lens),
                jnp.asarray(mults), self._csr_ids, self._csr_vals,
                self._doc_terms_dev, self._doc_tfs_dev,
                jnp.asarray(q_idx_arr), jnp.asarray(q_w_arr),
                jnp.asarray(q_head), self._head_codes_dev,
                self._alive_dev, vocab_pad, top_k, nom, nom_width,
                self.SEGCAP, 1 << 16, min(self.n_cap, 1 << 16),
                aligned_f,
            )
            out_i, out_s = _dedup_topk(
                np.asarray(f_ids, np.int64), np.asarray(f_sc), top_k
            )
            return out_i[:b], out_s[:b]
        t_ids, _t_sc = rescore_dispatch(
            starts, lens, self._csr_ids, self._doc_terms_dev,
            self._doc_tfs_dev, q_idx_arr, q_w_arr, self._alive_dev,
            vocab_pad, nom, self.SEGCAP, 8, self.n_cap,
            mults=mults, csr_vals=self._csr_vals,
            aligned=getattr(self, "_csr_aligned", False),
        )
        bp = max(_np2(b), 8)  # compile-shape stability
        dh_pad = self._head_codes_dev.shape[0]
        q_head = np.zeros((bp, dh_pad), np.float32)
        np.add.at(q_head, (qi_h, self._head_col[tidx_h]), idf_h)
        chunk = min(self.n_cap, 1 << 16)
        h_sc, h_ids = head_matmul_topk(
            jnp.asarray(q_head), self._head_codes_dev, self._alive_dev,
            nom, chunk,
        )
        cand = np.concatenate(
            [np.asarray(h_ids[:b], np.int64), t_ids], axis=1
        ).astype(np.int32)
        if bp > b:
            q_idx_arr = np.pad(
                q_idx_arr, ((0, bp - b), (0, 0)), constant_values=-1
            )
            q_w_arr = np.pad(q_w_arr, ((0, bp - b), (0, 0)))
            cand = np.pad(cand, ((0, bp - b), (0, 0)), constant_values=-1)
        fetch = min(2 * top_k, cand.shape[1])
        f_sc, f_ids = rescore_ids_topk(
            jnp.asarray(cand), self._doc_terms_dev, self._doc_tfs_dev,
            jnp.asarray(q_idx_arr), jnp.asarray(q_w_arr), self._alive_dev,
            vocab_pad, fetch,
        )
        out_i, out_s = _dedup_topk(
            np.asarray(f_ids, np.int64), np.asarray(f_sc), top_k
        )
        return out_i[:b], out_s[:b]
