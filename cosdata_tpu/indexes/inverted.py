"""Sparse (SPLADE-style) inverted index.

Re-design of the reference's power-of-4 trie of per-dimension quantized
posting lists (/root/reference/src/models/inverted_index.rs:39-367,
src/indexes/inverted/mod.rs) as host CSR arrays + a device
scatter-accumulate/top-k kernel:

- postings per dimension sorted by quantized bucket **descending**, so the
  reference's early-termination rule — low-valued query dims only scan the
  top buckets (sparse_ann_query.rs:89-126) — becomes a prefix slice.
- value quantization: ``clamp((v / upper_bound) * maxval, 0, maxval)``
  truncated to u8 (inverted_index.rs:168-172).
- the values_upper_bound is auto-tuned from a sample histogram: smallest
  integer bound in 1..10 with <= clamp_margin_percent of values above it
  (inverted/mod.rs:194-247).
- scoring: sum of (quantized query value × stored bucket) per matching dim,
  exactly the reference's u32 dot product accumulation.
- optional exact re-rank against raw sparse pairs
  (inverted/mod.rs:296-381), factor × k candidates.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


_PAD_MIN = 256


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


@dataclass
class _Postings:
    """Per-dimension postings kept sorted by bucket desc (lazy re-sort)."""

    ids: list = field(default_factory=list)
    buckets: list = field(default_factory=list)
    sorted_ids: np.ndarray | None = None
    sorted_buckets: np.ndarray | None = None

    def ensure_sorted(self):
        if self.sorted_ids is not None:
            return
        b = np.asarray(self.buckets, np.int32)
        i = np.asarray(self.ids, np.int32)
        order = np.argsort(-b, kind="stable")
        self.sorted_ids = i[order]
        self.sorted_buckets = b[order]

    def invalidate(self):
        self.sorted_ids = None
        self.sorted_buckets = None


class InvertedIndex:
    """Sparse index over (dim u32, value f32) pairs keyed by internal id."""

    def __init__(
        self,
        quantization: int = 64,  # 16|32|64|128|256 -> 4..8 bits (dtos.rs:98-128)
        sample_threshold: int = 1000,
        early_terminate_threshold: float = 0.0,  # config.toml:33
        clamp_margin_percent: float = 1.0,
        values_upper_bound: float | None = None,  # fixed -> skips sampling
        keep_raw: bool = True,
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
        self._postings: dict[int, _Postings] = {}
        self._raw: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.n_cap = 1024
        self._alive = np.ones(self.n_cap, bool)
        self._alive_dev = None
        self.n = 0  # max internal id + 1 seen
        # device-resident CSR (built lazily at search/flush time)
        self._csr_dirty = True
        self._csr_ids = None  # (P,) int32 device
        self._csr_vals = None  # (P,) f32 device (bucket values)
        self._csr_range: dict[int, tuple[int, int]] = {}  # dim -> (start, len)
        #: per-(query, dim) device gather segment width
        self.SEGCAP = 512

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
            if sum(1 for _ in self._sample) >= self.sample_threshold:
                self._finalize_sampling()
            return
        self._insert(internal_id, dims, values)

    def _finalize_sampling(self):
        all_vals = (
            np.concatenate([v for _, _, v in self._sample])
            if self._sample
            else np.zeros(0, np.float32)
        )
        self.values_upper_bound = tune_upper_bound(all_vals, self.clamp_margin_percent)
        self.is_configured = True
        pending, self._sample = self._sample, []
        for iid, d, v in pending:
            self._insert(iid, d, v)

    def flush(self):
        """Index whatever is buffered even if the sample threshold wasn't hit
        (the reference configures on pre-commit as well, indexes/mod.rs:85-118)."""
        if not self.is_configured:
            self._finalize_sampling()

    def _insert(self, internal_id: int, dims: np.ndarray, values: np.ndarray):
        internal_id = int(internal_id)
        q = self.quantize(values)
        for d, b in zip(dims.tolist(), q.tolist()):
            p = self._postings.get(d)
            if p is None:
                p = self._postings[d] = _Postings()
            p.ids.append(internal_id)
            p.buckets.append(b)
            p.invalidate()
        if self.keep_raw:
            self._raw[internal_id] = (dims, values)
        self._csr_dirty = True
        if internal_id >= self.n:
            self.n = internal_id + 1
        if internal_id >= self.n_cap:
            new_cap = _next_pow2(internal_id + 1)
            self._alive = np.concatenate(
                [self._alive, np.ones(new_cap - self.n_cap, bool)]
            )
            self.n_cap = new_cap
            self._alive_dev = None

    def delete(self, internal_id: int) -> None:
        if internal_id < self.n_cap:
            self._alive[internal_id] = False
            self._alive_dev = None
            self._raw.pop(int(internal_id), None)

    # ---------------------------------------------------------------- search

    def _build_csr(self):
        """Upload the postings as one flat device CSR (dims sorted-by-bucket,
        concatenated). Rebuilt per indexed transaction, not per query."""
        if not self._csr_dirty:
            return
        ids_parts, val_parts = [], []
        self._csr_range = {}
        pos = 0
        for dim, p in self._postings.items():
            p.ensure_sorted()
            ids_parts.append(p.sorted_ids)
            val_parts.append(p.sorted_buckets.astype(np.float32))
            self._csr_range[dim] = (pos, len(p.sorted_ids))
            pos += len(p.sorted_ids)
        if pos == 0:
            self._csr_ids = None
            self._csr_dirty = False
            return
        self._csr_ids = jnp.asarray(np.concatenate(ids_parts).astype(np.int32))
        self._csr_vals = jnp.asarray(np.concatenate(val_parts))
        self._csr_dirty = False

    def _query_segments(self, pairs) -> list[tuple[int, int, float]]:
        """One query -> [(start, len, multiplier)] segment descriptors with
        early termination applied; long dims split into SEGCAP segments."""
        low_threshold = int(self.early_terminate_threshold * (1 << self.bits))
        etv = min(int((1 << self.bits) * self.early_terminate_threshold), 255)
        segs: list[tuple[int, int, float]] = []
        for dim, value in sorted(pairs, key=lambda p: -p[1]):
            rng = self._csr_range.get(int(dim))
            if rng is None:
                continue
            start, length = rng
            qqv = int(self.quantize(np.float32(value)))
            if qqv <= low_threshold:
                p = self._postings[int(dim)]
                cut = int(np.searchsorted(-p.sorted_buckets, -etv, side="right"))
                length = min(length, cut)
            for off in range(0, length, self.SEGCAP):
                segs.append((start + off, min(self.SEGCAP, length - off), float(qqv)))
        return segs

    def search(
        self,
        queries: list[list[tuple[int, float]]],
        top_k: int = 10,
        rerank: bool = False,
        rerank_factor: int = 5,  # config.toml:5 sparse_raw_values_reranking_factor
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch search. Returns (ids (B, k), scores (B, k)), -1 padded."""
        b = len(queries)
        if b == 0 or self.n == 0:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        self.flush()
        self._build_csr()
        if self._csr_ids is None:
            return np.full((b, top_k), -1, np.int64), np.zeros((b, top_k), np.float32)
        if self._alive_dev is None:
            self._alive_dev = jnp.asarray(self._alive)
        k_fetch = min(top_k * (rerank_factor if rerank else 1), self.n_cap)
        seg_lists = [self._query_segments(q) for q in queries]
        maxd = max(_PAD_MIN // 16, _next_pow2(max(len(s) for s in seg_lists)))
        starts = np.full((b, maxd), -1, np.int32)
        lens = np.zeros((b, maxd), np.int32)
        mults = np.zeros((b, maxd), np.float32)
        for i, segs in enumerate(seg_lists):
            for j, (s, l, mlt) in enumerate(segs):
                starts[i, j] = s
                lens[i, j] = l
                mults[i, j] = mlt
        from cosdata_tpu.ops.sparse_kernels import csr_accumulate_topk

        scores, out_ids = csr_accumulate_topk(
            jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(mults),
            self._csr_ids, self._csr_vals, self._alive_dev,
            self.n_cap, k_fetch, self.SEGCAP,
        )
        out_ids = np.asarray(out_ids, np.int64)
        scores = np.asarray(scores)
        if rerank and self.keep_raw:
            out_ids, scores = self._rerank(queries, out_ids, top_k)
        else:
            out_ids, scores = out_ids[:, :top_k], scores[:, :top_k]
        return out_ids, scores

    def _rerank(self, queries, cand_ids, top_k):
        """Exact dot on raw sparse pairs (inverted/mod.rs:331-381)."""
        b, kk = cand_ids.shape
        out_i = np.full((b, top_k), -1, np.int64)
        out_s = np.zeros((b, top_k), np.float32)
        for qi, q in enumerate(queries):
            qmap = {int(d): float(v) for d, v in q}
            scored = []
            for cid in cand_ids[qi]:
                if cid < 0:
                    continue
                raw = self._raw.get(int(cid))
                if raw is None:
                    continue
                s = sum(qmap.get(int(d), 0.0) * float(v) for d, v in zip(*raw))
                scored.append((s, int(cid)))
            scored.sort(key=lambda t: -t[0])
            for j, (s, cid) in enumerate(scored[:top_k]):
                out_i[qi, j] = cid
                out_s[qi, j] = s
        return out_i, out_s
