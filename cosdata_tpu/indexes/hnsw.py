"""Dense HNSW index on fixed-degree adjacency arrays.

TPU-native re-design of the reference HNSW
(/root/reference/src/indexes/hnsw/mod.rs, src/vector_store.rs):

- The pointer-linked `ProbNode` graph (prob_node.rs:99-511) becomes dense HBM
  arrays: level-0 adjacency ``(cap, m0)`` and a single upper-level table
  ``(cap_up, L, m)`` addressed through a node->slot map (only ~N/10 nodes
  have level >= 1 with the default prob base 10, common.rs:421-434).
- Sequential per-vector insertion with atomic edge updates
  (vector_store.rs:782-940, create_node_edges :976-1109) becomes **batched
  insertion waves**: one beam-search pass finds candidates for a whole wave,
  intra-wave links come from a causal (W, W) MXU score matrix, and
  bidirectional edges are applied with a keep-m-closest merge kernel.
- Search (ann_search :256-402 + traverse_find_nearest :1112-1204) is the
  batched beam search in ops.hnsw_kernels, descending the level hierarchy.
- finalize_ann_results (:404-445) parity: candidates are deduplicated,
  tombstoned ids dropped, and the top 5*k re-ranked with exact f32 scores
  before the final top-k.
- Deletes (delete_embedding :1206-1371) are tombstones filtered at result
  time; edges through dead nodes keep the graph navigable (the reference
  repairs neighbor lists; we keep traversal-through semantics).

Graph construction differs from the reference's sequential order by design;
parity is recall-vs-brute-force, not graph isomorphism (SURVEY.md §7).
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def _blog(msg: str) -> None:
    """Build-stage progress logging, enabled by COSDATA_BUILD_LOG=1 (used to
    attribute time inside multi-minute 1M-scale builds)."""
    if os.environ.get("COSDATA_BUILD_LOG"):
        print(f"[build {time.strftime('%H:%M:%S')}] {msg}", flush=True)

from cosdata_tpu.ops import hnsw_kernels as HK
from cosdata_tpu.ops.storage import VectorStore
from cosdata_tpu.ops.topk import NEG_INF


def _next_pow2(v: int) -> int:
    return 1 << max(int(v) - 1, 0).bit_length()


@dataclass
class HNSWParams:
    """Hyperparameters, defaults mirroring /root/reference/config.toml:19-26."""

    num_layers: int = 9
    neighbors_count: int = 32
    level_0_neighbors_count: int = 64
    ef_construction: int = 128
    ef_search: int = 256
    level_prob_base: float = 10.0  # generate_level_probs x (common.rs:421)
    # TPU batching knobs (no reference equivalent):
    expand: int = 4  # beam entries expanded per wave iteration
    visited_cap: int = 2048  # per-query visited ring size
    max_iters: int = 96  # beam-search iteration bound
    wave_size: int = 1024  # insert wave width
    ef_upper: int = 8  # beam width above level 0
    # "heuristic" = HNSW diversity pruning (Algorithm 4); "closest" =
    # keep-m-closest, the reference's behavior (prob_node.rs:210-283)
    neighbor_selection: str = "heuristic"

    def to_dict(self) -> dict:
        return dict(self.__dict__)


def _rp_split_body(seg, vals, valid, n_segs: int):
    """One RP-tree level: split every segment at its approximate median
    (256-bucket histogram; the threshold bucket goes whole to one side,
    bounding imbalance by one bucket's mass). Replaces a full-array host
    lexsort per level — 184 s of a 397 s 1M build on the 1-core host.

    The (n_segs, 256) histogram is computed as a one-hot MXU contraction,
    NOT a scatter-add: TPU scatter with ~10^6 colliding updates executes
    serially, and on the tunneled device its first in-process execution
    measured 178-509 s at 1M rows. The matmul form is n*n_segs*256 MACs —
    microseconds on the MXU."""
    nbuck = 256
    lo = jnp.min(jnp.where(valid, vals, jnp.inf))
    hi = jnp.max(jnp.where(valid, vals, -jnp.inf))
    b = jnp.clip(
        ((vals - lo) / jnp.maximum(hi - lo, 1e-30) * nbuck).astype(jnp.int32),
        0, nbuck - 1,
    )
    oh_seg = (
        (seg[:, None] == jnp.arange(n_segs)[None, :]) & valid[:, None]
    ).astype(jnp.bfloat16)
    oh_b = (b[:, None] == jnp.arange(nbuck)[None, :]).astype(jnp.bfloat16)
    hist = jnp.matmul(
        oh_seg.T, oh_b, preferred_element_type=jnp.float32
    )  # (n_segs, 256), exact integer counts (< 2^24)
    counts = hist.sum(axis=1)
    csum = jnp.cumsum(hist, axis=1)
    half = jnp.floor((counts + 1) * 0.5)
    thresh = jnp.argmax(csum >= half[:, None], axis=1)
    side = b > thresh[jnp.minimum(seg, n_segs - 1)]
    return jnp.where(valid, seg * 2 + side.astype(jnp.int32), 0)


@functools.partial(jax.jit, static_argnames=("l", "mp"))
def _rp_level(proj, seg, l: int, mp: int):
    """One median-split level as its own small compiled program, slicing
    and padding the projections inside (no wide-tiled eager intermediates).

    Why not one fused all-levels program: on the tunneled device the first
    per-process run of the 7-level fused program measured 177-842 s (even
    with a persistent-cache hit and data already resident — a per-process
    program load/compile penalty that grows savagely with program size),
    while these per-level programs load in <0.1 s. The caller blocks after
    each level: chained *eager* dispatches were equally pathological, but a
    short blocked chain of small jit programs is fast and robust."""
    n_mem = proj.shape[0]
    vals = jnp.pad(proj[:, l], (0, mp - n_mem))
    valid = jnp.arange(mp) < n_mem
    return _rp_split_body(seg, vals, valid, 1 << l)


@functools.partial(jax.jit, static_argnames=("c",))
def _merge_candidates(
    cand_ids, cand_scores, wave_row_scores, wave_ids, level_ok, c: int
):
    """Top-c of (searched candidates from the existing graph) ∪
    (causally-earlier wave mates at this level), deduplicated."""
    from cosdata_tpu.ops.topk import unique_mask_ids

    wm = jnp.where(level_ok[None, :], wave_row_scores, NEG_INF)
    ids = jnp.concatenate(
        [cand_ids, jnp.broadcast_to(wave_ids[None, :], wm.shape)], axis=1
    )
    scores = jnp.concatenate([cand_scores, wm], axis=1)
    uniq = unique_mask_ids(ids)
    scores = jnp.where(uniq, scores, NEG_INF)
    top_s, pos = jax.lax.top_k(scores, min(c, scores.shape[1]))
    top_i = jnp.take_along_axis(ids, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_i, jnp.where(top_i >= 0, top_s, NEG_INF)


def _visited_impl(b: int, id_span: int, budget: int = 256 << 20) -> str:
    """Pick the beam visited-set implementation: exact per-query bit
    tables unless (B, ceil(N/32)) u32 would blow the HBM budget."""
    return "bitmask" if b * (-(-id_span // 32)) * 4 <= budget else "ring"


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "kind", "d", "d_true", "resolution", "ef0", "ef_upper",
        "expand", "vcap", "max_iters", "n_upper", "keep", "k", "rerank",
        "visited_impl",
    ),
)
def _fused_search(
    metric: str,
    kind: str,
    d: int,
    d_true: int,
    resolution: int,
    ef0: int,
    ef_upper: int,
    expand: int,
    vcap: int,
    max_iters: int,
    n_upper: int,  # number of active upper levels (descended top-down)
    keep: int,
    k: int,
    rerank: bool,
    lo,
    hi,
    q_raw,  # (B, Dpad) f32 raw queries (quantized in-program)
    store,
    raw,  # (cap, Dpad) f32 raw rows or a dummy when rerank=False
    adj0,
    up_adj,  # (cap_up, L, m)
    up_slot,
    alive,
    entry,  # () int32
    upper_levels,  # (n_upper,) int32 level numbers, descending
    visited_impl: str = "bitmask",
):
    """Whole ANN search in ONE device program: upper-level descent ->
    level-0 beam -> tombstone mask -> exact rerank -> top-k. One dispatch
    instead of ~(levels+2); dispatch round-trips dominate small-batch
    latency (acutely so through remote-device tunnels)."""
    from cosdata_tpu.ops.storage import _quantize_batch

    qkind = "f32" if kind == "float" else kind
    q = _quantize_batch(q_raw, lo, hi, qkind, resolution, d_true)
    b = q_raw.shape[0]
    start = jnp.full((b, 1), entry, jnp.int32)
    for i in range(n_upper):
        l_idx = upper_levels[i] - 1
        adj_l = up_adj[:, l_idx]
        ids, _ = HK.beam_search(
            metric, kind, d, ef_upper, expand, vcap, max_iters,
            q, store, adj_l, up_slot, start, use_row_of=True,
            visited_impl=visited_impl,
        )
        start = ids[:, : max(ef_upper, 1)]
    ids, scores = HK.beam_search(
        metric, kind, d, ef0, expand, vcap, max_iters,
        q, store, adj0, up_slot, start, use_row_of=False,
        visited_impl=visited_impl,
    )
    ids = ids[:, :keep]
    scores = scores[:, :keep]
    valid = (ids >= 0) & alive[jnp.maximum(ids, 0)]
    if rerank:
        from cosdata_tpu.ops.storage import _rerank

        scores = _rerank(metric, q_raw, raw, ids)
    scores = jnp.where(valid, scores, NEG_INF)
    top_s, pos = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(ids, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_i, top_s


@functools.partial(
    jax.jit,
    static_argnames=("metric", "kind", "d", "m", "scan_chunk", "heuristic"),
)
def _bulk_knn_edges(
    metric: str,
    kind: str,
    d: int,
    m: int,
    scan_chunk: int,
    heuristic: bool,
    node_ids,  # (W,) int32
    store,
    mask,  # (cap,) bool candidate mask
):
    """Exact top-2m neighbors of each node (self excluded) + diversity
    pruning to m — one device program per node chunk."""
    from cosdata_tpu.ops.flat_scan import flat_scan_topk
    from cosdata_tpu.ops.storage import _gather_queries

    q = _gather_queries("f32" if kind == "float" else kind, store, node_ids)
    k_fetch = 2 * m + 1
    vals, ids = flat_scan_topk(metric, kind, d, k_fetch, scan_chunk, q, store, mask)
    self_hit = ids == node_ids[:, None]
    vals = jnp.where(self_hit, NEG_INF, vals)
    ids = jnp.where(self_hit, -1, ids)
    # re-sort after masking self
    vals, pos = jax.lax.top_k(vals, 2 * m)
    ids = jnp.take_along_axis(ids, pos, axis=1)
    if heuristic:
        pair = HK.pairwise_scores(metric, kind, d, ids, store)
        return HK.select_diverse(ids, vals, pair, m)
    return _top_m(ids, vals, m)


@functools.partial(
    jax.jit,
    static_argnames=("metric", "kind", "d", "m", "chunk", "heuristic"),
)
def _prune_candidates(
    metric: str,
    kind: str,
    d: int,
    m: int,
    chunk: int,
    heuristic: bool,
    node_ids,  # (N,) int32 the node each candidate row belongs to
    cand_ids,  # (N, C) int32 or tuple of (N, C_t) per-tree parts
    cand_scores,  # (N, C) f32 (or matching tuple)
    store,
):
    """Forward-edge selection for bulk builds: per node, dedup candidates,
    keep the best 2m, then (optionally) diversity-prune to m — one fused
    lax.map over node chunks so the (chunk, 2m, 2m) pairwise block stays
    bounded. Returns (ids (N, m), dists (N, m)).

    Multi-tree candidates arrive as a TUPLE of per-tree parts and are
    concatenated per node-chunk inside the scan: an eager (N, sum C_t)
    concat at 1M x 256 materializes ~2 GB of HBM that the shared chip may
    not have (observed ResourceExhausted mid-build)."""
    from cosdata_tpu.ops.topk import unique_mask_ids

    parts_i = cand_ids if isinstance(cand_ids, (list, tuple)) else (cand_ids,)
    parts_s = (
        cand_scores
        if isinstance(cand_scores, (list, tuple))
        else (cand_scores,)
    )
    n = parts_i[0].shape[0]
    c = sum(p.shape[1] for p in parts_i)
    pad = (-n) % chunk
    ids_p = [
        jnp.pad(p, ((0, pad), (0, 0)), constant_values=-1).reshape(
            -1, chunk, p.shape[1]
        )
        for p in parts_i
    ]
    sc_p = [
        jnp.pad(p, ((0, pad), (0, 0)), constant_values=NEG_INF).reshape(
            -1, chunk, p.shape[1]
        )
        for p in parts_s
    ]
    nid_p = jnp.pad(node_ids, ((0, pad),), constant_values=-1)
    keep_c = min(2 * m, c)

    def one(args):
        ids_l, sc_l, nid_c = args
        ids_c = ids_l[0] if len(ids_l) == 1 else jnp.concatenate(ids_l, axis=1)
        sc_c = sc_l[0] if len(sc_l) == 1 else jnp.concatenate(sc_l, axis=1)
        uniq = unique_mask_ids(ids_c)
        ok = uniq & (ids_c >= 0) & (ids_c != nid_c[:, None])
        sc_c = jnp.where(ok, sc_c, NEG_INF)
        top_s, pos = jax.lax.top_k(sc_c, keep_c)
        top_i = jnp.take_along_axis(ids_c, pos, axis=1)
        top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
        if heuristic:
            safe = jnp.maximum(top_i, 0)
            g, s, mg = HK._decode_rows(kind, d, store, safe)
            pair = HK._block_scores(metric, kind, d, store, g, s, mg, g, s, mg)
            return HK.select_diverse(top_i, top_s, pair, m)
        t_s, t_pos = jax.lax.top_k(top_s, min(m, keep_c))
        t_i = jnp.take_along_axis(top_i, t_pos, axis=1)
        if t_i.shape[1] < m:
            t_i = jnp.pad(t_i, ((0, 0), (0, m - t_i.shape[1])), constant_values=-1)
            t_s = jnp.pad(t_s, ((0, 0), (0, m - t_s.shape[1])), constant_values=NEG_INF)
        return jnp.where(t_s > NEG_INF / 2, t_i, -1), t_s

    out_i, out_s = jax.lax.map(
        one, (ids_p, sc_p, nid_p.reshape(-1, chunk))
    )
    return out_i.reshape(-1, m)[:n], out_s.reshape(-1, m)[:n]


@functools.partial(jax.jit, static_argnames=("m",))
def _top_m(cand_ids, cand_scores, m: int):
    top_s, pos = jax.lax.top_k(cand_scores, min(m, cand_scores.shape[1]))
    top_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    return top_i, jnp.where(top_i >= 0, top_s, NEG_INF)


@functools.partial(jax.jit, static_argnames=("m", "dedup"))
def _merge_neighbors_3d(adj, dists, rows, level, inc_ids, inc_dists, m: int,
                        dedup: bool = True):
    """merge_neighbors over the (cap_up, L, m) upper table at one level.
    Rows of -1 (padding) are remapped past the table end so the scatter
    drops them (jax wraps raw negative indices BEFORE mode="drop")."""
    safe = jnp.maximum(rows, 0)
    drop_rows = jnp.where(rows >= 0, rows, adj.shape[0])
    cur_ids = adj[safe, level]
    cur_d = dists[safe, level]
    if dedup:
        # see merge_neighbors: inc-vs-cur membership replaces the O(k^2) mask
        dup = jnp.any(inc_ids[:, :, None] == cur_ids[:, None, :], axis=-1)
        inc_dists = jnp.where(dup, NEG_INF, inc_dists)
    all_ids = jnp.concatenate([cur_ids, inc_ids], axis=1)
    all_d = jnp.concatenate([cur_d, inc_dists], axis=1)
    masked = jnp.where(all_ids >= 0, all_d, NEG_INF)
    top_d, pos = jax.lax.top_k(masked, m)
    top_i = jnp.take_along_axis(all_ids, pos, axis=1)
    top_i = jnp.where(top_d > NEG_INF / 2, top_i, -1)
    adj = adj.at[drop_rows, level].set(top_i, mode="drop")
    dists = dists.at[drop_rows, level].set(
        jnp.where(top_i >= 0, top_d, NEG_INF), mode="drop"
    )
    return adj, dists


class HNSWIndex:
    """Batched-wave HNSW over a :class:`VectorStore`."""

    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        kind: str = "u8",
        resolution: int = 2,
        range_: tuple[float, float] = (-1.0, 1.0),
        params: HNSWParams | None = None,
        keep_raw: bool = True,
        seed: int = 0,
        initial_capacity: int = 1024,
        ship_dtype: str = "f32",
    ):
        self.params = params or HNSWParams()
        #: hamming has no graph-kernel contraction (XOR popcount does not
        #: ride the MXU dot-product path the beam/build kernels use), so
        #: hamming indexes run SCAN-ONLY: ingest stores rows without
        #: building adjacency, search routes to the exact chunked scan —
        #: exact results, and faster than graph traversal at every
        #: HBM-resident scale (BENCH.md "Engine selection").
        self.scan_only = metric == "hamming"
        self.store = VectorStore(
            dim=dim,
            kind=kind,
            metric=metric,
            resolution=resolution,
            range=range_,
            keep_raw=keep_raw,
            initial_capacity=initial_capacity,
            ship_dtype=ship_dtype,
        )
        p = self.params
        self.cap = self.store.capacity
        self.adj0 = jnp.full((self.cap, p.level_0_neighbors_count), -1, jnp.int32)
        self.adj0_d = jnp.full((self.cap, p.level_0_neighbors_count), NEG_INF, jnp.float32)
        # presize generously (expected upper fraction is 1/prob_base ~ 10%);
        # growth reallocates AND recompiles every kernel touching the table
        self.cap_up = max(1024, self.cap // 4)
        self.up_adj = jnp.full(
            (self.cap_up, p.num_layers, p.neighbors_count), -1, jnp.int32
        )
        self.up_d = jnp.full(
            (self.cap_up, p.num_layers, p.neighbors_count), NEG_INF, jnp.float32
        )
        self.up_slot = jnp.full((self.cap,), -1, jnp.int32)
        self.up_slot_host = np.full((self.cap,), -1, np.int32)
        self.n_up = 0
        self.levels = np.zeros((self.cap,), np.int8)  # host copy
        self.level_counts = np.zeros(p.num_layers + 1, np.int64)  # nodes at level >= l
        self.entry = -1
        self.entry_level = -1
        self.alive = jnp.ones((self.cap,), bool)
        self.n_deleted = 0
        self.rng = np.random.default_rng(seed)
        from cosdata_tpu.store.chunked import DirtyTracker

        #: adjacency-array dirty epochs ("adj0": store rows, "up": slot
        #: rows) so snapshots rewrite only touched chunks (O(delta) IO)
        self.tracker = DirtyTracker()
        #: set by bulk_build: {"ingest_s", "graph_s"} of the last build
        self.last_build_stats: dict | None = None

    # ------------------------------------------------------------------ util

    @property
    def n(self) -> int:
        return self.store.n

    def _sync_capacity(self):
        if self.store.capacity == self.cap:
            return
        new_cap = self.store.capacity
        grow = new_cap - self.cap
        spilled = self._maybe_spill_to_scan_only() and self.store.codes_on_host
        if not spilled:
            # scan-only mode never touches adjacency: padding it to a
            # beyond-HBM capacity would allocate the very HBM the spill
            # just freed
            self.adj0 = jnp.pad(self.adj0, ((0, grow), (0, 0)), constant_values=-1)
            self.adj0_d = jnp.pad(self.adj0_d, ((0, grow), (0, 0)), constant_values=NEG_INF)
            self.up_slot = jnp.pad(self.up_slot, ((0, grow),), constant_values=-1)
            self.alive = jnp.pad(self.alive, ((0, grow),), constant_values=True)
        else:
            self._alive_host = np.pad(
                self._alive_host, ((0, grow),), constant_values=True
            )
        self.up_slot_host = np.pad(self.up_slot_host, ((0, grow),), constant_values=-1)
        self.levels = np.pad(self.levels, ((0, grow),))
        self.cap = new_cap

    def _grow_up(self, need: int):
        while self.cap_up < need:
            self.cap_up *= 2
        if self.up_adj.shape[0] < self.cap_up:
            grow = self.cap_up - self.up_adj.shape[0]
            self.up_adj = jnp.pad(
                self.up_adj, ((0, grow), (0, 0), (0, 0)), constant_values=-1
            )
            self.up_d = jnp.pad(
                self.up_d, ((0, grow), (0, 0), (0, 0)), constant_values=NEG_INF
            )

    def _sample_levels(self, w: int) -> np.ndarray:
        """Geometric levels: P(level >= n) = base^-n, capped at num_layers
        (generate_level_probs, common.rs:421-434)."""
        u = self.rng.random(w)
        lv = np.minimum(
            np.floor(-np.log(np.maximum(u, 1e-300)) / np.log(self.params.level_prob_base)),
            self.params.num_layers,
        ).astype(np.int8)
        return lv

    def _active_upper_levels(self) -> list[int]:
        return [
            l
            for l in range(self.params.num_layers, 0, -1)
            if self.level_counts[l] > 0
        ]

    # ----------------------------------------------------------------- build

    #: empty-index batches at least this large take the exact-kNN bulk path
    BULK_THRESHOLD = 8192

    def add(self, x: np.ndarray) -> np.ndarray:
        """Insert a batch; returns internal ids.

        Large batches into an empty index use :meth:`bulk_build` (exact
        kNN-graph construction on the MXU — the TPU-native fast path);
        otherwise incremental insertion waves.
        """
        x = np.atleast_2d(np.asarray(x, np.float32))
        if getattr(self, "graph_on_spill", False):
            # kept-graph spill is read-frozen (edge distances and upper
            # tables were freed): ingest downgrades to scan-only serving
            self.graph_on_spill = False
            self.scan_only = True
            p = self.params
            self.adj0 = jnp.full(
                (1, p.level_0_neighbors_count), -1, jnp.int32
            )
        if self.scan_only:
            ids = self.store.add(x)
            self._sync_capacity()
            self.level_counts[0] += len(ids)
            if self.entry < 0 and len(ids):
                self.entry, self.entry_level = int(ids[0]), 0
            return np.asarray(ids, np.int64)
        if self.n == 0 and len(x) >= self.BULK_THRESHOLD:
            return self.bulk_build(x)
        out = []
        for i in range(0, len(x), self.params.wave_size):
            out.append(self._add_wave(x[i : i + self.params.wave_size]))
            if self.scan_only:
                # mid-add spill to the host-streamed tier: remaining waves
                # take the scan-only ingest path (no graph work)
                rest = x[i + self.params.wave_size :]
                if len(rest):
                    ids = self.store.add(rest)
                    self._sync_capacity()
                    self.level_counts[0] += len(ids)
                    out.append(np.asarray(ids, np.int64))
                break
        return np.concatenate(out) if out else np.empty((0,), np.int64)

    def _maybe_spill_to_scan_only(self) -> bool:
        """Past-HBM growth spilled the quantized codes to host RAM
        (VectorStore._spill_codes_to_host): flip to scan-only serving —
        the streamed exact scan replaces graph traversal (better results;
        the graph's HBM-resident gathers are gone anyway) — and free the
        adjacency HBM."""
        if not self.store.codes_on_host or self.scan_only:
            return self.scan_only
        self.scan_only = True
        # tombstones move to a host mirror (the device copy is freed with
        # the rest of the graph state)
        self._alive_host = np.asarray(self.alive)
        self.alive = jnp.ones((1,), bool)
        p = self.params
        self.adj0 = jnp.full((1, p.level_0_neighbors_count), -1, jnp.int32)
        self.adj0_d = jnp.full((1, p.level_0_neighbors_count), NEG_INF, jnp.float32)
        self.up_adj = jnp.full((1, p.num_layers, p.neighbors_count), -1, jnp.int32)
        self.up_d = jnp.full((1, p.num_layers, p.neighbors_count), NEG_INF, jnp.float32)
        self.cap_up = 1
        return True

    def bulk_build(self, x: np.ndarray) -> np.ndarray:
        """Build the whole graph from *exact* k-nearest-neighbor lists.

        The reference (and classic HNSW) must insert incrementally because
        sequential CPUs cannot afford N^2 distances. On the MXU the exact
        kNN sweep is cheap (~N^2*D int8 MACs, chunked through
        flat_scan_topk so (B, N) never materializes), which yields a
        strictly better-grounded graph than incremental search AND orders
        of magnitude higher build throughput. Edges = diversity-pruned
        exact neighbors + keep-m-closest reverse edges; upper levels get
        exact kNN among the level's members.
        """
        p = self.params
        x = np.atleast_2d(np.asarray(x, np.float32))
        n0 = self.store.n
        if n0 != 0:
            raise RuntimeError("bulk_build requires an empty index")
        t0 = time.time()
        ids = self.store.add(x)
        self._sync_capacity()
        ingest_s = time.time() - t0
        _blog(f"store.add {len(ids)} rows: {ingest_s:.1f}s")
        if self.scan_only:
            # ingest spilled codes to the host tier: serve scan-only
            self.level_counts[0] += len(ids)
            if self.entry < 0 and len(ids):
                self.entry, self.entry_level = int(ids[0]), 0
            self.last_build_stats = {"ingest_s": round(ingest_s, 1), "graph_s": 0.0}
            return np.asarray(ids, np.int64)
        t_graph0 = time.time()
        n = len(ids)

        lv = self._sample_levels(n)
        self.levels[ids] = lv
        for l in range(0, p.num_layers + 1):
            self.level_counts[l] += int((lv >= l).sum())
        upper_mask = lv >= 1
        n_new_up = int(upper_mask.sum())
        if n_new_up:
            self._grow_up(self.n_up + n_new_up)
            slots = np.arange(self.n_up, self.n_up + n_new_up, dtype=np.int32)
            self.up_slot = self.up_slot.at[jnp.asarray(ids[upper_mask])].set(
                jnp.asarray(slots)
            )
            self.up_slot_host[ids[upper_mask]] = slots
            self.n_up += n_new_up

        m0 = p.level_0_neighbors_count
        max_lv = int(lv.max()) if n else 0
        if n > self.RP_THRESHOLD:
            # partitioned build: RP-tree leaf kNN + NN-descent — O(n·L·d)
            # instead of the exact sweep's O(n^2·d) (>20x at 1M)
            t0 = time.time()
            self._bulk_level_rp(np.asarray(ids, np.int64), m0, level=0)
            _blog(f"level 0 ({n} members): {time.time() - t0:.1f}s")
            for l in range(1, max_lv + 1):
                members = np.asarray(ids[lv >= l], np.int64)
                if len(members) < 2:
                    continue
                t0 = time.time()
                self._bulk_level_rp(members, p.neighbors_count, l)
                _blog(f"level {l} ({len(members)} members): {time.time() - t0:.1f}s")
        else:
            # ---- exact kNN over the full store, node-chunked ----
            valid = self.store.valid_mask()
            self._bulk_level(
                np.asarray(ids, np.int64), None, valid, m0, level=0
            )
            for l in range(1, max_lv + 1):
                members = np.asarray(ids[lv >= l], np.int64)
                if len(members) < 2:
                    continue
                member_mask = np.zeros(self.cap, bool)
                member_mask[members] = True
                self._bulk_level(
                    members, jnp.asarray(member_mask), valid,
                    p.neighbors_count, l,
                )

        best = int(lv.argmax())
        if lv[best] > self.entry_level or self.entry < 0:
            self.entry = int(ids[best])
            self.entry_level = int(lv[best])
        self.tracker.bump()
        self.tracker.mark_all("adj0", self.cap)
        self.tracker.mark_all("up", self.cap_up)
        # decomposition for honest build-throughput reporting: ingest is
        # wire/tunnel-bound, the graph core is device-bound (BENCH.md)
        self.last_build_stats = {
            "ingest_s": round(ingest_s, 1),
            "graph_s": round(time.time() - t_graph0, 1),
        }
        return ids

    #: members above this count build via RP-tree leaf kNN instead of the
    #: exact full sweep (exact is O(n^2 d) — past ~32k the partitioned
    #: build wins by orders of magnitude at equal recall-after-refine)
    RP_THRESHOLD = 32768
    #: 8192 measured strictly better than 4096 at 100k x 768: higher recall
    #: (uniform ef512 0.62 vs 0.56) AND faster build (24s vs 44s — fewer,
    #: larger leaf matmuls use the MXU better); leaf kNN memory stays
    #: bounded by query-side blocking in _leaf_knn_body
    RP_LEAF = 8192
    RP_TREES = 2
    #: 0 (r4, measured on-chip at 1M x 768 clustered): NN-descent hurt BOTH
    #: axes — build 113 s -> 56.7 s AND recall@10 ef=64 0.965 -> 0.976,
    #: ef=128 0.990 -> 0.998, ef=256 0.999 -> 1.000. Its top-k-by-distance
    #: merge overwrites diversity-pruned forward edges with closest-only
    #: edges (see BENCH.md); the 2-tree union + reverse edges already
    #: bridge leaves. NOTE: descent (or a second tree) is what connects
    #: single-tree leaf islands — RP_TREES=1 with ROUNDS=0 collapses to
    #: 0.40 recall (measured); keep trees >= 2 when rounds == 0.
    NN_DESCENT_ROUNDS = 0
    #: per-leaf approx_max_k recall target. Selection is the leaf-kNN
    #: bottleneck (einsum 6 ms vs selection 15-29 ms per 8k leaf); 0.85
    #: measured recall-neutral after tree-union + NN-descent + reverse
    #: edges (see BENCH.md)
    LEAF_RECALL_TARGET = 0.85
    #: NN-descent neighbor subsample per side (candidates = sample^2 per
    #: node). 8 beats 16 on BOTH axes at 1M x 768 (recall@10 ef=128 0.978
    #: vs 0.956): the descent merge is plain top-k by distance, so a
    #: larger candidate pool overwrites more of the diversity-pruned
    #: forward edges with closest-only edges and hurts graph navigability;
    #: gather traffic also scales with sample^2
    NN_SAMPLE = 8

    def _rp_order(self, members: np.ndarray, leaf: int, seed: int) -> np.ndarray:
        """Partition members into balanced leaves by recursive median splits
        on random projections. Returns (num_leaves, Lmax) int32, -1 padded.

        The TPU-native replacement for incremental insert locality: the
        projections are one MXU matmul and the per-level splits run on
        device via histogram approximate medians (_rp_level);
        the host only
        does one stable argsort for the final leaf layout."""
        n_mem = len(members)
        depth = max(int(np.ceil(np.log2(max(n_mem / leaf, 1.0)))), 0)
        num_leaves = 1 << depth
        if depth == 0:
            w = max(-(-n_mem // 512) * 512, 512)
            out = np.full((1, w), -1, np.int64)
            out[0, :n_mem] = members
            return out.astype(np.int32)
        rng = np.random.default_rng(seed)
        rot = rng.normal(size=(self.store.dim_pad, depth)).astype(np.float32)
        contiguous = bool(
            n_mem and members[0] == 0 and members[-1] == n_mem - 1
            and n_mem == self.store.n
        )
        if self.store.keep_raw is True:
            base = self.store._raw
            x = base[:n_mem] if contiguous else base[jnp.asarray(members)]
            proj = jnp.matmul(x, jnp.asarray(rot))
        elif self.store.kind == "u8" and not self.store.codes_on_host:
            # device codes beat host raw for the projections even when raw
            # rows exist host-side: the host path fancy-indexed 100k x 768
            # f32 rows + ran the matmul on the 1-core host — measured
            # 5-12 s of the L1 pass at 1M (r5 build log) vs milliseconds
            # as a device gather + MXU matmul. Split quality is unchanged
            # (codes are an affine quantization of the same geometry).
            base = self.store._arrays.data
            x = base[:n_mem] if contiguous else base[jnp.asarray(members)]
            proj = jnp.matmul(x.astype(jnp.float32), jnp.asarray(rot))
        elif self.store.raw_on_host:
            base = self.store._raw_host
            x = base[:n_mem] if contiguous else base[members]
            proj = jnp.asarray(x @ rot)
        elif self.store.kind == "u8":
            base = self.store._arrays.data
            x = base[:n_mem] if contiguous else base[jnp.asarray(members)]
            proj = jnp.matmul(x.astype(jnp.float32), jnp.asarray(rot))
        else:
            # subbyte without raw rows: random balanced partition (codes are
            # sign-ish bits; a projection on them adds little over random)
            perm = rng.permutation(n_mem)
            per_leaf = -(-n_mem // num_leaves)
            l_max = -(-per_leaf // 512) * 512
            out = np.full((num_leaves, l_max), -1, np.int64)
            for i in range(num_leaves):
                part = perm[i::num_leaves]
                out[i, : len(part)] = members[part]
            return out.astype(np.int32)
        # median splits via 256-bucket histograms ON DEVICE, all levels in
        # one fused program (approximate median: the threshold bucket's
        # members all go one side, so leaves imbalance by <= one bucket's
        # mass — harmless, the layout pads to the max leaf anyway). The
        # previous exact host path (one lexsort over all members per level
        # per tree) measured 184 s of a 397 s 1M build on the single-core
        # bench host; dispatching the per-level splits as chained eager ops
        # measured 842 s on the tunneled device (see _rp_level).
        _log = os.environ.get("COSDATA_BUILD_LOG")
        t0 = time.time()
        jax.block_until_ready(proj)  # keep the queued-op chain short
        if _log:
            _blog(f"    rp_order proj: {time.time() - t0:.2f}s")
        t0 = time.time()
        mp = self._bucket(n_mem, 1024)
        seg_dev = jnp.zeros(mp, jnp.int32)
        for l in range(depth):
            seg_dev = _rp_level(proj, seg_dev, l, mp)
            jax.block_until_ready(seg_dev)  # see _rp_level docstring
        if _log:
            _blog(
                f"    rp_order {depth} levels: {time.time() - t0:.2f}s"
            )
        t0 = time.time()
        seg = np.asarray(seg_dev)[:n_mem].astype(np.int64)
        counts = np.bincount(seg, minlength=num_leaves)
        if _log:
            _blog(f"    rp_order layout: {time.time() - t0:.2f}s")
        # pad the leaf width to a 512 multiple: leaf_knn's compiled shape
        # then varies over a handful of widths instead of one per level
        # (each fresh XLA compile costs seconds on this platform)
        l_max = -(-int(counts.max()) // 512) * 512
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        order = np.argsort(seg, kind="stable")
        sorted_seg = seg[order]
        rank = np.arange(n_mem) - starts[sorted_seg]
        out = np.full((num_leaves, l_max), -1, np.int64)
        out[sorted_seg, rank] = members[order]
        return out.astype(np.int32)

    #: upper levels at or below this member count build in ONE fused exact
    #: program (member x member MXU block) instead of the RP pipeline.
    #: 12288 pulls the ~10k level-2 of a 1M build into the exact path
    #: (measured 7.6 s through the RP pipeline; a 12k x 12k int8 MXU block
    #: is ~0.1 TMAC); the (Mp, Mp) f32 score block at 12288 is 576 MB
    UPPER_EXACT_MAX = 12288

    @staticmethod
    def _bucket(n: int, lo: int = 1024) -> int:
        """Round up to {2^k, 1.5*2^k}: bounded compile variants (each fresh
        program pays a multi-second first-load on this platform), <=25%
        padding waste."""
        v = lo
        while v < n:
            if (v & (v - 1)) == 0 and n <= v * 3 // 2:
                return v * 3 // 2
            v *= 2
        return v

    def _bulk_level_rp(self, members: np.ndarray, m_l: int, level: int):
        """RP-tree bulk construction of one level, organized to touch as few
        distinct compiled programs as possible: per-tree fused
        leaf-kNN+gather -> diversity prune -> one fused tail program
        (forward writes + reverse edges + NN-descent rounds). Small upper
        levels collapse into a single exact program."""
        p = self.params
        n_mem = len(members)
        kind = self._kind()
        heur = p.neighbor_selection == "heuristic"
        if level >= 1 and n_mem <= self.UPPER_EXACT_MAX:
            t0 = time.time()
            # TWO shapes for all upper-exact levels (512 and the max):
            # each distinct shape costs a fresh ~20-50 s remote compile on
            # a cold cache (the exp_r3 1M build trace's "L2 exact 52.5s /
            # L4 17.3s / L5 0.1s" is compile, not compute — L5 reused L4's
            # bucket), while padding a 973-member level to 12288 costs ~ms
            # of extra MXU work and a transient (Mp, Mp) f32 block
            mp = 512 if n_mem <= 512 else self.UPPER_EXACT_MAX
            mem_pad = np.full(mp, -1, np.int32)
            mem_pad[:n_mem] = members
            slots_pad = np.full(mp, -1, np.int32)
            slots_pad[:n_mem] = self.up_slot_host[members]
            adj_l, dist_l = HK.upper_level_exact(
                self.store.metric, kind, self.store.dim_pad, m_l, heur,
                jnp.asarray(mem_pad), jnp.asarray(slots_pad), self.up_slot,
                self.up_adj[:, level - 1], self.up_d[:, level - 1],
                self.store._arrays,
            )
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(adj_l)
                _blog(f"  L{level} exact kernel: {time.time() - t0:.1f}s")
            t0 = time.time()
            self.up_adj = self.up_adj.at[:, level - 1].set(adj_l)
            self.up_d = self.up_d.at[:, level - 1].set(dist_l)
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(self.up_adj)
                _blog(f"  L{level} table set: {time.time() - t0:.1f}s")
            return
        kk = min(2 * m_l, self.RP_LEAF - 1)
        # upper levels are navigation-only: one tree suffices (level-0
        # candidate quality is what bounds recall; L1 of a 1M build spent
        # 10.4 s of which ~half was the second tree)
        trees = self.RP_TREES if (n_mem > self.RP_LEAF and level == 0) else 1
        if level == 0 and self.NN_DESCENT_ROUNDS == 0 and trees < 2:
            # rounds=0 is recall-safe ONLY with the 2-tree union bridging
            # leaf islands (single tree + rounds=0 measured 0.40 recall);
            # a user tuning RP_TREES=1 must not silently collapse recall
            trees = 2
        mp = self._bucket(n_mem, 1024)
        parts_i: list = []
        parts_s: list = []
        for t in range(trees):
            t0 = time.time()
            order = self._rp_order(members, self.RP_LEAF, seed=101 + 31 * t + level)
            _blog(f"  L{level} tree{t} rp_order: {time.time() - t0:.1f}s")
            t0 = time.time()
            l_sz = order.shape[1]
            # bound the (lc, L, L) score block to ~256 MB
            leaf_chunk = max(1, (1 << 26) // max(l_sz * l_sz, 1))
            # every member sits in exactly one leaf per tree: its candidate
            # row comes from an inverse-permutation gather fused into the
            # leaf-kNN program
            flat = order.reshape(-1)
            valid = flat >= 0
            pos = np.zeros(self.cap, np.int64)
            pos[flat[valid]] = np.flatnonzero(valid)
            pos_mem = np.full(mp, -1, np.int32)
            pos_mem[:n_mem] = pos[members]
            ids_m, sc_m = HK.leaf_knn_gather(
                self.store.metric, kind, self.store.dim_pad, kk, leaf_chunk,
                jnp.asarray(order), jnp.asarray(pos_mem), self.store._arrays,
                rt=self.LEAF_RECALL_TARGET,
            )
            parts_i.append(ids_m)
            parts_s.append(sc_m)
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(ids_m)
                _blog(f"  L{level} tree{t} leaf_knn: {time.time() - t0:.1f}s")
        mem_pad = np.full(mp, -1, np.int32)
        mem_pad[:n_mem] = members
        mem_dev = jnp.asarray(mem_pad)
        t0 = time.time()
        # per-tree parts concat inside the prune's chunk scan — never as a
        # whole-level array (2 GB at 1M x 2 trees, OOMs the shared chip)
        fwd_ids, fwd_d = _prune_candidates(
            self.store.metric, kind, self.store.dim_pad, m_l, 1024, heur,
            mem_dev, tuple(parts_i), tuple(parts_s), self.store._arrays,
        )
        del parts_i, parts_s
        if os.environ.get("COSDATA_BUILD_LOG"):
            jax.block_until_ready(fwd_ids)
            _blog(f"  L{level} prune: {time.time() - t0:.1f}s")
        t0 = time.time()
        if level == 0:
            self.adj0, self.adj0_d = HK.finalize_level0(
                self.store.metric, kind, self.store.dim_pad, m_l,
                self.NN_DESCENT_ROUNDS, self.NN_SAMPLE, 256,
                self.adj0, self.adj0_d, mem_dev, fwd_ids, fwd_d,
                self.store._arrays,
            )
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(self.adj0)
                _blog(f"  L{level} finalize: {time.time() - t0:.1f}s")
        else:
            slots_pad = np.full(mp, -1, np.int32)
            slots_pad[:n_mem] = self.up_slot_host[members]
            adj_l, dist_l = HK.upper_level_apply(
                m_l, mem_dev, jnp.asarray(slots_pad), self.up_slot,
                fwd_ids, fwd_d,
                self.up_adj[:, level - 1], self.up_d[:, level - 1],
            )
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(adj_l)
                _blog(f"  L{level} apply: {time.time() - t0:.1f}s")
            t0 = time.time()
            self.up_adj = self.up_adj.at[:, level - 1].set(adj_l)
            self.up_d = self.up_d.at[:, level - 1].set(dist_l)
            if os.environ.get("COSDATA_BUILD_LOG"):
                jax.block_until_ready(self.up_adj)
                _blog(f"  L{level} table set: {time.time() - t0:.1f}s")

    def _bulk_level(self, members, member_mask, valid, m_l: int, level: int):
        """Exact-kNN forward edges + reverse merge for one level."""
        p = self.params
        node_chunk = 2048
        scan_chunk = min(65536, self.cap)
        if self.cap % scan_chunk:
            # grow to a scan-chunk multiple: the halving fallback can
            # degrade to tiny chunks on odd capacities (e.g. 1000064)
            self.store._grow_to(-(-self.cap // scan_chunk) * scan_chunk)
            self._sync_capacity()
            valid = self.store.valid_mask()
            if member_mask is not None:
                pad = self.cap - member_mask.shape[0]
                member_mask = jnp.pad(member_mask, ((0, pad),))
        while self.cap % scan_chunk:
            scan_chunk //= 2
        mask = valid if member_mask is None else (valid & member_mask)
        # 1) dispatch every node chunk (pipelined, no blocking fetch)
        pending = []
        for s in range(0, len(members), node_chunk):
            part = members[s : s + node_chunk]
            w = len(part)
            wp = node_chunk
            pad = (
                np.concatenate([part, np.full(wp - w, part[-1], part.dtype)])
                if w < wp
                else part
            )
            f_ids, f_d = _bulk_knn_edges(
                self.store.metric,
                self._kind(),
                self.store.dim_pad,
                m_l,
                scan_chunk,
                p.neighbor_selection == "heuristic",
                jnp.asarray(pad, jnp.int32),
                self.store._arrays,
                mask,
            )
            # forward writes stay on device (no sync)
            part32 = jnp.asarray(part, jnp.int32)
            if level == 0:
                self.adj0 = self.adj0.at[part32].set(f_ids[:w])
                self.adj0_d = self.adj0_d.at[part32].set(f_d[:w])
            else:
                slots = jnp.asarray(self.up_slot_host[part])
                self.up_adj = self.up_adj.at[slots, level - 1].set(f_ids[:w])
                self.up_d = self.up_d.at[slots, level - 1].set(f_d[:w])
            pending.append((part, f_ids, f_d, w))
        # 2) one blocking fetch for the whole level
        fetched = jax.device_get([(f, d) for _, f, d, _ in pending])
        # 3) reverse edges for the whole level in one grouped merge
        src_all = np.concatenate([part[:w] for part, _, _, w in pending])
        fwd_all = np.concatenate(
            [np.asarray(f)[:w] for (_, _, _, w), (f, _) in zip(pending, fetched)]
        )
        dist_all = np.concatenate(
            [np.asarray(d)[:w] for (_, _, _, w), (_, d) in zip(pending, fetched)]
        )
        # dedup is required here: reverse edges heavily overlap the forward
        # kNN rows (near-symmetric), and duplicates would halve the degree
        self._apply_back_edges(level, m_l, src_all, fwd_all, dist_all, dedup=True)

    def _search_levels(self, q, b: int, ef0: int, ef_up: int, record_from: int = 0):
        """Descend the hierarchy; returns (ids, scores) at level 0 plus a dict
        of per-upper-level results for levels <= record_from."""
        p = self.params
        per_level = {}
        vimpl = _visited_impl(b, self.up_slot.shape[0])
        start = jnp.full((b, 1), self.entry, jnp.int32)
        for l in self._active_upper_levels():
            ef = ef0 if l <= record_from else ef_up
            ids, scores = HK.beam_search(
                self.store.metric,
                self._kind(),
                self.store.dim_pad,
                ef,
                p.expand,
                p.visited_cap,
                p.max_iters,
                q,
                self.store._arrays,
                self.up_adj[:, l - 1],
                self.up_slot,
                start,
                use_row_of=True,
                visited_impl=vimpl,
            )
            if l <= record_from:
                per_level[l] = (ids, scores)
            start = ids[:, : max(p.ef_upper, 1)]
        ids, scores = HK.beam_search(
            self.store.metric,
            self._kind(),
            self.store.dim_pad,
            ef0,
            p.expand,
            p.visited_cap,
            p.max_iters,
            q,
            self.store._arrays,
            self.adj0,
            self.up_slot,  # unused
            start,
            use_row_of=False,
            visited_impl=vimpl,
        )
        return ids, scores, per_level

    def _kind(self) -> str:
        return "float" if self.store.kind in ("f16", "f32") else self.store.kind

    def _add_wave(self, x: np.ndarray) -> np.ndarray:
        p = self.params
        n0 = self.store.n
        ids = self.store.add(x)
        self._sync_capacity()
        if self.scan_only:  # ingest spilled codes to the host tier
            self.level_counts[0] += len(ids)
            if self.entry < 0 and len(ids):
                self.entry, self.entry_level = int(ids[0]), 0
            return np.asarray(ids, np.int64)
        w = len(ids)
        # pad the *search-side* arrays to a power-of-two wave width so waves
        # hit a bounded set of compiled kernels (padded rows ignored on write)
        wp = max(64, 1 << int(np.ceil(np.log2(w))))
        pad_ids = (
            np.concatenate([ids, np.full(wp - w, ids[-1], ids.dtype)])
            if w < wp
            else ids
        )
        ids32 = jnp.asarray(pad_ids, jnp.int32)

        lv = self._sample_levels(w)
        self.levels[ids] = lv
        for l in range(0, p.num_layers + 1):
            self.level_counts[l] += int((lv >= l).sum())
        # assign upper slots
        upper_mask = lv >= 1
        n_new_up = int(upper_mask.sum())
        if n_new_up:
            self._grow_up(self.n_up + n_new_up)
            slots = np.arange(self.n_up, self.n_up + n_new_up, dtype=np.int32)
            self.up_slot = self.up_slot.at[jnp.asarray(ids[upper_mask])].set(
                jnp.asarray(slots)
            )
            self.up_slot_host[ids[upper_mask]] = slots
            self.n_up += n_new_up

        q_wave = self.store.gather_as_queries(ids32)
        max_lv = int(lv.max()) if w else 0

        # search existing graph for candidates (per level)
        if n0 > 0 and self.entry >= 0:
            c_ids, c_scores, per_level = self._search_levels(
                q_wave, wp, p.ef_construction, p.ef_upper, record_from=max_lv
            )
        else:
            c_ids = jnp.full((wp, p.ef_construction), -1, jnp.int32)
            c_scores = jnp.full((wp, p.ef_construction), NEG_INF)
            per_level = {}

        wavemat = HK.wave_scores(
            self.store.metric, self._kind(), self.store.dim_pad, q_wave, ids32,
            self.store._arrays, causal=True,
        )

        lv_padded = np.full(wp, -1, np.int32)
        lv_padded[:w] = lv
        levels_dev = jnp.asarray(lv_padded)
        for l in range(0, max_lv + 1):
            m_l = p.level_0_neighbors_count if l == 0 else p.neighbors_count
            if l == 0:
                cl_ids, cl_scores = c_ids, c_scores
            elif l in per_level:
                cl_ids, cl_scores = per_level[l]
            else:
                cl_ids = jnp.full((wp, p.ef_construction), -1, jnp.int32)
                cl_scores = jnp.full((wp, p.ef_construction), NEG_INF)
            merged_ids, merged_scores = _merge_candidates(
                cl_ids, cl_scores, wavemat, ids32, levels_dev >= l, 2 * m_l
            )
            if p.neighbor_selection == "heuristic":
                pair = HK.pairwise_scores(
                    self.store.metric, self._kind(), self.store.dim_pad,
                    merged_ids, self.store._arrays,
                )
                fwd_ids, fwd_d = HK.select_diverse(
                    merged_ids, merged_scores, pair, m_l
                )
            else:
                fwd_ids, fwd_d = _top_m(merged_ids, merged_scores, m_l)
            # keep only rows for wave nodes that exist at this level
            member = np.where(lv >= l)[0]
            if len(member) == 0:
                continue
            mem_j = jnp.asarray(member)
            rows_fwd = fwd_ids[mem_j]
            dist_fwd = fwd_d[mem_j]
            if l == 0:
                self.adj0 = self.adj0.at[ids32[mem_j]].set(rows_fwd)
                self.adj0_d = self.adj0_d.at[ids32[mem_j]].set(dist_fwd)
            else:
                slots = jnp.asarray(self.up_slot_host[ids[member]])
                self.up_adj = self.up_adj.at[slots, l - 1].set(rows_fwd)
                self.up_d = self.up_d.at[slots, l - 1].set(dist_fwd)

            # ---- back edges ----
            f_ids = np.asarray(rows_fwd)
            f_d = np.asarray(dist_fwd)
            src = ids[member]
            self._apply_back_edges(l, m_l, src, f_ids, f_d)

        # entry point
        wave_best = int(lv.argmax())
        if lv[wave_best] > self.entry_level or self.entry < 0:
            self.entry = int(ids[wave_best])
            self.entry_level = int(lv[wave_best])
        self.tracker.bump()
        self.tracker.mark_rows("adj0", ids)
        self.tracker.mark_rows("up", self.up_slot_host[ids])
        return ids

    def refine(self) -> None:
        """One NN-descent-style refinement pass: re-search candidates for
        every node against the *finished* graph and rebuild its forward
        edges (back edges merged keep-m-closest). Wave construction builds
        each wave against a graph snapshot; one refinement pass recovers
        most of the recall gap to sequential insertion at ~1x build cost."""
        if self.scan_only:
            return  # no graph to refine (hamming scan-only mode)
        p = self.params
        n = self.n
        if n == 0 or self.entry < 0:
            return
        self.tracker.bump()
        self.tracker.mark_all("adj0", self.cap)
        self.tracker.mark_all("up", self.cap_up)
        for start in range(0, n, p.wave_size):
            ids = np.arange(start, min(start + p.wave_size, n), dtype=np.int64)
            w = len(ids)
            wp = max(64, 1 << int(np.ceil(np.log2(w))))
            pad_ids = (
                np.concatenate([ids, np.full(wp - w, ids[-1], ids.dtype)])
                if w < wp
                else ids
            )
            ids32 = jnp.asarray(pad_ids, jnp.int32)
            q = self.store.gather_as_queries(ids32)
            lv = self.levels[ids]
            max_lv = int(lv.max()) if w else 0
            c_ids, c_scores, per_level = self._search_levels(
                q, wp, p.ef_construction, p.ef_upper, record_from=max_lv
            )
            for l in range(0, max_lv + 1):
                m_l = (
                    p.level_0_neighbors_count if l == 0 else p.neighbors_count
                )
                cl_ids, cl_scores = (
                    (c_ids, c_scores) if l == 0 else per_level.get(
                        l,
                        (
                            jnp.full((wp, p.ef_construction), -1, jnp.int32),
                            jnp.full((wp, p.ef_construction), NEG_INF),
                        ),
                    )
                )
                # drop self-matches (the node is in the graph it searched)
                self_mask = cl_ids == ids32[:, None]
                cl_ids = jnp.where(self_mask, -1, cl_ids)
                cl_scores = jnp.where(self_mask, NEG_INF, cl_scores)
                merged_ids, merged_scores = _top_m(cl_ids, cl_scores, 2 * m_l)
                if p.neighbor_selection == "heuristic":
                    pair = HK.pairwise_scores(
                        self.store.metric, self._kind(), self.store.dim_pad,
                        merged_ids, self.store._arrays,
                    )
                    fwd_ids, fwd_d = HK.select_diverse(
                        merged_ids, merged_scores, pair, m_l
                    )
                else:
                    fwd_ids, fwd_d = _top_m(merged_ids, merged_scores, m_l)
                member = np.where(lv >= l)[0]
                if len(member) == 0:
                    continue
                mem_j = jnp.asarray(member)
                rows_fwd = fwd_ids[mem_j]
                dist_fwd = fwd_d[mem_j]
                if l == 0:
                    self.adj0 = self.adj0.at[ids32[mem_j]].set(rows_fwd)
                    self.adj0_d = self.adj0_d.at[ids32[mem_j]].set(dist_fwd)
                else:
                    slots = jnp.asarray(self.up_slot_host[ids[member]])
                    self.up_adj = self.up_adj.at[slots, l - 1].set(rows_fwd)
                    self.up_d = self.up_d.at[slots, l - 1].set(dist_fwd)
                self._apply_back_edges(
                    l, m_l, ids[member], np.asarray(rows_fwd), np.asarray(dist_fwd)
                )

    def _apply_back_edges(self, level: int, m_l: int, src, f_ids, f_d,
                          dedup: bool = True):
        """Group forward edges by target and run the keep-m-closest merge
        (vectorized grouping; targets processed in bounded chunks)."""
        w, m = f_ids.shape
        u = np.repeat(src, m)
        v = f_ids.ravel()
        d = f_d.ravel()
        ok = v >= 0
        u, v, d = u[ok], v[ok], d[ok]
        if len(v) == 0:
            return
        # group by target, best-incoming first (vectorized; a python loop
        # here dominated bulk-build time)
        order = np.lexsort((-d, v))
        u, v, d = u[order], v[order], d[order]
        uniq_v, starts, counts = np.unique(v, return_index=True, return_counts=True)
        if level == 0:
            self.tracker.mark_rows("adj0", uniq_v)
        else:
            self.tracker.mark_rows("up", self.up_slot_host[uniq_v])
        col = np.arange(len(v)) - np.repeat(starts, counts)
        grp = np.repeat(np.arange(len(uniq_v)), counts)
        # cap group width at the m closest incoming edges per target:
        # the current row already holds m exact neighbors, so incoming
        # entries beyond the m best almost never survive the merge
        g_cap = m_l
        keep = col < g_cap
        g = 1 << int(np.ceil(np.log2(min(max(int(counts.max()), 4), g_cap))))
        # bounded target blocks keep the merge kernel's scratch small
        t_block = 16384
        for base in range(0, len(uniq_v), t_block):
            hi = min(base + t_block, len(uniq_v))
            nblk = hi - base
            t = 1 << int(np.ceil(np.log2(max(nblk, 64))))
            t = min(t, t_block)
            sel = keep & (grp >= base) & (grp < hi)
            inc_ids = np.full((t, g), -1, np.int32)
            inc_d = np.full((t, g), np.float32(-3.0e38))
            inc_ids[grp[sel] - base, col[sel]] = u[sel]
            inc_d[grp[sel] - base, col[sel]] = d[sel]
            # padded target rows use -1 and are dropped by the scatter
            blk_v = np.pad(uniq_v[base:hi], (0, t - nblk), constant_values=-1)
            if level == 0:
                self.adj0, self.adj0_d = HK.merge_neighbors(
                    self.adj0,
                    self.adj0_d,
                    jnp.asarray(blk_v.astype(np.int32)),
                    jnp.asarray(inc_ids),
                    jnp.asarray(inc_d),
                    m_l,
                    dedup=dedup,
                )
            else:
                rows = np.where(
                    blk_v >= 0, self.up_slot_host[np.maximum(blk_v, 0)], -1
                )
                self.up_adj, self.up_d = _merge_neighbors_3d(
                    self.up_adj,
                    self.up_d,
                    jnp.asarray(rows.astype(np.int32)),
                    level - 1,
                    jnp.asarray(inc_ids),
                    jnp.asarray(inc_d),
                    m_l,
                    dedup=dedup,
                )

    # ---------------------------------------------------------------- search

    def search(
        self,
        queries: np.ndarray,
        top_k: int = 10,
        ef: int | None = None,
        rerank: bool = True,
        rerank_keep: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched ANN search. Returns (ids (B, k), scores (B, k)); id -1 pads."""
        if self.store.codes_on_host and getattr(self, "graph_on_spill", False):
            # kept-graph spill: adjacency in HBM, codes in host RAM —
            # beam waves gather only the frontier's rows (force_spill doc)
            return self._search_graph_hostcodes(queries, top_k, ef, rerank)
        if self.scan_only:  # hamming: exact chunked scan (see __init__)
            return self.search_brute(queries, top_k, rerank=rerank)
        host_rerank = rerank and self.store.raw_on_host
        if host_rerank:
            # beyond-HBM mode: the device returns the full shortlist in
            # quantized-space order; the exact rerank runs against the
            # host-resident raw rows (cache_loader.rs's lazy-raw role)
            # clamp ef up to top_k first (search_device does the same), so
            # the returned arrays always have >= top_k columns
            ef_eff = max(int(ef or self.params.ef_search), top_k)
            keep = min(max(rerank_keep or 5 * top_k, top_k), ef_eff)
            out = self.search_device(
                queries, keep, ef, rerank=False, rerank_keep=keep
            )
        else:
            out = self.search_device(queries, top_k, ef, rerank, rerank_keep)
        if out is None:
            b = len(np.atleast_2d(queries))
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        ids, scores = jax.device_get(out)  # one round trip
        ids = ids.astype(np.int64)
        if host_rerank:
            re = self.store.rerank_scores_host(
                np.atleast_2d(np.asarray(queries, np.float32)), ids
            )
            re = np.where(ids >= 0, re, -np.inf)
            order = np.argsort(-re, axis=1, kind="stable")[:, :top_k]
            ids = np.take_along_axis(ids, order, axis=1)
            scores = np.take_along_axis(re, order, axis=1).astype(np.float32)
        return ids, scores

    def search_device(
        self,
        queries: np.ndarray,
        top_k: int = 10,
        ef: int | None = None,
        rerank: bool = True,
        rerank_keep: int | None = None,
    ):
        """Like :meth:`search` but returns device arrays without host sync
        (lets a sharded composition overlap dispatches across devices), or
        None for an empty index.

        Mirrors search_internal + finalize_ann_results
        (indexes/hnsw/mod.rs:390-441, vector_store.rs:404-445): beam search
        with ef_search, keep `rerank_keep` candidates (default 5*k, the
        reference's factor), exact-rerank on raw f32, top-k. Reranking is a
        single gather + (B, keep, D) dot — deepening it is nearly free next
        to the beam sweep, so quantization-noise-limited recall can be
        bought back with rerank_keep=ef.
        """
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        if self.n == 0 or self.entry < 0:
            return None
        p = self.params
        ef = int(ef or p.ef_search)
        ef = max(ef, top_k)
        # scale the wave width with the beam: wide beams converge in fewer,
        # larger (more MXU-efficient) waves — measured 2x faster at ef=512
        # than expanding 4-at-a-time, identical recall
        expand = max(p.expand, ef // 64)
        # keep the visited ring's wave-depth constant as waves widen
        vcap = max(p.visited_cap, 512 * expand)
        # pad the batch to a power of two so arbitrary client batch sizes
        # reuse a handful of compiled kernels
        bp = max(8, 1 << int(np.ceil(np.log2(b))))
        if bp != b:
            queries = np.concatenate([queries, np.repeat(queries[-1:], bp - b, 0)])
        q_raw = self.store.ship_queries(queries)
        upper = self._active_upper_levels()
        # cache the small per-call device constants (entry id, upper-level
        # list): on a remote link every host->device transfer is a round trip
        ckey = (self.entry, tuple(upper))
        cached = getattr(self, "_search_consts", None)
        if cached is None or cached[0] != ckey:
            cached = (
                ckey,
                jnp.int32(self.entry),
                jnp.asarray(np.asarray(upper, np.int32)),
            )
            self._search_consts = cached
        entry_dev, upper_dev = cached[1], cached[2]
        keep = min(max(rerank_keep or 5 * top_k, top_k), ef)
        rerank = bool(rerank and self.store.keep_raw is True)
        raw = self.store._raw if rerank else q_raw  # dummy when not reranking
        top_i, top_s = _fused_search(
            self.store.metric,
            self._kind(),
            self.store.dim_pad,
            self.store.dim,
            self.store.resolution,
            ef,
            p.ef_upper,
            expand,
            vcap,
            p.max_iters,
            len(upper),
            keep,
            top_k,
            rerank,
            self.store.range[0],
            self.store.range[1],
            q_raw,
            self.store._arrays,
            raw,
            self.adj0,
            self.up_adj,
            self.up_slot,
            self.alive,
            entry_dev,
            upper_dev,
            visited_impl=_visited_impl(bp, self.up_slot.shape[0]),
        )
        return top_i[:b], top_s[:b]

    #: capacities at/above one scan chunk use the fused chunked scan; the
    #: full (B, cap) score matrix is HBM-hostile past ~100k rows
    SCAN_CHUNK = 1 << 16

    def _rerank_factor(self) -> int:
        """Exact-rerank shortlist depth as a multiple of top_k. Scales with
        quantization coarseness: 1-2 bit codes order so noisily that the
        true top-k routinely sits outside a 5x shortlist (the reference's
        factor, vector_store.rs:404-445 — calibrated for u8); 20x costs one
        slightly deeper gather+dot. Shared by the device scan, the host
        rerank wrapper, and the beyond-HBM streamed path so spilled and
        resident stores nominate identically."""
        if self.store.kind == "subbyte" and self.store.resolution <= 2:
            return 20
        return 5

    def search_brute(
        self,
        queries: np.ndarray,
        top_k: int = 10,
        mask: np.ndarray | None = None,
        rerank: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        if self.store.codes_on_host:
            return self._search_streamed(queries, top_k, mask, rerank)
        host_rerank = rerank and self.store.raw_on_host
        # never fetch fewer than top_k columns: the device scan pads with
        # -1 past n, keeping the (B, top_k) output contract on tiny indexes;
        # rerank depth matches search_brute_device's coarse-code ladder
        fetch = (
            max(min(self._rerank_factor() * top_k, max(self.n, 1)), top_k)
            if host_rerank else top_k
        )
        out = self.search_brute_device(queries, fetch, mask, rerank)
        if out is None:
            b = len(np.atleast_2d(queries))
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        ids, vals = jax.device_get(out)
        ids = ids.astype(np.int64)
        vals = np.asarray(vals)
        if host_rerank:
            re = self.store.rerank_scores_host(
                np.atleast_2d(np.asarray(queries, np.float32)), ids
            )
            re = np.where(ids >= 0, re, -np.inf)
            order = np.argsort(-re, axis=1, kind="stable")[:, :top_k]
            ids = np.take_along_axis(ids, order, axis=1)
            vals = np.take_along_axis(re, order, axis=1).astype(np.float32)
        return ids, vals

    def search_brute_device(
        self,
        queries: np.ndarray,
        top_k: int = 10,
        mask: np.ndarray | None = None,
        rerank: bool = True,
    ):
        """Exact masked scan over the quantized store + exact f32 rerank —
        used for selective metadata filters where graph traversal would
        strand, and as the serving engine for collections small enough that
        a full MXU sweep beats graph traversal (the contract is search
        results, not a graph walk — search/repo.rs:14-166). Chunked via
        fused_flat_search so (B, cap) scores never materialize; returns
        device arrays (no host sync), or None for an empty index."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        if self.n == 0:
            return None
        do_rerank = bool(rerank and self.store.keep_raw is True)
        keep = min(
            self._rerank_factor() * top_k if do_rerank else top_k, self.cap
        )
        # pad batch to a power of two: compile-cache reuse across client sizes
        bp = max(8, 1 << int(np.ceil(np.log2(b))))
        if bp != b:
            queries = np.concatenate([queries, np.repeat(queries[-1:], bp - b, 0)])
        valid = self.store.valid_mask() & self.alive
        if mask is not None:
            m = np.zeros(self.cap, bool)
            m[: len(mask)] = mask
            valid = valid & jnp.asarray(m)
        if self.cap >= self.SCAN_CHUNK:
            from cosdata_tpu.ops.flat_scan import fused_flat_search

            if self.cap % self.SCAN_CHUNK:
                self.store._grow_to(
                    -(-self.cap // self.SCAN_CHUNK) * self.SCAN_CHUNK
                )
                self._sync_capacity()
                valid = self.store.valid_mask() & self.alive
                if mask is not None:
                    m = np.zeros(self.cap, bool)
                    m[: len(mask)] = mask
                    valid = valid & jnp.asarray(m)
            from cosdata_tpu.ops.storage import use_codes_engine

            if use_codes_engine(self.store):
                from cosdata_tpu.ops.flat_scan import fused_flat_search_codes

                qc = self.store.ship_query_codes(queries)
                raw = self.store._raw if do_rerank else qc.data
                q_re = (
                    self.store._pad_dims(queries, ship_f16=True)
                    if do_rerank else qc.mags
                )
                group = 32
                k_bins = max(64, -(-keep // group) * 2)
                select = os.environ.get("COSDATA_SCAN_SELECT", "approx")
                ids, vals = fused_flat_search_codes(
                    self.store.metric, self.store.dim, self.store.dim_pad,
                    k_bins, group, keep, top_k, self.SCAN_CHUNK, do_rerank,
                    qc, self.store._arrays, raw, q_re, valid, select=select,
                )
                return ids[:b], vals[:b]
            q_raw = self.store.ship_queries(queries)
            raw = self.store._raw if do_rerank else q_raw
            ids, vals = fused_flat_search(
                self.store.metric, self._kind(), self.store.dim,
                self.store.dim_pad, self.store.resolution, keep, top_k,
                self.SCAN_CHUNK, do_rerank, q_raw, self.store.range[0],
                self.store.range[1], self.store._arrays, raw, valid,
            )
            return ids[:b], vals[:b]
        q = self.store.quantize_queries(queries)
        scores = self.store.scores_all(q)
        vals, ids = jax.lax.top_k(jnp.where(valid[None, :], scores, NEG_INF), keep)
        if do_rerank:
            re = self.store.rerank_scores(queries, ids)
            vals = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
            vals, pos = jax.lax.top_k(vals, top_k)
            ids = jnp.take_along_axis(ids, pos, axis=1)
        else:
            vals, ids = vals[:, :top_k], ids[:, :top_k]
        ids = jnp.where(vals > NEG_INF / 2, ids, -1)
        return ids[:b], vals[:b]

    def _search_streamed(
        self,
        queries: np.ndarray,
        top_k: int,
        mask: np.ndarray | None,
        rerank: bool,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Beyond-HBM serving: codes streamed from host RAM through the
        chunked device scan (ops/flat_scan.streamed_flat_topk), exact
        rerank against the host-resident raw rows."""
        from cosdata_tpu.ops.flat_scan import streamed_flat_topk

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        if self.n == 0:
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        valid_np = np.zeros(self.store.capacity, bool)
        valid_np[: self.n] = True
        if getattr(self, "_alive_host", None) is not None:
            valid_np &= self._alive_host[: self.store.capacity]
        if mask is not None:
            m = np.zeros(self.store.capacity, bool)
            m[: len(mask)] = mask
            valid_np &= m
        host_rerank = rerank and self.store.raw_on_host
        fetch = (
            max(min(self._rerank_factor() * top_k, max(self.n, 1)), top_k)
            if host_rerank else top_k
        )
        top_s, top_i = streamed_flat_topk(
            self.store.metric, self.store, queries, fetch, valid_np
        )
        vals, ids = jax.device_get((top_s, top_i))
        ids = ids.astype(np.int64)
        ids = np.where(vals > NEG_INF / 2, ids, -1)
        if host_rerank:
            re = self.store.rerank_scores_host(queries, np.maximum(ids, 0))
            re = np.where(ids >= 0, re, -np.inf)
            order = np.argsort(-re, axis=1, kind="stable")[:, :top_k]
            ids = np.take_along_axis(ids, order, axis=1)
            vals = np.take_along_axis(re, order, axis=1).astype(np.float32)
        else:
            ids, vals = ids[:, :top_k], vals[:, :top_k]
        return ids, vals

    def force_spill(self, keep_graph: bool = False) -> None:
        """Explicitly move quantized codes to the host tier (organic
        spills happen on growth past COSDATA_HBM_GB; this is the operator
        /bench API). ``keep_graph=True`` retains level-0 adjacency in HBM
        and serves GRAPH search with per-wave host row gathers
        (_search_graph_hostcodes) — the beyond-HBM operating point where
        graph gathers touch ~ef*m rows/query while the streamed scan must
        move the whole corpus (VERDICT r4 missing #5; reference role
        cache_loader.rs:25-278). Kept-graph mode is read-frozen: a later
        add() downgrades to scan-only serving."""
        if self.store.codes_on_host:
            return
        if not self.store._spillable():
            raise RuntimeError(
                "store is not spillable (device-raw keeps rows in HBM)"
            )
        if (
            not keep_graph
            or self.level_counts[0] == 0
            or self.store.kind != "u8"
        ):
            self.store._spill_codes_to_host()
            self._maybe_spill_to_scan_only()
            return
        self.store._spill_codes_to_host()
        self.graph_on_spill = True
        self._alive_host = np.asarray(self.alive)[: self.cap].copy()
        self.alive = jnp.ones((1,), bool)
        p = self.params
        # search needs only the level-0 adjacency ids: free the f32 edge
        # distances and upper tables (upper levels are replaced by the
        # diverse random-entry seeding of the host-codes beam)
        self.adj0_d = jnp.full(
            (1, p.level_0_neighbors_count), NEG_INF, jnp.float32
        )
        self.up_adj = jnp.full(
            (1, p.num_layers, p.neighbors_count), -1, jnp.int32
        )
        self.up_d = jnp.full(
            (1, p.num_layers, p.neighbors_count), NEG_INF, jnp.float32
        )
        self.up_slot = jnp.full((1,), -1, jnp.int32)
        self.cap_up = 1

    #: beam entries expanded per wave in the host-codes graph engine —
    #: wider than the device loop's default: each wave costs a host round
    #: trip, so fewer, fatter waves win
    HOSTCODES_EXPAND = 8
    #: random alive entry seeds (stand-in for the freed upper levels)
    HOSTCODES_SEEDS = 32

    def _host_rows_chunk(self, ids_mat: np.ndarray, alive: np.ndarray):
        """Gather the UNIQUE alive rows of an id matrix from the spilled
        host code tier as an uploadable QuantizedU8 chunk + slot map."""
        from cosdata_tpu.ops import quantize as Q

        a = self.store._arrays
        flat = ids_mat.reshape(-1)
        ok = flat >= 0
        ok[ok] = alive[flat[ok]]
        uniq, inv = np.unique(flat[ok], return_inverse=True)
        u = len(uniq)
        up = max(256, _next_pow2(max(u, 1)))
        data = np.zeros((up, self.store.dim_pad), np.int8)
        sums = np.zeros((up,), np.int32)
        mags = np.ones((up,), np.float32)  # 1.0 pad: no 0-div in cosine
        if u:
            data[:u] = a.data[uniq]
            sums[:u] = a.sums[uniq]
            mags[:u] = a.mags[uniq]
        slots = np.full(ids_mat.shape, -1, np.int32)
        slots.reshape(-1)[ok] = inv
        chunk = Q.QuantizedU8(
            jnp.asarray(data), jnp.asarray(sums), jnp.asarray(mags),
            jnp.float32(a.a), jnp.float32(a.b), jnp.float32(a.dtrue),
        )
        return chunk, jnp.asarray(slots)

    def _search_graph_hostcodes(
        self, queries: np.ndarray, top_k: int, ef: int | None, rerank: bool
    ) -> tuple[np.ndarray, np.ndarray]:
        """Graph search over a kept-graph spilled index: adjacency lives
        in HBM, code rows live in host RAM; each beam wave downloads the
        fresh frontier ids, host-gathers their unique rows, uploads the
        chunk, and merges scores on device. Wire per query ~ ef*m rows
        (shared-hub dedup cuts it further) vs the whole corpus for the
        streamed scan."""
        import cosdata_tpu.ops.hnsw_kernels as HK

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        if self.n == 0 or self.entry < 0:
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        bp = max(8, _next_pow2(b))
        if bp != b:
            queries = np.concatenate(
                [queries, np.repeat(queries[-1:], bp - b, 0)]
            )
        alive = self._alive_host
        ef_eff = max(int(ef or self.params.ef_search), top_k)
        q = self.store.ship_query_codes(queries)
        rng = np.random.default_rng(0xC05DA7A)
        cand = np.flatnonzero(alive[: self.n])
        if not len(cand):
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        n_seed = min(self.HOSTCODES_SEEDS - 1, len(cand))
        seeds = rng.choice(cand, size=n_seed, replace=False)
        start_ids = np.full((bp, n_seed + 1), -1, np.int32)
        start_ids[:, 0] = (
            self.entry if alive[self.entry] else int(seeds[0])
        )
        start_ids[:, 1:] = seeds[None, :]
        chunk, slots = self._host_rows_chunk(start_ids, alive)
        bitmask_w = -(-self.cap // 32)
        ids, scores, expanded, visited = HK.beam_hostcodes_init(
            self.store.metric, self.store.dim_pad, ef_eff, bitmask_w,
            q, chunk, slots, jnp.asarray(start_ids),
        )
        for _ in range(self.params.max_iters):
            nbrs, expanded, visited, done = HK.beam_wave_select(
                ids, scores, expanded, visited, self.adj0,
                self.HOSTCODES_EXPAND,
            )
            nbrs_np, done_np = jax.device_get((nbrs, done))
            if bool(done_np):
                break
            chunk, slots = self._host_rows_chunk(
                nbrs_np.astype(np.int64), alive
            )
            ids, scores, expanded = HK.beam_wave_merge(
                self.store.metric, self.store.dim_pad, q, chunk, slots,
                jnp.asarray(nbrs_np), ids, scores, expanded,
            )
        ids_np, sc_np = jax.device_get((ids, scores))
        ids_np = ids_np[:b].astype(np.int64)
        sc_np = np.asarray(sc_np[:b])
        ids_np = np.where(sc_np > NEG_INF / 2, ids_np, -1)
        if rerank and self.store.raw_on_host:
            keep = min(max(5 * top_k, top_k), ef_eff)
            ids_np, sc_np = ids_np[:, :keep], sc_np[:, :keep]
            re = self.store.rerank_scores_host(
                queries[:b], np.maximum(ids_np, 0)
            )
            re = np.where(ids_np >= 0, re, -np.inf)
            order = np.argsort(-re, axis=1, kind="stable")[:, :top_k]
            ids_np = np.take_along_axis(ids_np, order, axis=1)
            sc_np = np.take_along_axis(re, order, axis=1).astype(np.float32)
            return ids_np, sc_np
        return ids_np[:, :top_k], sc_np[:, :top_k]

    def maybe_promote(self) -> bool:
        """Re-admit spilled codes into HBM when the budget fits again
        (compaction shrank the store or COSDATA_HBM_GB rose) — the inverse
        of the one-way spill VERDICT r4 flagged (missing #4). Serving
        returns to the DEVICE-resident fused codes scan (`use_codes_engine`
        passes once codes_on_host clears); the graph stays freed
        (scan_only) until a compaction rebuilds it."""
        if not self.store.codes_on_host:
            return False
        if not self.store.maybe_promote_codes():
            return False
        alive_host = getattr(self, "_alive_host", None)
        if alive_host is not None:
            self.alive = jnp.asarray(alive_host[: self.store.capacity])
            self._alive_host = None
        if getattr(self, "graph_on_spill", False):
            # the kept-graph mode freed the edge distances and upper
            # tables, so the device beam cannot serve; promoted codes
            # serve via the exact scan until a compaction rebuilds
            self.graph_on_spill = False
            self.scan_only = True
        return True

    # ---------------------------------------------------------------- delete

    def delete(self, internal_id: int) -> None:
        if getattr(self, "_alive_host", None) is not None:
            self._alive_host[int(internal_id)] = False
        else:
            self.alive = self.alive.at[int(internal_id)].set(False)
        self.n_deleted += 1
