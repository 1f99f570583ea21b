"""Batched HNSW graph kernels.

The reference walks a pointer-linked graph one query per thread with a
best-first loop (/root/reference/src/vector_store.rs:1112-1204
traverse_find_nearest). TPU-native, the graph is a fixed-degree adjacency
table in HBM and search is a *batched beam search*: every iteration expands
the top-E unexpanded candidates of B queries at once — one gather for the
neighbor ids, one int8/f32 einsum for the distances, one fused top-k merge.
Termination via `lax.while_loop` when every beam entry has been expanded
(exactly best-first termination generalized to an E-wide wave).

The visited set (the reference's PerformantFixedSet,
models/fixedset.rs:1-29) has two implementations:

- ``bitmask`` (default when it fits): a per-query bit table (B, ceil(N/32))
  uint32 — membership is one word gather + AND, marking is one scatter-add
  of fresh bits. Exact dedup, O(k) per wave.
- ``ring`` (fallback for huge id spans): a per-query ring buffer of
  recently visited ids; the membership test broadcasts a (B, k, vcap)
  compare per wave, which dominates beam time at large vcap — re-visits
  past the ring capacity only cost duplicate score work (the in-beam
  dedup keeps results correct).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cosdata_tpu.ops.storage import _scores_gathered as scores_gathered
from cosdata_tpu.ops.topk import NEG_INF, unique_mask_ids


class BeamState(NamedTuple):
    ids: jax.Array  # (B, EF) int32, -1 = empty slot
    scores: jax.Array  # (B, EF) f32 similarity (higher better)
    expanded: jax.Array  # (B, EF) bool
    visited: jax.Array  # (B, VCAP) int32 ring | (B, W) uint32 bit table
    t: jax.Array  # () int32 iteration counter


def _probe_bits(visited, rows_iota, ids):
    """Bit-table membership probe: (seen (B,k) bool, word idx, bit value).

    ids < 0 probe word 0 — callers mask them out of `fresh` anyway."""
    safe = jnp.maximum(ids, 0)
    word = jnp.right_shift(safe, 5)
    bitv = jnp.left_shift(jnp.uint32(1), (safe & 31).astype(jnp.uint32))
    got = visited[rows_iota, word]
    return (got & bitv) != 0, word, bitv


def _mark_bits(visited, rows_iota, word, bitv, fresh):
    """Set the bits of `fresh` ids. Scatter-ADD is exact OR here: each
    fresh id is wave-unique (unique_mask_ids) and its bit unset (~seen),
    so every (row, word, bit) contribution happens at most once."""
    add = jnp.where(fresh, bitv, jnp.uint32(0))
    return visited.at[rows_iota, word].add(add)


def _init_beam(metric, kind, d, ef, vcap, q, store, start_ids, bitmask_w=0):
    """Build the initial beam from (B, S) start ids (-1 padded)."""
    b, s = start_ids.shape
    uniq = unique_mask_ids(start_ids)
    scores = scores_gathered(metric, kind, d, q, store, start_ids)
    scores = jnp.where(uniq, scores, NEG_INF)
    if bitmask_w:
        rows_iota = jnp.arange(b)[:, None]
        visited = jnp.zeros((b, bitmask_w), jnp.uint32)
        seen, word, bitv = _probe_bits(visited, rows_iota, start_ids)
        visited = _mark_bits(
            visited, rows_iota, word, bitv, uniq & (start_ids >= 0)
        )
    else:
        visited = jnp.full((b, vcap), -1, jnp.int32)
    if s < ef:
        scores = jnp.pad(scores, ((0, 0), (0, ef - s)), constant_values=NEG_INF)
        start_ids = jnp.pad(start_ids, ((0, 0), (0, ef - s)), constant_values=-1)
    top_scores, pos = jax.lax.top_k(scores, ef)
    top_ids = jnp.take_along_axis(start_ids, pos, axis=1)
    top_ids = jnp.where(top_scores > NEG_INF / 2, top_ids, -1)
    return BeamState(
        ids=top_ids,
        scores=top_scores,
        expanded=top_ids < 0,
        visited=visited,
        t=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "kind", "d", "ef", "expand", "vcap", "max_iters",
        "use_row_of", "visited_impl",
    ),
)
def beam_search(
    metric: str,
    kind: str,
    d: int,
    ef: int,
    expand: int,
    vcap: int,
    max_iters: int,
    q,  # quantized query pytree, leading dim B
    store,  # quantized store pytree (capacity rows)
    adj_table: jax.Array,  # (rows, m) int32 adjacency, -1 padded
    row_of: jax.Array,  # (capacity,) int32 node id -> adjacency row (or identity)
    start_ids: jax.Array,  # (B, S) int32 entry candidates, -1 padded
    use_row_of: bool = True,
    visited_impl: str = "bitmask",
):
    """One-level batched beam search. Returns (ids (B, EF), scores (B, EF))."""
    # a wave cannot expand more entries than the beam holds
    expand = min(expand, ef)
    # never let the iteration bound silently truncate the beam: full
    # convergence needs ceil(ef/expand) waves just to expand every entry
    # once; 2x that is the safety net (the while_loop exits on convergence,
    # so a generous bound costs nothing when the search settles early)
    max_iters = max(max_iters, 2 * -(-ef // expand))
    m = adj_table.shape[1]
    k = expand * m
    # ring capacity must hold whole waves
    vcap = max(vcap // k, 1) * k
    # id span: candidates are node ids in [0, len(row_of)) for both the
    # row_of-mapped upper levels and the identity level 0
    bitmask_w = -(-row_of.shape[0] // 32) if visited_impl == "bitmask" else 0

    state = _init_beam(
        metric, kind, d, ef, vcap, q, store, start_ids, bitmask_w
    )
    b = state.ids.shape[0]
    rows_iota = jnp.arange(b)[:, None]

    def cond(st: BeamState):
        frontier = (~st.expanded) & (st.ids >= 0)
        return (st.t < max_iters) & jnp.any(frontier)

    def body(st: BeamState):
        # 1. pick top-E unexpanded beam entries per query
        sel_scores = jnp.where(st.expanded | (st.ids < 0), NEG_INF, st.scores)
        sel_vals, sel_pos = jax.lax.top_k(sel_scores, expand)
        valid_sel = sel_vals > NEG_INF / 2
        expanded = st.expanded.at[rows_iota, sel_pos].set(True)
        exp_ids = jnp.take_along_axis(st.ids, sel_pos, axis=1)
        exp_ids = jnp.where(valid_sel, exp_ids, -1)

        # 2. gather adjacency rows
        if use_row_of:
            rows = jnp.where(exp_ids >= 0, row_of[jnp.maximum(exp_ids, 0)], -1)
        else:
            rows = exp_ids
        nbrs = adj_table[jnp.maximum(rows, 0)]  # (B, E, m)
        nbrs = jnp.where(rows[:, :, None] >= 0, nbrs, -1).reshape(b, k)

        # 3. dedup: wave-unique and never scored before
        uniq = unique_mask_ids(nbrs)
        if bitmask_w:
            # every id ever scored has its bit set (start ids at init,
            # candidates as they are scored), so the probe subsumes the
            # in-beam check — O(k) words vs the ring's (k, vcap) compare
            seen, word, bitv = _probe_bits(st.visited, rows_iota, nbrs)
            fresh = uniq & ~seen & (nbrs >= 0)
            visited = _mark_bits(st.visited, rows_iota, word, bitv, fresh)
        else:
            in_beam = jnp.any(nbrs[:, :, None] == st.ids[:, None, :], axis=-1)
            in_vis = jnp.any(
                nbrs[:, :, None] == st.visited[:, None, :], axis=-1
            )
            fresh = uniq & ~in_beam & ~in_vis & (nbrs >= 0)

        # 4. score fresh candidates
        nscores = scores_gathered(metric, kind, d, q, store, nbrs)
        nscores = jnp.where(fresh, nscores, NEG_INF)
        nids = jnp.where(fresh, nbrs, -1)

        if not bitmask_w:
            # 5. record visits in the ring buffer (uniform per-row append)
            pos = (st.t * k) % vcap
            visited = jax.lax.dynamic_update_slice(st.visited, nids, (0, pos))

        # 6. merge into beam
        all_scores = jnp.concatenate([st.scores, nscores], axis=1)
        all_ids = jnp.concatenate([st.ids, nids], axis=1)
        all_exp = jnp.concatenate(
            [expanded, jnp.zeros_like(fresh)], axis=1
        )
        top_scores, pos2 = jax.lax.top_k(all_scores, ef)
        top_ids = jnp.take_along_axis(all_ids, pos2, axis=1)
        top_exp = jnp.take_along_axis(all_exp, pos2, axis=1) | (top_ids < 0)
        return BeamState(top_ids, top_scores, top_exp, visited, st.t + 1)

    final = jax.lax.while_loop(cond, body, state)
    return final.ids, final.scores


@functools.partial(jax.jit, static_argnames=("expand",))
def beam_wave_select(ids, scores, expanded, visited, adj_table, expand: int):
    """One beam wave's DEVICE half for the host-codes graph engine
    (VERDICT r5 ask #4): select the top-`expand` unexpanded beam entries,
    gather their adjacency rows, dedup against the visited bitmask, and
    return the fresh candidate ids — the HOST gathers those rows from the
    spilled code tier and `beam_wave_merge` scores them. Level-0 identity
    id mapping (adjacency row == node id)."""
    b, ef = ids.shape
    m = adj_table.shape[1]
    rows_iota = jnp.arange(b)[:, None]
    sel_scores = jnp.where(expanded | (ids < 0), NEG_INF, scores)
    sel_vals, sel_pos = jax.lax.top_k(sel_scores, min(expand, ef))
    valid_sel = sel_vals > NEG_INF / 2
    expanded = expanded.at[rows_iota, sel_pos].set(True)
    exp_ids = jnp.where(
        valid_sel, jnp.take_along_axis(ids, sel_pos, axis=1), -1
    )
    nbrs = adj_table[jnp.maximum(exp_ids, 0)]
    nbrs = jnp.where(exp_ids[:, :, None] >= 0, nbrs, -1)
    nbrs = nbrs.reshape(b, min(expand, ef) * m)
    uniq = unique_mask_ids(nbrs)
    seen, word, bitv = _probe_bits(visited, rows_iota, nbrs)
    fresh = uniq & ~seen & (nbrs >= 0)
    visited = _mark_bits(visited, rows_iota, word, bitv, fresh)
    nbrs = jnp.where(fresh, nbrs, -1)
    done = ~jnp.any((~expanded) & (ids >= 0))
    return nbrs, expanded, visited, done


@functools.partial(jax.jit, static_argnames=("metric", "d"))
def beam_wave_merge(
    metric: str,
    d: int,
    q,  # quantized query pytree (B rows)
    chunk,  # QuantizedU8 pytree of the wave's UNIQUE uploaded rows
    slots,  # (B, K) int32 position of each candidate in `chunk` (-1 dead)
    nbrs,  # (B, K) int32 candidate node ids (-1 padded)
    ids, scores, expanded,
):
    """Score the wave's host-gathered candidate rows and merge into the
    beam. `slots` maps candidates into the uploaded unique-row chunk
    (host-side np.unique keeps the wave's wire to unique rows only)."""
    ef = ids.shape[1]
    nscores = scores_gathered(
        metric, "u8", d, q, chunk, jnp.maximum(slots, 0)
    )
    nscores = jnp.where(slots >= 0, nscores, NEG_INF)
    nids = jnp.where(slots >= 0, nbrs, -1)
    all_scores = jnp.concatenate([scores, nscores], axis=1)
    all_ids = jnp.concatenate([ids, nids], axis=1)
    all_exp = jnp.concatenate(
        [expanded, jnp.zeros(nids.shape, bool)], axis=1
    )
    top_scores, pos = jax.lax.top_k(all_scores, ef)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    top_exp = jnp.take_along_axis(all_exp, pos, axis=1) | (top_ids < 0)
    return top_ids, top_scores, top_exp


@functools.partial(
    jax.jit, static_argnames=("metric", "d", "ef", "bitmask_w")
)
def beam_hostcodes_init(metric: str, d: int, ef: int, bitmask_w: int,
                        q, chunk, slots, start_ids):
    """Initial beam for the host-codes engine: score the start rows
    (already uploaded as `chunk`/`slots`) and build the visited bitmask
    of `bitmask_w` = ceil(cap/32) words."""
    b, s = start_ids.shape
    uniq = unique_mask_ids(start_ids)
    sc = scores_gathered(metric, "u8", d, q, chunk, jnp.maximum(slots, 0))
    sc = jnp.where(uniq & (slots >= 0), sc, NEG_INF)
    visited = jnp.zeros((b, bitmask_w), jnp.uint32)
    rows_iota = jnp.arange(b)[:, None]
    seen, word, bitv = _probe_bits(visited, rows_iota, start_ids)
    visited = _mark_bits(
        visited, rows_iota, word, bitv, uniq & (start_ids >= 0)
    )
    if s < ef:
        sc = jnp.pad(sc, ((0, 0), (0, ef - s)), constant_values=NEG_INF)
        start_ids = jnp.pad(
            start_ids, ((0, 0), (0, ef - s)), constant_values=-1
        )
    top_scores, pos = jax.lax.top_k(sc, ef)
    top_ids = jnp.take_along_axis(start_ids, pos, axis=1)
    top_ids = jnp.where(top_scores > NEG_INF / 2, top_ids, -1)
    return top_ids, top_scores, top_ids < 0, visited


@functools.partial(jax.jit, static_argnames=("m", "dedup"))
def merge_neighbors(
    adj_table: jax.Array,  # (rows, m) int32
    dist_table: jax.Array,  # (rows, m) f32 (similarity, higher better)
    rows: jax.Array,  # (T,) int32 target rows (unique; padded entries get
    #                     inc dists of -inf and become no-op rewrites)
    inc_ids: jax.Array,  # (T, G) int32 incoming neighbor ids, -1 padded
    inc_dists: jax.Array,  # (T, G) f32
    m: int,
    dedup: bool = True,
):
    """Keep-the-m-closest neighbor merge (the batched equivalent of the
    reference's atomic worst-slot replacement, prob_node.rs:210-283).
    Rows of -1 (padding) are remapped past the table end so the scatter
    drops them — jax normalizes NEGATIVE indices (wrap-around) BEFORE
    mode="drop" applies, so a raw -1 would overwrite the last row.
    ``dedup=False`` skips the O((m+G)^2) first-occurrence mask — safe when
    incoming ids are known disjoint from the current rows (bulk reverse
    edges); a duplicate would only waste a slot, never corrupt results."""
    safe_rows = jnp.maximum(rows, 0)
    drop_rows = jnp.where(rows >= 0, rows, adj_table.shape[0])
    cur_ids = adj_table[safe_rows]
    cur_dists = dist_table[safe_rows]
    if dedup:
        # current rows and incoming groups are each internally unique, so
        # dedup reduces to an inc-vs-cur membership test: O(G*m) instead of
        # materializing the O((m+G)^2) first-occurrence mask
        dup = jnp.any(inc_ids[:, :, None] == cur_ids[:, None, :], axis=-1)
        inc_dists = jnp.where(dup, NEG_INF, inc_dists)
    all_ids = jnp.concatenate([cur_ids, inc_ids], axis=1)
    all_dists = jnp.concatenate([cur_dists, inc_dists], axis=1)
    masked = jnp.where(all_ids >= 0, all_dists, NEG_INF)
    top_d, pos = jax.lax.top_k(masked, m)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    top_ids = jnp.where(top_d > NEG_INF / 2, top_ids, -1)
    adj_table = adj_table.at[drop_rows].set(top_ids, mode="drop")
    dist_table = dist_table.at[drop_rows].set(
        jnp.where(top_ids >= 0, top_d, NEG_INF), mode="drop"
    )
    return adj_table, dist_table


@functools.partial(jax.jit, static_argnames=("metric", "kind", "d", "chunk"))
def pairwise_scores(
    metric: str, kind: str, d: int, ids: jax.Array, store, chunk: int = 256
):
    """(W, C, C) similarity among candidate ids per row: gather each row's
    candidate vectors once and contract them against themselves on the MXU.
    W-chunked so the gather footprint stays ~chunk*C*D bytes. Used by the
    diversity pruning heuristic."""
    w, c = ids.shape
    pad = (-w) % chunk
    ids_p = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=-1)

    def one_chunk(ids_c):
        # the shared decode + block-score helpers (same math as every
        # other scoring path; one place to fix dequant handling)
        safe = jnp.maximum(ids_c, 0)
        g, s, mg = _decode_rows(kind, d, store, safe)
        return _block_scores(metric, kind, d, store, g, s, mg, g, s, mg)

    out = jax.lax.map(one_chunk, ids_p.reshape(-1, chunk, c))
    return out.reshape(-1, c, c)[:w]


@functools.partial(jax.jit, static_argnames=("m",))
def select_diverse(
    cand_ids: jax.Array,  # (W, C) desc-sorted by score, -1 padded
    cand_scores: jax.Array,  # (W, C) similarity to the query/new node
    pair: jax.Array,  # (W, C, C) candidate-candidate similarity
    m: int,
):
    """HNSW neighbor-selection heuristic (Algorithm 4 of the HNSW paper),
    batched: scan candidates best-first, keep c only if it is closer to the
    query than to every already-kept neighbor; backfill with the best pruned
    candidates (keepPrunedConnections). The reference uses plain
    keep-m-closest (prob_node.rs:210-283); diversity pruning strictly
    improves navigability at the same degree."""
    w, c = cand_ids.shape

    def body(keep, j):
        # closest kept-neighbor similarity for candidate j
        sim_kept = jnp.where(keep, pair[:, j, :], NEG_INF)
        max_kept = jnp.max(sim_kept, axis=1)
        n_kept = jnp.sum(keep, axis=1)
        ok = (
            (cand_ids[:, j] >= 0)
            & (cand_scores[:, j] > max_kept)
            & (n_kept < m)
        )
        keep = keep.at[:, j].set(ok)
        return keep, None

    keep = jnp.zeros((w, c), bool)
    keep, _ = jax.lax.scan(body, keep, jnp.arange(c))
    # kept first, then best pruned, all in score order
    priority = jnp.where(keep, cand_scores + 1e9, cand_scores)
    priority = jnp.where(cand_ids >= 0, priority, NEG_INF)
    top_p, pos = jax.lax.top_k(priority, m)
    out_ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    out_scores = jnp.take_along_axis(cand_scores, pos, axis=1)
    out_ids = jnp.where(top_p > NEG_INF / 2, out_ids, -1)
    out_scores = jnp.where(out_ids >= 0, out_scores, NEG_INF)
    return out_ids, out_scores


def _decode_rows(kind: str, d: int, store, safe_ids):
    """Gather rows as (codes (..., D) int8/f32, sums f32 or None, mags f32).

    Shared by the block-scoring kernels; safe_ids must be >= 0."""
    from cosdata_tpu.ops import quantize as Q

    if kind == "u8":
        return (
            store.data[safe_ids],
            store.sums[safe_ids].astype(jnp.float32),
            store.mags[safe_ids],
        )
    if kind == "subbyte":
        res = store.planes.shape[0]
        flat = safe_ids.reshape(-1)
        g = None
        for p in range(res):
            words = store.planes[p][flat]
            bits = Q.unpack_bits_from_u32(words, d)
            contrib = bits.astype(jnp.int8) << (res - 1 - p)
            g = contrib if g is None else g + contrib
        g = g.reshape(*safe_ids.shape, d)
        return g, store.sums[safe_ids].astype(jnp.float32), store.mags[safe_ids]
    return store.data[safe_ids].astype(jnp.float32), None, store.mags[safe_ids]


def _block_scores(metric, kind, d, store, g1, s1, m1, g2, s2, m2):
    """Similarity of decoded row blocks: g1 (..., A, D) x g2 (..., B, D) ->
    (..., A, B), with the u8/subbyte affine-dequant correction applied."""
    if kind in ("u8", "subbyte"):
        cc = jnp.einsum(
            "...ad,...bd->...ab", g1, g2, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        if kind == "u8":
            # stored codes are centered int8: code = u - 128
            code_dot = cc + 128.0 * (s1[..., :, None] + s2[..., None, :]) + d * 128.0 * 128.0
            u1 = s1 + 128.0 * d
            u2 = s2 + 128.0 * d
        else:
            code_dot = cc
            u1, u2 = s1, s2
        dot = (
            store.a * store.a * code_dot
            + store.a * store.b * (u1[..., :, None] + u2[..., None, :])
            + store.b * store.b * store.dtrue
        )
    else:
        dot = jnp.einsum("...ad,...bd->...ab", g1, g2)
    if metric == "dot":
        return dot
    if metric == "cosine":
        den = m1[..., :, None] * m2[..., None, :]
        return jnp.where(den > 1e-30, dot / jnp.maximum(den, 1e-30), 0.0)
    if metric != "euclidean":
        # hamming has no MXU-dot formulation; HNSWIndex runs it scan-only
        # and never reaches the graph kernels
        raise ValueError(f"graph kernels do not support metric {metric!r}")
    d2 = m1[..., :, None] ** 2 + m2[..., None, :] ** 2 - 2.0 * dot
    return -jnp.sqrt(jnp.maximum(d2, 0.0))




@functools.partial(
    jax.jit, static_argnames=("metric", "kind", "d", "kk", "leaf_chunk", "rt")
)
def leaf_knn_gather(
    metric: str,
    kind: str,
    d: int,
    kk: int,
    leaf_chunk: int,
    leaf_ids: jax.Array,  # (NL, L) int32 member ids per leaf, -1 padded
    pos_mem: jax.Array,  # (Mpad,) int32 flat position of each member (-1 pad)
    store,
    rt: float = 0.85,
):
    """leaf_knn + per-member inverse-permutation gather fused into ONE
    program: every extra compiled program costs a multi-second first-load
    through this platform's remote-compile tunnel, so bulk-build stages are
    fused aggressively. Returns (ids (Mpad, kk), scores (Mpad, kk))."""
    ids_t, sc_t = _leaf_knn_body(metric, kind, d, kk, leaf_chunk, leaf_ids, store, rt)
    kk_t = ids_t.shape[-1]
    safe = jnp.maximum(pos_mem, 0)
    ids_m = ids_t.reshape(-1, kk_t)[safe]
    sc_m = sc_t.reshape(-1, kk_t)[safe]
    ids_m = jnp.where(pos_mem[:, None] >= 0, ids_m, -1)
    sc_m = jnp.where(pos_mem[:, None] >= 0, sc_m, NEG_INF)
    if kk_t < kk:
        ids_m = jnp.pad(ids_m, ((0, 0), (0, kk - kk_t)), constant_values=-1)
        sc_m = jnp.pad(sc_m, ((0, 0), (0, kk - kk_t)), constant_values=NEG_INF)
    return ids_m, sc_m


def _leaf_knn_body(metric, kind, d, kk, leaf_chunk, leaf_ids, store, rt=0.85):
    nl, L = leaf_ids.shape
    kk = min(kk, L - 1)
    pad = (-nl) % leaf_chunk
    ids_p = jnp.pad(leaf_ids, ((0, pad), (0, 0)), constant_values=-1)
    # query-side blocking bounds the (lc, qc, L) score tensor to ~2^26
    # elements regardless of leaf width — big leaves (16k-32k) are the
    # high-recall operating point for geometry-free (uniform) data, where
    # random projections barely separate true neighbors and leaf-local
    # exactness is what buys graph quality
    qc = L
    while leaf_chunk * qc * L > (1 << 26) and qc > 512:
        qc //= 2

    def one(ids_c):  # (lc, L)
        lc = ids_c.shape[0]
        safe = jnp.maximum(ids_c, 0)
        g, s, m = _decode_rows(kind, d, store, safe)
        valid = ids_c >= 0
        col = jnp.arange(L)

        def qblk(start):
            gq = jax.lax.dynamic_slice_in_dim(g, start, qc, axis=1)
            sq = None if s is None else jax.lax.dynamic_slice_in_dim(s, start, qc, axis=1)
            mq = jax.lax.dynamic_slice_in_dim(m, start, qc, axis=1)
            sc = _block_scores(metric, kind, d, store, gq, sq, mq, g, s, m)
            qpos = start + jnp.arange(qc)
            selfmask = qpos[:, None] == col[None, :]
            sc = jnp.where(valid[:, None, :] & ~selfmask[None], sc, NEG_INF)
            if L >= 4096:
                # TPU-native approximate top-k (bucketed max-reduce) — the
                # exact lax.top_k partial sort dominates leaf-kNN time at
                # 8k-wide leaves (65 ms vs 6 ms for the int8 einsum itself;
                # rt=0.85 selection runs 21 ms vs 35 ms at rt=0.95).
                # Candidates are unioned across trees, diversity-pruned and
                # NN-descent-refined downstream, so per-leaf selection
                # recall does not bound final graph quality
                top_s, pos = jax.lax.approx_max_k(sc, kk, recall_target=rt)
            else:
                top_s, pos = jax.lax.top_k(sc, kk)
            cand = jnp.broadcast_to(ids_c[:, None, :], (lc, qc, L))
            top_i = jnp.take_along_axis(cand, pos, axis=2)
            top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
            return top_i, top_s

        if qc == L:
            out_i, out_s = qblk(0)
            return out_i, out_s
        outs_i, outs_s = jax.lax.map(qblk, jnp.arange(0, L, qc))
        out_i = jnp.moveaxis(outs_i, 0, 1).reshape(lc, L, kk)
        out_s = jnp.moveaxis(outs_s, 0, 1).reshape(lc, L, kk)
        return out_i, out_s

    out_i, out_s = jax.lax.map(one, ids_p.reshape(-1, leaf_chunk, L))
    return out_i.reshape(-1, L, kk)[:nl], out_s.reshape(-1, L, kk)[:nl]


#: reverse-edge source chunk: the compiled program's sort is
#: (SRC_CHUNK * m)-wide regardless of level size. The monolithic
#: whole-level variant put a 67M-element 3-operand lax.sort in ONE program
#: and its XLA compile ran tens of minutes through the remote-compile
#: tunnel (observed stuck in compile_or_get_cached >12 min at 1M x 64 —
#: the r3/r4 bench HNSW-section killer); a 4.2M-element sort in a
#: fori_loop body compiles like every other bulk kernel. m-best merging
#: is associative, so per-chunk cumulative merges select exactly the same
#: reverse edges as the global pass.
REV_SRC_CHUNK = 65536


@functools.partial(
    jax.jit,
    static_argnames=("m",),
    donate_argnums=(0, 1),
)
def apply_forward_and_reverse(
    adj: jax.Array,  # (cap, m) donated
    dist: jax.Array,  # (cap, m) donated
    mem: jax.Array,  # (Mpad,) int32, -1 padded
    fwd_ids: jax.Array,  # (Mpad, m)
    fwd_d: jax.Array,  # (Mpad, m)
    m: int,
):
    """Forward-edge writes + reverse-edge merge, one program. Levels wider
    than REV_SRC_CHUNK process reverse edges per source chunk inside a
    fori_loop (see REV_SRC_CHUNK)."""
    safe_mem = jnp.where(mem >= 0, mem, adj.shape[0])
    adj = adj.at[safe_mem].set(fwd_ids, mode="drop")
    dist = dist.at[safe_mem].set(fwd_d, mode="drop")
    w = mem.shape[0]
    if w <= REV_SRC_CHUNK:
        return _reverse_edges_body(adj, dist, mem, fwd_ids, fwd_d, m, m)
    pad = (-w) % REV_SRC_CHUNK
    mem_p = jnp.pad(mem, (0, pad), constant_values=-1)
    fi_p = jnp.pad(fwd_ids, ((0, pad), (0, 0)), constant_values=-1)
    fd_p = jnp.pad(fwd_d, ((0, pad), (0, 0)), constant_values=NEG_INF)

    def body(c, carry):
        a, dd = carry
        s0 = c * REV_SRC_CHUNK
        return _reverse_edges_body(
            a, dd,
            jax.lax.dynamic_slice_in_dim(mem_p, s0, REV_SRC_CHUNK),
            jax.lax.dynamic_slice_in_dim(fi_p, s0, REV_SRC_CHUNK),
            jax.lax.dynamic_slice_in_dim(fd_p, s0, REV_SRC_CHUNK),
            m, m,
        )

    return jax.lax.fori_loop(
        0, (w + pad) // REV_SRC_CHUNK, body, (adj, dist)
    )


@functools.partial(
    jax.jit,
    static_argnames=("metric", "kind", "d", "m", "sample", "node_chunk"),
    donate_argnums=(6, 7),
)
def nn_descent_round(
    metric: str,
    kind: str,
    d: int,
    m: int,
    sample: int,
    node_chunk: int,
    adj: jax.Array,  # (cap, m) donated
    dist: jax.Array,  # (cap, m) donated
    mem: jax.Array,  # (Mpad,) int32, -1 padded
    store,
):
    """One NN-descent refinement round as its own program."""
    return _nn_descent_body(
        metric, kind, d, m, sample, node_chunk, mem, adj, dist, store
    )


@functools.partial(jax.jit, static_argnames=("m",), donate_argnums=(0, 1))
def reverse_from_table(
    adj: jax.Array,  # (cap, m) donated
    dist: jax.Array,  # (cap, m) donated
    mem: jax.Array,  # (Mpad,) int32, -1 padded
    m: int,
):
    """Reverse-edge merge sourcing the CURRENT table rows of ``mem``.

    Chunked like apply_forward_and_reverse (see REV_SRC_CHUNK); later
    chunks source rows already refreshed by earlier chunks' merges — a
    benign freshness skew (NN-descent-family algorithms don't need
    snapshot semantics), not a correctness difference."""
    w = mem.shape[0]
    if w <= REV_SRC_CHUNK:
        return _reverse_edges_body(
            adj, dist, mem, adj[jnp.maximum(mem, 0)],
            dist[jnp.maximum(mem, 0)], m, m,
        )
    pad = (-w) % REV_SRC_CHUNK
    mem_p = jnp.pad(mem, (0, pad), constant_values=-1)

    def body(c, carry):
        a, dd = carry
        mem_c = jax.lax.dynamic_slice_in_dim(
            mem_p, c * REV_SRC_CHUNK, REV_SRC_CHUNK
        )
        safe = jnp.maximum(mem_c, 0)
        return _reverse_edges_body(a, dd, mem_c, a[safe], dd[safe], m, m)

    return jax.lax.fori_loop(
        0, (w + pad) // REV_SRC_CHUNK, body, (adj, dist)
    )


def finalize_level0(
    metric: str,
    kind: str,
    d: int,
    m: int,
    rounds: int,
    sample: int,
    node_chunk: int,
    adj: jax.Array,
    dist: jax.Array,
    mem: jax.Array,  # (Mpad,) int32, -1 padded
    fwd_ids: jax.Array,  # (Mpad, m)
    fwd_d: jax.Array,  # (Mpad, m)
    store,
):
    """Level-0 tail: forward-edge writes + reverse edges + NN-descent
    refinement round(s) + reverse again.

    Deliberately THREE SMALL programs, not one fused one: the single fused
    version's XLA compile was OOM-SIGKILLed by this platform's remote
    compile helper at 1M x 64 (and big fused programs pay a savage
    per-process load penalty even when cached — see _rp_level). The extra
    dispatches cost ~0.1 s total; tables are donated through every call so
    HBM holds one copy."""
    import os as _os
    import time as _time

    log = _os.environ.get("COSDATA_BUILD_LOG")

    def _t(label, t0):
        if log:
            jax.block_until_ready(adj)
            print(f"[build]     finalize/{label}: {_time.time() - t0:.1f}s",
                  flush=True)
        return _time.time()

    t0 = _time.time()
    adj, dist = apply_forward_and_reverse(adj, dist, mem, fwd_ids, fwd_d, m)
    t0 = _t("fwd+rev", t0)
    for _ in range(rounds):
        adj, dist = nn_descent_round(
            metric, kind, d, m, sample, node_chunk, adj, dist, mem, store
        )
        t0 = _t("nn_descent", t0)
        adj, dist = reverse_from_table(adj, dist, mem, m)
        _t("rev2", t0)
    return adj, dist


@functools.partial(
    jax.jit,
    static_argnames=("metric", "kind", "d", "m", "heuristic"),
)
def upper_level_exact(
    metric: str,
    kind: str,
    d: int,
    m: int,
    heuristic: bool,
    mem: jax.Array,  # (Mpad,) int32 member node ids, -1 padded
    slots: jax.Array,  # (Mpad,) int32 adjacency slot of each member, -1 padded
    up_slot: jax.Array,  # (cap,) int32 node id -> slot
    adj_l: jax.Array,  # (cap_up, m) this level's adjacency
    dist_l: jax.Array,  # (cap_up, m)
    store,
):
    """Whole small upper level in ONE program: exact member x member kNN on
    the MXU, diversity prune, reverse edges, slot writes. Levels above 1
    hold <= a few thousand nodes; splitting them across the generic
    multi-program pipeline paid ~10 s of program loads per level."""
    mp = mem.shape[0]
    safe = jnp.maximum(mem, 0)
    g, s, mg = _decode_rows(kind, d, store, safe)
    sc = _block_scores(metric, kind, d, store, g, s, mg, g, s, mg)  # (Mp, Mp)
    valid = mem >= 0
    eye = jnp.eye(mp, dtype=bool)
    sc = jnp.where(valid[None, :] & valid[:, None] & ~eye, sc, NEG_INF)
    kk = min(2 * m, mp)
    top_s, pos = jax.lax.top_k(sc, kk)
    cand = jnp.broadcast_to(mem[None, :], (mp, mp))
    top_i = jnp.take_along_axis(cand, pos, axis=1)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    if heuristic:
        pair = _gather_pair(sc, pos)
        fwd_i, fwd_d = select_diverse(top_i, top_s, pair, m)
    else:
        fwd_s, p2 = jax.lax.top_k(top_s, min(m, kk))
        fwd_i = jnp.take_along_axis(top_i, p2, axis=1)
        if fwd_i.shape[1] < m:
            fwd_i = jnp.pad(fwd_i, ((0, 0), (0, m - fwd_i.shape[1])), constant_values=-1)
            fwd_s = jnp.pad(fwd_s, ((0, 0), (0, m - fwd_s.shape[1])), constant_values=NEG_INF)
        fwd_d = jnp.where(fwd_i >= 0, fwd_s, NEG_INF)
        fwd_i = jnp.where(fwd_d > NEG_INF / 2, fwd_i, -1)
    safe_slots = jnp.where(slots >= 0, slots, adj_l.shape[0])
    adj_l = adj_l.at[safe_slots].set(fwd_i, mode="drop")
    dist_l = dist_l.at[safe_slots].set(fwd_d, mode="drop")
    tgt_slots = jnp.where(fwd_i >= 0, up_slot[jnp.maximum(fwd_i, 0)], -1)
    # reverse-edge source VALUES are node ids (mem) — upper adjacency rows
    # are slots but its values are node ids (beam_search dereferences them
    # via up_slot); rows to scatter into come from tgt_slots
    adj_l, dist_l = _reverse_edges_body(
        adj_l, dist_l, mem, tgt_slots, fwd_d, m, m
    )
    return adj_l, dist_l


@functools.partial(jax.jit, static_argnames=("m",))
def upper_level_apply(
    m: int,
    mem: jax.Array,  # (Mpad,) int32 member node ids, -1 padded (unused rows)
    slots: jax.Array,  # (Mpad,) int32 slot of each member, -1 padded
    up_slot: jax.Array,  # (cap,) int32 node id -> slot
    fwd_ids: jax.Array,  # (Mpad, m) forward neighbor node ids
    fwd_d: jax.Array,  # (Mpad, m)
    adj_l: jax.Array,  # (cap_up, m)
    dist_l: jax.Array,  # (cap_up, m)
):
    """Large-upper-level tail in one program: slot writes + reverse edges."""
    safe_slots = jnp.where(slots >= 0, slots, adj_l.shape[0])
    adj_l = adj_l.at[safe_slots].set(fwd_ids, mode="drop")
    dist_l = dist_l.at[safe_slots].set(fwd_d, mode="drop")
    tgt_slots = jnp.where(fwd_ids >= 0, up_slot[jnp.maximum(fwd_ids, 0)], -1)
    # source VALUES are node ids (mem), scatter rows are tgt_slots — see
    # upper_level_exact
    return _reverse_edges_body(adj_l, dist_l, mem, tgt_slots, fwd_d, m, m)


def _gather_pair(sc: jax.Array, pos: jax.Array) -> jax.Array:
    """Candidate-candidate scores of the selected top-kk member columns:
    candidate a of row i IS member column pos[i, a], so
    pair[i, a, b] = sc[pos[i, a], pos[i, b]] — ONE flat gather of the
    (Mp, Mp) member score matrix at indices pos[i,a]*Mp + pos[i,b].
    (A row gather ``sc[pos]`` would materialize (Mp, kk, Mp) — 38 GB at
    Mp=12288, kk=64 — and OOM'd HBM; the flat form peaks at (Mp, kk, kk).)"""
    mp = sc.shape[0]
    flat_idx = pos[:, :, None] * mp + pos[:, None, :]  # (Mp, kk, kk)
    return sc.reshape(-1)[flat_idx]


def _reverse_edges_body(adj, dist, src, fwd_rows, fwd_d, m, g_cap, chunk=65536):
    """Trace-inlinable body of apply_reverse_edges (shared by the fused
    bulk kernels).

    Grouping incoming edges by target uses a device SORT by
    (target, -dist) + rank-within-run + a UNIQUE-index scatter: measured
    on v5e at 64M edges, lax.sort runs 0.39 s where the previous
    hash-slot scatter-max (64M colliding updates — TPU scatter serializes
    collisions) took 1.15 s, and this form keeps exactly the m BEST
    incoming per target instead of hash-dropping same-slot edges."""
    rows_n = adj.shape[0]
    w, mf = fwd_rows.shape
    e = w * mf
    tgt = fwd_rows.reshape(e)
    d_ = fwd_d.reshape(e)
    s_ = jnp.broadcast_to(src[:, None], (w, mf)).reshape(e)
    ok = (tgt >= 0) & (s_ >= 0) & (d_ > NEG_INF / 2)
    tgt_k = jnp.where(ok, tgt, rows_n)  # invalid edges sort last
    tgt_s, negd_s, s_s = jax.lax.sort(
        (tgt_k, -d_, s_), dimension=0, num_keys=2
    )
    pos = jnp.arange(e, dtype=jnp.int32)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]]
    )
    # lax.cummax, NOT lax.associative_scan(jnp.maximum): both compute the
    # same inclusive running max, but associative_scan traces its log-depth
    # slice/concat network into the program and the TPU backend's compile
    # of it at 4.2M elements never finished (>15 min, measured by
    # scripts/probe_compile.py) — the r3/r4 "finalize stall". cummax
    # lowers to the dedicated cumulative-op path: 7.6 s compile, same run.
    seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
    rank = pos - seg_start  # quality rank within target (best = 0)
    keep = (rank < g_cap) & (tgt_s < rows_n)
    # dropped entries get UNIQUE out-of-bounds rows so unique_indices
    # stays truthful for the whole update set (mode="drop" removes them)
    row_idx = jnp.where(keep, tgt_s, rows_n + pos)
    col = jnp.minimum(rank, g_cap - 1)
    inc_ids = jnp.full((rows_n, g_cap), -1, jnp.int32)
    inc_ids = inc_ids.at[row_idx, col].set(
        s_s, mode="drop", unique_indices=True
    )
    inc_d = jnp.full((rows_n, g_cap), NEG_INF, jnp.float32)
    inc_d = inc_d.at[row_idx, col].set(
        -negd_s, mode="drop", unique_indices=True
    )
    inc_d = jnp.where(inc_ids >= 0, inc_d, NEG_INF)
    if rows_n <= chunk:
        dup = jnp.any(inc_ids[:, :, None] == adj[:, None, :], axis=-1)
        inc_d = jnp.where(dup, NEG_INF, inc_d)
        all_i = jnp.concatenate([adj, inc_ids], axis=1)
        all_d = jnp.concatenate([dist, inc_d], axis=1)
        masked = jnp.where(all_i >= 0, all_d, NEG_INF)
        top_d, pos = jax.lax.top_k(masked, m)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_d > NEG_INF / 2, top_i, -1)
        return top_i, jnp.where(top_i >= 0, top_d, NEG_INF)
    pad = (-rows_n) % chunk
    adj_p = jnp.pad(adj, ((0, pad), (0, 0)), constant_values=-1)
    dist_p = jnp.pad(dist, ((0, pad), (0, 0)), constant_values=NEG_INF)
    inc_ids = jnp.pad(inc_ids, ((0, pad), (0, 0)), constant_values=-1)
    inc_d = jnp.pad(inc_d, ((0, pad), (0, 0)), constant_values=NEG_INF)

    def body(c, carry):
        a, dd = carry
        start = c * chunk
        cur_i = jax.lax.dynamic_slice_in_dim(a, start, chunk)
        cur_d = jax.lax.dynamic_slice_in_dim(dd, start, chunk)
        ii = jax.lax.dynamic_slice_in_dim(inc_ids, start, chunk)
        id_ = jax.lax.dynamic_slice_in_dim(inc_d, start, chunk)
        dup = jnp.any(ii[:, :, None] == cur_i[:, None, :], axis=-1)
        id_ = jnp.where(dup, NEG_INF, id_)
        all_i = jnp.concatenate([cur_i, ii], axis=1)
        all_d = jnp.concatenate([cur_d, id_], axis=1)
        masked = jnp.where(all_i >= 0, all_d, NEG_INF)
        top_d, pos = jax.lax.top_k(masked, m)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_d > NEG_INF / 2, top_i, -1)
        a = jax.lax.dynamic_update_slice(a, top_i, (start, 0))
        dd = jax.lax.dynamic_update_slice(
            dd, jnp.where(top_i >= 0, top_d, NEG_INF), (start, 0)
        )
        return a, dd

    adj_p, dist_p = jax.lax.fori_loop(
        0, (rows_n + pad) // chunk, body, (adj_p, dist_p)
    )
    return adj_p[:rows_n], dist_p[:rows_n]


def _grouped_scores(metric, kind, store, gq, sq, mq, gc, sc_, mc, g: int = 8):
    """Per-node candidate scores (N, K) via GROUP-of-``g`` block GEMM.

    The natural formulation — einsum "nd,nkd->nk", a batched GEMV — does
    NOT ride the MXU (measured 4.6 s for 1M x 64 x 768 int8 on v5e, pure
    VPU time). Grouping g nodes against the CONCATENATION of their g
    candidate sets turns it into batched (g x D) @ (D x gK) GEMMs — g x
    redundant FLOPs, but MXU-placed, and the block-diagonal slices are
    the wanted scores."""
    n, k = gc.shape[0], gc.shape[1]
    while n % g:
        g //= 2
    ng = n // g
    dd = gq.shape[-1]
    q8 = gq.reshape(ng, g, dd)
    c8 = gc.reshape(ng, g * k, dd)
    if kind in ("u8", "subbyte"):
        cc = jnp.einsum(
            "gnd,gkd->gnk", q8, c8, preferred_element_type=jnp.int32
        )
        diag = cc.reshape(ng, g, g, k)[
            :, jnp.arange(g), jnp.arange(g), :
        ].reshape(n, k).astype(jnp.float32)
        if kind == "u8":
            code_dot = (
                diag + 128.0 * (sq[:, None] + sc_) + dd * 128.0 * 128.0
            )
            u1 = sq + 128.0 * dd
            u2 = sc_ + 128.0 * dd
        else:
            code_dot = diag
            u1, u2 = sq, sc_
        dot = (
            store.a * store.a * code_dot
            + store.a * store.b * (u1[:, None] + u2)
            + store.b * store.b * store.dtrue
        )
    else:
        cc = jnp.einsum("gnd,gkd->gnk", q8, c8)
        dot = cc.reshape(ng, g, g, k)[
            :, jnp.arange(g), jnp.arange(g), :
        ].reshape(n, k)
    if metric == "dot":
        return dot
    if metric == "cosine":
        den = mq[:, None] * mc
        return jnp.where(den > 1e-30, dot / jnp.maximum(den, 1e-30), 0.0)
    if metric != "euclidean":
        raise ValueError(f"graph kernels do not support metric {metric!r}")
    d2 = mq[:, None] ** 2 + mc ** 2 - 2.0 * dot
    return -jnp.sqrt(jnp.maximum(d2, 0.0))


def _nn_descent_body(metric, kind, d, m, sample, node_chunk, node_ids, adj, dist, store):
    """Trace-inlinable body of nn_descent_round."""
    n = node_ids.shape[0]
    m0 = adj.shape[1]
    stride = max(m0 // sample, 1)
    pad = (-n) % node_chunk
    ids_p = jnp.pad(node_ids, ((0, pad),), constant_values=-1)

    def one(ids_c):
        safe_c = jnp.maximum(ids_c, 0)
        nbrs = adj[safe_c]
        sub = nbrs[:, ::stride][:, :sample]
        nn2 = adj[jnp.maximum(sub, 0)][:, :, ::stride][:, :, :sample]
        nn2 = jnp.where(sub[:, :, None] >= 0, nn2, -1).reshape(ids_c.shape[0], -1)
        cand = nn2
        uniq = unique_mask_ids(cand)
        fresh = (
            uniq
            & (cand >= 0)
            & (cand != ids_c[:, None])
            & ~jnp.any(cand[:, :, None] == nbrs[:, None, :], axis=-1)
        )
        gq, sq, mq = _decode_rows(kind, d, store, safe_c)
        gc, sc_, mc = _decode_rows(kind, d, store, jnp.maximum(cand, 0))
        sc = _grouped_scores(metric, kind, store, gq, sq, mq, gc, sc_, mc)
        sc = jnp.where(fresh, sc, NEG_INF)
        cand = jnp.where(fresh, cand, -1)
        all_i = jnp.concatenate([nbrs, cand], axis=1)
        all_d = jnp.concatenate([dist[safe_c], sc], axis=1)
        masked = jnp.where(all_i >= 0, all_d, NEG_INF)
        top_d, pos = jax.lax.top_k(masked, m)
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        top_i = jnp.where(top_d > NEG_INF / 2, top_i, -1)
        return top_i, jnp.where(top_i >= 0, top_d, NEG_INF)

    out_i, out_d = jax.lax.map(one, ids_p.reshape(-1, node_chunk))
    out_i = out_i.reshape(-1, m)[:n]
    out_d = out_d.reshape(-1, m)[:n]
    safe_n = jnp.where(node_ids >= 0, node_ids, adj.shape[0])
    adj = adj.at[safe_n].set(out_i, mode="drop")
    dist = dist.at[safe_n].set(out_d, mode="drop")
    return adj, dist


@functools.partial(jax.jit, static_argnames=("metric", "kind", "d", "causal"))
def wave_scores(metric: str, kind: str, d: int, q_wave, wave_ids: jax.Array, store, causal: bool = True):
    """(W, W) intra-wave similarity with self (and optionally later nodes)
    masked to -inf. Used to let simultaneously-inserted nodes link to each
    other, approximating the reference's sequential insert order."""
    w = wave_ids.shape[0]
    ids_mat = jnp.broadcast_to(wave_ids[None, :], (w, w))
    s = scores_gathered(metric, kind, d, q_wave, store, ids_mat)
    i = jnp.arange(w)
    if causal:
        mask = i[:, None] > i[None, :]
    else:
        mask = i[:, None] != i[None, :]
    return jnp.where(mask, s, NEG_INF)
