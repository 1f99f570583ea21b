"""Batched HNSW graph kernels.

The reference walks a pointer-linked graph one query per thread with a
best-first loop (/root/reference/src/vector_store.rs:1112-1204
traverse_find_nearest). TPU-native, the graph is a fixed-degree adjacency
table in HBM and search is a *batched beam search*: every iteration expands
the top-E unexpanded candidates of B queries at once — one gather for the
neighbor ids, one int8/f32 einsum for the distances, one fused top-k merge.
Termination via `lax.while_loop` when every beam entry has been expanded
(exactly best-first termination generalized to an E-wide wave).

The visited set is a per-query ring buffer of recently visited ids (the
reference's PerformantFixedSet, models/fixedset.rs:1-29, plays the same
probabilistic role); re-visits past the ring capacity only cost duplicate
score work — the in-beam dedup keeps results correct.
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
    visited: jax.Array  # (B, VCAP) int32 ring buffer
    t: jax.Array  # () int32 iteration counter


def _init_beam(metric, kind, d, ef, vcap, q, store, start_ids):
    """Build the initial beam from (B, S) start ids (-1 padded)."""
    b, s = start_ids.shape
    uniq = unique_mask_ids(start_ids)
    scores = scores_gathered(metric, kind, d, q, store, start_ids)
    scores = jnp.where(uniq, scores, NEG_INF)
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
        visited=jnp.full((b, vcap), -1, jnp.int32),
        t=jnp.zeros((), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "kind", "d", "ef", "expand", "vcap", "max_iters", "use_row_of",
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

    state = _init_beam(metric, kind, d, ef, vcap, q, store, start_ids)
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

        # 3. dedup: wave-unique, not in beam, not recently visited
        uniq = unique_mask_ids(nbrs)
        in_beam = jnp.any(nbrs[:, :, None] == st.ids[:, None, :], axis=-1)
        in_vis = jnp.any(nbrs[:, :, None] == st.visited[:, None, :], axis=-1)
        fresh = uniq & ~in_beam & ~in_vis & (nbrs >= 0)

        # 4. score fresh candidates
        nscores = scores_gathered(metric, kind, d, q, store, nbrs)
        nscores = jnp.where(fresh, nscores, NEG_INF)
        nids = jnp.where(fresh, nbrs, -1)

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
    Rows of -1 (padding) are dropped by the scatter. ``dedup=False`` skips
    the O((m+G)^2) first-occurrence mask — safe when incoming ids are known
    disjoint from the current rows (bulk reverse edges); a duplicate would
    only waste a slot, never corrupt results."""
    safe_rows = jnp.maximum(rows, 0)
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
    adj_table = adj_table.at[rows].set(top_ids, mode="drop")
    dist_table = dist_table.at[rows].set(
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
    from cosdata_tpu.ops import quantize as Q

    w, c = ids.shape
    pad = (-w) % chunk
    ids_p = jnp.pad(ids, ((0, pad), (0, 0)), constant_values=-1)

    def one_chunk(ids_c):
        safe = jnp.maximum(ids_c, 0)
        if kind == "u8":
            g = store.data[safe]  # (chunk, C, D) int8
            sums = store.sums[safe].astype(jnp.float32)
            cc = jnp.einsum(
                "wcd,wed->wce", g, g, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            code_dot = (
                cc + 128.0 * (sums[:, :, None] + sums[:, None, :]) + d * 128.0 * 128.0
            )
            dot = (
                store.a * store.a * code_dot
                + store.a * store.b * (
                    (sums + 128.0 * d)[:, :, None] + (sums + 128.0 * d)[:, None, :]
                )
                + store.b * store.b * store.dtrue
            )
            mags = store.mags[safe]
        elif kind == "subbyte":
            res = store.planes.shape[0]
            g = None
            for p in range(res):
                words = store.planes[p][safe]
                ch, cn, wd = words.shape
                bits = Q.unpack_bits_from_u32(words.reshape(ch * cn, wd), d)
                contrib = bits.reshape(ch, cn, d).astype(jnp.int8) << (res - 1 - p)
                g = contrib if g is None else g + contrib
            sums = store.sums[safe].astype(jnp.float32)
            code_dot = jnp.einsum(
                "wcd,wed->wce", g, g, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            dot = (
                store.a * store.a * code_dot
                + store.a * store.b * (sums[:, :, None] + sums[:, None, :])
                + store.b * store.b * store.dtrue
            )
            mags = store.mags[safe]
        else:
            g = store.data[safe].astype(jnp.float32)
            dot = jnp.einsum("wcd,wed->wce", g, g)
            mags = store.mags[safe]
        if metric == "dot":
            return dot
        if metric == "cosine":
            den = mags[:, :, None] * mags[:, None, :]
            return jnp.where(den > 1e-30, dot / jnp.maximum(den, 1e-30), 0.0)
        # euclidean (negated similarity)
        d2 = mags[:, :, None] ** 2 + mags[:, None, :] ** 2 - 2.0 * dot
        return -jnp.sqrt(jnp.maximum(d2, 0.0))

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
