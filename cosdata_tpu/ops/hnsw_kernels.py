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


@functools.partial(jax.jit, static_argnames=("m",))
def merge_neighbors(
    adj_table: jax.Array,  # (rows, m) int32
    dist_table: jax.Array,  # (rows, m) f32 (similarity, higher better)
    rows: jax.Array,  # (T,) int32 target rows (unique; padded entries get
    #                     inc dists of -inf and become no-op rewrites)
    inc_ids: jax.Array,  # (T, G) int32 incoming neighbor ids, -1 padded
    inc_dists: jax.Array,  # (T, G) f32
    m: int,
):
    """Keep-the-m-closest neighbor merge (the batched equivalent of the
    reference's atomic worst-slot replacement, prob_node.rs:210-283).
    Rows of -1 (padding) are dropped by the scatter."""
    safe_rows = jnp.maximum(rows, 0)
    cur_ids = adj_table[safe_rows]
    cur_dists = dist_table[safe_rows]
    all_ids = jnp.concatenate([cur_ids, inc_ids], axis=1)
    all_dists = jnp.concatenate([cur_dists, inc_dists], axis=1)
    uniq = unique_mask_ids(all_ids)
    masked = jnp.where(uniq, all_dists, NEG_INF)
    top_d, pos = jax.lax.top_k(masked, m)
    top_ids = jnp.take_along_axis(all_ids, pos, axis=1)
    top_ids = jnp.where(top_d > NEG_INF / 2, top_ids, -1)
    adj_table = adj_table.at[rows].set(top_ids, mode="drop")
    dist_table = dist_table.at[rows].set(
        jnp.where(top_ids >= 0, top_d, NEG_INF), mode="drop"
    )
    return adj_table, dist_table


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
