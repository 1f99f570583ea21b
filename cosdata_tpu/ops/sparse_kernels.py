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


@functools.partial(jax.jit, static_argnames=("n_cap", "k", "segcap"))
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
):
    """Returns (scores (B, k), ids (B, k)) — ids are -1 where no candidate."""
    b, maxd = starts.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, segcap), 2)
    idx = starts[:, :, None] + iota  # (B, MAXD, S)
    valid = (iota < lens[:, :, None]) & (starts[:, :, None] >= 0)
    safe = jnp.clip(idx, 0, post_ids.shape[0] - 1)
    ids = jnp.where(valid, post_ids[safe], -1).reshape(b, maxd * segcap)
    contrib = jnp.where(valid, mults[:, :, None] * post_vals[safe], 0.0)
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
    top_s, top_i = jax.lax.top_k(masked, k)
    top_i = jnp.where(top_s > NEG_INF / 2, top_i, -1)
    top_s = jnp.where(top_s > NEG_INF / 2, top_s, 0.0)
    return top_s, top_i
