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
            # and the full sort of lax.top_k dominates the sweep otherwise
            c_s, c_i = jax.lax.approx_max_k(
                scores, min(k, chunk), recall_target=0.99
            )
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
