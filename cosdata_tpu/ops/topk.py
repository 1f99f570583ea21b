"""Top-k selection helpers.

The reference uses `select_nth_unstable` + sort on per-query candidate Vecs
(/root/reference/src/vector_store.rs:404-445). On TPU top-k over the whole
batch is one fused XLA op; for very large N we expose the hardware
approximate top-k (`lax.approx_max_k`) which is substantially faster on TPU
and exact enough for shortlist stages that are re-ranked afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-3.0e38)


def topk(
    scores: jax.Array,
    k: int,
    mask: jax.Array | None = None,
    approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k along the last axis. Returns (values, indices), sorted desc.

    ``mask`` (same shape, bool): False entries are excluded (score -> -inf).
    """
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    if approx:
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)


def merge_topk(
    values_a: jax.Array,
    idx_a: jax.Array,
    values_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two (… , ka/kb) top-k lists into one top-k list of size k."""
    vals = jnp.concatenate([values_a, values_b], axis=-1)
    idxs = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_vals, pos = jax.lax.top_k(vals, k)
    top_idx = jnp.take_along_axis(idxs, pos, axis=-1)
    return top_vals, top_idx


def unique_mask_ids(ids: jax.Array, fill: int = -1) -> jax.Array:
    """Boolean mask keeping the first occurrence of each id along the last axis.

    Used for deduplicating candidate lists (the reference dedups replica ids in
    remove_duplicates_and_filter, common.rs:381-412). ``fill`` ids are dropped.
    O(k^2) compares on the VPU — k is small (<= a few hundred).
    """
    k = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    dup = jnp.any(eq & earlier, axis=-1)
    return (~dup) & (ids != fill)
