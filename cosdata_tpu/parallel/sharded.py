"""Sharded dense scoring + top-k over a jax device mesh.

Design (SURVEY.md §5 "distributed communication backend"):

- mesh axes ``("dp", "tp")``: vectors (N, D) sharded N over dp and D over
  tp; queries replicated over dp, sharded D over tp.
- partial dot products computed per-device on the MXU, reduced over tp with
  ``psum`` (rides ICI), per-dp-shard top-k, then ``all_gather`` over dp and
  a final merge — the classic shard-local-topk + global-merge plan.
- the insert path shards row writes over dp (each shard owns a contiguous
  row range).

This replaces the reference's rayon `par_iter` batch parallelism
(/root/reference/src/indexes/mod.rs:260-272) with XLA collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // tp
    if dp < 1:
        raise ValueError(
            f"mesh needs at least tp={tp} devices, found {n} "
            f"(jax.devices()={devs}); on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=<n> and "
            "jax_platforms=cpu before the backend initializes"
        )
    return Mesh(np.asarray(devs[: dp * tp]).reshape(dp, tp), ("dp", "tp"))


def shard_vectors(mesh: Mesh, vectors: np.ndarray, mags: np.ndarray | None = None):
    """Place (N, D) f32 vectors sharded (dp, tp); N and D must divide."""
    v = jnp.asarray(vectors, jnp.float32)
    if mags is None:
        mags = jnp.linalg.norm(v, axis=-1)
    v = jax.device_put(v, NamedSharding(mesh, P("dp", "tp")))
    mags = jax.device_put(jnp.asarray(mags, jnp.float32), NamedSharding(mesh, P("dp")))
    return v, mags


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "metric"), donate_argnums=()
)
def sharded_search(mesh: Mesh, vectors, mags, queries, q_mags, n_valid, k: int,
                   metric: str = "cosine"):
    """Replicated (B, k) global top-k of sharded brute-force scores."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp", "tp"), P("dp"), P(None, "tp"), P(None), P()),
        out_specs=(P(None), P(None)),
        check_vma=False,
    )
    def step(v, m, q, qm, nv):
        nloc = v.shape[0]
        part = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dots = jax.lax.psum(part, "tp")  # (B, nloc) full-D dots
        if metric == "cosine":
            den = qm[:, None] * m[None, :]
            scores = jnp.where(den > 1e-30, dots / jnp.maximum(den, 1e-30), 0.0)
        elif metric == "dot":
            scores = dots
        else:  # euclidean
            scores = -jnp.sqrt(
                jnp.maximum(qm[:, None] ** 2 + m[None, :] ** 2 - 2 * dots, 0.0)
            )
        shard = jax.lax.axis_index("dp")
        base = shard * nloc
        row_ids = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        valid = row_ids < nv
        scores = jnp.where(valid, scores, -3.0e38)
        vals, idx = jax.lax.top_k(scores, min(k, nloc))
        gids = jnp.take_along_axis(row_ids, idx, axis=1)
        # gather every shard's top-k and merge (replicated result)
        all_vals = jax.lax.all_gather(vals, "dp", axis=1, tiled=True)  # (B, dp*k)
        all_gids = jax.lax.all_gather(gids, "dp", axis=1, tiled=True)
        top_vals, pos = jax.lax.top_k(all_vals, k)
        top_gids = jnp.take_along_axis(all_gids, pos, axis=1)
        # unfilled slots (n < k / empty index) must be -1, not fabricated
        # row ids that callers would dereference
        top_gids = jnp.where(top_vals > -1.0e38, top_gids, -1)
        return top_vals, top_gids

    return step(vectors, mags, queries, q_mags, n_valid)


@functools.partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1, 2))
def sharded_insert(mesh: Mesh, vectors, mags, new_rows, new_mags, offset):
    """Write a replicated wave of rows into the dp-sharded store at
    ``offset`` (each shard writes only the slice it owns). vectors/mags
    are donated: the caller rebinds them, and copying the full sharded
    store per wave would make insert O(capacity) in HBM traffic."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp", "tp"), P("dp"), P(None, "tp"), P(None), P()),
        out_specs=(P("dp", "tp"), P("dp")),
        check_vma=False,
    )
    def step(v, m, w, wm, off):
        nloc = v.shape[0]
        shard = jax.lax.axis_index("dp")
        base = shard * nloc
        # rows [off, off+W) in global space -> local [off-base, ...)
        wn = w.shape[0]
        local_ids = off - base + jnp.arange(wn)
        ok = (local_ids >= 0) & (local_ids < nloc)
        # out-of-shard rows are remapped PAST the end and dropped — the
        # old clip+where wrote stale values at the clamped index, and a
        # duplicate-index scatter (stale vs real write to the same slot)
        # has undefined order: boundary-spanning waves could silently
        # zero freshly inserted rows
        rows = jnp.where(ok, local_ids, nloc)
        v = v.at[rows].set(w, mode="drop")
        m = m.at[rows].set(wm, mode="drop")
        return v, m

    return step(vectors, mags, new_rows, new_mags, offset)


class ShardedFlatIndex:
    """Data-parallel flat index over a mesh (the DEEP-100M-style scale-out
    configuration: shard vectors, replicate queries, merge top-k)."""

    def __init__(self, mesh: Mesh, dim: int, capacity: int, metric: str = "cosine"):
        self.mesh = mesh
        self.metric = metric
        self.dim = dim
        dp = mesh.shape["dp"]
        tp = mesh.shape["tp"]
        if capacity % dp:
            capacity = -(-capacity // dp) * dp
        if dim % tp:
            raise ValueError(f"dim {dim} must divide tp={tp}")
        self.capacity = capacity
        self.n = 0
        self.vectors = jax.device_put(
            jnp.zeros((capacity, dim), jnp.float32),
            NamedSharding(mesh, P("dp", "tp")),
        )
        self.mags = jax.device_put(
            jnp.zeros((capacity,), jnp.float32), NamedSharding(mesh, P("dp"))
        )

    def add(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, np.float32))
        if self.n + len(x) > self.capacity:
            raise RuntimeError("sharded store is fixed-capacity; presize it")
        w = jnp.asarray(x)
        wm = jnp.linalg.norm(w, axis=-1)
        self.vectors, self.mags = sharded_insert(
            self.mesh, self.vectors, self.mags, w, wm, jnp.int32(self.n)
        )
        ids = np.arange(self.n, self.n + len(x), dtype=np.int64)
        self.n += len(x)
        return ids

    def search(self, queries: np.ndarray, top_k: int = 10):
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        qm = jnp.linalg.norm(q, axis=-1)
        vals, gids = sharded_search(
            self.mesh, self.vectors, self.mags, q, qm,
            jnp.int32(self.n), top_k, self.metric,
        )
        return np.asarray(gids, np.int64), np.asarray(vals)
