"""Flat (brute-force) dense index: one MXU matmul + top-k.

No reference equivalent (the reference always builds HNSW); this is both the
minimum end-to-end slice (SURVEY.md §7 step 2) and the exact-search oracle
used by recall tests and small collections.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from cosdata_tpu.ops.storage import VectorStore
from cosdata_tpu.ops.topk import NEG_INF, topk


class FlatIndex:
    def __init__(
        self,
        dim: int,
        metric: str = "cosine",
        kind: str = "f32",
        resolution: int = 2,
        range_: tuple[float, float] = (-1.0, 1.0),
        keep_raw: bool = True,
        initial_capacity: int = 1024,
        ship_dtype: str = "f32",
        raw_dtype: str = "f32",
    ):
        if initial_capacity >= self.SCAN_THRESHOLD:
            # presize to a scan-chunk multiple: growth later would transiently
            # hold old+new copies of every array (incl. the raw f32 rows)
            initial_capacity = -(-initial_capacity // self.SCAN_CHUNK) * self.SCAN_CHUNK
        self.store = VectorStore(
            dim=dim, kind=kind, metric=metric, resolution=resolution,
            range=range_, keep_raw=keep_raw, initial_capacity=initial_capacity,
            ship_dtype=ship_dtype, raw_dtype=raw_dtype,
        )
        self.alive = jnp.ones((self.store.capacity,), bool)

    @property
    def n(self) -> int:
        return self.store.n

    def add(self, x: np.ndarray) -> np.ndarray:
        ids = self.store.add(x)
        if self.alive.shape[0] != self.store.capacity:
            self.alive = jnp.pad(
                self.alive,
                ((0, self.store.capacity - self.alive.shape[0]),),
                constant_values=True,
            )
        return ids

    def delete(self, internal_id: int) -> None:
        self.alive = self.alive.at[int(internal_id)].set(False)

    def maybe_promote(self) -> bool:
        """Pull spilled codes back into HBM when the budget fits (see
        VectorStore.maybe_promote_codes); restores the fused codes engine."""
        if self.store.maybe_promote_codes():
            self._host_mask_cache = None
            return True
        return False

    def _mask(self) -> jax.Array:
        """valid & alive, cached — per-search device-op round trips dominate
        latency on a remote link (alive is replaced, not mutated, on delete,
        so identity is a sound cache key)."""
        cached = getattr(self, "_mask_cache", None)
        key = (self.store.n, self.store.capacity)
        if cached is None or cached[0] != key or cached[1] is not self.alive:
            cached = (key, self.alive, self.store.valid_mask() & self.alive)
            self._mask_cache = cached
        return cached[2]

    #: at/above one chunk of capacity, use the fused chunked scan (never
    #: materializes (B, N) — measured 14x faster than the full score matrix
    #: at 100k x 768 u8, whose (B, cap) f32 intermediate is HBM-hostile)
    SCAN_THRESHOLD = 1 << 16
    SCAN_CHUNK = 1 << 16

    def search(
        self, queries: np.ndarray, top_k: int = 10, rerank: bool = False,
        rerank_factor: int = 5,
    ) -> tuple[np.ndarray, np.ndarray]:
        if rerank and self.store.raw_on_host:
            # raw rows live host-side (RAM/disk tier): fetch the quantized
            # shortlist from the device, exact-rerank against the host raw
            # rows — same contract as the device-raw rerank instead of
            # silently returning quantized-order results
            queries = np.atleast_2d(np.asarray(queries, np.float32))
            fetch = max(min(top_k * rerank_factor,
                            max(self.store.capacity, 1)), top_k)
            ids, vals = jax.device_get(
                self.search_device(queries, fetch, rerank=False)
            )
            ids = ids.astype(np.int64)
            re = self.store.rerank_scores_host(queries, ids)
            re = np.where(ids >= 0, re, -np.inf)
            order = np.argsort(-re, axis=1, kind="stable")[:, :top_k]
            ids = np.take_along_axis(ids, order, axis=1)
            vals = np.take_along_axis(re, order, axis=1).astype(np.float32)
            return ids, vals
        ids, vals = self.search_device(queries, top_k, rerank, rerank_factor)
        ids, vals = jax.device_get((ids, vals))  # one round trip
        return ids.astype(np.int64), np.asarray(vals)

    def search_device(
        self, queries: np.ndarray, top_k: int = 10, rerank: bool = False,
        rerank_factor: int = 5,
    ):
        """Dispatch one search without host synchronization.

        Returns device arrays (ids, vals); jax dispatch is async, so callers
        can pipeline many batches (overlapping host->device transfer with
        compute) and fetch all results with one `jax.device_get` at the end —
        the throughput shape the reference measures with concurrent requests
        (tests/rps-test.py:414-454).
        """
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        if self.n == 0:
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        if self.store.codes_on_host:
            # beyond-HBM spill tier: stream host code chunks through the
            # device scan (see VectorStore._spill_codes_to_host)
            from cosdata_tpu.ops.flat_scan import streamed_flat_topk

            cached = getattr(self, "_host_mask_cache", None)
            key = (self.store.n, self.store.capacity)
            if cached is None or cached[0] != key or cached[1] is not self.alive:
                valid_np = np.zeros(self.store.capacity, bool)
                valid_np[: self.store.n] = True
                valid_np &= np.asarray(self.alive)[: self.store.capacity]
                cached = (key, self.alive, valid_np)
                self._host_mask_cache = cached
            k_fetch = min(
                top_k * rerank_factor if rerank else top_k,
                self.store.capacity,
            )
            top_s, top_i = streamed_flat_topk(
                self.store.metric, self.store, queries, k_fetch, cached[2]
            )
            ids = jnp.where(top_s > NEG_INF / 2, top_i, -1)
            # no rerank stage exists on this path (raw_on_host reranks are
            # intercepted by search()): honor the (B, top_k) contract
            # instead of returning the k_fetch-wide quantized shortlist
            return ids[:, :top_k], top_s[:, :top_k]
        mask = self._mask()
        k_fetch = min(
            top_k * rerank_factor if rerank else top_k, self.store.capacity
        )
        if self.store.capacity >= self.SCAN_THRESHOLD:
            from cosdata_tpu.ops.flat_scan import fused_flat_search

            if self.store.capacity % self.SCAN_CHUNK:
                self.store._grow_to(
                    -(-self.store.capacity // self.SCAN_CHUNK) * self.SCAN_CHUNK
                )
                self.alive = jnp.pad(
                    self.alive,
                    ((0, self.store.capacity - self.alive.shape[0]),),
                    constant_values=True,
                )
                mask = self._mask()
            kind = "float" if self.store.kind in ("f16", "f32") else self.store.kind
            do_rerank = bool(rerank and self.store.keep_raw is True)
            from cosdata_tpu.ops.storage import use_codes_engine

            if use_codes_engine(self.store):
                from cosdata_tpu.ops.flat_scan import (
                    exact_rerank_sorted,
                    fused_flat_search_codes,
                    fused_flat_search_codes_f16q,
                )

                import os as _os

                # "bins" default (r5): the global bin-max route replaces
                # 16 per-chunk approx_max_k sorts with ONE selection over
                # the maxima — measured 261 vs 400 ms at b4096, even at
                # b1024, recall preserved at k_bins=64
                # (scripts/exp_r5_flatdev.py / exp_r5_scanparts.py)
                select = _os.environ.get("COSDATA_SCAN_SELECT", "bins")
                group = 32
                # windowed-max guarantee: the true top-J rows live in the
                # top-J bins; 64 = k_fetch slack + headroom for the 0.99
                # approx selection over maxima (every extra bin costs a
                # `group`-row expansion rescore)
                k_bins = max(64, -(-k_fetch // group) * 2)
                if not do_rerank:
                    # no rerank tier: u8 codes are the leanest wire
                    qc = self.store.ship_query_codes(queries)
                    ids, vals = fused_flat_search_codes(
                        self.store.metric, self.store.dim,
                        self.store.dim_pad, k_bins, group, k_fetch,
                        k_fetch, self.SCAN_CHUNK,
                        False, qc, self.store._arrays, qc.data, qc.mags,
                        mask, select=select,
                    )
                    return ids[:, :top_k], vals[:, :top_k]
                # ONE f16 query upload serves both stages (the old
                # codes+f16 double upload paid the wire twice on a link
                # where transfers never overlap compute), then the exact
                # rerank runs as its OWN program — fused into the scan it
                # scheduled pathologically at wide batches (353 ms at
                # b4096 vs ~35 ms standalone, scripts/exp_r5_rerank.py)
                q_f16 = self.store._pad_dims(queries, ship_f16=True)
                lo, hi = self.store.range
                ids, vals = fused_flat_search_codes_f16q(
                    self.store.metric, self.store.dim, self.store.dim_pad,
                    k_bins, group, k_fetch, k_fetch, self.SCAN_CHUNK,
                    q_f16, lo, hi, self.store._arrays, mask,
                    select=select,
                )
                return exact_rerank_sorted(
                    self.store.metric, self.store.dim, self.store.dim_pad,
                    top_k, q_f16, self.store._raw, ids, vals,
                )
            q_raw = self.store.ship_queries(queries)
            raw = self.store._raw if do_rerank else q_raw
            return fused_flat_search(
                self.store.metric, kind, self.store.dim, self.store.dim_pad,
                self.store.resolution, k_fetch, top_k, self.SCAN_CHUNK,
                do_rerank, q_raw, self.store.range[0], self.store.range[1],
                self.store._arrays, raw, mask,
            )
        q = self.store.quantize_queries(queries)
        scores = self.store.scores_all(q)
        vals, ids = topk(scores, k_fetch, mask=mask[None, :])
        if rerank and self.store.keep_raw is True:
            re = self.store.rerank_scores(queries, ids)
            re = jnp.where(vals > NEG_INF / 2, re, NEG_INF)
            vals, pos = jax.lax.top_k(re, top_k)
            ids = jnp.take_along_axis(ids, pos, axis=1)
        else:
            vals, ids = vals[:, :top_k], ids[:, :top_k]
        ids = jnp.where(vals > NEG_INF / 2, ids, -1)
        return ids, vals
