"""Data-parallel HNSW across devices (the DEEP-100M configuration,
SURVEY.md §7 step 10).

Each device owns an independent HNSW sub-graph over its shard of the
vectors (arrays committed to that device via jax.default_device). Inserts
round-robin across shards; queries fan out to every shard — dispatches are
asynchronous, so per-shard beam searches overlap across devices — and the
per-shard top-k lists merge on host into global ids.

This is the shard-parallel plan the reference runs with rayon threads
(indexes/mod.rs:260-272) lifted to whole accelerators; the flat sharded
path in parallel/sharded.py covers the shard_map/psum formulation for
brute-force scoring.
"""

from __future__ import annotations

import numpy as np

import jax

from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams


class ShardedHNSWIndex:
    #: marker for the serving layer (DenseIndexHandle routes sharded
    #: engines through ShardedHNSWIndex.search, which owns per-shard
    #: engine selection + mask translation)
    is_sharded = True

    #: per-SHARD flat/graph crossover: each device serves its shard with
    #: the exact fused scan while the shard fits HBM-resident-scan scale
    #: (same crossover measurement as DenseIndexHandle.flat_serve_threshold)
    flat_serve_threshold = 1_572_864

    def __init__(
        self,
        dim: int,
        devices: list | None = None,
        n_shards: int | None = None,
        metric: str = "cosine",
        kind: str = "u8",
        resolution: int = 2,
        range_: tuple[float, float] = (-1.0, 1.0),
        params: HNSWParams | None = None,
        seed: int = 0,
        initial_capacity_per_shard: int = 1024,
        keep_raw: bool | str = True,
        ship_dtype: str = "f32",
    ):
        devices = devices or jax.devices()
        if n_shards is not None:
            devices = (devices * n_shards)[:n_shards]
        self.devices = devices
        self.params = params or HNSWParams()
        self.shards: list[HNSWIndex] = []
        for i, dev in enumerate(devices):
            with jax.default_device(dev):
                self.shards.append(
                    HNSWIndex(
                        dim=dim,
                        metric=metric,
                        kind=kind,
                        resolution=resolution,
                        range_=range_,
                        params=self.params,
                        seed=seed + i,
                        initial_capacity=initial_capacity_per_shard,
                        keep_raw=keep_raw,
                        ship_dtype=ship_dtype,
                    )
                )
        self.scan_only = self.shards[0].scan_only if self.shards else False
        # per-shard local row -> global id, plus the reverse map so delete
        # is O(1) instead of a linear probe per shard
        self._global_of: list[list[int]] = [[] for _ in devices]
        self._loc_of: dict[int, tuple[int, int]] = {}
        self.n = 0
        #: rotation cursor so SMALL batches spread across shards over
        #: successive add() calls — np.array_split alone sends every
        #: batch smaller than n_shards entirely to shard 0
        self._rr = 0

    def add(self, x: np.ndarray) -> np.ndarray:
        """Round-robin block insert; returns global ids."""
        x = np.atleast_2d(np.asarray(x, np.float32))
        n_sh = len(self.shards)
        gids = np.arange(self.n, self.n + len(x), dtype=np.int64)
        # balanced contiguous blocks per shard for this batch, rotated by
        # a persistent cursor so streaming single-vector adds still
        # balance across devices
        blocks = np.array_split(np.arange(len(x)), n_sh)
        splits = [
            blocks[(s - self._rr) % n_sh] for s in range(n_sh)
        ]
        self._rr = (self._rr + 1) % n_sh
        for s, part in enumerate(splits):
            if len(part) == 0:
                continue
            with jax.default_device(self.devices[s]):
                self.shards[s].add(x[part])
            base = len(self._global_of[s])
            for j, g in enumerate(gids[part].tolist()):
                self._loc_of[g] = (s, base + j)
            self._global_of[s].extend(gids[part].tolist())
        self.n += len(x)
        return gids

    @property
    def n_deleted(self) -> int:
        return sum(s.n_deleted for s in self.shards)

    @property
    def store(self):
        """First shard's store: the serving layer reads kind/metric/
        keep_raw configuration off it (identical across shards)."""
        return self.shards[0].store

    def _local_mask(self, s: int, row_mask: np.ndarray) -> np.ndarray:
        """Translate a GLOBAL row mask (indexed by global insert order) to
        shard ``s``'s local row space."""
        gmap = np.asarray(self._global_of[s], np.int64)
        safe = np.minimum(gmap, len(row_mask) - 1)
        local = np.zeros(self.shards[s].cap, bool)
        if len(gmap):
            local[: len(gmap)] = np.where(
                gmap < len(row_mask), row_mask[safe], False
            )
        return local

    def search(
        self,
        queries: np.ndarray,
        top_k: int = 10,
        ef: int | None = None,
        row_mask: np.ndarray | None = None,
    ):
        """Fan out to all shards (async dispatch — per-shard beam/scan
        programs overlap across devices), merge global top-k on host.

        Engine selection is PER SHARD (the serving rule of
        core/collection.py lifted to the mesh): a shard at HBM-resident
        scan scale serves the exact fused scan, a beyond-crossover shard
        serves graph traversal; masked (metadata-filtered) searches use
        the exact masked scan on every shard — always the correct
        filtered top-k (query_filtering.rs:7-110 contract)."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        b = len(queries)
        pending = []
        for s, shard in enumerate(self.shards):
            if shard.n == 0:
                continue
            mask_l = (
                self._local_mask(s, row_mask) if row_mask is not None else None
            )
            # host-raw shards return a 5x quantized-order shortlist; the
            # merge loop exact-reranks it before the cross-shard top-k
            fetch = top_k * 5 if shard.store.raw_on_host else top_k
            with jax.default_device(self.devices[s]):
                if shard.store.codes_on_host:
                    # spilled shard: host-streamed scan (sync host arrays)
                    out = shard.search_brute(queries, fetch, mask=mask_l)
                elif (
                    mask_l is not None
                    or shard.n <= self.flat_serve_threshold
                    or shard.scan_only
                ):
                    out = shard.search_brute_device(
                        queries, fetch, mask=mask_l
                    )
                else:
                    out = shard.search_device(queries, top_k=fetch, ef=ef)
            if out is not None:
                pending.append((s, out))
        if not pending:
            return (
                np.full((b, top_k), -1, np.int64),
                np.full((b, top_k), -np.inf, np.float32),
            )
        all_ids, all_scores = [], []
        for s, (ids_dev, scores_dev) in pending:
            ids = np.asarray(ids_dev, np.int64)
            scores = np.asarray(scores_dev, np.float32)
            shard = self.shards[s]
            if shard.store.raw_on_host and not shard.store.codes_on_host:
                # host-raw shards: exact rerank against host-resident raw
                # rows before the cross-shard merge (scores must be
                # comparable across shards, and quantized-order scores
                # from one shard must not outrank exact ones from another;
                # spilled shards' search_brute already reranked)
                re = shard.store.rerank_scores_host(queries, np.maximum(ids, 0))
                scores = np.where(ids >= 0, re, -np.inf).astype(np.float32)
            gmap = np.asarray(self._global_of[s], np.int64)
            ok = ids >= 0
            gids = np.full_like(ids, -1)
            gids[ok] = gmap[ids[ok]]
            all_ids.append(gids)
            all_scores.append(np.where(ok, scores, -np.inf))
        cat_ids = np.concatenate(all_ids, axis=1)
        cat_scores = np.concatenate(all_scores, axis=1)
        order = np.argsort(-cat_scores, axis=1)[:, :top_k]
        out_ids = np.take_along_axis(cat_ids, order, axis=1)
        out_scores = np.take_along_axis(cat_scores, order, axis=1)
        return out_ids, out_scores

    def refine(self) -> None:
        for s, shard in enumerate(self.shards):
            with jax.default_device(self.devices[s]):
                shard.refine()

    def delete(self, global_id: int) -> None:
        loc = self._loc_of.pop(int(global_id), None)
        if loc is None:
            return
        s, row = loc
        self.shards[s].delete(row)

    def raw_rows(self, global_rows: np.ndarray) -> np.ndarray:
        """Raw f32 rows by GLOBAL row id (resolved shard-by-shard)."""
        global_rows = np.atleast_1d(np.asarray(global_rows, np.int64))
        out = np.zeros(
            (len(global_rows), self.shards[0].store.dim), np.float32
        )
        for i, g in enumerate(global_rows):
            loc = self._loc_of.get(int(g))
            if loc is None:
                continue
            s, row = loc
            out[i] = self.shards[s].store.raw_rows(np.asarray([row]))[0]
        return out
