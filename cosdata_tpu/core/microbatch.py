"""Micro-batching queue in front of the device (SURVEY.md §7: "batching
queue in front of the device").

On a remote-tunnel TPU every search dispatch pays a fixed round trip
(tens of ms), so N concurrent REST requests that each carry a handful of
queries waste N-1 round trips. The reference absorbs request concurrency
with actix worker threads + rayon batch_search (indexes/mod.rs:260-272);
the TPU-native equivalent is coalescing: the first thread in becomes the
leader, waits a few ms for followers, stacks every pending request into
ONE device call at max(top_k), and slices the results back per request.

Thread-safety bonus: engine calls serialize through leaders, so
concurrent searches no longer race inside the index handle.
"""

from __future__ import annotations

import threading
import time

import numpy as np


class MicroBatcher:
    """Leader-follower coalescer for `run(queries (B, d), top_k)` calls.

    `run` must return `(ids (B, K), scores (B, K))` arrays. Requests are
    only coalesced with each other — a lone caller pays just WINDOW_S.
    """

    #: how long the leader waits for followers. Small vs the device round
    #: trip it saves; irrelevant for throughput (the window overlaps the
    #: previous batch's device time under sustained load).
    WINDOW_S = 0.003
    #: safety cap on one coalesced dispatch
    MAX_BATCH = 4096

    def __init__(self, run):
        self._run = run
        self._lock = threading.Lock()
        self._pending: list[tuple[np.ndarray, int, threading.Event, dict]] = []
        self._leader_active = False

    @staticmethod
    def _concat(parts):
        if isinstance(parts[0], np.ndarray):
            return np.concatenate(parts)
        out = []
        for p in parts:
            out.extend(p)
        return out

    def search(self, queries, top_k: int):
        """`queries` is a (B, d) array (dense) or a list of per-query
        payloads (sparse term pairs / BM25 texts) — anything `run` takes
        whose results come back as (B, K) arrays."""
        if isinstance(queries, np.ndarray) or not isinstance(queries, (list, tuple)):
            queries = np.atleast_2d(np.asarray(queries, np.float32))
        if len(queries) >= self.MAX_BATCH:
            return self._run(queries, top_k)
        ev = threading.Event()
        slot: dict = {}
        with self._lock:
            self._pending.append((queries, top_k, ev, slot))
            am_leader = not self._leader_active
            if am_leader:
                self._leader_active = True
        if not am_leader:
            ev.wait()
            if "err" in slot:
                raise slot["err"]
            return slot["ids"], slot["scores"]

        time.sleep(self.WINDOW_S)
        with self._lock:
            batch, self._pending = self._pending, []
            self._leader_active = False
        try:
            if len(batch) == 1:
                q, k, _, _ = batch[0]
                out = self._run(q, k)
                return out
            qs = self._concat([b[0] for b in batch])
            k_max = max(b[1] for b in batch)
            ids, scores = self._run(qs, k_max)
            ids = np.asarray(ids)
            scores = np.asarray(scores)
            pos = 0
            mine = None
            for i, (q, k, evt, slot_i) in enumerate(batch):
                rows = slice(pos, pos + len(q))
                pos += len(q)
                part = (ids[rows, :k], scores[rows, :k])
                if i == 0:
                    mine = part
                else:
                    slot_i["ids"], slot_i["scores"] = part
                    evt.set()
            return mine
        except Exception as e:
            for i, (_, _, evt, slot_i) in enumerate(batch):
                if i == 0:
                    continue
                slot_i["err"] = e
                evt.set()
            raise
