"""MicroBatcher: leader-follower coalescing of concurrent dense searches."""

import threading

import numpy as np
import pytest

from cosdata_tpu.core.microbatch import MicroBatcher


def _engine(n=500, d=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    calls = []

    def run(q, k):
        calls.append(len(q))
        s = q @ x.T
        ids = np.argsort(-s, axis=1)[:, :k]
        return ids, np.take_along_axis(s, ids, axis=1)

    return x, run, calls


class TestMicroBatcher:
    def test_single_caller_exact(self):
        x, run, calls = _engine()
        mb = MicroBatcher(run)
        ids, sc = mb.search(x[:3], 5)
        assert ids.shape == (3, 5) and (ids[:, 0] == np.arange(3)).all()
        assert calls == [3]

    def test_concurrent_coalesce_and_correctness(self):
        x, run, calls = _engine()
        mb = MicroBatcher(run)
        mb.WINDOW_S = 0.05  # wide window so all threads coalesce
        results = {}
        errs = []

        def worker(i, k):
            try:
                ids, sc = mb.search(x[i : i + 2], k)
                results[i] = (ids, sc, k)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=worker, args=(i, 3 + i % 4))
              for i in range(12)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        # every request got ITS rows at ITS k, self-hit first
        for i, (ids, sc, k) in results.items():
            assert ids.shape == (2, k)
            assert ids[0, 0] == i and ids[1, 0] == i + 1
        # far fewer engine calls than requests (coalescing happened)
        assert len(calls) < 12

    def test_error_propagates_to_followers(self):
        mb = MicroBatcher(lambda q, k: (_ for _ in ()).throw(RuntimeError("boom")))
        mb.WINDOW_S = 0.05
        errs = []

        def worker():
            try:
                mb.search(np.zeros((1, 4), np.float32), 3)
            except RuntimeError as e:
                errs.append(str(e))

        ts = [threading.Thread(target=worker) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert errs == ["boom"] * 4

    def test_oversize_bypasses(self):
        x, run, calls = _engine(n=64, d=8)
        mb = MicroBatcher(run)
        mb.MAX_BATCH = 4
        q = np.zeros((8, 8), np.float32)
        ids, sc = mb.search(q, 2)
        assert ids.shape == (8, 2) and calls == [8]


class TestListPayloads:
    def test_list_queries_coalesce(self):
        # engine over list payloads (the sparse/BM25 shape)
        def run(qs, k):
            ids = np.stack([np.full(k, len(q)) for q in qs])
            return ids, ids.astype(np.float32)

        mb = MicroBatcher(run)
        mb.WINDOW_S = 0.05
        results = {}

        def worker(i):
            ids, sc = mb.search([list(range(i))], 3)
            results[i] = ids

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i, ids in results.items():
            assert (ids == i).all()


class TestChunkedDispatch:
    def test_coalesced_batch_respects_max_batch(self):
        x, run, calls = _engine(n=200, d=16)
        mb = MicroBatcher(run)
        mb.WINDOW_S = 0.05
        mb.MAX_BATCH = 5
        results = {}

        def worker(i):
            ids, sc = mb.search(x[i * 2 : i * 2 + 2], 4)
            results[i] = ids

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert max(calls) <= 5  # no engine call exceeded the cap
        for i, ids in results.items():
            assert ids[0, 0] == i * 2 and ids[1, 0] == i * 2 + 1

    def test_dispatches_serialize_on_shared_lock(self):
        import time as _time

        active = []
        peak = []
        lock = threading.RLock()

        def run(qs, k):
            active.append(1)
            peak.append(len(active))
            _time.sleep(0.01)
            active.pop()
            ids = np.zeros((len(qs), k), np.int64)
            return ids, ids.astype(np.float32)

        a = MicroBatcher(run, dispatch_lock=lock)
        b = MicroBatcher(run, dispatch_lock=lock)
        ts = [threading.Thread(
                target=lambda m: m.search(np.zeros((1, 4), np.float32), 2),
                args=(m,))
              for m in (a, b, a, b, a, b)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert max(peak) == 1  # engine never entered concurrently
