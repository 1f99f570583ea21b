"""HNSW recall vs brute force (SURVEY.md §4: recall parity, not isomorphism)."""

import numpy as np
import pytest

from cosdata_tpu.indexes.flat import FlatIndex
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _recall(got_ids, true_ids):
    hits = 0
    total = 0
    for g, t in zip(got_ids, true_ids):
        tset = set(int(i) for i in t if i >= 0)
        hits += len(tset & set(int(i) for i in g if i >= 0))
        total += len(tset)
    return hits / max(total, 1)


SMALL = dict(
    num_layers=4, wave_size=256, ef_construction=64, ef_search=96,
    max_iters=64, visited_cap=1024,
)


class TestFlat:
    def test_exact_search(self):
        d, n = 64, 500
        x = _unit(n, d, 0)
        idx = FlatIndex(dim=d, kind="f32")
        idx.add(x)
        q = x[:7]
        ids, scores = idx.search(q, top_k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(7))
        np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-4)

    def test_delete(self):
        x = _unit(100, 32, 1)
        idx = FlatIndex(dim=32, kind="f32")
        idx.add(x)
        idx.delete(5)
        ids, _ = idx.search(x[5], top_k=3)
        assert 5 not in ids[0]


class TestHammingScanOnly:
    """hamming dense indexes run scan-only (no graph kernels support the
    XOR-popcount contraction); results must be exact and the handle must
    route hamming to the scan regardless of flat_serve_threshold."""

    @pytest.mark.fast
    def test_hnsw_hamming_exact(self):
        d, n, k = 64, 400, 5
        x = _unit(n, d, 40)
        idx = HNSWIndex(dim=d, kind="u8", range_=(-0.3, 0.3),
                        metric="hamming", params=HNSWParams(**SMALL),
                        initial_capacity=n)
        assert idx.scan_only
        ids = idx.add(x)
        assert len(ids) == n
        got, _ = idx.search(x[:16], top_k=k, rerank=False)
        assert (got[:, 0] == np.arange(16)).all()  # self-query rank 1
        idx.delete(3)
        got, _ = idx.search(x[3], top_k=3, rerank=False)
        assert 3 not in got[0]

    @pytest.mark.fast
    def test_handle_metric_aliases_and_range_validation(self):
        from cosdata_tpu.core.collection import DenseIndexHandle

        h = DenseIndexHandle(dimension=16, distance_metric="dotproduct")
        assert h.metric == "dot"
        h2 = DenseIndexHandle(dimension=16, distance_metric="hamming")
        assert h2.metric == "hamming"
        with pytest.raises(ValueError):
            DenseIndexHandle(dimension=16, distance_metric="chebyshev")
        with pytest.raises(ValueError):
            DenseIndexHandle(
                dimension=16,
                quantization={
                    "type": "scalar",
                    "data_type": "u8",
                    "range": {"min": 0.5, "max": 0.5},
                },
            )


class TestHNSW:
    @pytest.mark.parametrize("kind", ["f32", "u8"])
    def test_recall_vs_bruteforce(self, kind):
        d, n, nq, k = 96, 3000, 32, 10
        x = _unit(n, d, 2)
        q = _unit(nq, d, 3)
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)

        idx = HNSWIndex(dim=d, kind=kind, params=HNSWParams(**SMALL), seed=7)
        idx.add(x)
        got_ids, _ = idx.search(q, top_k=k)
        r = _recall(got_ids, true_ids)
        assert r >= 0.90, f"recall@{k} = {r}"

    def test_incremental_and_self_query(self):
        d = 64
        x = _unit(600, d, 4)
        idx = HNSWIndex(dim=d, kind="f32", params=HNSWParams(**SMALL), seed=1)
        idx.add(x[:200])
        idx.add(x[200:400])
        idx.add(x[400:])
        ids, scores = idx.search(x[:16], top_k=1)
        # self should nearly always be the top hit with exact rerank
        assert (ids[:, 0] == np.arange(16)).mean() >= 0.9

    def test_delete_tombstone(self):
        d = 32
        x = _unit(300, d, 5)
        idx = HNSWIndex(dim=d, kind="f32", params=HNSWParams(**SMALL), seed=2)
        idx.add(x)
        ids0, _ = idx.search(x[10], top_k=1)
        assert ids0[0, 0] == 10
        idx.delete(10)
        ids1, _ = idx.search(x[10], top_k=5)
        assert 10 not in ids1[0]

    def test_empty_search(self):
        idx = HNSWIndex(dim=16, kind="f32", params=HNSWParams(**SMALL))
        ids, scores = idx.search(np.zeros((2, 16), np.float32), top_k=3)
        assert (ids == -1).all()

    def test_host_raw_mode_recall(self):
        """keep_raw="host": raw rows live in host RAM (beyond-HBM mode);
        the exact rerank runs on host and recall must match device-raw."""
        d, n, nq, k = 96, 3000, 32, 10
        x = _unit(n, d, 2)
        q = _unit(nq, d, 3)
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)
        idx = HNSWIndex(dim=d, kind="u8", params=HNSWParams(**SMALL),
                        seed=7, keep_raw="host")
        idx.add(x)
        assert idx.store._raw is None  # no HBM raw copy
        got_ids, got_scores = idx.search(q, top_k=k)
        assert _recall(got_ids, true_ids) >= 0.90
        # scores are exact f32 cosine (host rerank), not quantized-space
        v = x[got_ids[0, 0]]
        want = (q[0] @ v) / (np.linalg.norm(q[0]) * np.linalg.norm(v))
        np.testing.assert_allclose(got_scores[0, 0], want, rtol=1e-4)
        # brute path through host rerank too
        b_ids, b_scores = idx.search_brute(q, top_k=k)
        assert _recall(b_ids, true_ids) >= 0.99


class TestFlatScan:
    def test_chunked_scan_matches_direct(self):
        # force the chunked path with a small threshold
        from cosdata_tpu.indexes.flat import FlatIndex

        old_thresh, old_chunk = FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK
        FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = 256, 128
        try:
            x = _unit(700, 64, 9)
            q = _unit(5, 64, 10)
            idx = FlatIndex(dim=64, kind="u8", range_=(-0.3, 0.3),
                            initial_capacity=1024)
            idx.add(x)
            idx.delete(3)
            ids_scan, vals_scan = idx.search(q, top_k=7)
            FlatIndex.SCAN_THRESHOLD = 1 << 30  # direct path
            ids_dir, vals_dir = idx.search(q, top_k=7)
            # accumulation order differs between the chunked and direct
            # paths -> f32 noise; compare id sets and values loosely
            for a, b in zip(ids_scan, ids_dir):
                assert set(a) == set(b)
            np.testing.assert_allclose(
                np.sort(vals_scan), np.sort(vals_dir), rtol=1e-4, atol=1e-5
            )
        finally:
            FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = old_thresh, old_chunk

    def test_scan_with_rerank(self):
        from cosdata_tpu.indexes.flat import FlatIndex

        old_thresh, old_chunk = FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK
        FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = 256, 128
        try:
            x = _unit(600, 32, 11)
            idx = FlatIndex(dim=32, kind="u8", range_=(-0.3, 0.3),
                            initial_capacity=1024)
            idx.add(x)
            ids, scores = idx.search(x[:4], top_k=1, rerank=True)
            np.testing.assert_array_equal(ids[:, 0], np.arange(4))
            np.testing.assert_allclose(scores[:, 0], 1.0, rtol=1e-4)
        finally:
            FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = old_thresh, old_chunk


class TestBulkBuild:
    def test_bulk_matches_recall(self):
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        d, n, nq, k = 96, 3000, 32, 10
        x = _unit(n, d, 20)
        q = _unit(nq, d, 21)
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)

        idx = HNSWIndex(dim=d, kind="u8", range_=(-0.3, 0.3),
                        params=HNSWParams(**SMALL), seed=7, initial_capacity=n)
        old = HNSWIndex.BULK_THRESHOLD
        HNSWIndex.BULK_THRESHOLD = 1000
        try:
            idx.add(x)  # takes the bulk path
        finally:
            HNSWIndex.BULK_THRESHOLD = old
        got_ids, _ = idx.search(q, top_k=k)
        r = _recall(got_ids, true_ids)
        assert r >= 0.93, f"bulk recall@{k} = {r}"

        # incremental insert after bulk still works
        x2 = _unit(100, d, 22)
        ids2 = idx.add(x2)
        got, _ = idx.search(x2[:4], top_k=1)
        assert (got[:, 0] == ids2[:4]).mean() >= 0.75

    @pytest.mark.fast
    def test_chunked_reverse_matches_global_oracle(self, monkeypatch):
        """apply_forward_and_reverse processes reverse edges per source
        chunk inside a fori_loop (REV_SRC_CHUNK — the monolithic 67M-edge
        sort's XLA compile ran tens of minutes remotely). m-best merging is
        associative, so the chunked cumulative merge must select exactly
        the global per-target m-best reverse edges. Oracle in numpy."""
        import jax.numpy as jnp

        from cosdata_tpu.ops import hnsw_kernels as HK

        rng = np.random.default_rng(41)
        cap, m, w = 96, 6, 256  # w >> chunk: exercises the loop
        monkeypatch.setattr(HK, "REV_SRC_CHUNK", 64)
        # member ids are unique rows of the table (a permutation); the
        # padded tail is -1 like real bucketed levels
        mem = np.full(w, -1, np.int32)
        mem[:cap] = rng.permutation(cap)
        fwd = np.full((w, m), -1, np.int32)
        fwd_d = np.full((w, m), -np.inf, np.float32)
        for i in range(cap):
            nn = rng.choice(cap, size=m, replace=False)
            nn = nn[nn != mem[i]][: m - 1]
            fwd[i, : len(nn)] = nn
            fwd_d[i, : len(nn)] = rng.uniform(0.1, 1.0, len(nn)).astype(np.float32)
        adj0 = np.full((cap, m), -1, np.int32)
        dist0 = np.full((cap, m), -np.inf, np.float32)
        out_i, out_d = HK.apply_forward_and_reverse(
            jnp.asarray(adj0), jnp.asarray(dist0), jnp.asarray(mem),
            jnp.asarray(fwd), jnp.asarray(fwd_d), m,
        )
        out_i, out_d = np.asarray(out_i), np.asarray(out_d)

        # numpy oracle: forward writes, then per-target m-best incoming
        # (dedup vs the row's forward entries), merged to m best total
        want = {}
        rows = {int(mem[i]): (fwd[i], fwd_d[i]) for i in range(cap)}
        incoming: dict = {t: [] for t in range(cap)}
        for i in range(cap):
            s = int(mem[i])
            for j in range(m):
                t = int(fwd[i, j])
                if t >= 0 and np.isfinite(fwd_d[i, j]):
                    incoming[t].append((s, float(fwd_d[i, j])))
        for t in range(cap):
            fids, fds = rows[t]
            cur = [(int(a), float(b)) for a, b in zip(fids, fds) if a >= 0]
            inc = [
                (s, d) for s, d in incoming[t]
                if s not in {a for a, _ in cur}
            ]
            merged = sorted(cur + inc, key=lambda p: -p[1])[:m]
            want[t] = merged
        for t in range(cap):
            got = [
                (int(a), round(float(b), 5))
                for a, b in zip(out_i[t], out_d[t]) if a >= 0
            ]
            exp = [(a, round(b, 5)) for a, b in want[t]]
            # compare as score-sorted sets (ties may reorder)
            assert sorted(got, key=lambda p: (-p[1], p[0])) == sorted(
                exp, key=lambda p: (-p[1], p[0])
            ), (t, got, exp)

    @pytest.mark.fast
    def test_upper_adjacency_values_are_node_ids(self):
        """Structural invariant of the bulk-built graph: every upper-level
        neighbor value is a NODE ID whose own level reaches that level
        (reverse edges once inserted slot indices here — r2 review)."""
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        d, n = 64, 3000
        x = _unit(n, d, 33)
        idx = HNSWIndex(dim=d, kind="u8", range_=(-0.3, 0.3),
                        params=HNSWParams(**SMALL), seed=11,
                        initial_capacity=n)
        old = HNSWIndex.BULK_THRESHOLD
        HNSWIndex.BULK_THRESHOLD = 1000
        try:
            idx.add(x)
        finally:
            HNSWIndex.BULK_THRESHOLD = old
        up = np.asarray(idx.up_adj)  # (cap_up, L, m)
        slot_host = idx.up_slot_host
        checked = 0
        for level in range(1, up.shape[1] + 1):
            members = np.where(idx.levels >= level)[0]
            if len(members) < 2:
                continue
            slots = slot_host[members]
            vals = up[slots, level - 1].reshape(-1)
            vals = vals[vals >= 0]
            assert len(vals), f"level {level} has no edges"
            # value must be a node id that exists at this level
            assert (idx.levels[vals] >= level).all(), (
                f"level {level}: adjacency holds non-member values "
                f"(slot indices?) {vals[idx.levels[vals] < level][:8]}"
            )
            checked += len(vals)
        assert checked > 0

    def test_rp_order_is_a_partition(self):
        """_rp_order (device histogram median splits) must place every
        member exactly once, whatever the imbalance."""
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        d, n = 64, 5000
        x = _unit(n, d, 30)
        idx = HNSWIndex(dim=d, kind="u8", range_=(-0.3, 0.3),
                        params=HNSWParams(**SMALL), seed=3, initial_capacity=n)
        idx.store.add(x)
        members = np.arange(n, dtype=np.int64)
        out = idx._rp_order(members, 512, seed=42)
        flat = out.reshape(-1)
        placed = flat[flat >= 0]
        assert len(placed) == n
        assert set(placed.tolist()) == set(range(n))
        assert out.shape[0] == 16  # 2^ceil(log2(5000/512)) = 2^4
        # leaves are 512-padded
        assert out.shape[1] % 512 == 0

    def test_rp_bulk_path_recall(self):
        """Force the RP-tree bulk path at small n: graph must stay usable
        (self-retrieval) after histogram-split partitioning."""
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        d, n = 64, 4000
        x = _unit(n, d, 31)
        old_t, old_l = HNSWIndex.RP_THRESHOLD, HNSWIndex.RP_LEAF
        HNSWIndex.RP_THRESHOLD, HNSWIndex.RP_LEAF = 1000, 512
        try:
            idx = HNSWIndex(dim=d, kind="u8", range_=(-0.3, 0.3),
                            params=HNSWParams(**SMALL), seed=9,
                            initial_capacity=n)
            idx.add(x)
        finally:
            HNSWIndex.RP_THRESHOLD, HNSWIndex.RP_LEAF = old_t, old_l
        got, _ = idx.search(x[:32], top_k=5, ef=128)
        self_hit = np.mean([int(i in set(map(int, got[i]))) for i in range(32)])
        assert self_hit >= 0.85, f"self-retrieval {self_hit}"


class TestBeyondHBMSpill:
    """Past-HBM growth spills u8 codes to host RAM and serves the
    streamed exact scan (VERDICT r2 weak #8 / missing #2: degradation
    instead of an opaque XLA OOM)."""

    def test_spill_streamed_search_and_delete(self, monkeypatch):
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))  # ~50 KB
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=128,
            params=HNSWParams(num_layers=2, wave_size=256, max_iters=32),
        )
        x = _unit(3000, 64, 31)
        ids = idx.add(x)
        assert len(ids) == 3000
        assert idx.store.codes_on_host, "growth past the budget must spill"
        assert idx.scan_only
        got, vals = idx.search(x[:5], top_k=5)
        assert (got[:, 0] == np.arange(5)).all()
        assert vals[0, 0] > 0.98  # exact host rerank
        # tombstones work through the host mirror
        idx.delete(3)
        got, _ = idx.search(x[3], top_k=5)
        assert 3 not in got[0]
        # masked (filtered) search
        mask = np.zeros(3000, bool)
        mask[::2] = True
        got, _ = idx.search_brute(x[:4], top_k=5, mask=mask)
        assert got[0, 0] == 0
        flat = got[got >= 0]
        assert (flat % 2 == 0).all()

    def test_graph_then_spill_frees_adjacency(self, monkeypatch):
        monkeypatch.setenv("COSDATA_HBM_GB", str(100 / (1 << 20)))  # ~100 KB
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=1024,
            params=HNSWParams(num_layers=2, wave_size=256, max_iters=32),
        )
        x = _unit(4000, 64, 33)
        idx.add(x[:1000])  # fits: graph built
        assert not idx.scan_only
        idx.add(x[1000:])  # growth spills mid-add
        assert idx.store.codes_on_host and idx.scan_only
        assert idx.adj0.shape[0] == 1  # adjacency HBM freed
        got, _ = idx.search(x[:8], top_k=3)
        assert (got[:, 0] == np.arange(8)).all()

    def test_kept_graph_spill_serves_graph_search(self):
        """force_spill(keep_graph=True): codes move to host RAM, level-0
        adjacency stays, and search runs the host-wave beam — per-wave
        frontier row gathers instead of streaming the whole corpus
        (VERDICT r4 missing #5)."""
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=4096,
            params=HNSWParams(num_layers=2, wave_size=256, max_iters=32),
        )
        x = _unit(4000, 64, 41)
        idx.add(x)
        assert not idx.scan_only
        pre_ids, _ = idx.search(x[:16], top_k=5, ef=128)
        idx.force_spill(keep_graph=True)
        assert idx.store.codes_on_host and not idx.scan_only
        assert idx.graph_on_spill
        assert idx.adj0.shape[0] >= 4000  # adjacency retained
        got, vals = idx.search(x[:16], top_k=5, ef=128)
        # self-retrieval through the host-wave beam + exact host rerank
        self_hit = np.mean([int(i in set(map(int, got[i]))) for i in range(16)])
        assert self_hit >= 0.9, self_hit
        assert vals[0, 0] > 0.98
        # tombstones respected mid-traversal
        target = int(got[1, 0])
        idx.delete(target)
        got2, _ = idx.search(x[1], top_k=5, ef=128)
        assert target not in set(map(int, got2[0]))
        # streamed exact scan still serves the same spilled store
        # (rows 4..8: row `target` was tombstoned above)
        b_ids, _ = idx.search_brute(x[4:8], top_k=3)
        assert (b_ids[:, 0] == np.arange(4, 8)).all()
        # ingest past the kept-graph spill downgrades to scan-only
        idx.add(_unit(8, 64, 42))
        assert idx.scan_only and not idx.graph_on_spill
        got3, _ = idx.search(x[4:8], top_k=3)
        assert (got3[:, 0] == np.arange(4, 8)).all()

    def test_streamed_codes_merge_parity(self, monkeypatch):
        """The fused-codes streamed merge (Pallas bin-max per chunk,
        interpret mode on CPU) must return the same results as the plain
        streamed merge on a spilled u8 store (VERDICT r4 missing #4:
        spill used to lose the codes engine)."""
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=128,
            params=HNSWParams(num_layers=2, wave_size=256, max_iters=32),
        )
        x = _unit(3000, 64, 37)
        idx.add(x)
        assert idx.store.codes_on_host
        monkeypatch.setenv("COSDATA_STREAM_CODES", "0")
        plain_ids, plain_vals = idx.search(x[:6], top_k=5)
        monkeypatch.setenv("COSDATA_STREAM_CODES", "interpret")
        fused_ids, fused_vals = idx.search(x[:6], top_k=5)
        assert (fused_ids[:, 0] == np.arange(6)).all()
        # both paths end in the exact host rerank of the same shortlist
        # contract; ids may differ past ties, scores must agree
        np.testing.assert_allclose(fused_vals, plain_vals, rtol=1e-4)
        overlap = np.mean([
            len(set(plain_ids[i]) & set(fused_ids[i])) / 5 for i in range(6)
        ])
        assert overlap >= 0.9, overlap

    def test_repromote_restores_codes_engine(self, monkeypatch):
        """Spill is no longer one-way (VERDICT r4 missing #4): when the
        budget fits again, codes re-admit to HBM, tombstones move back to
        the device mirror, and the fused codes engine becomes eligible."""
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))  # ~50 KB
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
        from cosdata_tpu.ops.storage import use_codes_engine

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=128,
            params=HNSWParams(num_layers=2, wave_size=256, max_iters=32),
        )
        x = _unit(3000, 64, 35)
        idx.add(x)
        assert idx.store.codes_on_host
        idx.delete(7)  # tombstone while spilled (host mirror)
        # budget unchanged: promotion must refuse
        assert not idx.maybe_promote()
        assert idx.store.codes_on_host
        monkeypatch.setenv("COSDATA_HBM_GB", "1.0")
        assert idx.maybe_promote()
        assert not idx.store.codes_on_host
        assert getattr(idx, "_alive_host", None) is None
        # device-resident serving again, tombstone preserved
        got, vals = idx.search(x[:5], top_k=5)
        assert (got[:, 0] == np.arange(5)).all()
        assert vals[0, 0] > 0.98
        got7, _ = idx.search(x[7], top_k=5)
        assert 7 not in got7[0]
        # the fused codes engine is eligible again
        monkeypatch.setenv("COSDATA_FLAT_ENGINE", "codes")
        assert use_codes_engine(idx.store)
        # second promote is a no-op
        assert not idx.maybe_promote()

    def test_flat_repromote(self, monkeypatch):
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))
        from cosdata_tpu.indexes.flat import FlatIndex

        f = FlatIndex(dim=64, kind="u8", range_=(-0.3, 0.3),
                      keep_raw="host", initial_capacity=128)
        x = _unit(2000, 64, 36)
        f.add(x)
        assert f.store.codes_on_host
        monkeypatch.setenv("COSDATA_HBM_GB", "1.0")
        assert f.maybe_promote()
        assert not f.store.codes_on_host
        ids, vals = f.search(x[:4], top_k=3, rerank=True)
        assert (ids[:, 0] == np.arange(4)).all()

    def test_spill_snapshot_restart(self, monkeypatch, tmp_path):
        """Snapshot + restore of a SPILLED index must re-enter the
        beyond-HBM tier: host-resident codes, scan-only serving, host
        tombstones (ADVICE r3 high: the dummy (1, m) adjacency used to be
        persisted and the restore served garbage)."""
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))  # ~50 KB
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
        from cosdata_tpu.store.snapshots import _load_one_dense, _save_one_dense

        params = HNSWParams(num_layers=2, wave_size=256, max_iters=32)
        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=128, params=params,
        )
        x = _unit(3000, 64, 31)
        idx.add(x)
        assert idx.store.codes_on_host and idx.scan_only
        idx.delete(3)
        _save_one_dense(idx, tmp_path, [-0.3, 0.3])

        idx2 = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw="host",
            initial_capacity=128, params=params,
        )
        _load_one_dense(idx2, tmp_path, "host")
        assert idx2.store.codes_on_host and idx2.scan_only
        assert idx2.store.capacity == idx.store.capacity
        assert idx2.store.n == 3000
        assert isinstance(idx2.store._arrays.data, np.ndarray)  # host tier
        got, vals = idx2.search(x[:5], top_k=5)
        keep = [0, 1, 2, 4]  # row 3 was tombstoned pre-snapshot
        assert (got[keep, 0] == np.asarray(keep)).all()
        assert vals[0, 0] > 0.98  # exact host rerank still works
        got3, _ = idx2.search(x[3], top_k=5)
        assert 3 not in got3[0], "tombstone lost across restart"

    def test_device_raw_over_budget_raises_clearly(self, monkeypatch):
        monkeypatch.setenv("COSDATA_HBM_GB", str(50 / (1 << 20)))
        from cosdata_tpu.indexes.hnsw import HNSWIndex

        idx = HNSWIndex(
            dim=64, kind="u8", range_=(-0.3, 0.3), keep_raw=True,
            initial_capacity=128,
        )
        with pytest.raises(RuntimeError, match="raw_storage"):
            idx.add(_unit(3000, 64, 35))

    def test_subbyte_spill_streamed_search(self, monkeypatch):
        """The DEEP-100M 2-bit config must degrade gracefully past HBM
        (VERDICT r3 #7): packed subbyte planes spill to host RAM, search
        streams plane chunks, exact host rerank recovers ordering, and
        results match the never-spilled subbyte index on the same data."""
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

        params = HNSWParams(num_layers=2, wave_size=256, max_iters=32)
        x = _unit(3000, 64, 37)

        # oracle: identical subbyte index, no HBM pressure
        ref = HNSWIndex(dim=64, kind="subbyte", resolution=2,
                        keep_raw="host", initial_capacity=4096, params=params)
        ref.add(x)
        assert not ref.store.codes_on_host
        ref_ids, _ = ref.search_brute(x[:16], top_k=5)

        monkeypatch.setenv("COSDATA_HBM_GB", str(30 / (1 << 20)))  # ~30 KB
        idx = HNSWIndex(dim=64, kind="subbyte", resolution=2,
                        keep_raw="host", initial_capacity=128, params=params)
        ids = idx.add(x)
        assert len(ids) == 3000
        assert idx.store.codes_on_host, "subbyte growth past budget must spill"
        assert idx.scan_only
        assert isinstance(idx.store._arrays.planes, np.ndarray)  # host tier
        got, vals = idx.search(x[:16], top_k=5)
        assert (got[:, 0] == np.arange(16)).all()
        assert vals[0, 0] > 0.98  # exact host rerank
        # identical quantization + rerank => identical results to unspilled
        assert _recall(got, ref_ids) > 0.95
        # tombstones through the host mirror
        idx.delete(7)
        got, _ = idx.search(x[7], top_k=5)
        assert 7 not in got[0]

    def test_subbyte_spill_snapshot_restart(self, monkeypatch, tmp_path):
        from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams
        from cosdata_tpu.store.snapshots import _load_one_dense, _save_one_dense

        monkeypatch.setenv("COSDATA_HBM_GB", str(30 / (1 << 20)))
        params = HNSWParams(num_layers=2, wave_size=256, max_iters=32)
        idx = HNSWIndex(dim=64, kind="subbyte", resolution=2,
                        keep_raw="host", initial_capacity=128, params=params)
        x = _unit(3000, 64, 39)
        idx.add(x)
        assert idx.store.codes_on_host and idx.scan_only
        idx.delete(3)
        _save_one_dense(idx, tmp_path, [-1.0, 1.0])

        idx2 = HNSWIndex(dim=64, kind="subbyte", resolution=2,
                         keep_raw="host", initial_capacity=128, params=params)
        _load_one_dense(idx2, tmp_path, "host")
        assert idx2.store.codes_on_host and idx2.scan_only
        assert idx2.store.n == 3000
        assert isinstance(idx2.store._arrays.planes, np.ndarray)
        np.testing.assert_array_equal(
            idx2.store._arrays.planes, np.asarray(idx.store._arrays.planes)
        )
        got, vals = idx2.search(x[:5], top_k=5)
        keep = [0, 1, 2, 4]
        assert (got[keep, 0] == np.asarray(keep)).all()
        got3, _ = idx2.search(x[3], top_k=5)
        assert 3 not in got3[0], "tombstone lost across restart"


class TestCodesEngine:
    """Query-CODES flat engine (1-byte/dim wire + bf16 bin-max selection,
    flat_scan.fused_flat_search_codes): recall parity with the f32-query
    engine at the same shapes."""

    def test_matches_f32_engine(self, monkeypatch):
        from cosdata_tpu.indexes.flat import FlatIndex

        monkeypatch.setenv("COSDATA_FLAT_ENGINE", "codes")
        old_thresh, old_chunk = FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK
        FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = 256, 128
        try:
            x = _unit(900, 64, 41)
            q = _unit(16, 64, 42)
            idx = FlatIndex(dim=64, kind="u8", range_=(-0.3, 0.3),
                            initial_capacity=1024)
            idx.add(x)
            ids_c, vals_c = idx.search(q, top_k=7, rerank=True)
            monkeypatch.setenv("COSDATA_FLAT_ENGINE", "f32")
            ids_f, _ = idx.search(q, top_k=7, rerank=True)
            overlap = np.mean([
                len(set(a[a >= 0]) & set(b[b >= 0])) / 7
                for a, b in zip(ids_c, ids_f)
            ])
            assert overlap >= 0.9, overlap
            # exact self-retrieval
            ids_s, vals_s = idx.search(x[:8], top_k=3, rerank=True)
            assert (ids_s[:, 0] == np.arange(8)).all()
            assert vals_s[0, 0] > 0.99
        finally:
            FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = old_thresh, old_chunk

    def test_tombstones_respected(self, monkeypatch):
        from cosdata_tpu.indexes.flat import FlatIndex

        monkeypatch.setenv("COSDATA_FLAT_ENGINE", "codes")
        old_thresh, old_chunk = FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK
        FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = 256, 128
        try:
            x = _unit(700, 64, 43)
            idx = FlatIndex(dim=64, kind="u8", range_=(-0.3, 0.3),
                            initial_capacity=1024)
            idx.add(x)
            idx.delete(5)
            ids, _ = idx.search(x[5], top_k=5, rerank=True)
            assert 5 not in ids[0]
        finally:
            FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = old_thresh, old_chunk

    def test_bins_select_matches_approx(self, monkeypatch):
        """The global-bin-max selection route (COSDATA_SCAN_SELECT=bins,
        rewritten r5: one maxima table + ONE approx_max_k instead of 16
        per-chunk sorts) must agree with the default approx route."""
        from cosdata_tpu.indexes.flat import FlatIndex

        monkeypatch.setenv("COSDATA_FLAT_ENGINE", "codes")
        old_thresh, old_chunk = FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK
        FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = 256, 128
        try:
            x = _unit(900, 64, 47)
            q = _unit(16, 64, 48)
            idx = FlatIndex(dim=64, kind="u8", range_=(-0.3, 0.3),
                            initial_capacity=1024)
            idx.add(x)
            monkeypatch.setenv("COSDATA_SCAN_SELECT", "bins")
            ids_b, vals_b = idx.search(q, top_k=7, rerank=True)
            monkeypatch.setenv("COSDATA_SCAN_SELECT", "approx")
            ids_a, _ = idx.search(q, top_k=7, rerank=True)
            overlap = np.mean([
                len(set(a[a >= 0]) & set(bb[bb >= 0])) / 7
                for a, bb in zip(ids_a, ids_b)
            ])
            assert overlap >= 0.9, overlap
            # self-retrieval through the bins route
            monkeypatch.setenv("COSDATA_SCAN_SELECT", "bins")
            ids_s, vals_s = idx.search(x[:8], top_k=3, rerank=True)
            assert (ids_s[:, 0] == np.arange(8)).all()
            assert vals_s[0, 0] > 0.99
        finally:
            FlatIndex.SCAN_THRESHOLD, FlatIndex.SCAN_CHUNK = old_thresh, old_chunk
