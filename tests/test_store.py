"""Storage layer: WAL round-trips, durable WAL, versioning, metadata KV
(the reference's heaviest unit-test area, SURVEY.md §4 layer 1)."""

import numpy as np
import pytest

from cosdata_tpu.store.meta import MetaStore
from cosdata_tpu.store.versioning import VersionControl
from cosdata_tpu.store.wal import (
    OP_DELETE,
    OP_UPSERT,
    DurableWALFile,
    WALFile,
    read_durable_wal,
    read_wal,
)


class TestWAL:
    def test_roundtrip_mixed_ops(self, tmp_path):
        wal = WALFile()
        rng = np.random.default_rng(0)
        expect = []
        for i in range(20):
            if rng.random() < 0.7:
                vecs = [
                    {"id": f"v{i}_{j}", "dense_values": [float(j)] * 4}
                    for j in range(int(rng.integers(1, 5)))
                ]
                wal.append_upsert(vecs)
                expect.append((OP_UPSERT, vecs))
            else:
                wal.append_delete(f"v{i}")
                expect.append((OP_DELETE, f"v{i}"))
        path = tmp_path / "1.wal"
        wal.flush(path)
        header, ops = read_wal(path)
        assert header["total_ops"] == len(expect)
        assert header["upserted"] == wal.records_upserted
        assert header["deleted"] == wal.records_deleted
        assert ops == expect

    def test_flush_is_atomic(self, tmp_path):
        wal = WALFile()
        wal.append_upsert([{"id": 1}])
        p = tmp_path / "x.wal"
        wal.flush(p)
        assert p.exists() and not p.with_suffix(".tmp").exists()

    def test_durable_wal_appends_survive(self, tmp_path):
        p = tmp_path / "d.wal"
        d = DurableWALFile(p)
        d.append_upsert([{"id": "a"}])
        d.append_delete("b")
        d.append_upsert([{"id": "c"}, {"id": "d"}])
        assert d.records_upserted == 3 and d.records_deleted == 1
        # read without closing (simulates crash)
        ops = read_durable_wal(p)
        assert ops == [
            (OP_UPSERT, [{"id": "a"}]),
            (OP_DELETE, "b"),
            (OP_UPSERT, [{"id": "c"}, {"id": "d"}]),
        ]
        d.close()


class TestVersioning:
    def test_monotonic_versions_and_sources(self, tmp_path):
        meta = MetaStore(tmp_path / "m.sqlite")
        vcs = VersionControl(meta, "c")
        assert vcs.current_version == 0
        v1 = vcs.allot_version()
        vcs.set_current_version(v1, {"kind": "explicit", "txn_id": "t1"},
                                upserted=5, total_ops=2)
        v2 = vcs.allot_version()
        vcs.set_current_version(v2, {"kind": "implicit", "epoch_id": 99})
        assert (v1, v2) == (1, 2)
        assert vcs.current_version == 2
        info = vcs.version_info(1)
        assert info["source"]["txn_id"] == "t1"
        assert info["records_upserted"] == 5
        assert vcs.unindexed_versions() == [1, 2]
        vcs.update_background_version(1)
        assert vcs.unindexed_versions() == [2]

    def test_listing_sorted(self, tmp_path):
        meta = MetaStore(tmp_path / "m.sqlite")
        vcs = VersionControl(meta, "c")
        for _ in range(3):
            v = vcs.allot_version()
            vcs.set_current_version(v, {"kind": "explicit", "txn_id": str(v)})
        assert [v["version"] for v in vcs.list_versions()] == [0, 1, 2, 3]


class TestMetaStore:
    def test_named_dbs_and_types(self, tmp_path):
        m = MetaStore(tmp_path / "kv.sqlite")
        m.put("a", "k", {"x": [1, 2, 3]})
        m.put("b", "k", "other")
        m.put("a", ("tuple", 2), b"bytes")
        assert m.get("a", "k") == {"x": [1, 2, 3]}
        assert m.get("b", "k") == "other"
        assert m.get("a", ("tuple", 2)) == b"bytes"
        assert m.get("a", "missing", default=42) == 42
        m.delete("a", "k")
        assert m.get("a", "k") is None
        assert len(m.items("a")) == 1

    def test_persistence_across_open(self, tmp_path):
        p = tmp_path / "kv.sqlite"
        m = MetaStore(p)
        m.put("db", "key", [1, 2])
        m.close()
        m2 = MetaStore(p)
        assert m2.get("db", "key") == [1, 2]


class TestIncrementalSnapshots:
    """O(delta) snapshot IO (file_persist.rs:16-157's design role): a small
    commit into a large collection must not rewrite the whole state."""

    def _mtimes(self, snap):
        return {
            f.name: f.stat().st_mtime_ns
            for f in snap.rglob("*")
            if f.is_file()
        }

    def test_small_commit_writes_o_delta(self, tmp_path):
        from cosdata_tpu.config import load_config
        from cosdata_tpu.core.app_context import AppContext

        ctx = AppContext(
            load_config(data_path=str(tmp_path / "data")), admin_key="t"
        )
        coll = ctx.create_collection(
            {"name": "big", "dense_vector": {"enabled": True, "dimension": 32}}
        )
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "u8",
                          "range": {"min": -1.0, "max": 1.0}},
            hnsw_params={"num_layers": 2, "wave_size": 64},
        )
        rng = np.random.default_rng(0)
        x = rng.normal(size=(300, 32)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        coll.stream_upsert(
            [{"id": f"v{i}", "dense_values": x[i].tolist()} for i in range(200)]
        )
        coll.close_epoch()
        snap = coll.data_dir / "snapshot"
        before = self._mtimes(snap)
        base_size = (snap / "maps.msgpack").stat().st_size

        # small delta commit
        coll.stream_upsert(
            [{"id": f"w{i}", "dense_values": x[200 + i].tolist()}
             for i in range(5)]
        )
        coll.close_epoch()
        after = self._mtimes(snap)
        # the maps base must NOT be rewritten — deltas ride the log
        assert before["maps.msgpack"] == after["maps.msgpack"]
        assert (snap / "maps.log").exists()
        assert (snap / "maps.log").stat().st_size < base_size
        # raw/data store chunks: only the touched chunk exists (single chunk
        # at this size) but adj files were rewritten at most once each —
        # sanity: no file got larger than the full state
        # restart restores everything incl. the log tail
        ctx2 = AppContext(
            load_config(data_path=str(tmp_path / "data")), admin_key="t"
        )
        c2 = ctx2.get_collection("big")
        assert c2.get_vector("w3") is not None
        assert len(c2.get_vector("w3")["dense_values"]) == 32
        got = c2.search_dense([x[201].tolist()], top_k=3)
        assert got[0][0]["id"] == "w1"

    def test_chunked_roundtrip_and_dirty_skip(self, tmp_path):
        from cosdata_tpu.store.chunked import (
            CHUNK_ROWS,
            DirtyTracker,
            load_chunked,
            save_chunked,
        )

        tr = DirtyTracker()
        arr = np.arange(100 * 4, dtype=np.int32).reshape(100, 4)
        tr.bump()
        tr.mark_range("a", 0, 100)
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        out = load_chunked(tmp_path, "a")
        assert np.array_equal(out, arr)
        # clean save: chunk file untouched
        files = sorted(tmp_path.glob("a.c*.npy"))
        m0 = files[0].stat().st_mtime_ns
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        assert files[0].stat().st_mtime_ns == m0
        # dirty rows: rewritten
        tr.bump()
        tr.mark_rows("a", np.asarray([7]))
        arr[7] = -1
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        assert np.array_equal(load_chunked(tmp_path, "a"), arr)

    def test_capacity_grow_rewrites_boundary_chunk(self, tmp_path):
        """A silent capacity grow (no rows marked dirty) changes the
        boundary chunk's extent; the stale partial file must be rewritten
        or the next load would broadcast-fail (r2 review finding)."""
        from cosdata_tpu.store.chunked import (
            CHUNK_ROWS,
            DirtyTracker,
            load_chunked,
            save_chunked,
        )

        tr = DirtyTracker()
        n0 = CHUNK_ROWS + 100  # chunk 1 is partial
        arr = np.arange(n0, dtype=np.int32).reshape(n0, 1)
        tr.bump()
        tr.mark_range("a", 0, n0)
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        # grow capacity without marking anything dirty (zero padding only)
        n1 = 2 * CHUNK_ROWS
        grown = np.zeros((n1, 1), np.int32)
        grown[:n0] = arr
        save_chunked(tmp_path, "a", grown, tr.view("a"))
        out = load_chunked(tmp_path, "a")
        assert out.shape == (n1, 1)
        assert np.array_equal(out, grown)
        # and a shrink (compaction rebuild would normally reset gen, but
        # guard the raw mechanism too)
        n2 = CHUNK_ROWS + 10
        save_chunked(tmp_path, "a", grown[:n2], tr.view("a"))
        assert np.array_equal(load_chunked(tmp_path, "a"), grown[:n2])

    def test_mutation_after_save_is_persisted(self, tmp_path):
        """Post-save mutations marked without an intervening bump must not
        be skipped by the next save: save_collection_state bumps trackers,
        and this guards the underlying invariant (r2 review finding)."""
        from cosdata_tpu.store.chunked import (
            DirtyTracker,
            load_chunked,
            save_chunked,
        )

        tr = DirtyTracker()
        arr = np.zeros((16, 1), np.int32)
        tr.bump()
        tr.mark_range("a", 0, 16)
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        tr.bump()  # what save_collection_state now does after saving
        arr[3] = 7
        tr.mark_rows("a", np.asarray([3]))  # no bump between save & mark
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        assert load_chunked(tmp_path, "a")[3, 0] == 7

    def test_generation_change_forces_full(self, tmp_path):
        from cosdata_tpu.store.chunked import (
            DirtyTracker,
            load_chunked,
            save_chunked,
        )

        tr = DirtyTracker()
        arr = np.ones((10, 2), np.float32)
        tr.bump()
        tr.mark_range("a", 0, 10)
        save_chunked(tmp_path, "a", arr, tr.view("a"))
        # a rebuilt structure: fresh tracker, fresh epochs, changed data
        tr2 = DirtyTracker()
        arr2 = np.zeros((10, 2), np.float32)
        save_chunked(tmp_path, "a", arr2, tr2.view("a"))
        assert np.array_equal(load_chunked(tmp_path, "a"), arr2)
