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
