"""Collection runtime: transactions, WAL, versioning, restart replay, hybrid."""

import numpy as np
import pytest

from cosdata_tpu.config import load_config
from cosdata_tpu.core.app_context import AppContext
from cosdata_tpu.core.collection import tune_dense_range


def _ctx(tmp_path):
    cfg = load_config(data_path=str(tmp_path / "data"))
    return AppContext(cfg, admin_key="test-admin")


def _mk_collection(ctx, name="c1", dim=32, sparse=False, tfidf=False):
    return ctx.create_collection(
        {
            "name": name,
            "dense_vector": {"enabled": True, "dimension": dim},
            "sparse_vector": {"enabled": sparse},
            "tf_idf_options": {"enabled": tfidf},
            "store_raw_text": tfidf,
        }
    )


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestTuneRange:
    def test_reference_ladder(self):
        vals = np.random.default_rng(0).normal(0, 0.03, 10000).astype(np.float32)
        assert tune_dense_range(vals) == (-0.1, 0.1)
        vals2 = np.random.default_rng(0).uniform(-0.9, 0.9, 10000)
        assert tune_dense_range(vals2) == (-1.0, 1.0)


class TestTransactions:
    def test_full_txn_lifecycle(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx)
        coll.create_dense_index(
            quantization={"type": "auto", "sample_threshold": 50},
            hnsw_params={"wave_size": 64, "ef_construction": 48, "ef_search": 64,
                         "num_layers": 3, "max_iters": 48},
        )
        x = _unit(120, 32, 1)
        txn = coll.create_transaction()
        vectors = [
            {"id": f"v{i}", "dense_values": x[i].tolist(), "document_id": f"d{i%10}"}
            for i in range(120)
        ]
        coll.txn_upsert(txn.txn_id, vectors, upsert=False)
        assert txn.status.to_dict()["status"] == "not_started"
        version = coll.commit_transaction(txn.txn_id)
        assert version == 1
        ctx.indexing.trigger(coll, version, txn)
        ctx.indexing.wait_idle()
        st = txn.status.to_dict()
        assert st["status"] == "complete"
        assert st["records_upserted"] == 120
        assert coll.vcs.background_version == 1
        assert not (coll.data_dir / "1.wal").exists()

        res = coll.search_dense([x[5].tolist()], top_k=3)
        assert res[0][0]["id"] == "v5"
        assert res[0][0]["document_id"] == "d5"

    def test_single_open_txn_and_abort(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "c2")
        txn = coll.create_transaction()
        with pytest.raises(RuntimeError):
            coll.create_transaction()
        coll.abort_transaction(txn.txn_id)
        coll.create_transaction()  # now allowed

    def test_duplicate_id_rejected(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "c3")
        coll.stream_upsert([{"id": "a", "dense_values": [0.0] * 32}])
        txn = coll.create_transaction()
        with pytest.raises(ValueError, match="already exists"):
            coll.txn_upsert(
                txn.txn_id, [{"id": "a", "dense_values": [0.0] * 32}], upsert=False
            )
        # upsert path allows it
        coll.txn_upsert(
            txn.txn_id, [{"id": "a", "dense_values": [0.1] * 32}], upsert=True
        )

    @pytest.mark.fast
    def test_wal_payloads_released_after_commit(self, tmp_path):
        """Committed WAL payloads live on disk; keeping them in RAM pins
        every transaction's vectors for process lifetime (r2 review)."""
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cw")
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id,
            [{"id": f"v{i}", "dense_values": [0.1] * 32} for i in range(50)],
            upsert=True,
        )
        assert txn.wal.total_operations == 1
        coll.commit_transaction(txn.txn_id)
        assert txn.wal.ops == []  # payloads dropped at flush
        # counters stay queryable
        assert txn.wal.records_upserted == 50
        assert txn.wal.total_operations == 1

    @pytest.mark.fast
    def test_numeric_string_id_lookup(self, tmp_path):
        """Path segments arrive as strings: a vector upserted with the JSON
        int id 123 must be reachable via GET /vectors/123 (r2 review)."""
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cn")
        coll.stream_upsert([
            {"id": 123, "dense_values": [0.1] * 32, "document_id": 9},
            {"id": "s1", "dense_values": [0.2] * 32},
        ])
        assert coll.get_vector("123") is not None  # str form of int id
        assert coll.get_vector(123) is not None
        assert coll.vectors_by_document("9")  # str form of int doc id
        coll.delete_embedding("123")  # str form must delete the int id
        assert coll.get_vector(123) is None

    @pytest.mark.fast
    def test_background_version_is_monotonic(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cm")
        coll.vcs.update_background_version(7)
        coll.vcs.update_background_version(6)  # late epoch close must not regress
        assert coll.vcs.background_version == 7

    @pytest.mark.fast
    def test_delete_index_clears_descriptor(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cd", sparse=True)
        coll.create_sparse_index()
        assert any(
            d["index_type"] == "sparse" for d in coll.list_indexes()
        )
        coll.delete_index("sparse")
        assert not any(
            d["index_type"] == "sparse" for d in coll.list_indexes()
        )

    def test_dimension_validation(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "c4", dim=8)
        txn = coll.create_transaction()
        with pytest.raises(ValueError, match="dimension mismatch"):
            coll.txn_upsert(txn.txn_id, [{"id": "x", "dense_values": [0.1] * 9}], False)


class TestDiskTierRestart:
    @pytest.mark.fast
    def test_disk_raw_tier_survives_restart(self, tmp_path):
        """raw_storage='disk' must come back as a disk-backed memmap after
        a snapshot round-trip — materializing it in host RAM defeats the
        beyond-RAM tier (r2 review)."""
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cdk")
        coll.create_dense_index(
            quantization={"type": "auto", "sample_threshold": 10},
            hnsw_params={"wave_size": 64, "num_layers": 3},
            raw_storage="disk",
        )
        ctx._persist_index_descriptors(coll)
        x = _unit(60, 32, 8)
        coll.stream_upsert(
            [{"id": f"v{i}", "dense_values": x[i].tolist()} for i in range(60)]
        )
        coll.flush_indexes()
        coll.save_snapshot()
        ctx.indexing.wait_idle()
        # restart
        ctx2 = AppContext(
            load_config(data_path=str(tmp_path / "data")), admin_key="test-admin"
        )
        c2 = ctx2.get_collection("cdk")
        vs = c2.dense.index.store
        assert vs.keep_raw == "disk", vs.keep_raw
        assert isinstance(vs._raw_host, np.memmap), type(vs._raw_host)
        res = c2.search_dense([x[7].tolist()], top_k=3)
        assert res[0][0]["id"] == "v7"
        assert res[0][0]["score"] > 0.98  # exact host rerank worked


class TestRestartReplay:
    def test_wal_replay_after_crash(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cc")
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"wave_size": 64, "num_layers": 3},
        )
        ctx._persist_index_descriptors(coll)
        x = _unit(40, 32, 2)
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id,
            [{"id": i, "dense_values": x[i].tolist()} for i in range(40)],
            False,
        )
        version = coll.commit_transaction(txn.txn_id)
        # simulate crash BEFORE background indexing ran: WAL exists on disk
        assert (coll.data_dir / "1.wal").exists()
        ctx.meta.close()

        ctx2 = _ctx(tmp_path)
        coll2 = ctx2.get_collection("cc")
        assert coll2 is not None
        assert coll2.vcs.current_version == version
        assert coll2.vcs.background_version == version  # replayed
        res = coll2.search_dense([x[7].tolist()], top_k=1)
        assert res[0][0]["id"] == 7

    def test_streaming_wal_survives_mid_epoch_explicit_commit(self, tmp_path):
        """An explicit commit mid-epoch advances background PAST the open
        implicit version; its durable WAL must STILL be replayed on
        restart or acknowledged streaming writes are lost (r2 review)."""
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cwx")
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"wave_size": 64, "num_layers": 3},
        )
        ctx._persist_index_descriptors(coll)
        x = _unit(20, 32, 6)
        # open an implicit epoch (version 1) with two streamed vectors
        coll.stream_upsert([{"id": "s0", "dense_values": x[0].tolist()}])
        # explicit txn commits as version 2 and fully indexes
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id, [{"id": "e0", "dense_values": x[10].tolist()}], False
        )
        v2 = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, v2, txn)
        ctx.indexing.wait_idle()
        assert coll.vcs.background_version == v2  # past the implicit v1
        # more acknowledged streaming writes into the STILL-OPEN epoch
        coll.stream_upsert([{"id": "s1", "dense_values": x[1].tolist()}])
        imp_v = coll.implicit.version
        assert imp_v < v2
        assert (coll.data_dir / f"{imp_v}.wal").exists()
        ctx.meta.close()  # crash: epoch never closed

        ctx2 = _ctx(tmp_path)
        coll2 = ctx2.get_collection("cwx")
        # the implicit WAL was replayed despite background > its version
        assert coll2.get_vector("s0") is not None
        assert coll2.get_vector("s1") is not None
        assert coll2.get_vector("e0") is not None
        assert not (coll2.data_dir / f"{imp_v}.wal").exists()

    def test_implicit_replay_preserves_op_order(self, tmp_path):
        """Streaming ops are applied inline in strict order; crash replay
        must reproduce that state — a delete-then-reupsert of the same id
        must SURVIVE (the delete-after-upsert reorder is explicit-txn
        parity only)."""
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cord")
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"wave_size": 64, "num_layers": 3},
        )
        ctx._persist_index_descriptors(coll)
        x = _unit(4, 32, 7)
        coll.stream_upsert([{"id": "a", "dense_values": x[0].tolist()}])
        coll.stream_delete("a")
        coll.stream_upsert([{"id": "a", "dense_values": x[1].tolist()}])
        imp_v = coll.implicit.version
        ctx.meta.close()  # crash before epoch close

        ctx2 = _ctx(tmp_path)
        coll2 = ctx2.get_collection("cord")
        rec = coll2.get_vector("a")
        assert rec is not None, "upsert-after-delete must survive replay"
        np.testing.assert_allclose(
            rec["dense_values"], x[1].tolist(), atol=1e-4
        )
        assert not (coll2.data_dir / f"{imp_v}.wal").exists()

    @pytest.mark.fast
    def test_abort_releases_wal_payloads(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cab")
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id,
            [{"id": f"v{i}", "dense_values": [0.1] * 32} for i in range(50)],
            upsert=True,
        )
        coll.abort_transaction(txn.txn_id)
        assert txn.wal.ops == []  # payloads freed
        st = coll.get_transaction(txn.txn_id)  # status stays queryable
        assert st is txn

    def test_snapshot_restore(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cs", sparse=True, tfidf=True)
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"wave_size": 64, "num_layers": 3})
        coll.create_sparse_index(quantization=64, sample_threshold=5)
        coll.create_tf_idf_index(sample_threshold=5)
        ctx._persist_index_descriptors(coll)
        x = _unit(30, 32, 3)
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id,
            [
                {
                    "id": f"v{i}",
                    "dense_values": x[i].tolist(),
                    "sparse_values": [[i % 7, 0.5], [(i + 3) % 7, 0.9]],
                    "text": f"document number {i} about topic{i % 3}",
                }
                for i in range(30)
            ],
            False,
        )
        v = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, v, txn)
        ctx.indexing.wait_idle()
        expect_dense = coll.search_dense([x[4].tolist()], top_k=1)
        expect_tfidf = coll.search_tfidf(["topic1"], top_k=5)
        ctx.meta.close()

        ctx2 = _ctx(tmp_path)
        coll2 = ctx2.get_collection("cs")
        got = coll2.search_dense([x[4].tolist()], top_k=1)
        assert got[0][0]["id"] == expect_dense[0][0]["id"]
        got_t = coll2.search_tfidf(["topic1"], top_k=5)
        assert {r["id"] for r in got_t[0]} == {r["id"] for r in expect_tfidf[0]}
        got_s = coll2.search_sparse([[(4 % 7, 0.5)]], top_k=3)
        assert len(got_s[0]) > 0


class TestStreamingAndHybrid:
    def test_streaming_upsert_and_delete(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "st")
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"wave_size": 32, "num_layers": 2})
        x = _unit(20, 32, 4)
        coll.stream_upsert(
            [{"id": i, "dense_values": x[i].tolist()} for i in range(20)]
        )
        res = coll.search_dense([x[3].tolist()], top_k=1)
        assert res[0][0]["id"] == 3
        coll.stream_delete(3)
        res = coll.search_dense([x[3].tolist()], top_k=3)
        assert all(r["id"] != 3 for r in res[0])
        coll.close_epoch()
        assert coll.implicit is None

    def test_hybrid_rrf(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "hy", sparse=True, tfidf=True)
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"wave_size": 32, "num_layers": 2})
        coll.create_sparse_index(quantization=64, sample_threshold=2)
        coll.create_tf_idf_index(sample_threshold=2)
        x = _unit(25, 32, 5)
        coll.stream_upsert(
            [
                {
                    "id": f"v{i}",
                    "dense_values": x[i].tolist(),
                    "sparse_values": [[i % 5, 1.0]],
                    "text": f"alpha beta topic{i % 5}",
                }
                for i in range(25)
            ]
        )
        coll.flush_indexes()
        out = coll.hybrid_search(
            {"query_vector": x[7].tolist(), "query_terms": [(7 % 5, 1.0)]},
            top_k=5,
        )
        assert out and out[0]["score"] > 0
        ids = [r["id"] for r in out]
        assert "v7" in ids
        out2 = coll.hybrid_search(
            {"query_vector": x[7].tolist(), "query_text": "topic2"}, top_k=5
        )
        assert out2
        with pytest.raises(ValueError):
            coll.hybrid_search({"query_vector": x[0].tolist()}, top_k=5)

    def test_get_vector_and_documents(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "gv")
        x = _unit(5, 32, 6)
        coll.stream_upsert(
            [
                {"id": f"v{i}", "dense_values": x[i].tolist(), "document_id": "doc1"}
                for i in range(5)
            ]
        )
        assert coll.get_vector("v2")["id"] == "v2"
        assert coll.get_vector("nope") is None
        assert len(coll.vectors_by_document("doc1")) == 5

    def test_versions_listing(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "vl")
        for i in range(3):
            txn = coll.create_transaction()
            coll.txn_upsert(
                txn.txn_id, [{"id": f"a{i}", "dense_values": [0.1] * 32}], False
            )
            coll.commit_transaction(txn.txn_id)
        versions = coll.vcs.list_versions()
        assert [v["version"] for v in versions] == [0, 1, 2, 3]
        assert coll.vcs.current_version == 3


class TestCollectionCache:
    def test_unload_and_lazy_reload(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "uc")
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"wave_size": 32, "num_layers": 2})
        ctx._persist_index_descriptors(coll)
        x = _unit(20, 32, 8)
        coll.stream_upsert(
            [{"id": i, "dense_values": x[i].tolist()} for i in range(20)]
        )
        coll.close_epoch()  # snapshot
        ctx.unload_collection("uc")
        assert "uc" not in ctx.collections
        # lazy reload on access
        coll2 = ctx.get_collection("uc")
        assert coll2 is not None
        res = coll2.search_dense([x[4].tolist()], top_k=1)
        assert res[0][0]["id"] == 4

    def test_eviction_cap(self, tmp_path):
        ctx = _ctx(tmp_path)
        ctx.max_loaded_collections = 2
        for i in range(4):
            _mk_collection(ctx, f"e{i}")
        assert len(ctx.collections) <= 2
        # all still retrievable (lazy reload)
        for i in range(4):
            assert ctx.get_collection(f"e{i}") is not None

    def test_delete_unloaded(self, tmp_path):
        ctx = _ctx(tmp_path)
        _mk_collection(ctx, "du")
        ctx.unload_collection("du")
        ctx.delete_collection("du")
        with pytest.raises(KeyError):
            ctx.unload_collection("du")


class TestCompaction:
    def test_compact_after_many_deletes(self, tmp_path):
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cp")
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"wave_size": 64, "num_layers": 2})
        x = _unit(100, 32, 9)
        coll.stream_upsert(
            [{"id": i, "dense_values": x[i].tolist()} for i in range(100)]
        )
        for i in range(40):
            coll.stream_delete(i)
        assert coll.dense.index.n_deleted == 40
        coll.dense.maybe_compact()
        assert coll.dense.index.n == 60
        assert coll.dense.index.n_deleted == 0
        res = coll.search_dense([x[70].tolist()], top_k=3)
        assert res[0][0]["id"] == 70
        res = coll.search_dense([x[5].tolist()], top_k=5)
        assert all(r["id"] != 5 for r in res[0])


class TestContextHistory:
    def test_versioned_snapshots_retained(self, tmp_path):
        cfg = load_config(data_path=str(tmp_path / "data"))
        cfg.enable_context_history = True
        ctx = AppContext(cfg, admin_key="test-admin")
        coll = ctx.create_collection(
            {"name": "ch", "dense_vector": {"enabled": True, "dimension": 8}}
        )
        coll.create_dense_index(quantization={"type": "scalar", "data_type": "f32"},
                                hnsw_params={"num_layers": 2, "wave_size": 32})
        for i in range(2):
            txn = coll.create_transaction()
            coll.txn_upsert(
                txn.txn_id, [{"id": f"x{i}", "dense_values": [0.1 * i] * 8}], False
            )
            v = coll.commit_transaction(txn.txn_id)
            ctx.indexing.trigger(coll, v, txn)
            ctx.indexing.wait_idle()
        assert (coll.data_dir / "snapshot-v1").exists()
        assert (coll.data_dir / "snapshot-v2").exists()

    def test_checkout_queries_old_version(self, tmp_path):
        """Version-context querying: search an older version's state
        (latest_node.rs:19-73 time-travel design role)."""
        cfg = load_config(data_path=str(tmp_path / "data"))
        cfg.enable_context_history = True
        ctx = AppContext(cfg, admin_key="test-admin")
        coll = ctx.create_collection(
            {"name": "cq", "dense_vector": {"enabled": True, "dimension": 8}}
        )
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "f32"},
            hnsw_params={"num_layers": 2, "wave_size": 32},
        )
        import numpy as np
        a = (np.eye(8)[0]).tolist()
        b = (np.eye(8)[1]).tolist()
        txn = coll.create_transaction()
        coll.txn_upsert(txn.txn_id, [{"id": "a", "dense_values": a}], False)
        v1 = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, v1, txn)
        ctx.indexing.wait_idle()
        txn = coll.create_transaction()
        coll.txn_upsert(txn.txn_id, [{"id": "b", "dense_values": b}], True)
        v2 = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, v2, txn)
        ctx.indexing.wait_idle()
        # current sees both; v1 checkout sees only "a"
        now = coll.search_dense([b], top_k=2)
        assert any(r["id"] == "b" for r in now[0])
        old = coll.checkout_version(v1)
        assert old.get_vector("b") is None
        assert old.get_vector("a") is not None
        res = old.search_dense([a], top_k=2)
        ids = [r["id"] for r in res[0]]
        assert ids[0] == "a" and "b" not in ids
        # unknown version -> KeyError (404 surface)
        import pytest
        with pytest.raises(KeyError):
            coll.checkout_version(99)


class TestCollectionCacheConfig:
    def test_residency_cap_from_config(self, tmp_path):
        """Creating collections past cache.max_collections evicts the oldest
        (snapshot + drop), matching the reference's collection cache
        (collection_cache.rs:56-270, config_loader.rs:201-225)."""
        cfg = load_config(data_path=str(tmp_path / "data"))
        cfg.cache.max_collections = 2
        ctx = AppContext(cfg, admin_key="test-admin")
        assert ctx.max_loaded_collections == 2
        for i in range(3):
            ctx.create_collection(
                {"name": f"cc{i}", "dense_vector": {"enabled": True, "dimension": 8}}
            )
        assert len(ctx.collections) == 2
        # the evicted one is still addressable: lazily reloaded on access
        assert ctx.get_collection("cc0") is not None


class TestCoalescedCommit:
    """index_version coalesces a fresh collection's upsert ops into one
    bulk ingest; duplicate external ids keep the last occurrence."""

    def test_bulk_path_with_cross_op_duplicates(self, tmp_path, monkeypatch):
        from cosdata_tpu.core.collection import Collection

        monkeypatch.setattr(Collection, "COALESCE_MIN", 10)
        ctx = _ctx(tmp_path)
        coll = _mk_collection(ctx, "cc1")
        coll.create_dense_index(
            quantization={"type": "auto", "sample_threshold": 10},
            hnsw_params={"wave_size": 64, "ef_construction": 48,
                         "ef_search": 64, "num_layers": 3, "max_iters": 48},
        )
        x = _unit(40, 32, 5)
        txn = coll.create_transaction()
        # op 1: v0..v19 with placeholder values; op 2: v10..v29 — the
        # overlap (v10..v19) must resolve to op 2's vectors
        coll.txn_upsert(
            txn.txn_id,
            [{"id": f"v{i}", "dense_values": x[i].tolist()} for i in range(20)],
            upsert=False,
        )
        coll.txn_upsert(
            txn.txn_id,
            [{"id": f"v{i}", "dense_values": x[i + 10].tolist()}
             for i in range(10, 30)],
            upsert=True,
        )
        version = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, version, txn)
        ctx.indexing.wait_idle()
        st = txn.status.to_dict()
        assert st["status"] == "complete"
        assert st["records_upserted"] == 40  # raw op count, reference parity
        # 30 distinct ids remain
        assert len(coll.etoi) == 30
        # overlapping id v15 must hold op 2's vector (x[25])
        res = coll.search_dense([x[25].tolist()], top_k=1)
        assert res[0][0]["id"] == "v15"
        # op-1-only id unaffected
        res = coll.search_dense([x[5].tolist()], top_k=1)
        assert res[0][0]["id"] == "v5"
