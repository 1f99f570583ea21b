"""Sharded search on the virtual 8-device CPU mesh (SURVEY.md §4 (d))."""

import numpy as np
import jax
import pytest

from cosdata_tpu.parallel.sharded import ShardedFlatIndex, make_mesh


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests require the 8-device CPU mesh"
    return make_mesh(8)  # dp=4, tp=2


class TestShardedFlat:
    def test_matches_single_device_bruteforce(self, mesh):
        d, n, nq, k = 64, 512, 16, 10
        x = _unit(n, d, 0)
        q = _unit(nq, d, 1)
        idx = ShardedFlatIndex(mesh, dim=d, capacity=1024)
        idx.add(x)
        ids, vals = idx.search(q, top_k=k)

        true = (q @ x.T) / (
            np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(x, axis=1)[None, :]
        )
        expect = np.argsort(-true, axis=1)[:, :k]
        for i in range(nq):
            assert set(ids[i]) == set(expect[i]), i
            np.testing.assert_allclose(
                np.sort(vals[i]), np.sort(np.take(true[i], expect[i])), rtol=1e-4
            )

    def test_incremental_insert_across_shards(self, mesh):
        d = 64
        x = _unit(300, d, 2)
        idx = ShardedFlatIndex(mesh, dim=d, capacity=512)
        idx.add(x[:100])
        idx.add(x[100:250])
        idx.add(x[250:])
        # EVERY row must be retrievable as its own nearest neighbor —
        # boundary-spanning waves once zeroed rows at shard edges via
        # duplicate-index scatter (clip+where, r2 review); asserting only
        # the first few rows missed it
        ids, _ = idx.search(x, top_k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(300))

    def test_underfilled_topk_pads_minus_one(self, mesh):
        idx = ShardedFlatIndex(mesh, dim=64, capacity=64)
        idx.add(_unit(5, 64, 9))
        ids, _ = idx.search(_unit(2, 64, 9), top_k=10)
        assert (ids[:, 5:] == -1).all(), "unfilled slots must be -1"
        assert set(ids[0, :5].tolist()) == set(range(5))

    def test_capacity_guard(self, mesh):
        idx = ShardedFlatIndex(mesh, dim=64, capacity=16)
        with pytest.raises(RuntimeError):
            idx.add(_unit(100, 64, 3))

    def test_dp_only_mesh(self):
        mesh = make_mesh(8, tp=1)
        x = _unit(128, 32, 4)
        idx = ShardedFlatIndex(mesh, dim=32, capacity=256)
        idx.add(x)
        ids, _ = idx.search(x[:4], top_k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(4))


class TestShardedHNSW:
    def test_matches_unsharded_recall(self, mesh):
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.flat import FlatIndex
        import jax

        d, n, nq, k = 64, 2000, 16, 10
        x = _unit(n, d, 5)
        q = _unit(nq, d, 6)
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)

        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:4], kind="f32",
            params=__import__("cosdata_tpu.indexes.hnsw", fromlist=["HNSWParams"]).HNSWParams(
                num_layers=3, wave_size=256, ef_construction=64, ef_search=96,
                max_iters=64,
            ),
            initial_capacity_per_shard=1024,
        )
        idx.add(x)
        got, _ = idx.search(q, top_k=k)
        hits = sum(len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true_ids, got))
        r = hits / (nq * k)
        assert r >= 0.9, r

    def test_global_id_mapping_and_delete(self, mesh):
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.hnsw import HNSWParams
        import jax

        d = 32
        x = _unit(200, d, 7)
        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:2], kind="f32",
            params=HNSWParams(num_layers=2, wave_size=64, max_iters=32),
        )
        gids = idx.add(x)
        assert list(gids[:3]) == [0, 1, 2]
        ids, _ = idx.search(x[:8], top_k=1)
        assert (ids[:, 0] == np.arange(8)).mean() >= 0.9
        idx.delete(5)
        ids, _ = idx.search(x[5], top_k=5)
        assert 5 not in ids[0]

    def test_quaternary_sharded_build_and_query(self, mesh):
        """The DEEP-100M-style operating point (BASELINE.json config #5):
        quaternary 2-bit storage, sharded build + batched query. The
        per-shard HNSW stores bitplanes; scoring goes through the packed
        sub-byte kernels."""
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.flat import FlatIndex
        from cosdata_tpu.indexes.hnsw import HNSWParams
        import jax

        d, n, nq, k = 64, 1200, 8, 10
        x = _unit(n, d, 9)
        q = x[:nq]
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)
        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:4], kind="quaternary",
            params=HNSWParams(num_layers=2, wave_size=128,
                              ef_construction=48, ef_search=96,
                              max_iters=32),
            initial_capacity_per_shard=512,
        )
        idx.add(x)
        got, _ = idx.search(q, top_k=k)
        hits = sum(
            len(set(map(int, t)) & set(map(int, g)))
            for t, g in zip(true_ids, got)
        )
        assert hits / (nq * k) >= 0.85, hits / (nq * k)


class TestServedSharded:
    """The sharded engine behind the REAL serving surface (VERDICT r2
    missing #1): collection config -> ShardedHNSWIndex engine -> txn
    ingest -> search -> snapshot -> restart, plus the full HTTP path."""

    def _mk(self, tmp_path, shards=4, dim=32, name="shc"):
        from cosdata_tpu.config import load_config
        from cosdata_tpu.core.app_context import AppContext

        ctx = AppContext(
            load_config(data_path=str(tmp_path / "data")),
            admin_key="test-admin",
        )
        coll = ctx.create_collection(
            {
                "name": name,
                "dense_vector": {"enabled": True, "dimension": dim},
                "sparse_vector": {"enabled": False},
                "tf_idf_options": {"enabled": False},
                "config": {"max_vectors": None, "shards": shards},
                "metadata_schema": {
                    "fields": [
                        {"name": "cat", "values": ["a", "b"]},
                    ]
                },
            }
        )
        return ctx, coll

    def test_collection_sharded_lifecycle(self, tmp_path):
        d = 32
        ctx, coll = self._mk(tmp_path)
        coll.create_dense_index(
            quantization={"type": "scalar", "data_type": "u8",
                          "range": {"min": -0.5, "max": 0.5}},
            hnsw_params={"num_layers": 2, "wave_size": 64, "max_iters": 32},
        )
        idx = coll.dense.index
        assert getattr(idx, "is_sharded", False)
        assert len(idx.shards) == 4
        x = _unit(240, d, 21)
        txn = coll.create_transaction()
        coll.txn_upsert(
            txn.txn_id,
            [
                {"id": f"v{i}", "dense_values": x[i].tolist(),
                 "metadata": {"cat": "a" if i % 2 else "b"}}
                for i in range(240)
            ],
            upsert=False,
        )
        version = coll.commit_transaction(txn.txn_id)
        ctx.indexing.trigger(coll, version, txn)
        ctx.indexing.wait_idle()
        # rows spread across devices
        populated = [s.n for s in idx.shards]
        assert min(populated) > 0, populated
        assert sum(populated) == 240
        # exact self-retrieval through the served search path
        res = coll.search_dense([x[7].tolist()], top_k=3)
        assert res[0][0]["id"] == "v7"
        # metadata-filtered search: exact masked scan on every shard
        res = coll.search_dense(
            [x[8].tolist()], top_k=3,
            filter_dto={"Is": {"field_name": "cat", "field_value": "b",
                               "operator": "Equal"}},
        )
        got = [r["id"] for r in res[0]]
        assert got[0] == "v8"  # v8 is cat=b (8 % 2 == 0)
        assert all(int(g[1:]) % 2 == 0 for g in got), got
        # delete routes to the owning shard
        coll.stream_delete("v7")
        res = coll.search_dense([x[7].tolist()], top_k=3)
        assert res[0][0]["id"] != "v7"
        # snapshot + restart restores the sharded engine
        coll.save_snapshot()
        from cosdata_tpu.config import load_config
        from cosdata_tpu.core.app_context import AppContext

        ctx2 = AppContext(
            load_config(data_path=str(tmp_path / "data")),
            admin_key="test-admin",
        )
        c2 = ctx2.get_collection("shc")
        idx2 = c2.dense.index
        assert getattr(idx2, "is_sharded", False)
        assert [s.n for s in idx2.shards] == populated
        res = c2.search_dense([x[9].tolist()], top_k=3)
        assert res[0][0]["id"] == "v9"
        res = c2.search_dense([x[7].tolist()], top_k=3)
        assert res[0][0]["id"] != "v7"  # tombstone survived restart

    def test_http_sharded_collection(self, tmp_path):
        """Full REST loop against the sharded engine (the dryrun drives
        the same path; SURVEY §7 step 10)."""
        import asyncio

        from aiohttp.test_utils import TestClient, TestServer

        from cosdata_tpu.api.server import make_app
        from cosdata_tpu.config import load_config
        from cosdata_tpu.core.app_context import AppContext

        d = 32
        x = _unit(200, d, 23)

        async def run():
            ctx = AppContext(
                load_config(data_path=str(tmp_path / "data")),
                admin_key="key-1",
            )
            client = TestClient(TestServer(make_app(ctx)))
            await client.start_server()
            try:
                r = await client.post(
                    "/auth/create-session",
                    json={"username": "admin", "password": "key-1"},
                )
                assert r.status == 200
                tok = (await r.json())["access_token"]
                hdr = {"Authorization": f"Bearer {tok}"}
                r = await client.post(
                    "/vectordb/collections",
                    json={
                        "name": "hsc",
                        "dense_vector": {"enabled": True, "dimension": d},
                        "config": {"max_vectors": None, "shards": 4},
                    },
                    headers=hdr,
                )
                assert r.status == 201, await r.text()
                r = await client.post(
                    "/vectordb/collections/hsc/indexes/dense",
                    json={
                        "name": "idx",
                        "distance_metric_type": "cosine",
                        "quantization": {
                            "type": "scalar",
                            "properties": {"data_type": "u8"},
                            "data_type": "u8",
                            "range": {"min": -0.5, "max": 0.5},
                        },
                        "hnsw_params": {"num_layers": 2},
                    },
                    headers=hdr,
                )
                assert r.status == 201, await r.text()
                r = await client.post(
                    "/vectordb/collections/hsc/transactions", json={}, headers=hdr
                )
                assert r.status == 200, await r.text()
                txn_id = (await r.json())["transaction_id"]
                # /upsert takes the UpsertDto envelope; /vectors takes a
                # single CreateVectorDto (transactions/controller.rs:121,224)
                r = await client.post(
                    f"/vectordb/collections/hsc/transactions/{txn_id}/upsert",
                    json={"vectors": [
                        {"id": f"v{i}", "dense_values": x[i].tolist()}
                        for i in range(200)
                    ]},
                    headers=hdr,
                )
                assert r.status == 200, await r.text()
                r = await client.post(
                    f"/vectordb/collections/hsc/transactions/{txn_id}/commit",
                    json={}, headers=hdr,
                )
                assert r.status == 200, await r.text()
                ctx.indexing.wait_idle()
                coll = ctx.get_collection("hsc")
                assert getattr(coll.dense.index, "is_sharded", False)
                assert min(s.n for s in coll.dense.index.shards) > 0
                r = await client.post(
                    "/vectordb/collections/hsc/search/dense",
                    json={"query_vector": x[11].tolist(), "top_k": 3},
                    headers=hdr,
                )
                assert r.status == 200, await r.text()
                results = (await r.json())["results"]
                assert results[0]["id"] == "v11"
            finally:
                await client.close()

        asyncio.run(run())
