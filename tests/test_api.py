"""Black-box REST API test, mirroring the reference's tests/test.py smoke
flow: create session -> collection -> index -> txn upsert -> poll status ->
search -> fetch by id (SURVEY.md §4 layer 4)."""

import asyncio


import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from cosdata_tpu.api.server import make_app
from cosdata_tpu.config import load_config
from cosdata_tpu.core.app_context import AppContext

ADMIN = "test-key-123"


def async_test(fn):
    """Run an async test through its own event loop + test client (no
    pytest-asyncio in the image)."""

    # NB: no functools.wraps — pytest must see (self, tmp_path), not the
    # wrapped coroutine's (self, client) signature
    wrapper_name = fn.__name__

    def wrapper(self, tmp_path):
        async def run():
            ctx = AppContext(
                load_config(data_path=str(tmp_path / "data")), admin_key=ADMIN
            )
            client = TestClient(TestServer(make_app(ctx)))
            await client.start_server()
            try:
                await fn(self, client)
            finally:
                await client.close()

        asyncio.run(run())

    wrapper.__name__ = wrapper_name
    return wrapper


async def _login(client) -> dict:
    resp = await client.post(
        "/auth/create-session", json={"username": "admin", "password": ADMIN}
    )
    assert resp.status == 200
    token = (await resp.json())["access_token"]
    return {"Authorization": f"Bearer {token}"}


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestAuth:
    @async_test
    async def test_bad_credentials(self, client):
        resp = await client.post(
            "/auth/create-session", json={"username": "admin", "password": "wrong"}
        )
        assert resp.status == 401

    @async_test
    async def test_unauthorized_access(self, client):
        resp = await client.get("/vectordb/collections")
        assert resp.status == 401

    @async_test
    async def test_garbage_token(self, client):
        resp = await client.get(
            "/vectordb/collections", headers={"Authorization": "Bearer junk"}
        )
        assert resp.status == 401


class TestSmoke:
    @async_test
    async def test_full_flow(self, client):
        h = await _login(client)
        # create collection
        resp = await client.post(
            "/vectordb/collections",
            json={
                "name": "smoke",
                "dense_vector": {"enabled": True, "dimension": 32},
                "sparse_vector": {"enabled": False},
                "tf_idf_options": {"enabled": False},
            },
            headers=h,
        )
        assert resp.status == 201, await resp.text()

        # create dense index
        resp = await client.post(
            "/vectordb/collections/smoke/indexes/dense",
            json={
                "name": "smoke_index",
                "distance_metric_type": "cosine",
                "quantization": {"type": "auto", "sample_threshold": 50},
                "hnsw_params": {"num_layers": 3, "ef_construction": 48,
                                "ef_search": 64},
            },
            headers=h,
        )
        assert resp.status == 201, await resp.text()

        # transaction upsert
        x = _unit(100, 32, 0)
        resp = await client.post(
            "/vectordb/collections/smoke/transactions", json={}, headers=h
        )
        txn = (await resp.json())["transaction_id"]
        resp = await client.post(
            f"/vectordb/collections/smoke/transactions/{txn}/upsert",
            json={
                "vectors": [
                    {"id": f"v{i}", "dense_values": x[i].tolist()} for i in range(100)
                ]
            },
            headers=h,
        )
        assert resp.status == 200, await resp.text()
        resp = await client.post(
            f"/vectordb/collections/smoke/transactions/{txn}/commit",
            json={},
            headers=h,
        )
        assert resp.status == 200
        version = (await resp.json())["version"]
        assert version == 1

        # poll status until complete (first-compile latency dominates on CPU)
        for _ in range(600):
            resp = await client.get(
                f"/vectordb/collections/smoke/transactions/{txn}/status", headers=h
            )
            body = await resp.json()
            if body["status"] == "complete":
                break
            await asyncio.sleep(0.1)
        assert body["status"] == "complete"
        assert body["records_upserted"] == 100

        # search
        resp = await client.post(
            "/vectordb/collections/smoke/search/dense",
            json={"query_vector": x[7].tolist(), "top_k": 5},
            headers=h,
        )
        body = await resp.json()
        assert resp.status == 200, body
        assert body["results"][0]["id"] == "v7"
        assert body["warning"] is None

        # batch search
        resp = await client.post(
            "/vectordb/collections/smoke/search/batch-dense",
            json={
                "queries": [{"vector": x[3].tolist()}, {"vector": x[9].tolist()}],
                "top_k": 2,
            },
            headers=h,
        )
        body = await resp.json()
        assert body["responses"][0]["results"][0]["id"] == "v3"
        assert body["responses"][1]["results"][0]["id"] == "v9"

        # get vector / 404
        resp = await client.get(
            "/vectordb/collections/smoke/vectors/v3", headers=h
        )
        assert resp.status == 200
        assert (await resp.json())["id"] == "v3"
        resp = await client.get(
            "/vectordb/collections/smoke/vectors/ghost", headers=h
        )
        assert resp.status == 404

        # versions
        resp = await client.get("/vectordb/collections/smoke/versions", headers=h)
        versions = (await resp.json())["versions"]
        assert versions[-1]["version"] == 1
        resp = await client.get(
            "/vectordb/collections/smoke/versions/current", headers=h
        )
        assert (await resp.json())["version"] == 1

        # indexing status rollup
        resp = await client.get(
            "/vectordb/collections/smoke/indexing_status", headers=h
        )
        body = await resp.json()
        assert body["status_counts"]["complete"] == 1

    @async_test
    async def test_sparse_tfidf_hybrid_flow(self, client):
        h = await _login(client)
        await client.post(
            "/vectordb/collections",
            json={
                "name": "multi",
                "dense_vector": {"enabled": True, "dimension": 16},
                "sparse_vector": {"enabled": True},
                "tf_idf_options": {"enabled": True},
                "store_raw_text": True,
            },
            headers=h,
        )
        for path, body in [
            ("dense", {"quantization": {"type": "scalar", "data_type": "f32"},
                       "hnsw_params": {"num_layers": 2}}),
            ("sparse", {"quantization": 64, "sample_threshold": 5}),
            ("tf-idf", {"sample_threshold": 5}),
        ]:
            resp = await client.post(
                f"/vectordb/collections/multi/indexes/{path}", json=body, headers=h
            )
            assert resp.status == 201, await resp.text()

        x = _unit(30, 16, 1)
        resp = await client.post(
            "/vectordb/collections/multi/streaming/upsert",
            json={
                "vectors": [
                    {
                        "id": i,
                        "dense_values": x[i].tolist(),
                        "sparse_values": [[i % 6, 0.8]],
                        "text": f"sample text number {i} theme{i % 4}",
                    }
                    for i in range(30)
                ]
            },
            headers=h,
        )
        assert resp.status == 200, await resp.text()

        resp = await client.post(
            "/vectordb/collections/multi/search/sparse",
            json={"query_terms": [[2, 1.0]], "top_k": 5},
            headers=h,
        )
        body = await resp.json()
        assert resp.status == 200 and body["results"]

        resp = await client.post(
            "/vectordb/collections/multi/search/tf-idf",
            json={"query": "theme1", "top_k": 5, "return_raw_text": True},
            headers=h,
        )
        body = await resp.json()
        assert body["results"] and "theme1" in body["results"][0]["text"]

        resp = await client.post(
            "/vectordb/collections/multi/search/hybrid",
            json={
                "query_vector": x[5].tolist(),
                "query_text": "theme1",
                "top_k": 5,
            },
            headers=h,
        )
        body = await resp.json()
        assert resp.status == 200 and body["results"]

        # batch-hybrid: ONE collection call regrouping legs across mixed
        # leg-type queries (r5 serving path)
        resp = await client.post(
            "/vectordb/collections/multi/search/batch-hybrid",
            json={
                "queries": [
                    {"query_vector": x[5].tolist(), "query_text": "theme1"},
                    {"query_terms": [[2, 1.0]], "query_text": "theme2"},
                    {"query_vector": x[7].tolist(),
                     "query_terms": [[1, 0.5]]},
                ],
                "top_k": 3,
            },
            headers=h,
        )
        body = await resp.json()
        assert resp.status == 200, await resp.text()
        assert len(body["responses"]) == 3
        assert all(r["results"] for r in body["responses"])
        assert all(
            r["results"][0]["score"] > 0 for r in body["responses"]
        )

        # streaming delete
        resp = await client.delete(
            "/vectordb/collections/multi/streaming/vectors/5", headers=h
        )
        assert resp.status == 200
        resp = await client.get("/vectordb/collections/multi/vectors/5", headers=h)
        assert resp.status == 404

        # vectors by document: none were given document ids
        resp = await client.get(
            "/vectordb/collections/multi/vectors?document_id=none", headers=h
        )
        assert (await resp.json())["vectors"] == []

        # neighbors endpoint is explicitly unimplemented (parity)
        resp = await client.get(
            "/vectordb/collections/multi/vectors/1/neighbors", headers=h
        )
        assert resp.status == 501

    @async_test
    async def test_error_paths(self, client):
        h = await _login(client)
        # search on missing collection
        resp = await client.post(
            "/vectordb/collections/ghost/search/dense",
            json={"query_vector": [0.1]},
            headers=h,
        )
        assert resp.status == 404
        # duplicate collection
        cfg = {"name": "dup", "dense_vector": {"enabled": True, "dimension": 4}}
        assert (
            await client.post("/vectordb/collections", json=cfg, headers=h)
        ).status == 201
        assert (
            await client.post("/vectordb/collections", json=cfg, headers=h)
        ).status == 400
        # index on collection without dense enabled
        await client.post(
            "/vectordb/collections",
            json={"name": "nodense", "dense_vector": {"enabled": False}},
            headers=h,
        )
        resp = await client.post(
            "/vectordb/collections/nodense/indexes/dense", json={}, headers=h
        )
        assert resp.status == 400
        # commit of unknown transaction
        resp = await client.post(
            "/vectordb/collections/dup/transactions/zzz/commit", json={}, headers=h
        )
        assert resp.status == 404

    @async_test
    async def test_openapi(self, client):
        resp = await client.get("/api-docs/openapi.json")
        body = await resp.json()
        assert body["openapi"].startswith("3.")
        assert "/vectordb/collections" in body["paths"]

    @async_test
    async def test_openapi_per_module(self, client):
        # per-module scoped docs (reference src/api/docs.rs:8-30)
        resp = await client.get("/api-docs/search/openapi.json")
        body = await resp.json()
        paths = list(body["paths"])
        assert paths and all("/search" in p for p in paths)
        assert (
            "/vectordb/collections/{collection_id}/search/hybrid" in body["paths"]
        )
        resp = await client.get("/api-docs/auth/openapi.json")
        body = await resp.json()
        assert list(body["paths"]) == ["/auth/create-session"]
        resp = await client.get("/api-docs/vectors/openapi.json")
        body = await resp.json()
        assert all(
            "/vectors" in p and "/transactions" not in p for p in body["paths"]
        )
        resp = await client.get("/api-docs/nope/openapi.json")
        assert resp.status == 404


class TestHead:
    @async_test
    async def test_head_vector(self, client):
        h = await _login(client)
        await client.post(
            "/vectordb/collections",
            json={"name": "hd", "dense_vector": {"enabled": True, "dimension": 4}},
            headers=h,
        )
        await client.post(
            "/vectordb/collections/hd/streaming/upsert",
            json={"vectors": [{"id": "a", "dense_values": [0.1, 0.2, 0.3, 0.4]}]},
            headers=h,
        )
        resp = await client.head("/vectordb/collections/hd/vectors/a", headers=h)
        assert resp.status == 200
        resp = await client.head("/vectordb/collections/hd/vectors/zz", headers=h)
        assert resp.status == 404


class TestCorsAndOpenAPI:
    @async_test
    async def test_cors_preflight_and_headers(self, client):
        resp = await client.options("/vectordb/collections")
        assert resp.status == 204
        assert resp.headers["Access-Control-Allow-Origin"] == "*"
        resp = await client.post(
            "/auth/create-session",
            json={"username": "admin", "password": ADMIN},
        )
        assert resp.headers.get("Access-Control-Allow-Origin") == "*"

    @async_test
    async def test_openapi_schemas(self, client):
        resp = await client.get("/api-docs/openapi.json")
        doc = await resp.json()
        schemas = doc["components"]["schemas"]
        for name in (
            "CreateCollectionDto", "DenseSearchRequest", "HybridSearchRequest",
            "VectorDto", "TransactionStatusResponse", "CreateDenseIndexDto",
        ):
            assert name in schemas, name
        dense = doc["paths"][
            "/vectordb/collections/{collection_id}/search/dense"
        ]["post"]
        ref = dense["requestBody"]["content"]["application/json"]["schema"]
        assert ref == {"$ref": "#/components/schemas/DenseSearchRequest"}
        assert dense["responses"]["200"]["content"]["application/json"][
            "schema"
        ] == {"$ref": "#/components/schemas/SearchResponse"}
