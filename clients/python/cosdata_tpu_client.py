"""Minimal Python SDK for the cosdata_tpu REST API.

Mirrors how the reference's Python tests drive the server (SURVEY.md §1
clients layer): session auth, collections, indexes, transactions as context
managers, streaming, and all search endpoints.

Usage:
    from cosdata_tpu_client import Client

    c = Client("127.0.0.1:8443", admin_key="...")
    c.create_collection("docs", dense_dimension=768)
    c.create_dense_index("docs")
    with c.transaction("docs") as txn:
        txn.upsert([{"id": "a", "dense_values": [...]}])
    c.wait_for_indexing("docs")
    hits = c.search_dense("docs", query_vector=[...], top_k=10)
"""

from __future__ import annotations

import time

import requests


class ClientError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


class Transaction:
    def __init__(self, client: "Client", collection: str, txn_id: str):
        self._c = client
        self.collection = collection
        self.txn_id = txn_id

    def insert(self, vectors: list[dict]):
        return self._c._post(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/vectors",
            vectors,
        )

    def upsert(self, vectors: list[dict]):
        return self._c._post(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/upsert",
            {"vectors": vectors},
        )

    def delete(self, vector_id):
        return self._c._delete(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/vectors/{vector_id}"
        )

    def commit(self) -> int:
        out = self._c._post(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/commit",
            {},
        )
        return out["version"]

    def abort(self):
        return self._c._post(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/abort",
            {},
        )

    def status(self) -> dict:
        return self._c._get(
            f"/vectordb/collections/{self.collection}/transactions/"
            f"{self.txn_id}/status"
        )

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.commit()
        else:
            self.abort()
        return False


class Client:
    def __init__(self, host: str = "127.0.0.1:8443", admin_key: str = "",
                 username: str = "admin", scheme: str = "http",
                 timeout: float = 120.0):
        self.base = f"{scheme}://{host}"
        self.timeout = timeout
        self._session = requests.Session()
        resp = self._session.post(
            f"{self.base}/auth/create-session",
            json={"username": username, "password": admin_key},
            timeout=timeout,
        )
        if resp.status_code != 200:
            raise ClientError(resp.status_code, resp.text)
        token = resp.json()["access_token"]
        self._session.headers["Authorization"] = f"Bearer {token}"

    # -- plumbing ---------------------------------------------------------

    def _req(self, method, path, json_body=None):
        resp = self._session.request(
            method, self.base + path, json=json_body, timeout=self.timeout
        )
        if resp.status_code >= 400:
            try:
                msg = resp.json().get("error", resp.text)
            except Exception:
                msg = resp.text
            raise ClientError(resp.status_code, msg)
        if resp.content:
            return resp.json()
        return None

    def _get(self, path):
        return self._req("GET", path)

    def _post(self, path, body):
        return self._req("POST", path, body)

    def _delete(self, path):
        return self._req("DELETE", path)

    # -- collections --------------------------------------------------------

    def create_collection(self, name: str, dense_dimension: int | None = None,
                          sparse: bool = False, tf_idf: bool = False,
                          metadata_schema: dict | None = None,
                          store_raw_text: bool = False, **extra):
        body = {
            "name": name,
            "dense_vector": {
                "enabled": dense_dimension is not None,
                "dimension": dense_dimension or 0,
            },
            "sparse_vector": {"enabled": sparse},
            "tf_idf_options": {"enabled": tf_idf},
            "store_raw_text": store_raw_text,
            **extra,
        }
        if metadata_schema:
            body["metadata_schema"] = metadata_schema
        return self._post("/vectordb/collections", body)

    def list_collections(self):
        return self._get("/vectordb/collections")["collections"]

    def get_collection(self, name: str):
        return self._get(f"/vectordb/collections/{name}")

    def delete_collection(self, name: str):
        return self._delete(f"/vectordb/collections/{name}")

    def indexing_status(self, name: str):
        return self._get(f"/vectordb/collections/{name}/indexing_status")

    def wait_for_indexing(self, name: str, timeout: float = 600.0):
        t0 = time.time()
        while time.time() - t0 < timeout:
            st = self.indexing_status(name)
            if (
                st["status_counts"]["in_progress"] == 0
                and st["background_version"] >= st["current_version"]
            ):
                return st
            time.sleep(0.25)
        raise TimeoutError(f"indexing of '{name}' did not finish")

    # -- indexes -------------------------------------------------------------

    def create_dense_index(self, collection: str, distance_metric: str = "cosine",
                           quantization: dict | None = None,
                           hnsw_params: dict | None = None,
                           raw_storage: str = "device"):
        """raw_storage: "device" (raw f32 rows in HBM, fused exact rerank),
        "host" (raw rows in host RAM — frees HBM for bigger collections),
        or "none" (quantized-space scores only)."""
        return self._post(
            f"/vectordb/collections/{collection}/indexes/dense",
            {
                "distance_metric_type": distance_metric,
                "quantization": quantization
                or {"type": "auto", "sample_threshold": 100},
                "hnsw_params": hnsw_params or {},
                "raw_storage": raw_storage,
            },
        )

    def create_sparse_index(self, collection: str, quantization: int = 64,
                            sample_threshold: int = 1000):
        return self._post(
            f"/vectordb/collections/{collection}/indexes/sparse",
            {"quantization": quantization, "sample_threshold": sample_threshold},
        )

    def create_tf_idf_index(self, collection: str, k1: float = 1.2,
                            b: float = 0.75, sample_threshold: int = 1000):
        return self._post(
            f"/vectordb/collections/{collection}/indexes/tf-idf",
            {"k1": k1, "b": b, "sample_threshold": sample_threshold},
        )

    # -- transactions / streaming --------------------------------------------

    def transaction(self, collection: str) -> Transaction:
        out = self._post(f"/vectordb/collections/{collection}/transactions", {})
        return Transaction(self, collection, out["transaction_id"])

    def stream_upsert(self, collection: str, vectors: list[dict]):
        return self._post(
            f"/vectordb/collections/{collection}/streaming/upsert",
            {"vectors": vectors},
        )

    def stream_delete(self, collection: str, vector_id):
        return self._delete(
            f"/vectordb/collections/{collection}/streaming/vectors/{vector_id}"
        )

    # -- search ----------------------------------------------------------------

    def search_dense(self, collection: str, query_vector, top_k: int = 10,
                     filter: dict | None = None, return_raw_text: bool = False):
        body = {"query_vector": [float(v) for v in query_vector], "top_k": top_k,
                "return_raw_text": return_raw_text}
        if filter:
            body["filter"] = filter
        return self._post(
            f"/vectordb/collections/{collection}/search/dense", body
        )["results"]

    def batch_search_dense(self, collection: str, vectors, top_k: int = 10):
        return self._post(
            f"/vectordb/collections/{collection}/search/batch-dense",
            {"queries": [{"vector": [float(x) for x in v]} for v in vectors],
             "top_k": top_k},
        )["responses"]

    def search_sparse(self, collection: str, query_terms, top_k: int = 10,
                      early_terminate_threshold: float | None = None):
        body = {
            "query_terms": [[int(p[0]), float(p[1])] for p in query_terms],
            "top_k": top_k,
        }
        if early_terminate_threshold is not None:
            body["early_terminate_threshold"] = early_terminate_threshold
        return self._post(
            f"/vectordb/collections/{collection}/search/sparse", body
        )["results"]

    def search_tf_idf(self, collection: str, query: str, top_k: int = 10):
        return self._post(
            f"/vectordb/collections/{collection}/search/tf-idf",
            {"query": query, "top_k": top_k},
        )["results"]

    def search_hybrid(self, collection: str, top_k: int = 10,
                      fusion_constant_k: float = 60.0, **query):
        return self._post(
            f"/vectordb/collections/{collection}/search/hybrid",
            {"top_k": top_k, "fusion_constant_k": fusion_constant_k, **query},
        )["results"]

    # -- vectors / versions -----------------------------------------------------

    def get_vector(self, collection: str, vector_id):
        from urllib.parse import quote

        return self._get(
            f"/vectordb/collections/{collection}/vectors/"
            f"{quote(str(vector_id), safe='')}"
        )

    def vectors_by_document(self, collection: str, document_id):
        from urllib.parse import quote

        return self._get(
            f"/vectordb/collections/{collection}/vectors"
            f"?document_id={quote(str(document_id), safe='')}"
        )["vectors"]

    def list_versions(self, collection: str):
        return self._get(f"/vectordb/collections/{collection}/versions")["versions"]

    def current_version(self, collection: str):
        return self._get(f"/vectordb/collections/{collection}/versions/current")
