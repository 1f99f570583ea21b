"""Python SDK client driven against a real in-process HTTP server."""

import socket
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent / "clients" / "python"))


@pytest.fixture
def server(tmp_path):
    import asyncio

    from aiohttp import web

    from cosdata_tpu.api.server import make_app
    from cosdata_tpu.config import load_config
    from cosdata_tpu.core.app_context import AppContext

    ctx = AppContext(load_config(data_path=str(tmp_path / "data")), admin_key="sdk")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    loop = asyncio.new_event_loop()
    started = threading.Event()

    async def run():
        runner = web.AppRunner(make_app(ctx))
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", port)
        await site.start()
        started.set()

    t = threading.Thread(
        target=lambda: (loop.create_task(run()), loop.run_forever()), daemon=True
    )
    t.start()
    started.wait(10)
    yield f"127.0.0.1:{port}"
    loop.call_soon_threadsafe(loop.stop)


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestSDK:
    def test_end_to_end(self, server):
        from cosdata_tpu_client import Client, ClientError

        c = Client(server, admin_key="sdk")
        c.create_collection("sdkc", dense_dimension=32, tf_idf=True,
                            store_raw_text=True)
        c.create_dense_index(
            "sdkc",
            quantization={"type": "auto", "sample_threshold": 40},
            hnsw_params={"num_layers": 2},
        )
        c.create_tf_idf_index("sdkc", sample_threshold=5)
        x = _unit(60, 32, 0)
        with c.transaction("sdkc") as txn:
            txn.upsert(
                [
                    {"id": f"v{i}", "dense_values": x[i].tolist(),
                     "text": f"note number {i} topic{i % 3}"}
                    for i in range(60)
                ]
            )
        c.wait_for_indexing("sdkc")
        hits = c.search_dense("sdkc", x[11], top_k=3)
        assert hits[0]["id"] == "v11"
        hits = c.search_tf_idf("sdkc", "topic1", top_k=5)
        assert hits
        hits = c.search_hybrid("sdkc", query_vector=x[4].tolist(),
                               query_text="topic1", top_k=5)
        assert hits
        assert c.get_vector("sdkc", "v3")["id"] == "v3"
        assert c.current_version("sdkc")["version"] == 1
        with pytest.raises(ClientError) as e:
            c.get_vector("sdkc", "ghost")
        assert e.value.status == 404

    def test_transaction_abort_on_error(self, server):
        from cosdata_tpu_client import Client

        c = Client(server, admin_key="sdk")
        c.create_collection("ab", dense_dimension=8)
        try:
            with c.transaction("ab") as txn:
                txn.upsert([{"id": "a", "dense_values": [0.1] * 8}])
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        # transaction aborted -> a new one can open
        with c.transaction("ab") as txn:
            txn.upsert([{"id": "a", "dense_values": [0.1] * 8}])
