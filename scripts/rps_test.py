"""RPS harness against a running server (mirrors the reference's
tests/rps-test.py:414-454: concurrent batched dense searches, prints RPS).

Usage: python scripts/rps_test.py [--host 127.0.0.1:8443] [--admin-key KEY]
       [--n 10000] [--dim 768] [--queries 1000] [--batch 32] [--workers 8]
"""

import argparse
import concurrent.futures as futures
import time

import numpy as np
import requests


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1:8443")
    ap.add_argument("--admin-key", default="admin")
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()

    base = f"http://{args.host}"
    tok = requests.post(
        f"{base}/auth/create-session",
        json={"username": "admin", "password": args.admin_key},
    ).json()["access_token"]
    h = {"Authorization": f"Bearer {tok}"}

    name = "rps_bench"
    requests.delete(f"{base}/vectordb/collections/{name}", headers=h)
    r = requests.post(
        f"{base}/vectordb/collections",
        json={"name": name, "dense_vector": {"enabled": True, "dimension": args.dim}},
        headers=h,
    )
    r.raise_for_status()
    requests.post(
        f"{base}/vectordb/collections/{name}/indexes/dense",
        json={"quantization": {"type": "auto", "sample_threshold": 1000}},
        headers=h,
    ).raise_for_status()

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.n, args.dim)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    t0 = time.time()
    txn = requests.post(
        f"{base}/vectordb/collections/{name}/transactions", json={}, headers=h
    ).json()["transaction_id"]
    # 500-vector chunks + 6-decimal rounding keep each request under the
    # server's 8 MB JSON limit at 768-d (full float repr is ~20 chars;
    # rounding is harmless — the store quantizes to u8 anyway)
    chunk = 500 if args.dim >= 512 else 1000
    # round in float64: json repr of a rounded double is the short form
    # ("0.012346"), while a rounded float32 still reprs with ~17 digits
    xr = np.round(x.astype(np.float64), 6)
    for i in range(0, args.n, chunk):
        requests.post(
            f"{base}/vectordb/collections/{name}/transactions/{txn}/upsert",
            json={
                "vectors": [
                    {"id": f"v{j}", "dense_values": xr[j].tolist()}
                    for j in range(i, min(i + chunk, args.n))
                ]
            },
            headers=h,
        ).raise_for_status()
    requests.post(
        f"{base}/vectordb/collections/{name}/transactions/{txn}/commit",
        json={},
        headers=h,
    ).raise_for_status()
    while True:
        st = requests.get(
            f"{base}/vectordb/collections/{name}/transactions/{txn}/status",
            headers=h,
        ).json()
        if st["status"] == "complete":
            break
        time.sleep(0.5)
    print(f"ingest+index: {time.time()-t0:.1f}s")

    q = rng.normal(size=(args.queries, args.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    batches = [
        q[i : i + args.batch] for i in range(0, args.queries, args.batch)
    ]

    def one(batch):
        r = requests.post(
            f"{base}/vectordb/collections/{name}/search/batch-dense",
            json={
                "queries": [{"vector": v.tolist()} for v in batch],
                "top_k": args.top_k,
            },
            headers=h,
        )
        r.raise_for_status()
        return len(batch)

    # warm up
    one(batches[0])
    t0 = time.time()
    with futures.ThreadPoolExecutor(args.workers) as ex:
        done = sum(ex.map(one, batches))
    elapsed = time.time() - t0
    print(f"RPS = {done/elapsed:.1f}  ({done} queries in {elapsed:.2f}s, "
          f"batch={args.batch}, workers={args.workers})")


if __name__ == "__main__":
    main()
