"""Versioned snapshot persistence for collections and indexes.

The reference persists via append-only index files + LMDB-tracked metadata
(/root/reference/src/models/{file_persist,meta_persist}.rs, SURVEY.md §5
checkpoint/resume). TPU-native, index state is a handful of dense arrays,
so a checkpoint is an atomic .npz + msgpack snapshot written at flush
points (txn pre-commit / epoch close); crash recovery between snapshots is
WAL replay of versions in (background, current] — identical semantics.
"""

from __future__ import annotations

import os
from pathlib import Path

import msgpack
import numpy as np
import jax.numpy as jnp


def _atomic_write(path: Path, data: bytes):
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _save_npz(path: Path, arrays: dict):
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, path)


def save_collection_state(coll, snap_dir: str | Path) -> None:
    snap_dir = Path(snap_dir)
    snap_dir.mkdir(parents=True, exist_ok=True)

    maps = {
        "etoi": list(coll.etoi.items()),
        "dtoi": list(coll.dtoi.items()),
        "raw": list(coll.raw.items()),
        "next_internal": coll.next_internal,
    }
    _atomic_write(snap_dir / "maps.msgpack", msgpack.packb(maps))

    if coll.dense is not None and coll.dense.index is not None:
        d = coll.dense
        idx = d.index
        vs = idx.store
        arrays = {
            "adj0": idx.adj0,
            "adj0_d": idx.adj0_d,
            "up_adj": idx.up_adj,
            "up_d": idx.up_d,
            "up_slot": idx.up_slot,
            "levels": idx.levels,
            "alive": idx.alive,
        }
        if vs.kind == "subbyte":
            arrays.update(
                planes=vs._arrays.planes, sums=vs._arrays.sums, mags=vs._arrays.mags
            )
        elif vs.kind == "u8":
            arrays.update(
                data=vs._arrays.data, sums=vs._arrays.sums, mags=vs._arrays.mags
            )
        else:
            arrays.update(data=vs._arrays.data, mags=vs._arrays.mags)
        if vs._raw is not None:
            arrays["raw"] = vs._raw
        _save_npz(snap_dir / "dense.npz", arrays)
        meta = {
            "kind": vs.kind,
            "metric": vs.metric,
            "resolution": vs.resolution,
            "range": list(vs.range),
            "n": vs.n,
            "n_up": idx.n_up,
            "entry": idx.entry,
            "entry_level": idx.entry_level,
            "n_deleted": idx.n_deleted,
            "level_counts": [int(x) for x in idx.level_counts],
            "configured_range": list(d.range),
            "row_of": list(d.row_of.items()),
            "internal_of": d.internal_of,
        }
        _atomic_write(snap_dir / "dense.msgpack", msgpack.packb(meta))

    if coll.sparse is not None:
        s = coll.sparse
        s._fold_pending()
        data = {
            "bits": s.bits,
            "upper_bound": s.values_upper_bound,
            "configured": s.is_configured,
            "n": s.n,
            "n_cap": s.n_cap,
            "n_docs": s.n_docs,
            "live_docs": s.live_docs,
            "raw_max": s._raw_max,
            "keep_raw": s.keep_raw,
            "sample": [
                (int(i), d.tolist(), v.tolist()) for i, d, v in s._sample
            ],
        }
        _atomic_write(snap_dir / "sparse.msgpack", msgpack.packb(data))
        _save_npz(
            snap_dir / "sparse.npz",
            {
                "h_keys": s._h_keys,
                "h_ids": s._h_ids,
                "h_buckets": s._h_buckets,
                "alive": s._alive,
                "has_doc": s._has_doc,
                "raw_nnz": s._raw_nnz,
                "raw_dims": s._raw_dims,
                "raw_vals": s._raw_vals,
            },
        )

    if coll.tfidf is not None:
        t = coll.tfidf
        data = {
            "k1": t.k1,
            "b": t.b,
            "avgdl": t.average_document_length,
            "configured": t.is_configured,
            "total_documents": t.total_documents,
            "live_documents": t.live_documents,
            "n": t.n,
            "n_cap": t.n_cap,
            "alive": t._alive.tolist(),
            "has_doc": t._has_doc.tolist(),
            "postings": [
                (term, p.ids, t._tfs[term]) for term, p in t._postings.items()
            ],
        }
        _atomic_write(snap_dir / "tfidf.msgpack", msgpack.packb(data))


def load_collection_state(coll, snap_dir: str | Path) -> None:
    snap_dir = Path(snap_dir)
    maps_path = snap_dir / "maps.msgpack"
    if maps_path.exists():
        with open(maps_path, "rb") as f:
            maps = msgpack.unpackb(f.read(), strict_map_key=False)
        coll.etoi = {k: v for k, v in maps["etoi"]}
        coll.itoe = {v: k for k, v in maps["etoi"]}
        coll.dtoi = {k: list(v) for k, v in maps["dtoi"]}
        coll.raw = {int(k): v for k, v in maps["raw"]}
        coll.next_internal = maps["next_internal"]

    dense_meta_p = snap_dir / "dense.msgpack"
    if dense_meta_p.exists() and coll.dense is not None:
        from cosdata_tpu.ops import quantize as Q

        with open(dense_meta_p, "rb") as f:
            meta = msgpack.unpackb(f.read(), strict_map_key=False)
        z = np.load(snap_dir / "dense.npz")
        d = coll.dense
        d.kind = meta["kind"]
        d.resolution = meta["resolution"]
        d.range = tuple(meta["configured_range"])
        d._build()
        idx = d.index
        vs = idx.store
        cap = int(z["adj0"].shape[0])
        # rebuild the store at snapshot capacity
        vs.capacity = cap
        vs.range = tuple(meta["range"])
        empty = vs._empty(cap)  # rebuilds the dequant scalars from range/dim
        if meta["kind"] == "subbyte":
            vs._arrays = empty._replace(
                planes=jnp.asarray(z["planes"]),
                sums=jnp.asarray(z["sums"]),
                mags=jnp.asarray(z["mags"]),
            )
        elif meta["kind"] == "u8":
            vs._arrays = empty._replace(
                data=jnp.asarray(z["data"]),
                sums=jnp.asarray(z["sums"]),
                mags=jnp.asarray(z["mags"]),
            )
        else:
            vs._arrays = empty._replace(
                data=jnp.asarray(z["data"]), mags=jnp.asarray(z["mags"])
            )
        vs._raw = jnp.asarray(z["raw"]) if "raw" in z.files else None
        vs.keep_raw = vs._raw is not None
        vs.n = int(meta["n"])
        idx.cap = cap
        idx.adj0 = jnp.asarray(z["adj0"])
        idx.adj0_d = jnp.asarray(z["adj0_d"])
        idx.up_adj = jnp.asarray(z["up_adj"])
        idx.cap_up = int(idx.up_adj.shape[0])
        idx.up_d = jnp.asarray(z["up_d"])
        idx.up_slot = jnp.asarray(z["up_slot"])
        idx.up_slot_host = np.asarray(z["up_slot"]).astype(np.int32)
        idx.levels = np.asarray(z["levels"])
        idx.alive = jnp.asarray(z["alive"])
        idx.n_up = int(meta["n_up"])
        idx.entry = int(meta["entry"])
        idx.entry_level = int(meta["entry_level"])
        idx.n_deleted = int(meta["n_deleted"])
        idx.level_counts = np.asarray(meta["level_counts"], np.int64)
        d.row_of = {int(k): int(v) for k, v in meta["row_of"]}
        d.internal_of = [int(x) for x in meta["internal_of"]]

    sparse_p = snap_dir / "sparse.msgpack"
    if sparse_p.exists() and coll.sparse is not None:
        with open(sparse_p, "rb") as f:
            data = msgpack.unpackb(f.read(), strict_map_key=False)
        s = coll.sparse
        s.values_upper_bound = data["upper_bound"]
        s.is_configured = data["configured"]
        s.n = data["n"]
        s.n_cap = data["n_cap"]
        s.n_docs = data["n_docs"]
        s.live_docs = data["live_docs"]
        s._raw_max = data["raw_max"]
        s.keep_raw = data["keep_raw"]
        s._sample = [
            (i, np.asarray(d, np.int64), np.asarray(v, np.float32))
            for i, d, v in data["sample"]
        ]
        z = np.load(snap_dir / "sparse.npz")
        s._h_keys = np.asarray(z["h_keys"], np.int64)
        s._h_ids = np.asarray(z["h_ids"], np.int32)
        s._h_buckets = np.asarray(z["h_buckets"], np.int32)
        s._alive = np.asarray(z["alive"], bool)
        s._has_doc = np.asarray(z["has_doc"], bool)
        s._raw_nnz = np.asarray(z["raw_nnz"], np.int32)
        s._raw_dims = np.asarray(z["raw_dims"], np.int64)
        s._raw_vals = np.asarray(z["raw_vals"], np.float32)
        s._alive_dev = None
        s._csr_ids = None
        s._csr_dirty = False
        s._pend_docs, s._pend_dims, s._pend_buckets = [], [], []
        s._rebuild_ranges()

    tf_p = snap_dir / "tfidf.msgpack"
    if tf_p.exists() and coll.tfidf is not None:
        from cosdata_tpu.indexes.tf_idf import _Postings

        with open(tf_p, "rb") as f:
            data = msgpack.unpackb(f.read(), strict_map_key=False)
        t = coll.tfidf
        t.average_document_length = data["avgdl"]
        t.is_configured = data["configured"]
        t.total_documents = data["total_documents"]
        t.live_documents = data.get("live_documents", t.total_documents)
        t.n = data["n"]
        t.n_cap = data["n_cap"]
        t._alive = np.asarray(data["alive"], bool)
        t._has_doc = (
            np.asarray(data["has_doc"], bool)
            if "has_doc" in data
            else np.ones(t.n_cap, bool)
        )
        t._alive_dev = None
        t._postings = {}
        t._tfs = {}
        for term, ids, tfs in data["postings"]:
            p = _Postings()
            p.ids = list(ids)
            t._postings[int(term)] = p
            t._tfs[int(term)] = list(tfs)
