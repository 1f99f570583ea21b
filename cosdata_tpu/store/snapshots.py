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
import jax
import jax.numpy as jnp

from cosdata_tpu.ops.topk import NEG_INF


def _fsync_dir(path: Path) -> None:
    """Make a rename durable: the dirent must hit disk too."""
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _atomic_write(path: Path, data: bytes):
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path.parent)


def _save_npz(path: Path, arrays: dict):
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    # fsync BEFORE the rename: a power loss must not leave a durable
    # msgpack pointing at a torn npz (np.savez does not sync)
    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(path.parent)


def _dense_rows_state(coll):
    d = coll.dense
    if d is None:
        return None
    return {
        "gen": getattr(d, "_gen", 0),
        "internal_of": list(d.internal_of),
        "field_rows": {f: list(v) for f, v in d.field_rows.items()},
    }


def _save_maps(coll, snap_dir: Path, archive: bool = False) -> None:
    """Incremental id-map persistence: a compacted ``maps.msgpack`` base +
    an append-only ``maps.log`` of per-commit deltas (the design role of the
    reference's TreeMap dim/data files, tree_map.rs:22-665). A commit of a
    small batch appends O(batch) bytes; the base is rewritten only when the
    log outgrows it. ``archive=True`` (version-context history dirs) always
    writes a standalone full base."""
    base_p = snap_dir / "maps.msgpack"
    log_p = snap_dir / "maps.log"
    deltas = getattr(coll, "_map_log", None)
    d = coll.dense
    saved = getattr(coll, "_maps_saved", None)
    can_increment = (
        not archive
        and base_p.exists()
        and deltas is not None
        and saved is not None
        and (d is None or saved.get("dense_gen") == getattr(d, "_gen", 0))
    )
    if can_increment:
        frame = {"ops": deltas}
        new_mark = saved.get("dense_mark", 0)
        if d is not None:
            mark = saved.get("dense_mark", 0)
            new_mark = len(d.internal_of)
            if new_mark > mark:
                frame["drows"] = {
                    "internal_of": list(d.internal_of[mark:]),
                    "field_rows": {
                        f: list(v[mark:]) for f, v in d.field_rows.items()
                    },
                }
        if frame["ops"] or "drows" in frame:
            with open(log_p, "ab") as f:
                f.write(msgpack.packb(frame))
                f.flush()
                os.fsync(f.fileno())
        # advance the mark only AFTER the frame is durably appended — an
        # ENOSPC mid-append must not permanently drop these rows from
        # every future incremental frame
        if d is not None:
            saved["dense_mark"] = new_mark
        coll._map_log = []
        log_sz = log_p.stat().st_size if log_p.exists() else 0
        if log_sz <= max(base_p.stat().st_size, 1 << 20):
            return
    maps = {
        "etoi": list(coll.etoi.items()),
        "dtoi": list(coll.dtoi.items()),
        "raw": list(coll.raw.items()),
        "next_internal": coll.next_internal,
        "dense_rows": _dense_rows_state(coll),
    }
    _atomic_write(base_p, msgpack.packb(maps))
    log_p.unlink(missing_ok=True)
    if not archive:
        if deltas is not None:
            coll._map_log = []
        coll._maps_saved = {
            "dense_gen": getattr(d, "_gen", 0) if d is not None else None,
            "dense_mark": len(d.internal_of) if d is not None else 0,
        }


def _save_one_dense(idx, snap_dir: Path, configured_range: list) -> None:
    """Persist one HNSWIndex (+ its VectorStore) into ``snap_dir``."""
    from cosdata_tpu.store.chunked import save_chunked

    vs = idx.store
    scan_only = bool(getattr(idx, "scan_only", False))
    # big row-major arrays: dirty-chunk writes (clean chunks never
    # leave the device); small per-row scalars ride one npz.
    # scan-only indexes (spilled past HBM, or hamming) carry DUMMY (1, m)
    # adjacency — persisting it would make the load derive a capacity of 1
    # and serve garbage after restart (ADVICE r3 high); skip the graph.
    if not scan_only:
        save_chunked(snap_dir, "adj0", idx.adj0, idx.tracker.view("adj0"))
        save_chunked(snap_dir, "adj0_d", idx.adj0_d, idx.tracker.view("adj0"))
        save_chunked(snap_dir, "up_adj", idx.up_adj, idx.tracker.view("up"))
        save_chunked(snap_dir, "up_d", idx.up_d, idx.tracker.view("up"))
    st = vs.tracker.view("rows")
    if vs.kind == "subbyte":
        save_chunked(snap_dir, "planes", vs._arrays.planes, st, axis=1)
    else:
        save_chunked(snap_dir, "data", vs._arrays.data, st)
    if vs._raw is not None:
        save_chunked(snap_dir, "raw", vs._raw, st)
    elif getattr(vs, "_raw_host", None) is not None:
        save_chunked(snap_dir, "raw_host", vs._raw_host, st)
    alive_host = getattr(idx, "_alive_host", None)
    arrays = {
        "levels": idx.levels,
        # spilled indexes keep tombstones in a host mirror; the device
        # `alive` is a (1,) dummy there
        "alive": alive_host if (scan_only and alive_host is not None) else idx.alive,
        "mags": vs._arrays.mags,
    }
    if not scan_only:
        arrays["up_slot"] = idx.up_slot
    if vs.kind in ("u8", "subbyte"):
        arrays["sums"] = vs._arrays.sums
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
        "configured_range": configured_range,
        # the resolved ingest wire path ("u8"/"f16"/"f32"): pinned so a
        # collection never mixes host- and device-quantized codes when
        # later sessions probe a different link speed
        "ship_dtype": vs.ship_dtype,
        # beyond-HBM state: capacity can no longer be derived from adj0
        # (not saved when scan_only), and the load must re-enter the
        # spilled tier instead of re-materializing codes on device
        "capacity": int(vs.capacity),
        "codes_on_host": bool(vs.codes_on_host),
        "scan_only": scan_only,
        "raw_dtype": vs.raw_dtype,
    }
    _atomic_write(snap_dir / "dense.msgpack", msgpack.packb(meta))
    # invariant: every mutation AFTER this save must mark its chunks at
    # an epoch strictly above anything just recorded, or the next save
    # would skip it (markers record the tracker's *current* epoch)
    idx.tracker.bump()
    vs.tracker.bump()


def _save_sharded_dense(d, snap_dir: Path) -> None:
    """Sharded dense engine: one sub-snapshot per shard + a manifest with
    the global<->local row maps. Per-shard files keep the same layout as
    the single-index snapshot, so each shard round-trips through the same
    save/load helpers (the multi-chip analog of the reference's
    per-file-id index regions, offset_counter.rs:70-77)."""
    idx = d.index
    for s, shard in enumerate(idx.shards):
        sub = snap_dir / f"dense_shard{s}"
        sub.mkdir(parents=True, exist_ok=True)
        _save_one_dense(shard, sub, list(d.range))
    manifest = {
        "n_shards": len(idx.shards),
        "n": idx.n,
        "global_of": [list(map(int, g)) for g in idx._global_of],
        "configured_range": list(d.range),
    }
    _atomic_write(snap_dir / "dense_sharded.msgpack", msgpack.packb(manifest))


def save_collection_state(coll, snap_dir: str | Path, archive: bool = False) -> None:
    """Persist collection state into ``snap_dir``. ``archive=True`` marks a
    one-shot version-context history dir (always full, self-contained)."""
    from cosdata_tpu.store.chunked import save_chunked

    snap_dir = Path(snap_dir)
    snap_dir.mkdir(parents=True, exist_ok=True)

    _save_maps(coll, snap_dir, archive=archive)

    if coll.dense is not None and coll.dense.index is not None:
        d = coll.dense
        if getattr(d.index, "is_sharded", False):
            _save_sharded_dense(d, snap_dir)
        else:
            _save_one_dense(d.index, snap_dir, list(d.range))

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
        # write order matters for crash consistency: chunked arrays and the
        # npz FIRST, the msgpack manifest LAST — loaders key on the
        # manifest, so a crash mid-save must never leave a manifest whose
        # data files are missing (the dense section uses the same order)
        _save_npz(
            snap_dir / "sparse.npz",
            {
                "alive": s._alive,
                "has_doc": s._has_doc,
                "raw_nnz": s._raw_nnz,
            },
        )
        csr_t = s.tracker.view("csr")
        save_chunked(snap_dir, "sp_keys", s._h_keys, csr_t)
        save_chunked(snap_dir, "sp_ids", s._h_ids, csr_t)
        save_chunked(snap_dir, "sp_buckets", s._h_buckets, csr_t)
        raw_t = s.tracker.view("raw")
        save_chunked(snap_dir, "sp_raw_dims", s._raw_dims, raw_t)
        save_chunked(snap_dir, "sp_raw_vals", s._raw_vals, raw_t)
        s.tracker.bump()  # see the dense-section invariant note
        _atomic_write(snap_dir / "sparse.msgpack", msgpack.packb(data))

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


def _replay_map_log(coll, dense_rows, log_p: Path):
    """Apply maps.log frames on top of the loaded base."""
    with open(log_p, "rb") as f:
        unpacker = msgpack.Unpacker(f, strict_map_key=False)
        for frame in unpacker:
            for op in frame.get("ops", []):
                if op[0] == "u":
                    _, iid, rec = op
                    iid = int(iid)
                    ext = rec["id"]
                    old = coll.etoi.get(ext)
                    if old is not None and old != iid:
                        coll.itoe.pop(old, None)
                        old_rec = coll.raw.pop(old, None)
                        if old_rec and old_rec.get("document_id") is not None:
                            lst = coll.dtoi.get(old_rec["document_id"], [])
                            if old in lst:
                                lst.remove(old)
                    coll.etoi[ext] = iid
                    coll.itoe[iid] = ext
                    coll.raw[iid] = rec
                    if rec.get("document_id") is not None:
                        coll.dtoi.setdefault(rec["document_id"], []).append(iid)
                    coll.next_internal = max(coll.next_internal, iid + 1)
                else:  # ("d", iid, ext)
                    _, iid, ext = op
                    iid = int(iid)
                    coll.etoi.pop(ext, None)
                    coll.itoe.pop(iid, None)
                    rec = coll.raw.pop(iid, None)
                    if rec and rec.get("document_id") is not None:
                        lst = coll.dtoi.get(rec["document_id"], [])
                        if iid in lst:
                            lst.remove(iid)
            drows = frame.get("drows")
            if drows is not None and dense_rows is not None:
                dense_rows["internal_of"].extend(drows["internal_of"])
                for fld, vals in drows["field_rows"].items():
                    base_len = len(dense_rows["internal_of"]) - len(vals)
                    cur = dense_rows["field_rows"].setdefault(
                        fld, [-1] * base_len
                    )
                    cur.extend(vals)
    return dense_rows


def _load_one_dense(idx, snap_dir: Path, keep_raw_mode, meta=None) -> dict:
    """Load one HNSWIndex (+ VectorStore) from a dir written by
    _save_one_dense. Returns the parsed meta."""
    from cosdata_tpu.store.chunked import adopt_tracker, load_chunked

    if meta is None:
        with open(snap_dir / "dense.msgpack", "rb") as f:
            meta = msgpack.unpackb(f.read(), strict_map_key=False)
    z = np.load(snap_dir / "dense.npz")
    adj0 = load_chunked(snap_dir, "adj0")
    vs = idx.store
    scan_only = bool(meta.get("scan_only"))
    codes_on_host = bool(meta.get("codes_on_host"))
    if meta.get("capacity"):
        cap = int(meta["capacity"])
    else:  # pre-capacity snapshot layout: adj0 always existed
        cap = int(adj0.shape[0])
    # rebuild the store at snapshot capacity
    vs.capacity = cap
    vs.range = tuple(meta["range"])
    if meta.get("raw_dtype"):
        vs.raw_dtype = meta["raw_dtype"]
    if codes_on_host:
        # beyond-HBM tier: codes stay HOST-resident (re-materializing them
        # as device arrays is exactly the allocation the spill avoided)
        from cosdata_tpu.ops import quantize as Q

        lo, hi = vs.range
        if meta["kind"] == "subbyte":
            step = np.float32(2.0 / (1 << vs.resolution))
            vs._arrays = Q.QuantizedSubByte(
                np.asarray(load_chunked(snap_dir, "planes"), np.uint32),
                np.asarray(z["sums"], np.int32),
                np.asarray(z["mags"], np.float32),
                step,
                np.float32(step / 2.0 - 1.0),
                np.float32(vs.dim),
            )
        else:
            vs._arrays = Q.QuantizedU8(
                np.asarray(load_chunked(snap_dir, "data"), np.int8),
                np.asarray(z["sums"], np.int32),
                np.asarray(z["mags"], np.float32),
                np.float32((hi - lo) / 255.0),
                np.float32(lo),
                np.float32(vs.dim),
            )
        vs.codes_on_host = True
    else:
        empty = vs._empty(cap)  # rebuilds the dequant scalars from range/dim
        if meta["kind"] == "subbyte":
            vs._arrays = empty._replace(
                planes=jnp.asarray(load_chunked(snap_dir, "planes")),
                sums=jnp.asarray(z["sums"]),
                mags=jnp.asarray(z["mags"]),
            )
        elif meta["kind"] == "u8":
            vs._arrays = empty._replace(
                data=jnp.asarray(load_chunked(snap_dir, "data")),
                sums=jnp.asarray(z["sums"]),
                mags=jnp.asarray(z["mags"]),
            )
        else:
            vs._arrays = empty._replace(
                data=jnp.asarray(load_chunked(snap_dir, "data")),
                mags=jnp.asarray(z["mags"]),
            )
    raw_np = load_chunked(snap_dir, "raw")
    vs._raw = jnp.asarray(raw_np) if raw_np is not None else None
    del raw_np
    if keep_raw_mode == "disk":
        # preserve the beyond-RAM tier: stream chunks straight into a
        # fresh memmap instead of materializing GBs in host RAM
        def _disk_dest(shape, dtype):
            # replace (and unlink) the memmap the store constructor
            # just allocated — every load would otherwise orphan one
            # cosdata_raw_*.f32 temp file forever
            stale = getattr(vs, "_raw_path", None)
            mm = vs._new_memmap(int(shape[0]))
            if stale and stale != vs._raw_path:
                try:
                    os.unlink(stale)
                except OSError:
                    pass
            return mm

        vs._raw_host = load_chunked(
            snap_dir, "raw_host", out_factory=_disk_dest
        )
        if isinstance(vs._raw_host, np.memmap):
            vs._raw_host.flush()
    else:
        vs._raw_host = load_chunked(snap_dir, "raw_host")
    if vs._raw is not None:
        vs.keep_raw = True
    elif vs._raw_host is not None:
        vs.keep_raw = "disk" if keep_raw_mode == "disk" else "host"
    else:
        vs.keep_raw = False
    vs.n = int(meta["n"])
    if meta.get("ship_dtype"):
        # honor the path the existing codes were produced by (see save)
        vs.ship_dtype = meta["ship_dtype"]
    idx.cap = cap
    if scan_only:
        # re-enter the spilled/scan-only state: dummy device adjacency
        # (freed with the graph at spill time), tombstones on host
        p = idx.params
        idx.scan_only = True
        idx.adj0 = jnp.full((1, p.level_0_neighbors_count), -1, jnp.int32)
        idx.adj0_d = jnp.full(
            (1, p.level_0_neighbors_count), NEG_INF, jnp.float32
        )
        idx.up_adj = jnp.full(
            (1, p.num_layers, p.neighbors_count), -1, jnp.int32
        )
        idx.up_d = jnp.full(
            (1, p.num_layers, p.neighbors_count), NEG_INF, jnp.float32
        )
        idx.cap_up = 1
        idx.up_slot = jnp.full((1,), -1, jnp.int32)
        idx.up_slot_host = np.full((cap,), -1, np.int32)
        idx._alive_host = np.asarray(z["alive"], bool)
        idx.alive = jnp.ones((1,), bool)
    else:
        idx.adj0 = jnp.asarray(adj0)
        idx.adj0_d = jnp.asarray(load_chunked(snap_dir, "adj0_d"))
        idx.up_adj = jnp.asarray(load_chunked(snap_dir, "up_adj"))
        idx.cap_up = int(idx.up_adj.shape[0])
        idx.up_d = jnp.asarray(load_chunked(snap_dir, "up_d"))
        idx.up_slot = jnp.asarray(z["up_slot"])
        idx.up_slot_host = np.asarray(z["up_slot"]).astype(np.int32)
        idx.alive = jnp.asarray(z["alive"])
    idx.levels = np.asarray(z["levels"])
    idx.n_up = int(meta["n_up"])
    idx.entry = int(meta["entry"])
    idx.entry_level = int(meta["entry_level"])
    idx.n_deleted = int(meta["n_deleted"])
    idx.level_counts = np.asarray(meta["level_counts"], np.int64)
    if not scan_only:
        adopt_tracker(
            snap_dir, idx.tracker, ["adj0", "adj0_d", "up_adj", "up_d"]
        )
    store_names = ["planes" if meta["kind"] == "subbyte" else "data"]
    if vs._raw is not None:
        store_names.append("raw")
    adopt_tracker(snap_dir, vs.tracker, store_names)
    return meta


def load_collection_state(coll, snap_dir: str | Path) -> None:
    snap_dir = Path(snap_dir)
    maps_path = snap_dir / "maps.msgpack"
    dense_rows = None
    if maps_path.exists():
        with open(maps_path, "rb") as f:
            maps = msgpack.unpackb(f.read(), strict_map_key=False)
        coll.etoi = {k: v for k, v in maps["etoi"]}
        coll.itoe = {v: k for k, v in maps["etoi"]}
        coll.dtoi = {k: list(v) for k, v in maps["dtoi"]}
        coll.raw = {int(k): v for k, v in maps["raw"]}
        coll.next_internal = maps["next_internal"]
        dense_rows = maps.get("dense_rows")
        if dense_rows is not None:
            dense_rows = {
                "gen": dense_rows["gen"],
                "internal_of": list(dense_rows["internal_of"]),
                "field_rows": {
                    f: list(v) for f, v in dense_rows["field_rows"].items()
                },
            }
        log_p = snap_dir / "maps.log"
        if log_p.exists():
            dense_rows = _replay_map_log(coll, dense_rows, log_p)

    sharded_p = snap_dir / "dense_sharded.msgpack"
    if sharded_p.exists() and coll.dense is not None:
        with open(sharded_p, "rb") as f:
            manifest = msgpack.unpackb(f.read(), strict_map_key=False)
        d = coll.dense
        shard0_meta_p = snap_dir / "dense_shard0" / "dense.msgpack"
        with open(shard0_meta_p, "rb") as f:
            meta0 = msgpack.unpackb(f.read(), strict_map_key=False)
        d.kind = meta0["kind"]
        d.resolution = meta0["resolution"]
        d.range = tuple(manifest["configured_range"])
        d.shards = int(manifest["n_shards"])
        d._build()
        idx = d.index
        alive_parts = []
        for s, shard in enumerate(idx.shards):
            # commit each shard's arrays to ITS device — without the
            # default_device scope every shard loads onto device 0 and
            # the restored engine serves single-device (ADVICE r3 medium)
            with jax.default_device(idx.devices[s]):
                _load_one_dense(shard, snap_dir / f"dense_shard{s}", d.keep_raw)
            a_host = getattr(shard, "_alive_host", None)
            alive_parts.append(
                np.asarray(a_host if shard.scan_only and a_host is not None
                           else shard.alive)[: shard.n]
            )
        idx.n = int(manifest["n"])
        idx._global_of = [list(map(int, g)) for g in manifest["global_of"]]
        idx._loc_of = {
            int(g): (s, j)
            for s, lst in enumerate(idx._global_of)
            for j, g in enumerate(lst)
        }
        idx.scan_only = idx.shards[0].scan_only
        if dense_rows is not None:
            d._gen = int(dense_rows["gen"])
            d.internal_of = [int(x) for x in dense_rows["internal_of"]]
            d.field_rows = {
                f: [int(x) for x in v]
                for f, v in dense_rows["field_rows"].items()
            }
            # global alive: shard-local tombstones mapped to global rows
            alive_g = np.ones(max(idx.n, len(d.internal_of)), bool)
            for s, lst in enumerate(idx._global_of):
                if lst:
                    alive_g[np.asarray(lst, np.int64)] = alive_parts[s][
                        : len(lst)
                    ]
            d.row_of = {
                int(iid): r
                for r, iid in enumerate(d.internal_of)
                if r < len(alive_g) and alive_g[r]
            }

    dense_meta_p = snap_dir / "dense.msgpack"
    if dense_meta_p.exists() and coll.dense is not None:
        with open(dense_meta_p, "rb") as f:
            meta = msgpack.unpackb(f.read(), strict_map_key=False)
        d = coll.dense
        d.kind = meta["kind"]
        d.resolution = meta["resolution"]
        d.range = tuple(meta["configured_range"])
        d._build()
        idx = d.index
        _load_one_dense(idx, snap_dir, d.keep_raw, meta=meta)
        z = np.load(snap_dir / "dense.npz")
        if dense_rows is None and "internal_of" in meta:
            # pre-dense_rows snapshot layout kept the row maps in
            # dense.msgpack — honor it so older data dirs still load
            dense_rows = {
                "gen": meta.get("gen", 0),
                "internal_of": meta["internal_of"],
                "field_rows": meta.get("field_rows", {}),
            }
        if dense_rows is not None:
            d._gen = int(dense_rows["gen"])
            d.internal_of = [int(x) for x in dense_rows["internal_of"]]
            d.field_rows = {
                f: [int(x) for x in v]
                for f, v in dense_rows["field_rows"].items()
            }
            alive_np = np.asarray(z["alive"])
            d.row_of = {
                int(iid): r
                for r, iid in enumerate(d.internal_of)
                if alive_np[r]
            }
        # _maps_saved is set once at the end of this function (all kinds)

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
        from cosdata_tpu.store.chunked import adopt_tracker, load_chunked

        z = np.load(snap_dir / "sparse.npz")
        s._h_keys = np.asarray(load_chunked(snap_dir, "sp_keys"), np.int64)
        s._h_ids = np.asarray(load_chunked(snap_dir, "sp_ids"), np.int32)
        s._h_buckets = np.asarray(
            load_chunked(snap_dir, "sp_buckets"), np.int32
        )
        s._alive = np.asarray(z["alive"], bool)
        s._has_doc = np.asarray(z["has_doc"], bool)
        s._raw_nnz = np.asarray(z["raw_nnz"], np.int32)
        s._raw_dims = np.asarray(load_chunked(snap_dir, "sp_raw_dims"), np.int64)
        s._raw_vals = np.asarray(
            load_chunked(snap_dir, "sp_raw_vals"), np.float32
        )
        adopt_tracker(
            snap_dir,
            s.tracker,
            ["sp_keys", "sp_ids", "sp_buckets", "sp_raw_dims", "sp_raw_vals"],
        )
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
    # incremental-maps bookkeeping for EVERY collection kind: without it a
    # sparse-/tfidf-only collection's first commit after restart rewrites
    # the whole maps base instead of appending an O(batch) frame
    d = coll.dense
    coll._maps_saved = {
        "dense_gen": getattr(d, "_gen", 0) if d is not None else None,
        "dense_mark": len(d.internal_of) if d is not None else 0,
    }
