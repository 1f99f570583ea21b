"""Time lower()+compile()+run of each bulk-build finalize piece, one
process, warmup once. Bisects the multi-minute finalize compile stall:
both the monolithic 67M-edge reverse program AND the REV_SRC_CHUNK-chunked
variant sat in backend_compile_and_load >20 min at 1M x 64, so the blowup
is inside _reverse_edges_body — this isolates which op.

Usage: python scripts/probe_compile.py [piece ...]
pieces: sort scan scatter inc merge body chunked nnd  (default: all)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

import functools

import jax
import jax.numpy as jnp

from cosdata_tpu.ops import hnsw_kernels as HK
from cosdata_tpu.ops import quantize as Q
from cosdata_tpu.utils.device import warmup_device

NEG_INF = HK.NEG_INF
m, d = 64, 768
CAP = 1 << 20
E = (1 << 16) * m  # one REV_SRC_CHUNK of edges = 4.2M

print(f"warmup {warmup_device():.1f}s", flush=True)

pieces = set(sys.argv[1:]) or {
    "cummax",
    "sort", "scan", "scatter", "inc", "merge", "body", "chunked", "nnd"
}


def probe(name, fn, kwargs, statics):
    t0 = time.time()
    lowered = fn.lower(**kwargs, **statics)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = compiled(**kwargs)
    jax.block_until_ready(out)
    t3 = time.time()
    print(f"{name}: lower {t1-t0:.1f}s compile {t2-t1:.1f}s run {t3-t2:.2f}s",
          flush=True)


rng = np.random.default_rng(0)
tgt_np = rng.integers(0, CAP, E).astype(np.int32)
d_np = rng.uniform(0.0, 1.0, E).astype(np.float32)
s_np = rng.integers(0, CAP, E).astype(np.int32)

if "sort" in pieces:
    @jax.jit
    def sort_probe(tgt, dd, ss):
        return jax.lax.sort((tgt, -dd, ss), dimension=0, num_keys=2)

    probe("sort_4.2M_2key", sort_probe,
          dict(tgt=jnp.asarray(tgt_np), dd=jnp.asarray(d_np),
               ss=jnp.asarray(s_np)), {})

if "scan" in pieces:
    @jax.jit
    def scan_probe(tgt_s):
        pos = jnp.arange(E, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]]
        )
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, pos, 0)
        )
        return pos - seg_start

    probe("assoc_scan_4.2M", scan_probe, dict(tgt_s=jnp.asarray(tgt_np)), {})

if "cummax" in pieces:
    @jax.jit
    def cummax_probe(tgt_s):
        pos = jnp.arange(E, dtype=jnp.int32)
        first = jnp.concatenate(
            [jnp.ones((1,), bool), tgt_s[1:] != tgt_s[:-1]]
        )
        seg_start = jax.lax.cummax(jnp.where(first, pos, 0))
        return pos - seg_start

    probe("cummax_4.2M", cummax_probe, dict(tgt_s=jnp.asarray(tgt_np)), {})

if "scatter" in pieces or "inc" in pieces:
    @functools.partial(jax.jit, static_argnames=("g_cap",))
    def inc_probe(tgt_s, negd_s, s_s, rank, g_cap: int):
        keep = (rank < g_cap) & (tgt_s < CAP)
        pos = jnp.arange(E, dtype=jnp.int32)
        row_idx = jnp.where(keep, tgt_s, CAP + pos)
        col = jnp.minimum(rank, g_cap - 1)
        inc_ids = jnp.full((CAP, g_cap), -1, jnp.int32)
        inc_ids = inc_ids.at[row_idx, col].set(
            s_s, mode="drop", unique_indices=True
        )
        inc_d = jnp.full((CAP, g_cap), NEG_INF, jnp.float32)
        inc_d = inc_d.at[row_idx, col].set(
            -negd_s, mode="drop", unique_indices=True
        )
        return inc_ids, inc_d

    rank_np = rng.integers(0, 2 * m, E).astype(np.int32)
    probe("inc_scatter_4.2M", inc_probe,
          dict(tgt_s=jnp.asarray(tgt_np), negd_s=jnp.asarray(-d_np),
               s_s=jnp.asarray(s_np), rank=jnp.asarray(rank_np)),
          dict(g_cap=m))

if "merge" in pieces:
    @functools.partial(jax.jit, static_argnames=("mm",), donate_argnums=(0, 1))
    def merge_probe(adj, dist, inc_ids, inc_d, mm: int):
        chunk = 65536

        def body(c, carry):
            a, dd = carry
            start = c * chunk
            cur_i = jax.lax.dynamic_slice_in_dim(a, start, chunk)
            cur_d = jax.lax.dynamic_slice_in_dim(dd, start, chunk)
            ii = jax.lax.dynamic_slice_in_dim(inc_ids, start, chunk)
            id_ = jax.lax.dynamic_slice_in_dim(inc_d, start, chunk)
            dup = jnp.any(ii[:, :, None] == cur_i[:, None, :], axis=-1)
            id_ = jnp.where(dup, NEG_INF, id_)
            all_i = jnp.concatenate([cur_i, ii], axis=1)
            all_d = jnp.concatenate([cur_d, id_], axis=1)
            masked = jnp.where(all_i >= 0, all_d, NEG_INF)
            top_d, pos = jax.lax.top_k(masked, mm)
            top_i = jnp.take_along_axis(all_i, pos, axis=1)
            top_i = jnp.where(top_d > NEG_INF / 2, top_i, -1)
            a = jax.lax.dynamic_update_slice(a, top_i, (start, 0))
            dd = jax.lax.dynamic_update_slice(
                dd, jnp.where(top_i >= 0, top_d, NEG_INF), (start, 0)
            )
            return a, dd

        return jax.lax.fori_loop(0, CAP // chunk, body, (adj, dist))

    probe("merge_1M", merge_probe,
          dict(adj=jnp.full((CAP, m), -1, jnp.int32),
               dist=jnp.full((CAP, m), NEG_INF, jnp.float32),
               inc_ids=jnp.full((CAP, m), -1, jnp.int32),
               inc_d=jnp.full((CAP, m), NEG_INF, jnp.float32)),
          dict(mm=m))

if "body" in pieces:
    @functools.partial(jax.jit, static_argnames=("mm",), donate_argnums=(0, 1))
    def body_probe(adj, dist, src, fwd, fwd_d, mm: int):
        return HK._reverse_edges_body(adj, dist, src, fwd, fwd_d, mm, mm)

    probe("body_65k_src_1M_tbl", body_probe,
          dict(adj=jnp.full((CAP, m), -1, jnp.int32),
               dist=jnp.full((CAP, m), NEG_INF, jnp.float32),
               src=jnp.arange(1 << 16, dtype=jnp.int32),
               fwd=jnp.asarray(tgt_np.reshape(1 << 16, m)),
               fwd_d=jnp.asarray(d_np.reshape(1 << 16, m))),
          dict(mm=m))

if "chunked" in pieces:
    probe("apply_fwd_rev_1M_chunked", HK.apply_forward_and_reverse,
          dict(adj=jnp.full((CAP, m), -1, jnp.int32),
               dist=jnp.full((CAP, m), NEG_INF, jnp.float32),
               mem=jnp.arange(CAP, dtype=jnp.int32),
               fwd_ids=jnp.asarray(
                   rng.integers(0, CAP, (CAP, m)).astype(np.int32)),
               fwd_d=jnp.asarray(
                   rng.uniform(0, 1, (CAP, m)).astype(np.float32))),
          dict(m=m))

if "nnd" in pieces:
    store = Q.QuantizedU8(
        jnp.zeros((CAP, d), jnp.int8), jnp.zeros((CAP,), jnp.int32),
        jnp.ones((CAP,), jnp.float32), jnp.float32(1 / 255.0),
        jnp.float32(-1.0), jnp.float32(d),
    )
    probe("nn_descent_1M", HK.nn_descent_round,
          dict(adj=jnp.full((CAP, m), -1, jnp.int32),
               dist=jnp.full((CAP, m), NEG_INF, jnp.float32),
               mem=jnp.arange(CAP, dtype=jnp.int32), store=store),
          dict(metric="cosine", kind="u8", d=d, m=m, sample=8,
               node_chunk=256))

print("PROBE_DONE", flush=True)
