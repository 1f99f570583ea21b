"""Decompose the flat-scan exact-rerank tier (VERDICT r5 ask #1).

prof_flat_stages.py r5: stage-1 scales to 45.5k qps at b4096 but the
rerank tier costs 52 ms (b1024) -> 353 ms (b4096) — superlinear, and the
whole b4096<b1024 inversion. This times the tier's sub-ops and candidate
fixes, per batch size:

- gather-only (random ids)          — is the row gather latency-bound?
- gather-only (contiguous ids)      — DMA bandwidth ceiling for the shape
- current full rerank               — gather + f32 cast + diag-dot + norms
- f16-kept rerank (f32 accum)       — halve gathered bytes materialized
- candidate-chunked rerank          — bound the live (B,kc,D) intermediate
- sorted-gather rerank              — locality: sort ids, invert after

Usage: python scripts/exp_r5_rerank.py [n] [reps]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax
import jax.numpy as jnp

from cosdata_tpu.ops.storage import _cos_or_dot, _diag_dot
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
d, kf = 768, 50

rng = np.random.default_rng(0)
raw = jnp.asarray(rng.normal(size=(n, d)).astype(np.float16))
jax.block_until_ready(raw)
print("raw resident", flush=True)


def timed(label, fn, reps=reps):
    fn()
    jax.block_until_ready(jnp.zeros(()))
    t0 = time.time()
    outs = [fn() for _ in range(reps)]
    jax.device_get(outs)
    dt = (time.time() - t0) / reps
    print(f"{label}: {dt*1000:.1f} ms/call", flush=True)
    return dt


@jax.jit
def gather_only(raw, ids):
    return raw[ids].astype(jnp.float32).sum()


@jax.jit
def rerank_current(raw, q, ids):
    cand = raw[ids].astype(jnp.float32)  # (B, K, D)
    dot = _diag_dot(q, cand, int8=False)
    qm = jnp.linalg.norm(q, axis=-1)
    cm = jnp.linalg.norm(cand, axis=-1)
    return _cos_or_dot("cosine", dot, qm, cm)


@jax.jit
def rerank_f16(raw, q, ids):
    cand = raw[ids]  # stay f16
    qh = q.astype(jnp.float16)
    b, k = ids.shape
    # grouped block-diag GEMM like _diag_dot but f16 in, f32 accum
    g = 8
    while b % g:
        g //= 2
    qg = qh.reshape(b // g, g, d)
    cg = cand.reshape(b // g, g * k, d)
    dots = jnp.einsum(
        "bgd,bkd->bgk", qg, cg, preferred_element_type=jnp.float32
    )
    idx = jnp.arange(g)[:, None] * k + jnp.arange(k)[None, :]
    dot = dots[:, jnp.arange(g)[:, None], idx].reshape(b, k)
    qm = jnp.linalg.norm(q, axis=-1)
    cm = jnp.sqrt(
        jnp.einsum("bkd,bkd->bk", cand, cand,
                   preferred_element_type=jnp.float32)
    )
    return _cos_or_dot("cosine", dot, qm, cm)


@functools.partial(jax.jit, static_argnames=("kc",))
def rerank_chunked(raw, q, ids, kc: int = 10):
    b, k = ids.shape
    qm = jnp.linalg.norm(q, axis=-1)

    def body(c, acc):
        sl = jax.lax.dynamic_slice_in_dim(ids, c * kc, kc, axis=1)
        cand = raw[sl].astype(jnp.float32)
        dot = _diag_dot(q, cand, int8=False)
        cm = jnp.linalg.norm(cand, axis=-1)
        sc = _cos_or_dot("cosine", dot, qm, cm)
        return jax.lax.dynamic_update_slice_in_dim(acc, sc, c * kc, axis=1)

    return jax.lax.fori_loop(
        0, k // kc, body, jnp.zeros((b, k), jnp.float32)
    )


@jax.jit
def rerank_sorted(raw, q, ids):
    b, k = ids.shape
    flat = ids.reshape(-1)
    order = jnp.argsort(flat)
    cand_s = raw[flat[order]].astype(jnp.float32)
    inv = jnp.argsort(order)
    cand = cand_s[inv].reshape(b, k, d)
    dot = _diag_dot(q, cand, int8=False)
    qm = jnp.linalg.norm(q, axis=-1)
    cm = jnp.linalg.norm(cand, axis=-1)
    return _cos_or_dot("cosine", dot, qm, cm)


for bsz in (1024, 4096):
    q = jnp.asarray(rng.normal(size=(bsz, d)).astype(np.float32))
    ids_r = jnp.asarray(rng.integers(0, n, size=(bsz, kf)).astype(np.int32))
    ids_c = jnp.asarray(
        (np.arange(bsz * kf, dtype=np.int32) % n).reshape(bsz, kf)
    )
    jax.block_until_ready((q, ids_r, ids_c))
    print(f"--- b{bsz} (kf={kf}) ---", flush=True)
    timed(f"b{bsz} rerank current", lambda: rerank_current(raw, q, ids_r))
    timed(f"b{bsz} rerank f16-kept", lambda: rerank_f16(raw, q, ids_r))
    timed(f"b{bsz} rerank sorted-gather", lambda: rerank_sorted(raw, q, ids_r))
    timed(f"b{bsz} rerank chunked(kc=10)", lambda: rerank_chunked(raw, q, ids_r))
    timed(f"b{bsz} gather random", lambda: gather_only(raw, ids_r))
    timed(f"b{bsz} gather contiguous", lambda: gather_only(raw, ids_c))
    # agreement check (ordering-critical: top-1 of each row)
    a = np.asarray(rerank_current(raw, q, ids_r))
    c = np.asarray(rerank_f16(raw, q, ids_r))
    print(
        f"b{bsz} f16 max-abs-diff: {np.abs(a - c).max():.5f} "
        f"top1 agree: {(a.argmax(1) == c.argmax(1)).mean():.4f}",
        flush=True,
    )
