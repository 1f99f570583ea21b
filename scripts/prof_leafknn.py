"""Decompose leaf-kNN per-leaf cost on the real device.

Times bare variants of the stages inside _leaf_knn_body at the 1M op point
(leaf=8192, kk=128, d=768, u8): int8 einsum, +mask, +approx_max_k vs
top_k, full leaf_knn_gather at 16 leaves.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu
import numpy as np, jax, jax.numpy as jnp
from cosdata_tpu.utils.device import warmup_device

print(f"warmup: {warmup_device():.1f}s", flush=True)

L, D, KK = 8192, 768, 128
rng = np.random.default_rng(0)
g = jnp.asarray(rng.integers(-127, 127, size=(1, L, D), dtype=np.int8))
s = jnp.asarray(rng.integers(-1000, 1000, size=(1, L)).astype(np.float32))
m = jnp.asarray(rng.uniform(0.5, 1.5, size=(1, L)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, 10**6, size=(1, L), dtype=np.int32))


def timeit(name, fn, *a):
    o = fn(*a); jax.block_until_ready(o)  # compile
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        o = fn(*a)
    jax.block_until_ready(o)
    print(f"{name}: {(time.time()-t0)/reps*1000:.1f} ms", flush=True)


@jax.jit
def just_mm(g):
    return jnp.einsum("...ad,...bd->...ab", g, g,
                      preferred_element_type=jnp.int32)

@jax.jit
def mm_f32(g):
    return jnp.einsum("...ad,...bd->...ab", g.astype(jnp.float32),
                      g.astype(jnp.float32))

@jax.jit
def mm_bf16(g):
    return jnp.einsum("...ad,...bd->...ab", g.astype(jnp.bfloat16),
                      g.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)

@jax.jit
def mm_mask(g, s, m, ids):
    cc = jnp.einsum("...ad,...bd->...ab", g, g,
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    cc = cc + s[..., :, None] + s[..., None, :]
    den = m[..., :, None] * m[..., None, :]
    sc = jnp.where(den > 1e-30, cc / den, 0.0)
    valid = ids >= 0
    col = jnp.arange(L)
    selfmask = col[:, None] == col[None, :]
    return jnp.where(valid[:, None, :] & ~selfmask[None], sc, -1e30)

@jax.jit
def mask_approx(g, s, m, ids):
    sc = mm_mask(g, s, m, ids)
    ts, pos = jax.lax.approx_max_k(sc, KK, recall_target=0.95)
    cand = jnp.broadcast_to(ids[:, None, :], (1, L, L))
    ti = jnp.take_along_axis(cand, pos, axis=2)
    return ti, ts

@jax.jit
def mask_exact(g, s, m, ids):
    sc = mm_mask(g, s, m, ids)
    ts, pos = jax.lax.top_k(sc, KK)
    cand = jnp.broadcast_to(ids[:, None, :], (1, L, L))
    ti = jnp.take_along_axis(cand, pos, axis=2)
    return ti, ts


timeit("int8 einsum (1,8192,768)^2", just_mm, g)
timeit("bf16 einsum", mm_bf16, g)
timeit("f32 einsum", mm_f32, g)
timeit("einsum+mask", mm_mask, g, s, m, ids)
timeit("einsum+mask+approx_max_k", mask_approx, g, s, m, ids)
timeit("einsum+mask+top_k", mask_exact, g, s, m, ids)

# full pipeline at 16 leaves through the real kernel
from cosdata_tpu.ops.storage import VectorStore
from cosdata_tpu.ops import hnsw_kernels as HK

n = 16 * L
x = rng.normal(size=(n, D)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
vs = VectorStore(dim=D, kind="u8", range=(-0.2, 0.2), keep_raw=False,
                 initial_capacity=n, ship_dtype="auto")
vs.add(x)
order = np.arange(n, dtype=np.int32).reshape(16, L)
pos_mem = np.arange(n, dtype=np.int32)

def run(lc):
    return HK.leaf_knn_gather("cosine", "u8", vs.dim_pad, KK, lc,
                              jnp.asarray(order), jnp.asarray(pos_mem),
                              vs._arrays)

for lc in (1, 2, 4):
    o = run(lc); jax.block_until_ready(o)
    t0 = time.time()
    o = run(lc); jax.block_until_ready(o)
    dt = time.time() - t0
    print(f"leaf_knn_gather 16 leaves lc={lc}: {dt:.2f}s = "
          f"{dt/16*1000:.1f} ms/leaf", flush=True)
