import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu
import numpy as np, jax, jax.numpy as jnp
from cosdata_tpu.ops.storage import VectorStore

n, d = 65536, 768
x = np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)

vs = VectorStore(dim=d, kind="u8", metric="cosine", range=(-1,1), keep_raw=True, initial_capacity=n)
t0 = time.time()
xj = vs._pad_dims(x); jax.block_until_ready(xj)
print(f"pad+up transfer: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
qb = vs._quantize(xj); jax.block_until_ready(qb)
print(f"quantize: {time.time()-t0:.2f}s", flush=True)
from cosdata_tpu.ops.storage import _write_rows
t0 = time.time()
arr = _write_rows(vs._arrays, qb, 0, "u8"); jax.block_until_ready(arr)
print(f"write_rows: {time.time()-t0:.2f}s", flush=True)
t0 = time.time()
raw2 = jax.lax.dynamic_update_slice(vs._raw, xj, (0, 0)); jax.block_until_ready(raw2)
print(f"raw update: {time.time()-t0:.2f}s", flush=True)
# full store.add on a fresh store
vs2 = VectorStore(dim=d, kind="u8", metric="cosine", range=(-1,1), keep_raw=True, initial_capacity=n)
t0 = time.time(); vs2.add(x)
jax.block_until_ready(vs2._arrays.data)
print(f"store.add total: {time.time()-t0:.2f}s", flush=True)
