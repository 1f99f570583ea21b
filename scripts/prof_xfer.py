import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu  # enables compile cache
import numpy as np, jax, jax.numpy as jnp

for mb in (8, 64, 192):
    x = np.random.rand(mb * 1024 * 1024 // 4).astype(np.float32)
    t0 = time.time(); d = jnp.asarray(x); jax.block_until_ready(d)
    up = time.time() - t0
    t0 = time.time(); _ = np.asarray(d)
    down = time.time() - t0
    print(f"{mb} MB: up {mb/up:.1f} MB/s ({up:.2f}s)  down {mb/down:.1f} MB/s ({down:.2f}s)", flush=True)
# int8 up
x8 = np.random.randint(0, 127, 192*1024*1024, dtype=np.int8)
t0 = time.time(); d = jnp.asarray(x8); jax.block_until_ready(d)
print(f"192 MB int8: up {192/(time.time()-t0):.1f} MB/s", flush=True)
# quantize on device steady
q = jax.jit(lambda v: jnp.clip((v*127), -127, 127).astype(jnp.int8))
xd = jnp.asarray(np.random.rand(65536, 768).astype(np.float32))
jax.block_until_ready(q(xd))
t0=time.time(); jax.block_until_ready(q(xd)); print(f"quantize 65k on-dev: {time.time()-t0:.3f}s", flush=True)
