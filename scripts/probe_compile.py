"""Time lower()+compile()+run of each bulk-build program, one process,
warmup once. Attributes the multi-minute finalize stall."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from cosdata_tpu.ops import hnsw_kernels as HK
from cosdata_tpu.ops import quantize as Q
from cosdata_tpu.utils.device import warmup_device

m, d = 64, 768
print(f"warmup {warmup_device():.1f}s", flush=True)

import functools

@functools.partial(jax.jit, static_argnames=("nk",))
def sort_probe(tgt, dd, ss, nk: int):
    return jax.lax.sort((tgt, dd, ss), dimension=0, num_keys=nk)

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

for e in (1 << 23, 1 << 26):
    probe(f"sort_{e>>20}M_2key", sort_probe,
          dict(tgt=jnp.zeros((e,), jnp.int32), dd=jnp.zeros((e,), jnp.float32),
               ss=jnp.zeros((e,), jnp.int32)), dict(nk=2))

def mk(cap):
    return dict(
        adj=jnp.full((cap, m), -1, jnp.int32),
        dist=jnp.full((cap, m), -1e30, jnp.float32),
        mem=jnp.arange(cap, dtype=jnp.int32),
    )

def mkstore(cap):
    return Q.QuantizedU8(
        jnp.zeros((cap, d), jnp.int8), jnp.zeros((cap,), jnp.int32),
        jnp.ones((cap,), jnp.float32), jnp.float32(1/255.), jnp.float32(-1.0),
        jnp.float32(d),
    )

kw = mk(131072)
kw.update(fwd_ids=jnp.zeros((131072, m), jnp.int32),
          fwd_d=jnp.zeros((131072, m), jnp.float32))
probe("rev_131k", HK.apply_forward_and_reverse, kw, dict(m=m))
kw = mk(1 << 20)
kw.update(fwd_ids=jnp.zeros((1 << 20, m), jnp.int32),
          fwd_d=jnp.zeros((1 << 20, m), jnp.float32))
probe("rev_1M", HK.apply_forward_and_reverse, kw, dict(m=m))
kw = mk(1 << 20)
kw["store"] = mkstore(1 << 20)
probe("nnd_1M", HK.nn_descent_round, kw,
      dict(metric="cosine", kind="u8", d=d, m=m, sample=8, node_chunk=256))
kw = mk(1 << 20)
probe("rev2_1M", HK.reverse_from_table, kw, dict(m=m))
print("PROBE_DONE", flush=True)
