import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cosdata_tpu
import numpy as np, jax, jax.numpy as jnp
from cosdata_tpu.core.collection import tune_dense_range
from cosdata_tpu.indexes import hnsw as H
from cosdata_tpu.indexes.hnsw import HNSWIndex, HNSWParams

n, d = 65536, 768
rng = np.random.default_rng(0)
nc = n // 100
centers = rng.normal(size=(nc, d)).astype(np.float32)
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
noise = 0.5/np.sqrt(d)
x = centers[rng.integers(0, nc, n)] + noise*rng.normal(size=(n,d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
r = tune_dense_range(x[:1000])

def patched(self, members, m_l, level):
    from cosdata_tpu.ops.topk import NEG_INF
    from cosdata_tpu.ops import hnsw_kernels as HK
    import jax.numpy as jnp
    p = self.params
    T = lambda: time.time()
    def tick(name, t0, *arrs):
        for a in arrs: jax.block_until_ready(a)
        print(f"    L{level} {name}: {time.time()-t0:.2f}s", flush=True)
    n_mem = len(members)
    kk = min(2*m_l, self.RP_LEAF - 1)
    trees = self.RP_TREES if n_mem > self.RP_LEAF else 1
    kind = self._kind()
    parts_i, parts_s = [], []
    for t in range(trees):
        t0=T(); order = self._rp_order(members, self.RP_LEAF, seed=101+31*t+level); tick("rp_order", t0)
        l_sz = order.shape[1]
        leaf_chunk = max(1, (1<<26)//max(l_sz*l_sz,1))
        t0=T(); ids_t, sc_t = HK.leaf_knn(self.store.metric, kind, self.store.dim_pad, min(kk, l_sz-1), leaf_chunk, jnp.asarray(order), self.store._arrays); tick("leaf_knn", t0, ids_t)
        t0=T()
        flat = order.reshape(-1); valid = flat >= 0
        pos = np.zeros(self.cap, np.int64); pos[flat[valid]] = np.flatnonzero(valid)
        pos_mem = jnp.asarray(pos[members], jnp.int32)
        kk_t = ids_t.shape[-1]
        ids_m = ids_t.reshape(-1, kk_t)[pos_mem]; sc_m = sc_t.reshape(-1, kk_t)[pos_mem]
        if kk_t < kk:
            ids_m = jnp.pad(ids_m, ((0,0),(0,kk-kk_t)), constant_values=-1)
            sc_m = jnp.pad(sc_m, ((0,0),(0,kk-kk_t)), constant_values=NEG_INF)
        parts_i.append(ids_m); parts_s.append(sc_m)
        tick("gather_assemble", t0, ids_m)
    t0=T()
    cand_mem = parts_i[0] if trees==1 else jnp.concatenate(parts_i, axis=1)
    sc_mem = parts_s[0] if trees==1 else jnp.concatenate(parts_s, axis=1)
    mem_dev = jnp.asarray(members.astype(np.int32))
    tick("concat", t0, cand_mem)
    t0=T(); fwd_ids, fwd_d = H._prune_candidates(self.store.metric, kind, self.store.dim_pad, m_l, 1024, p.neighbor_selection=="heuristic", mem_dev, cand_mem, sc_mem, self.store._arrays); tick("prune", t0, fwd_ids)
    if level == 0:
        t0=T()
        self.adj0 = self.adj0.at[mem_dev].set(fwd_ids)
        self.adj0_d = self.adj0_d.at[mem_dev].set(fwd_d)
        tick("fwd_write", t0, self.adj0)
        t0=T(); self.adj0, self.adj0_d = HK.apply_reverse_edges(self.adj0, self.adj0_d, mem_dev, fwd_ids, fwd_d, m_l, m_l); tick("reverse", t0, self.adj0)
        for _ in range(self.NN_DESCENT_ROUNDS):
            t0=T(); self.adj0, self.adj0_d = HK.nn_descent_round(self.store.metric, kind, self.store.dim_pad, m_l, 16, 256, mem_dev, self.adj0, self.adj0_d, self.store._arrays); tick("nn_descent", t0, self.adj0)
            t0=T(); self.adj0, self.adj0_d = HK.apply_reverse_edges(self.adj0, self.adj0_d, mem_dev, self.adj0[mem_dev], self.adj0_d[mem_dev], m_l, m_l); tick("reverse2", t0, self.adj0)
    else:
        t0=T()
        slots = jnp.asarray(self.up_slot_host[members])
        adj_l = self.up_adj[:, level-1]; dist_l = self.up_d[:, level-1]
        adj_l = adj_l.at[slots].set(fwd_ids); dist_l = dist_l.at[slots].set(fwd_d)
        tick("slot_write", t0, adj_l)
        t0=T()
        tgt_slots = jnp.where(fwd_ids >= 0, self.up_slot[jnp.maximum(fwd_ids,0)], -1)
        tick("tgt_slots", t0, tgt_slots)
        t0=T(); adj_l, dist_l = HK.apply_reverse_edges(adj_l, dist_l, mem_dev, tgt_slots, fwd_d, m_l, m_l); tick("reverse", t0, adj_l)
        t0=T()
        self.up_adj = self.up_adj.at[:, level-1].set(adj_l)
        self.up_d = self.up_d.at[:, level-1].set(dist_l)
        tick("up_write", t0, self.up_adj)
HNSWIndex._bulk_level_rp = patched

idx = HNSWIndex(dim=d, kind="u8", range_=r, params=HNSWParams(), seed=3, initial_capacity=n)
# warm the down-channel first so the first tick isn't polluted
_ = np.asarray(jnp.zeros((8,)))
t0=time.time(); idx.add(x); print(f"TOTAL: {time.time()-t0:.1f}s", flush=True)
