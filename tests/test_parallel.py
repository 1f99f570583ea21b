"""Sharded search on the virtual 8-device CPU mesh (SURVEY.md §4 (d))."""

import numpy as np
import jax
import pytest

from cosdata_tpu.parallel.sharded import ShardedFlatIndex, make_mesh


def _unit(n, d, seed):
    x = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests require the 8-device CPU mesh"
    return make_mesh(8)  # dp=4, tp=2


class TestShardedFlat:
    def test_matches_single_device_bruteforce(self, mesh):
        d, n, nq, k = 64, 512, 16, 10
        x = _unit(n, d, 0)
        q = _unit(nq, d, 1)
        idx = ShardedFlatIndex(mesh, dim=d, capacity=1024)
        idx.add(x)
        ids, vals = idx.search(q, top_k=k)

        true = (q @ x.T) / (
            np.linalg.norm(q, axis=1)[:, None] * np.linalg.norm(x, axis=1)[None, :]
        )
        expect = np.argsort(-true, axis=1)[:, :k]
        for i in range(nq):
            assert set(ids[i]) == set(expect[i]), i
            np.testing.assert_allclose(
                np.sort(vals[i]), np.sort(np.take(true[i], expect[i])), rtol=1e-4
            )

    def test_incremental_insert_across_shards(self, mesh):
        d = 64
        x = _unit(300, d, 2)
        idx = ShardedFlatIndex(mesh, dim=d, capacity=512)
        idx.add(x[:100])
        idx.add(x[100:250])
        idx.add(x[250:])
        # EVERY row must be retrievable as its own nearest neighbor —
        # boundary-spanning waves once zeroed rows at shard edges via
        # duplicate-index scatter (clip+where, r2 review); asserting only
        # the first few rows missed it
        ids, _ = idx.search(x, top_k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(300))

    def test_underfilled_topk_pads_minus_one(self, mesh):
        idx = ShardedFlatIndex(mesh, dim=64, capacity=64)
        idx.add(_unit(5, 64, 9))
        ids, _ = idx.search(_unit(2, 64, 9), top_k=10)
        assert (ids[:, 5:] == -1).all(), "unfilled slots must be -1"
        assert set(ids[0, :5].tolist()) == set(range(5))

    def test_capacity_guard(self, mesh):
        idx = ShardedFlatIndex(mesh, dim=64, capacity=16)
        with pytest.raises(RuntimeError):
            idx.add(_unit(100, 64, 3))

    def test_dp_only_mesh(self):
        mesh = make_mesh(8, tp=1)
        x = _unit(128, 32, 4)
        idx = ShardedFlatIndex(mesh, dim=32, capacity=256)
        idx.add(x)
        ids, _ = idx.search(x[:4], top_k=1)
        np.testing.assert_array_equal(ids[:, 0], np.arange(4))


class TestShardedHNSW:
    def test_matches_unsharded_recall(self, mesh):
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.flat import FlatIndex
        import jax

        d, n, nq, k = 64, 2000, 16, 10
        x = _unit(n, d, 5)
        q = _unit(nq, d, 6)
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)

        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:4], kind="f32",
            params=__import__("cosdata_tpu.indexes.hnsw", fromlist=["HNSWParams"]).HNSWParams(
                num_layers=3, wave_size=256, ef_construction=64, ef_search=96,
                max_iters=64,
            ),
            initial_capacity_per_shard=1024,
        )
        idx.add(x)
        got, _ = idx.search(q, top_k=k)
        hits = sum(len(set(map(int, t)) & set(map(int, g))) for t, g in zip(true_ids, got))
        r = hits / (nq * k)
        assert r >= 0.9, r

    def test_global_id_mapping_and_delete(self, mesh):
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.hnsw import HNSWParams
        import jax

        d = 32
        x = _unit(200, d, 7)
        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:2], kind="f32",
            params=HNSWParams(num_layers=2, wave_size=64, max_iters=32),
        )
        gids = idx.add(x)
        assert list(gids[:3]) == [0, 1, 2]
        ids, _ = idx.search(x[:8], top_k=1)
        assert (ids[:, 0] == np.arange(8)).mean() >= 0.9
        idx.delete(5)
        ids, _ = idx.search(x[5], top_k=5)
        assert 5 not in ids[0]

    def test_quaternary_sharded_build_and_query(self, mesh):
        """The DEEP-100M-style operating point (BASELINE.json config #5):
        quaternary 2-bit storage, sharded build + batched query. The
        per-shard HNSW stores bitplanes; scoring goes through the packed
        sub-byte kernels."""
        from cosdata_tpu.parallel.sharded_hnsw import ShardedHNSWIndex
        from cosdata_tpu.indexes.flat import FlatIndex
        from cosdata_tpu.indexes.hnsw import HNSWParams
        import jax

        d, n, nq, k = 64, 1200, 8, 10
        x = _unit(n, d, 9)
        q = x[:nq]
        flat = FlatIndex(dim=d, kind="f32")
        flat.add(x)
        true_ids, _ = flat.search(q, top_k=k)
        idx = ShardedHNSWIndex(
            dim=d, devices=jax.devices()[:4], kind="quaternary",
            params=HNSWParams(num_layers=2, wave_size=128,
                              ef_construction=48, ef_search=96,
                              max_iters=32),
            initial_capacity_per_shard=512,
        )
        idx.add(x)
        got, _ = idx.search(q, top_k=k)
        hits = sum(
            len(set(map(int, t)) & set(map(int, g)))
            for t, g in zip(true_ids, got)
        )
        assert hits / (nq * k) >= 0.85, hits / (nq * k)
