"""VectorStore: growth, padding, scoring, gather-scoring, rerank."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosdata_tpu.ops.storage import VectorStore


def _rand(n, d, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, size=(n, d)).astype(np.float32)


@pytest.mark.parametrize("kind", ["u8", "subbyte", "f16", "f32"])
def test_add_and_score_unpadded_dim(kind):
    d = 128
    vs = VectorStore(dim=d, kind=kind, metric="cosine", initial_capacity=128)
    x = _rand(300, d, seed=1)  # forces growth past initial capacity
    ids = vs.add(x)
    assert vs.n == 300 and vs.capacity >= 300
    assert list(ids[:3]) == [0, 1, 2]

    q = x[:5]
    qq = vs.quantize_queries(q)
    scores = np.asarray(vs.scores_all(qq))[:, : vs.n]
    # self-similarity should be the max (cosine of identical quantized vectors)
    top = scores.argmax(axis=1)
    np.testing.assert_array_equal(top, np.arange(5))


def test_dim_padding_is_inert():
    d = 100  # pads to 128
    x = _rand(50, d, seed=2)
    vs = VectorStore(dim=d, kind="u8", initial_capacity=128)
    vs.add(x)
    vs_full = VectorStore(dim=128, kind="u8", initial_capacity=128)
    vs_full.add(np.pad(x, ((0, 0), (0, 28))))
    # padded store: pad lanes are forced to u8 value 0 == what a 128-d store
    # would see only if the input pad also quantizes to 0... compare rankings
    q = x[:3]
    s1 = np.asarray(vs.scores_all(vs.quantize_queries(q)))[:, :50]
    top = s1.argmax(axis=1)
    np.testing.assert_array_equal(top, np.arange(3))


def test_scores_gathered_matches_scores_all():
    d = 128
    x = _rand(200, d, seed=3)
    for kind in ["u8", "subbyte", "f32"]:
        vs = VectorStore(dim=d, kind=kind, initial_capacity=256)
        vs.add(x)
        q = _rand(4, d, seed=4)
        qq = vs.quantize_queries(q)
        all_scores = np.asarray(vs.scores_all(qq))
        ids = np.array([[0, 5, 17, 99], [3, 2, 1, 0], [150, 60, 7, 8], [9, 9, 9, 9]])
        got = np.asarray(vs.scores_gathered(qq, jnp.asarray(ids)))
        expect = np.take_along_axis(all_scores, ids, axis=1)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_rerank_exact_f32():
    d = 64
    x = _rand(100, d, seed=5)
    vs = VectorStore(dim=d, kind="u8", initial_capacity=128, keep_raw=True)
    vs.add(x)
    q = _rand(2, d, seed=6)
    ids = np.array([[0, 1, 2], [10, 20, 30]])
    got = np.asarray(vs.rerank_scores(jnp.asarray(q), jnp.asarray(ids)))
    for i in range(2):
        for j in range(3):
            v = x[ids[i, j]]
            expect = (q[i] @ v) / (np.linalg.norm(q[i]) * np.linalg.norm(v))
            np.testing.assert_allclose(got[i, j], expect, rtol=1e-5)


def test_raw_rows_roundtrip():
    d = 100
    x = _rand(10, d, seed=7)
    vs = VectorStore(dim=d, kind="f32", initial_capacity=128)
    vs.add(x)
    np.testing.assert_allclose(vs.raw_rows(np.array([2, 7])), x[[2, 7]], rtol=1e-6)


class TestRoundTrip:
    """keep_raw modes: device / host / none (the host mode is the
    beyond-HBM degradation path — cache_loader.rs's lazy-raw role)."""

    def test_host_raw_rows_and_growth(self):
        d = 96
        x = _rand(300, d, seed=8)  # forces growth past initial capacity
        vs = VectorStore(dim=d, kind="u8", initial_capacity=128, keep_raw="host")
        vs.add(x)
        assert vs._raw is None and vs._raw_host is not None
        np.testing.assert_allclose(
            vs.raw_rows(np.array([0, 150, 299])), x[[0, 150, 299]], rtol=1e-6
        )

    def test_host_rerank_matches_device_rerank(self):
        d = 64
        x = _rand(200, d, seed=9)
        q = _rand(3, d, seed=10)
        ids = np.array([[0, 5, 9], [10, 20, 30], [100, 150, 199]])
        dev = VectorStore(dim=d, kind="u8", initial_capacity=256, keep_raw=True)
        dev.add(x)
        host = VectorStore(dim=d, kind="u8", initial_capacity=256, keep_raw="host")
        host.add(x)
        want = np.asarray(dev.rerank_scores(jnp.asarray(q), jnp.asarray(ids)))
        got = host.rerank_scores_host(q, ids)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("metric", ["dot", "euclidean"])
    def test_host_rerank_metrics(self, metric):
        d = 32
        x = _rand(50, d, seed=11)
        q = _rand(2, d, seed=12)
        ids = np.array([[0, 1, 2], [10, 20, 30]])
        vs = VectorStore(dim=d, kind="u8", metric=metric,
                         initial_capacity=64, keep_raw="host")
        vs.add(x)
        got = vs.rerank_scores_host(q, ids)
        for i in range(2):
            for j in range(3):
                v = x[ids[i, j]]
                want = (q[i] @ v) if metric == "dot" else -np.linalg.norm(q[i] - v)
                np.testing.assert_allclose(got[i, j], want, rtol=1e-4, atol=1e-5)


class TestDiskRaw:
    """keep_raw="disk": raw rows in a memory-mapped file (beyond-RAM tier;
    rows fault in via the OS page cache — lazy_item.rs's page-fault role)."""

    def test_disk_rows_growth_and_rerank(self):
        d = 96
        x = _rand(300, d, seed=8)  # forces growth past initial capacity
        vs = VectorStore(dim=d, kind="u8", initial_capacity=128, keep_raw="disk")
        vs.add(x)
        assert vs._raw is None and isinstance(vs._raw_host, np.memmap)
        assert vs.raw_on_host
        np.testing.assert_allclose(
            vs.raw_rows(np.array([0, 150, 299])), x[[0, 150, 299]], rtol=1e-6
        )
        q = _rand(2, d, seed=13)
        ids = np.array([[0, 5, 9], [100, 150, 299]])
        ram = VectorStore(dim=d, kind="u8", initial_capacity=512, keep_raw="host")
        ram.add(x)
        np.testing.assert_allclose(
            vs.rerank_scores_host(q, ids), ram.rerank_scores_host(q, ids),
            rtol=1e-6,
        )
        # growth re-memmaps into a fresh file and unlinks the old one
        import os
        assert vs._raw_path is not None and os.path.exists(vs._raw_path)


class TestU8Ship:
    """ship_dtype="u8": host-side affine quantization parity."""

    def test_codes_match_device_quantization(self):
        d = 200  # unpadded on purpose (dim_pad 256)
        x = _rand(500, d, seed=7) * 0.4
        a = VectorStore(dim=d, kind="u8", range=(-0.3, 0.3), keep_raw=False,
                        initial_capacity=128, ship_dtype="u8")
        b = VectorStore(dim=d, kind="u8", range=(-0.3, 0.3), keep_raw=False,
                        initial_capacity=128, ship_dtype="f32")
        a.add(x)
        b.add(x)
        ca = np.asarray(a._arrays.data)[:500]
        cb = np.asarray(b._arrays.data)[:500]
        # identical f32 math on host and device; allow <=1-bucket drift on
        # exact boundary values from fp reassociation differences
        diff = np.abs(ca.astype(np.int32) - cb.astype(np.int32))
        assert (diff <= 1).all()
        assert (diff > 0).mean() < 1e-3
        np.testing.assert_allclose(
            np.asarray(a._arrays.mags)[:500], np.asarray(b._arrays.mags)[:500],
            rtol=1e-4,
        )
        sa = np.asarray(a._arrays.sums)[:500]
        sb = np.asarray(b._arrays.sums)[:500]
        assert np.abs(sa - sb).max() <= np.int32(diff.sum(axis=1)).max()

    def test_scores_match(self):
        d = 128
        x = _rand(300, d, seed=9) * 0.4
        a = VectorStore(dim=d, kind="u8", range=(-0.3, 0.3), keep_raw="host",
                        initial_capacity=128, ship_dtype="u8")
        a.add(x)
        q = a.quantize_queries(x[:4])
        sc = np.asarray(a.scores_all(q))[:, :300]
        assert (sc.argmax(axis=1) == np.arange(4)).all()

    def test_device_raw_falls_back(self):
        # keep_raw=True needs the f32 upload; ship_dtype="u8" must not
        # silently drop the raw rows
        d = 128
        x = _rand(64, d, seed=3)
        a = VectorStore(dim=d, kind="u8", range=(-1, 1), keep_raw=True,
                        initial_capacity=64, ship_dtype="u8")
        a.add(x)
        np.testing.assert_allclose(
            np.asarray(a._raw)[:64, :d], x, rtol=0, atol=1e-6
        )


class TestQueryWire:
    """ship_queries: f16 query wire on slow links (ops/storage.py)."""

    def test_f16_wire_preserves_search_quality(self, monkeypatch):
        import cosdata_tpu.ops.storage as st

        monkeypatch.setattr(st, "_WIRE_BW_MBPS", 10.0)  # force slow-link path
        d = 96
        x = _rand(200, d, seed=5)
        vs = VectorStore(dim=d, kind="u8", range=(-1, 1), initial_capacity=256)
        vs.add(x)
        qj = vs.ship_queries(x[:6])
        assert qj.dtype == jnp.float32 and qj.shape[1] == vs.dim_pad
        # f16 wire loses <1e-3 relative — self-match must survive quantized
        # scoring and exact rerank alike
        sc = np.asarray(vs.scores_all(vs._quantize(qj)))[:, : vs.n]
        assert (sc.argmax(axis=1) == np.arange(6)).all()
        re = np.asarray(
            vs.rerank_scores(x[:6], np.tile(np.arange(200), (6, 1))[:, :50])
        )
        assert (re.argmax(axis=1) == np.arange(6)).all()

    def test_fast_link_ships_f32_exact(self, monkeypatch):
        import cosdata_tpu.ops.storage as st

        monkeypatch.setattr(st, "_WIRE_BW_MBPS", 1000.0)
        vs = VectorStore(dim=64, kind="u8", initial_capacity=64)
        x = _rand(8, 64, seed=6)
        qj = np.asarray(vs.ship_queries(x))
        np.testing.assert_array_equal(qj[:, :64], x)


class TestHostNative:
    """Native host kernels (csrc/host_kernels.cpp) vs the numpy wire path:
    must be BIT-identical (they feed the same device codes)."""

    def _skip_if_missing(self):
        from cosdata_tpu.ops import host_native

        if not host_native.available():
            pytest.skip("_hostkernels.so not built (make -C csrc)")
        return host_native

    def test_quantize_u8_centered_bitexact(self):
        hn = self._skip_if_missing()
        rng = np.random.default_rng(2)
        x = rng.uniform(-1.5, 1.5, size=(257, 96)).astype(np.float32)
        x[0, :4] = [-9.0, 9.0, -1.0, 1.0]  # clip + boundary values
        # awkward range: f32(hi)-f32(lo) differs from f32(hi-lo) by 1 ulp,
        # which is exactly the discrepancy this test locks down
        lo, hi, d_true = -1.3, 0.7, 90
        # numpy fallback's (and the device kernel's) operation order:
        # clip -> subtract -> divide by f32(hi)-f32(lo) -> *255 -> floor
        scaled = np.clip(x, lo, hi)
        scaled -= np.float32(lo)
        scaled /= np.float32(hi) - np.float32(lo)
        scaled *= np.float32(255.0)
        u8 = scaled.astype(np.uint8)
        u8[:, d_true:] = 0
        u8 ^= 128
        ref = u8.view(np.int8)
        got = hn.quantize_u8_centered(x, lo, hi, d_true)
        np.testing.assert_array_equal(got, ref)

    def test_quantize_u8_centered_matches_device_kernel(self):
        """Host wire codes must equal the device path's codes on XLA:CPU
        (same IEEE op order; on TPU the wire path is pinned per store so
        any residual divide-rounding difference can never mix within one
        collection)."""
        hn = self._skip_if_missing()
        import jax.numpy as jnp

        from cosdata_tpu.ops.quantize import quantize_u8

        rng = np.random.default_rng(5)
        x = rng.uniform(-1.5, 1.5, size=(128, 96)).astype(np.float32)
        lo, hi, d_true = -1.3, 0.7, 90
        dev = np.asarray(quantize_u8(jnp.asarray(x), lo, hi, d_true).data)
        got = hn.quantize_u8_centered(x, lo, hi, d_true)
        np.testing.assert_array_equal(got, dev)

    def test_f32_to_f16_bitexact(self):
        hn = self._skip_if_missing()
        rng = np.random.default_rng(3)
        y = (
            rng.normal(size=4096)
            * 10.0 ** rng.integers(-6, 5, 4096).astype(np.float64)
        ).astype(np.float32)
        y[:8] = [0.0, -0.0, 1e-8, 65504.0, 70000.0, -70000.0, np.inf, -np.inf]
        np.testing.assert_array_equal(
            hn.f32_to_f16(y).view(np.uint16),
            y.astype(np.float16).view(np.uint16),
        )

    def test_u8_wire_uses_native(self):
        # end-to-end: ship_dtype="u8" ingest produces identical device codes
        # whether or not the native kernel is used
        from cosdata_tpu.ops import host_native

        if not host_native.available():
            pytest.skip("_hostkernels.so not built")
        x = _rand(100, 80, seed=7) * 0.5
        stores = []
        import cosdata_tpu.ops.host_native as hn_mod
        import unittest.mock as mock

        for force_numpy in (False, True):
            ctx = (
                mock.patch.object(hn_mod, "_lib", None)
                if force_numpy
                else mock.patch.object(hn_mod, "_lib", hn_mod._lib)
            )
            with ctx:
                vs = VectorStore(dim=80, kind="u8", range=(-0.6, 0.6),
                                 keep_raw=False, initial_capacity=128,
                                 ship_dtype="u8")
                vs.add(x)
                stores.append(np.asarray(vs._arrays.data)[:100])
        np.testing.assert_array_equal(stores[0], stores[1])
