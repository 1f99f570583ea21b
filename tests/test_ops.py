"""Kernel parity tests vs numpy brute force (SURVEY.md §4 strategy (a)).

Quantized kinds score in dequantized space: codes match the reference's
bucket assignment exactly; dot/cosine are computed for the dequantized
values x̂ = a*u + b (see ops/quantize.py docstring).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cosdata_tpu.ops import distance as D
from cosdata_tpu.ops import quantize as Q
from cosdata_tpu.ops import topk as T


def _rand(n, d, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=(n, d)).astype(np.float32)


def _ref_codes_u8(x, lo, hi):
    return np.floor((np.clip(x, lo, hi) - lo) / (hi - lo) * 255.0).clip(0, 255).astype(np.int64)


def _deq_u8(x, lo, hi):
    a = (hi - lo) / 255.0
    return a * _ref_codes_u8(x, lo, hi) + lo


def _codes_subbyte(x, res):
    parts = 1 << res
    step = 2.0 / parts
    return np.clip(np.floor((x + 1.0) / step), 0, parts - 1).astype(np.int64)


def _deq_subbyte(x, res):
    parts = 1 << res
    step = 2.0 / parts
    return step * _codes_subbyte(x, res) + (step / 2.0 - 1.0)


class TestQuantizeU8:
    def test_codes_match_reference_formula(self):
        x = _rand(16, 64, seed=1, lo=-2, hi=2)
        q = Q.quantize_u8(jnp.asarray(x), -1.0, 1.0)
        expect = _ref_codes_u8(x, -1.0, 1.0)
        got = np.asarray(q.data).astype(np.int64) + 128
        np.testing.assert_array_equal(got, expect)
        deq = _deq_u8(x, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(q.mags), np.linalg.norm(deq, axis=-1), rtol=1e-5
        )

    def test_dot_and_cosine_dequantized(self):
        x, y = _rand(8, 128, seed=2), _rand(12, 128, seed=3)
        qx = Q.quantize_u8(jnp.asarray(x), -1.0, 1.0)
        qy = Q.quantize_u8(jnp.asarray(y), -1.0, 1.0)
        dx, dy = _deq_u8(x, -1, 1), _deq_u8(y, -1, 1)
        expect_dot = dx @ dy.T
        np.testing.assert_allclose(
            np.asarray(D.dot_u8(qx, qy)), expect_dot, rtol=1e-4, atol=1e-4
        )
        mags_x = np.linalg.norm(dx, axis=-1)
        mags_y = np.linalg.norm(dy, axis=-1)
        np.testing.assert_allclose(
            np.asarray(D.cosine_u8(qx, qy)),
            expect_dot / (mags_x[:, None] * mags_y[None, :]),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_lane_padding_inert(self):
        x = _rand(4, 100, seed=4)
        xp = np.pad(x, ((0, 0), (0, 28)))
        q = Q.quantize_u8(jnp.asarray(xp), -1.0, 1.0, d_true=100)
        deq = _deq_u8(x, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(q.mags), np.linalg.norm(deq, axis=-1), rtol=1e-5
        )
        got = np.asarray(D.dot_u8(q, q))
        np.testing.assert_allclose(got, deq @ deq.T, rtol=1e-4, atol=1e-4)

    def test_u8_cosine_close_to_f32_cosine(self):
        # the whole point of dequantized scoring: values approximate true
        # cosine to within quantization error even for zero-centered data
        x, y = _rand(8, 768, seed=5, lo=-0.1, hi=0.1), _rand(256, 768, seed=6, lo=-0.1, hi=0.1)
        qx = Q.quantize_u8(jnp.asarray(x), -0.1, 0.1)
        qy = Q.quantize_u8(jnp.asarray(y), -0.1, 0.1)
        got = np.asarray(D.cosine_u8(qx, qy))
        true = (x @ y.T) / (
            np.linalg.norm(x, axis=-1)[:, None] * np.linalg.norm(y, axis=-1)[None, :]
        )
        assert np.abs(got - true).max() < 0.01


class TestSubByte:
    @pytest.mark.parametrize("res", [1, 2, 3])
    def test_bucket_codes(self, res):
        x = _rand(7, 100, seed=6)
        q = Q.quantize_subbyte(jnp.asarray(x), res)
        expect = _codes_subbyte(x, res)
        got = np.asarray(Q.subbyte_values(q.planes, x.shape[1])).astype(np.int64)
        np.testing.assert_array_equal(got, expect)
        np.testing.assert_allclose(
            np.asarray(q.mags),
            np.linalg.norm(_deq_subbyte(x, res), axis=-1),
            rtol=1e-5,
        )

    @pytest.mark.parametrize("res", [1, 2, 3])
    def test_dot_and_cosine_dequantized(self, res):
        x, y = _rand(5, 96, seed=7), _rand(9, 96, seed=8)
        qx = Q.quantize_subbyte(jnp.asarray(x), res)
        qy = Q.quantize_subbyte(jnp.asarray(y), res)
        dx, dy = _deq_subbyte(x, res), _deq_subbyte(y, res)
        expect = dx @ dy.T
        np.testing.assert_allclose(
            np.asarray(D.dot_subbyte(qx, qy, 96)), expect, rtol=1e-4, atol=1e-4
        )
        mx, my = np.linalg.norm(dx, axis=-1), np.linalg.norm(dy, axis=-1)
        np.testing.assert_allclose(
            np.asarray(D.cosine_subbyte(qx, qy, 96)),
            expect / (mx[:, None] * my[None, :]),
            rtol=1e-4,
            atol=1e-4,
        )


class TestFloat:
    def test_cosine_f32(self):
        x, y = _rand(6, 50, seed=9), _rand(11, 50, seed=10)
        qx, qy = Q.quantize_f32(jnp.asarray(x)), Q.quantize_f32(jnp.asarray(y))
        expect = (x @ y.T) / (
            np.linalg.norm(x, axis=-1)[:, None] * np.linalg.norm(y, axis=-1)[None, :]
        )
        np.testing.assert_allclose(np.asarray(D.cosine_float(qx, qy)), expect, rtol=1e-4)

    def test_euclidean_f32(self):
        x, y = _rand(6, 50, seed=11), _rand(11, 50, seed=12)
        qx, qy = Q.quantize_f32(jnp.asarray(x)), Q.quantize_f32(jnp.asarray(y))
        expect = np.sqrt(((x[:, None, :] - y[None, :, :]) ** 2).sum(-1))
        np.testing.assert_allclose(np.asarray(D.euclidean_float(qx, qy)), expect, rtol=1e-3, atol=1e-3)

    def test_f16_roundtrip(self):
        x = _rand(4, 32, seed=13)
        q = Q.quantize_f16(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(q.data, dtype=np.float32), x, atol=2e-3)


class TestHamming:
    def test_hamming_u8(self):
        x, y = _rand(5, 64, seed=14), _rand(7, 64, seed=15)
        qx = Q.quantize_u8(jnp.asarray(x), -1.0, 1.0)
        qy = Q.quantize_u8(jnp.asarray(y), -1.0, 1.0)
        ux, uy = _ref_codes_u8(x, -1, 1), _ref_codes_u8(y, -1, 1)
        expect = np.zeros((5, 7))
        for i in range(5):
            for j in range(7):
                expect[i, j] = bin(int.from_bytes(
                    np.bitwise_xor(ux[i].astype(np.uint8), uy[j].astype(np.uint8)).tobytes(), "little"
                )).count("1")
        np.testing.assert_allclose(np.asarray(D.hamming_u8(qx, qy)), expect)

    def test_hamming_f16_zero_on_self(self):
        x = _rand(3, 32, seed=16)
        q = Q.quantize_f16(jnp.asarray(x))
        got = np.asarray(D.hamming_f16(q, q))
        np.testing.assert_array_equal(np.diag(got), np.zeros(3))


class TestTopK:
    def test_topk_masked(self):
        scores = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 6))
        mask = jnp.asarray([[True] * 6, [True, True, True, False, False, False]])
        vals, idx = T.topk(scores, 2, mask=mask)
        np.testing.assert_array_equal(np.asarray(idx), [[5, 4], [2, 1]])

    def test_merge_topk(self):
        va, ia = jnp.asarray([[5.0, 3.0]]), jnp.asarray([[10, 11]])
        vb, ib = jnp.asarray([[4.0, 1.0]]), jnp.asarray([[20, 21]])
        v, i = T.merge_topk(va, ia, vb, ib, 3)
        np.testing.assert_array_equal(np.asarray(i), [[10, 20, 11]])

    def test_unique_mask(self):
        ids = jnp.asarray([[3, 5, 3, -1, 5, 7]])
        mask = np.asarray(T.unique_mask_ids(ids))
        np.testing.assert_array_equal(mask, [[True, True, False, False, False, True]])
