"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cosdata_tpu.ops import distance as D
from cosdata_tpu.ops import quantize as Q
from cosdata_tpu.ops.pallas.subbyte_scan import subbyte_code_scores, subbyte_scores


def _rand(n, d, seed=0):
    return np.random.default_rng(seed).uniform(-1, 1, size=(n, d)).astype(np.float32)


class TestSubbyteScan:
    @pytest.mark.parametrize("res", [1, 2, 3])
    def test_code_dot_parity(self, res):
        d, c, b = 128, 256, 8
        x = _rand(c, d, seed=res)
        qx = _rand(b, d, seed=res + 10)
        store = Q.quantize_subbyte(jnp.asarray(x), res)
        q = Q.quantize_subbyte(jnp.asarray(qx), res)
        q_codes = Q.subbyte_values(q.planes, d)
        got = np.asarray(
            subbyte_code_scores(q_codes, store.planes, d, block=128, interpret=True)
        )
        # reference: jnp path
        expect_codes_q = np.asarray(Q.subbyte_values(q.planes, d)).astype(np.int64)
        expect_codes_v = np.asarray(Q.subbyte_values(store.planes, d)).astype(np.int64)
        expect = expect_codes_q @ expect_codes_v.T
        np.testing.assert_array_equal(got, expect)

    def test_cosine_parity_with_jnp_path(self):
        d, c, b, res = 128, 256, 4, 2
        x = _rand(c, d, seed=30)
        qx = _rand(b, d, seed=31)
        store = Q.quantize_subbyte(jnp.asarray(x), res)
        q = Q.quantize_subbyte(jnp.asarray(qx), res)
        got = np.asarray(
            subbyte_scores("cosine", q, store, d, block=128, interpret=True)
        )
        expect = np.asarray(D.cosine_subbyte(q, store, d))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestU8BinMax:
    """Fused u8 scan bin-max kernel (ops/pallas/u8_scan.py) vs the jnp
    reference scoring path, interpret mode."""

    @pytest.mark.parametrize("metric", ["cosine", "dot"])
    def test_bin_max_parity(self, metric):
        from cosdata_tpu.ops.pallas.u8_scan import u8_bin_max_from_store

        d, c, b, group = 128, 2048, 8, 32
        x = _rand(c, d, seed=51)
        qx = _rand(b, d, seed=52)
        lo, hi = -0.5, 0.5
        store = Q.quantize_u8(jnp.asarray(x), lo, hi, d)
        q = Q.quantize_u8(jnp.asarray(qx), lo, hi, d)
        valid = np.ones(c, bool)
        valid[5] = False
        valid[2000:] = False
        bc = 1024
        got = np.asarray(u8_bin_max_from_store(
            metric, group, q, store, jnp.asarray(valid), d,
            qb=8, bc=bc, interpret=True,
        )).T  # (B, C/group)
        ref = np.asarray(D.score(metric, "u8", q, store, d))
        ref = np.where(valid[None, :], ref, -3.0e38)
        # STRIDED bins: bin j*nb+b covers rows j*bc + b + g*nb
        nb = bc // group
        expect = np.full((b, c // group), -3.0e38, np.float32)
        for jblk in range(c // bc):
            blk = ref[:, jblk * bc : (jblk + 1) * bc]
            expect[:, jblk * nb : (jblk + 1) * nb] = blk.reshape(
                b, group, nb
            ).max(axis=1)
        ok = expect > -1e37
        np.testing.assert_allclose(got[ok], expect[ok], rtol=2e-5, atol=1e-5)
        assert (got[~ok] < -1e37).all()
