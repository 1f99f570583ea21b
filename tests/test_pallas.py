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
