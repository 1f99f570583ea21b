"""Batched distance kernels: (Q, D) queries x (N, D) stored -> (Q, N) scores.

The reference computes one scalar distance per graph edge with CPU SIMD
(/root/reference/src/distance/*.rs, /root/reference/src/models/dot_product*).
Here every metric is a *batched matrix product* so the MXU does the work,
and quantized kinds score in **dequantized space** (see ops.quantize):

    x̂·ŷ = a²·Σ(u_q·u_v) + a·b·(Σu_q + Σu_v) + b²·d_true

where the code contraction Σ(u_q·u_v) is one int8 MXU matmul (centered via
``cc + 128*(s_q+s_v) + D*128²`` for u8; direct bucket-code matmul for
sub-byte — mathematically the reference's weighted popcounts,
dot_product.rs:35-90, rescaled to bucket centers).

- f32/f16 cosine/dot: direct matmul (f16 upcast, f32 accumulation).
- euclidean: ||q||² + ||v||² - 2 q·v via the same dot kernels.
- hamming: popcount(x XOR y) = pc(x) + pc(y) - 2*dot(bits) over raw bit
  patterns (hamming.rs:60-115).

Scores follow each metric's native orientation: cosine/dot higher-is-better,
euclidean/hamming negated to "higher is better" by `score()`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cosdata_tpu.ops.quantize import (
    QuantizedFloat,
    QuantizedSubByte,
    QuantizedU8,
    subbyte_values,
    unpack_bits_from_u32,
)

_EPS = 1e-30


def _safe_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """Cosine denominator of 0 is an error in the reference (cosine.rs:167-180);
    we map it to similarity 0 so padded/empty rows sort last naturally."""
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


# ---------------------------------------------------------------------------
# u8 (centered int8) kernels
# ---------------------------------------------------------------------------


def dot_u8(q: QuantizedU8, v: QuantizedU8) -> jax.Array:
    """Dequantized dot product x̂·ŷ, (Q, N), on the int8 MXU."""
    d_pad = q.data.shape[-1]
    cc = jax.lax.dot_general(
        q.data,
        v.data,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    code_dot = (cc + 128 * (q.sums[:, None] + v.sums[None, :]) + d_pad * 128 * 128).astype(jnp.float32)
    uq = (q.sums + 128 * d_pad).astype(jnp.float32)
    uv = (v.sums + 128 * d_pad).astype(jnp.float32)
    return (
        q.a * q.a * code_dot
        + q.a * q.b * (uq[:, None] + uv[None, :])
        + q.b * q.b * q.dtrue
    )


def cosine_u8(q: QuantizedU8, v: QuantizedU8) -> jax.Array:
    return _safe_div(dot_u8(q, v), q.mags[:, None] * v.mags[None, :])


def euclidean_u8(q: QuantizedU8, v: QuantizedU8) -> jax.Array:
    d2 = q.mags[:, None] ** 2 + v.mags[None, :] ** 2 - 2.0 * dot_u8(q, v)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


# ---------------------------------------------------------------------------
# sub-byte bitplane kernels
# ---------------------------------------------------------------------------


def _subbyte_code_dot(q: QuantizedSubByte, v: QuantizedSubByte, d: int) -> jax.Array:
    qv = subbyte_values(q.planes, d)
    vv = subbyte_values(v.planes, d)
    out = jax.lax.dot_general(
        qv,
        vv,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return out.astype(jnp.float32)


def dot_subbyte(q: QuantizedSubByte, v: QuantizedSubByte, d: int) -> jax.Array:
    """Dequantized (bucket-center) dot product, (Q, N)."""
    code_dot = _subbyte_code_dot(q, v, d)
    return (
        q.a * q.a * code_dot
        + q.a * q.b * (q.sums.astype(jnp.float32)[:, None] + v.sums.astype(jnp.float32)[None, :])
        + q.b * q.b * q.dtrue
    )


def cosine_subbyte(q: QuantizedSubByte, v: QuantizedSubByte, d: int) -> jax.Array:
    return _safe_div(dot_subbyte(q, v, d), q.mags[:, None] * v.mags[None, :])


# ---------------------------------------------------------------------------
# float kernels
# ---------------------------------------------------------------------------


def dot_float(q: QuantizedFloat, v: QuantizedFloat) -> jax.Array:
    # HIGHEST: the float path is the "exact" tier (used for re-ranking);
    # the fast MXU tiers are the u8/sub-byte int8 kernels.
    return jax.lax.dot_general(
        q.data.astype(jnp.float32),
        v.data.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def cosine_float(q: QuantizedFloat, v: QuantizedFloat) -> jax.Array:
    return _safe_div(dot_float(q, v), q.mags[:, None] * v.mags[None, :])


def euclidean_float(q: QuantizedFloat, v: QuantizedFloat) -> jax.Array:
    d2 = q.mags[:, None] ** 2 + v.mags[None, :] ** 2 - 2.0 * dot_float(q, v)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


# ---------------------------------------------------------------------------
# hamming kernels (popcount of XOR over raw bit patterns)
# ---------------------------------------------------------------------------


def hamming_from_bits(q_bits: jax.Array, v_bits: jax.Array) -> jax.Array:
    """popcount(x XOR y) = pc(x) + pc(y) - 2 * dot(bits) as an MXU matmul."""
    qc = jnp.sum(q_bits.astype(jnp.int32), axis=-1)
    vc = jnp.sum(v_bits.astype(jnp.int32), axis=-1)
    both = jax.lax.dot_general(
        q_bits,
        v_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (qc[:, None] + vc[None, :] - 2 * both).astype(jnp.float32)


def hamming_u8(q: QuantizedU8, v: QuantizedU8) -> jax.Array:
    """Per-byte XOR popcount of the u8 code representations
    (hamming.rs:60-70)."""

    def expand(s: QuantizedU8) -> jax.Array:
        u8 = (s.data.astype(jnp.int32) + 128).astype(jnp.uint32)
        n, d = u8.shape
        shifts = jnp.arange(8, dtype=jnp.uint32)
        bits = (u8[:, :, None] >> shifts) & jnp.uint32(1)
        return bits.reshape(n, d * 8).astype(jnp.int8)

    return hamming_from_bits(expand(q), expand(v))


def hamming_subbyte(q: QuantizedSubByte, v: QuantizedSubByte, d: int) -> jax.Array:
    """XOR popcount over bucket-code bit patterns (hamming.rs:73-97)."""
    res = q.planes.shape[0]
    out = None
    for p in range(res):
        h = hamming_from_bits(
            unpack_bits_from_u32(q.planes[p], d),
            unpack_bits_from_u32(v.planes[p], d),
        )
        out = h if out is None else out + h
    return out


def hamming_f16(q: QuantizedFloat, v: QuantizedFloat) -> jax.Array:
    """Bitwise XOR popcount of the f16 bit patterns (hamming.rs:100-115)."""

    def expand(s: QuantizedFloat) -> jax.Array:
        u16 = jax.lax.bitcast_convert_type(s.data.astype(jnp.float16), jnp.uint16)
        n, d = u16.shape
        shifts = jnp.arange(16, dtype=jnp.uint16)
        bits = (u16[:, :, None] >> shifts) & jnp.uint16(1)
        return bits.reshape(n, d * 16).astype(jnp.int8)

    return hamming_from_bits(expand(q), expand(v))


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _use_pallas_subbyte(store) -> bool:
    """Route full-store sub-byte scoring through the fused Pallas unpack+
    matmul kernel on TPU (keeps HBM traffic at packed width). Decided at
    trace time; the jnp path remains the CPU/test reference."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    res, c, w = store.planes.shape
    return c % 512 == 0 and c >= 512


#: metric name -> (higher_is_better)
METRIC_HIGHER_IS_BETTER = {
    "cosine": True,
    "dot": True,
    "euclidean": False,
    "hamming": False,
}


def score(metric: str, kind: str, q, v, d: int) -> jax.Array:
    """Uniform (Q, N) *similarity* scores — always higher-is-better.

    ``kind`` in {"u8", "subbyte", "float"}; euclidean/hamming are negated.
    """
    if metric in ("cosine", "dot") and kind == "subbyte" and _use_pallas_subbyte(v):
        from cosdata_tpu.ops.pallas.subbyte_scan import subbyte_scores

        return subbyte_scores(metric, q, v, d)
    if metric == "cosine":
        if kind == "u8":
            return cosine_u8(q, v)
        if kind == "subbyte":
            return cosine_subbyte(q, v, d)
        return cosine_float(q, v)
    if metric == "dot":
        if kind == "u8":
            return dot_u8(q, v)
        if kind == "subbyte":
            return dot_subbyte(q, v, d)
        return dot_float(q, v)
    if metric == "euclidean":
        if kind == "u8":
            return -euclidean_u8(q, v)
        if kind == "float":
            return -euclidean_float(q, v)
        raise ValueError("euclidean unsupported for sub-byte storage")
    if metric == "hamming":
        if kind == "u8":
            return -hamming_u8(q, v)
        if kind == "subbyte":
            return -hamming_subbyte(q, v, d)
        return -hamming_f16(q, v)
    raise ValueError(f"unknown metric {metric!r}")
