"""Quantization kernels (scalar u8, sub-byte bitplanes, f16/f32 pass-through).

Bucket assignment mirrors the reference's scalar quantizer exactly
(/root/reference/src/quantization/scalar.rs:18-55 and
/root/reference/src/models/common.rs:226-270), but scoring uses the
**dequantized** space: every stored code ``u`` represents ``x̂ = a*u + b``
and all dot products are computed for ``x̂`` via one int8 MXU matmul plus
rank-1 corrections. The reference computes cosine over the *shifted* code
values directly (distance/cosine.rs:105-131), which biases rankings for
zero-centered data; the dequantized estimator costs the same FLOPs and is
unbiased, so we use it for every quantized kind (u8 affine and sub-byte
bucket centers).

Layouts (for the MXU):
- **u8**: codes stored centered to int8 (``u - 128``) + per-row code sums,
  so u8×u8 contractions run on the int8 MXU:
  ``Σ u_q u_v = cc + 128*(s_q + s_v) + D*128²`` with ``s = Σ(u-128)``.
- **sub-byte (1/2/3-bit)**: values bucketed over [-1, 1] with
  ``step = 2/2^bits`` (common.rs:226-236), bitplanes packed MSB-first into
  uint32 words; dequantized value is the bucket center
  ``x̂ = step*n + (step/2 - 1)``.
- **f16/f32**: stored as-is with f32 magnitudes (scalar.rs:39-50).

All functions take the lane-padded (N, Dpad) batch plus the true dimension
``d_true``; padded lanes are forced to code 0 and excluded from sums,
magnitudes and the constant correction terms.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedU8(NamedTuple):
    """u8-quantized batch. x̂ = a*u + b on the first `dtrue` lanes."""

    data: jax.Array  # (N, D) int8 == u8 code - 128  (0 code on padded lanes)
    sums: jax.Array  # (N,)  int32 sum of centered codes (all lanes)
    mags: jax.Array  # (N,)  f32 ||x̂|| over true lanes
    a: jax.Array  # () f32 scale  (hi-lo)/255
    b: jax.Array  # () f32 offset lo
    dtrue: jax.Array  # () f32 number of true lanes


class QuantizedSubByte(NamedTuple):
    """Sub-byte batch: packed bitplanes (MSB plane first), x̂ = a*n + b."""

    planes: jax.Array  # (res, N, ceil(D/32)) uint32
    sums: jax.Array  # (N,) int32 sum of bucket codes (all lanes; padded = 0)
    mags: jax.Array  # (N,) f32 ||x̂|| over true lanes
    a: jax.Array  # () f32 = step
    b: jax.Array  # () f32 = step/2 - 1
    dtrue: jax.Array  # () f32


class QuantizedFloat(NamedTuple):
    """f16/f32 storage with precomputed magnitudes."""

    data: jax.Array  # (N, D) f16 or f32
    mags: jax.Array  # (N,) f32


@functools.partial(jax.jit, static_argnames=("d_true",))
def quantize_u8(x: jax.Array, lo: jax.Array, hi: jax.Array, d_true: int | None = None) -> QuantizedU8:
    """Affine u8 bucket assignment over [lo, hi] (scalar.rs:18-28)."""
    x = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    d_true = d_pad if d_true is None else d_true
    scaled = (jnp.clip(x, lo, hi) - lo) / (hi - lo) * 255.0
    # Rust `as u8` truncates toward zero; values are >= 0 here so floor == trunc.
    u8 = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, 255)
    lanes = jnp.arange(d_pad) < d_true
    u8 = u8 * lanes[None, :]
    a = (hi - lo) / 255.0
    b = lo * 1.0
    deq = a * u8.astype(jnp.float32) + b
    mags = jnp.sqrt(jnp.sum(jnp.where(lanes[None, :], deq * deq, 0.0), axis=-1))
    return QuantizedU8(
        (u8 - 128).astype(jnp.int8),
        jnp.sum(u8 - 128, axis=-1, dtype=jnp.int32),
        mags,
        jnp.float32(a),
        jnp.float32(b),
        jnp.float32(d_true),
    )


def _pack_bits_to_u32(bits: jax.Array) -> jax.Array:
    """Pack a (N, D) array of 0/1 int32 into (N, ceil(D/32)) uint32 words.

    **Strided layout**: bit ``i`` of word ``w`` holds dimension ``i*W + w``
    (W = word count). Chosen so a Pallas kernel can unpack with 32 shift
    ops + static column-slice writes — no reshapes, which Mosaic's vector
    layout inference rejects. (The reference packs LSB-first per dim,
    common.rs:253; only the in-memory word layout differs, the per-dim
    bucket values are identical.)
    """
    n, d = bits.shape
    w = -(-d // 32)
    pad = w * 32 - d
    if pad:
        bits = jnp.pad(bits, ((0, 0), (0, pad)))
    bits = bits.reshape(n, 32, w).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    return jnp.sum(bits << shifts, axis=1, dtype=jnp.uint32)


def unpack_bits_from_u32(packed: jax.Array, d: int) -> jax.Array:
    """Inverse of :func:`_pack_bits_to_u32`: (N, W) uint32 -> (N, d) int8 of 0/1."""
    n, w = packed.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[:, None, :] >> shifts[None, :, None]) & jnp.uint32(1)
    return bits.reshape(n, w * 32)[:, :d].astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("resolution", "d_true"))
def quantize_subbyte(
    x: jax.Array, resolution: int, d_true: int | None = None
) -> QuantizedSubByte:
    """Sub-byte bitplane bucket assignment (common.rs:226-270).

    ``resolution`` in {1, 2, 3}. Values bucketed over [-1, 1] into
    ``2^resolution`` buckets; plane ``p`` holds bit ``resolution-1-p`` of the
    bucket index (plane 0 = MSB, matching to_float_flag common.rs:230-233).
    Out-of-range values clamp to the extreme buckets (the reference wraps on
    exactly +1.0 — a quirk we do not reproduce).
    """
    x = x.astype(jnp.float32)
    d_pad = x.shape[-1]
    d_true = d_pad if d_true is None else d_true
    parts = 1 << resolution
    step = 2.0 / parts
    n_bucket = jnp.clip(jnp.floor((x + 1.0) / step).astype(jnp.int32), 0, parts - 1)
    lanes = jnp.arange(d_pad) < d_true
    n_bucket = n_bucket * lanes[None, :]
    planes = []
    for p in range(resolution):
        bit = (n_bucket >> (resolution - 1 - p)) & 1
        planes.append(_pack_bits_to_u32(bit))
    a = step
    b = step / 2.0 - 1.0
    deq = a * n_bucket.astype(jnp.float32) + b
    mags = jnp.sqrt(jnp.sum(jnp.where(lanes[None, :], deq * deq, 0.0), axis=-1))
    return QuantizedSubByte(
        jnp.stack(planes, axis=0),
        jnp.sum(n_bucket, axis=-1, dtype=jnp.int32),
        mags,
        jnp.float32(a),
        jnp.float32(b),
        jnp.float32(d_true),
    )


def subbyte_values(planes: jax.Array, d: int) -> jax.Array:
    """Reconstruct bucket codes 0..2^res-1 as (N, d) int8 from packed planes."""
    res = planes.shape[0]
    acc = None
    for p in range(res):
        bits = unpack_bits_from_u32(planes[p], d)
        contrib = bits.astype(jnp.int8) << (res - 1 - p)
        acc = contrib if acc is None else acc + contrib
    return acc


@jax.jit
def quantize_f32(x: jax.Array) -> QuantizedFloat:
    x = x.astype(jnp.float32)
    return QuantizedFloat(x, jnp.sqrt(jnp.sum(x * x, axis=-1)))


@jax.jit
def quantize_f16(x: jax.Array) -> QuantizedFloat:
    x32 = x.astype(jnp.float32)
    return QuantizedFloat(x32.astype(jnp.float16), jnp.sqrt(jnp.sum(x32 * x32, axis=-1)))


def train_range(sample: np.ndarray, clamp_margin_percent: float = 1.0) -> tuple[float, float]:
    """Percentile clamp-range helper (generic; the REST layer uses the exact
    reference ladder in core.collection.tune_dense_range)."""
    flat = np.asarray(sample, dtype=np.float32).ravel()
    if flat.size == 0:
        return (-1.0, 1.0)
    lo = float(np.percentile(flat, clamp_margin_percent))
    hi = float(np.percentile(flat, 100.0 - clamp_margin_percent))
    if hi <= lo:
        hi = lo + 1e-6
    return (lo, hi)
