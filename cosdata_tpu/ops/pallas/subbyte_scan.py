"""Pallas kernel: fused sub-byte unpack + int8 MXU matmul.

The jnp sub-byte path (ops/distance.py dot_subbyte) unpacks packed bitplanes
to an int8 (N, D) matrix before the matmul — HBM sees 8x the packed bytes.
This kernel streams the *packed* uint32 words into VMEM, unpacks on the VPU,
and contracts on the MXU, so HBM traffic stays at 1-3 bits/dim: the
TPU-native equivalent of the reference's bitplane popcount kernels
(/root/reference/src/models/dot_product.rs:35-90) for the DEEP-100M
quaternary configuration.

Layout: planes (res, C, W) uint32, W = ceil(D/32), bit i of word w =
dimension w*32+i (ops/quantize._pack_bits_to_u32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(res: int, w: int):
    """Unpack strided-packed bitplanes into a VMEM codes scratch and contract
    on the MXU. The strided pack layout (bit i of word w' <-> dim i*W + w',
    ops/quantize._pack_bits_to_u32) makes every unpack step a shift + mask +
    static column-slice write: no reshapes (Mosaic rejects those) and all
    element-wise math in int32 (the VPU has no i8 lanes)."""

    def kernel(q_ref, planes_ref, out_ref, codes_ref):
        for i in range(32):
            acc = None
            for p in range(res):
                bits = ((planes_ref[p] >> jnp.uint32(i)) & jnp.uint32(1)).astype(
                    jnp.int32
                )
                contrib = bits << (res - 1 - p)
                acc = contrib if acc is None else acc + contrib
            codes_ref[:, i * w : (i + 1) * w] = acc
        out_ref[:, :] = jax.lax.dot_general(
            q_ref[:, :],
            codes_ref[:, :].astype(jnp.int8),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("d", "block", "interpret")
)
def subbyte_code_scores(
    q_codes: jax.Array,  # (B, D) int8 bucket codes of the queries
    planes: jax.Array,  # (res, C, W) uint32 packed store bitplanes
    d: int,
    block: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """(B, C) int32 code dot products: sum_i qcode_i * vcode_i."""
    res, c, w = planes.shape
    b, d_pad = q_codes.shape
    assert c % block == 0, (c, block)
    assert d_pad == 32 * w, (d_pad, w)
    grid = (c // block,)
    return pl.pallas_call(
        _make_kernel(res, w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((res, block, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block, 32 * w), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d,
            bytes_accessed=res * c * w * 4 + b * d + b * c * 4,
            transcendentals=0,
        ),
    )(q_codes, planes)


def subbyte_scores(metric, q, store, d: int, block: int = 512,
                   interpret: bool = False) -> jax.Array:
    """(B, C) dequantized similarity using the fused Pallas scan.

    Drop-in equivalent of ops.distance.score(metric, "subbyte", ...) for the
    full-store case (parity-tested in tests/test_pallas.py).
    """
    from cosdata_tpu.ops.quantize import subbyte_values

    q_codes = subbyte_values(q.planes, d)
    code_dot = subbyte_code_scores(
        q_codes, store.planes, d, block=block, interpret=interpret
    ).astype(jnp.float32)
    dot = (
        q.a * q.a * code_dot
        + q.a * q.b * (
            q.sums.astype(jnp.float32)[:, None]
            + store.sums.astype(jnp.float32)[None, :]
        )
        + q.b * q.b * q.dtrue
    )
    if metric == "dot":
        return dot
    den = q.mags[:, None] * store.mags[None, :]
    return jnp.where(den > 1e-30, dot / jnp.maximum(den, 1e-30), 0.0)
