"""Pallas kernel: fused u8 scan — int8 MXU matmul + dequant epilogue +
per-group bin-max, with the (B, C) score matrix living ONLY in VMEM.

The XLA path (ops/flat_scan) materializes every chunk's (B, chunk) f32
scores in HBM between the matmul and the selection — measured 3.3 ms
matmul + 8.9 ms selection per 1024x65536 chunk on v5e, ~10x over the
memory bound. Here each grid step contracts a (QB, D) query block against
a (BC, D) store block on the MXU, applies the affine dequant + cosine
correction on the VPU, reduces to per-`group`-row maxima, and writes only
the (QB, BC/group) bin maxima to HBM: score traffic drops by `group`x and
the epilogue never leaves VMEM. Downstream, the winning bins expand to
row windows rescored exactly (see flat_scan.fused_flat_search_codes).

Math (ops/distance.dot_u8): with centered codes cc = Σ q_i v_i,
  dot = a²·cc + k1·(sq + sv) + k0,
  k1 = 128a² + ab,  k0 = a²·D_pad·128² + 2ab·128·D_pad + b²·d_true
folded host-side into a per-query additive row (k1·sq + k0) and a
per-store-row additive column (k1·sv); cosine divides by the magnitudes
via precomputed reciprocals (invalid rows carry reciprocal 0 + mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(metric: str, group: int, bc: int):
    nbins = bc // group

    def kernel(a2_ref, q_ref, qa_ref, qinv_ref, codes_ref, va_ref,
               vinv_ref, vsink_ref, out_ref):
        cc = jax.lax.dot_general(
            q_ref[:, :],
            codes_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        dot = a2_ref[0, 0] * cc.astype(jnp.float32)
        dot = dot + qa_ref[:, :] + va_ref[:, :]
        if metric == "cosine":
            sc = dot * qinv_ref[:, :] * vinv_ref[:, :]
        else:  # dot product: vinv carries the valid mask as 1/0
            sc = dot * vinv_ref[:, :]
        # invalid rows: vinv zeroed their score; vsink (-3e38 on invalid
        # rows, 0 elsewhere) then sinks them below any real score
        sc = sc + vsink_ref[:, :]
        for j in range(nbins):
            out_ref[:, j] = jnp.max(
                sc[:, j * group : (j + 1) * group], axis=1
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "group", "qb", "bc", "interpret")
)
def u8_bin_max(
    metric: str,
    group: int,
    q_codes: jax.Array,  # (B, D) int8
    q_add: jax.Array,  # (B, 1) f32: k1*sq + k0  (minus nothing)
    q_inv: jax.Array,  # (B, 1) f32: 1/max(qmag, eps) (cosine) or 1
    codes: jax.Array,  # (C, D) int8
    v_add: jax.Array,  # (C,) f32: k1*sv
    v_inv: jax.Array,  # (C,) f32: valid/max(vmag, eps) (cosine) or valid
    v_sink: jax.Array,  # (C,) f32: 0 on valid rows, -3e38 on invalid
    a2,  # () f32 scalar a²
    qb: int = 512,
    bc: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Returns (B, C // group) f32 bin maxima (invalid rows ≈ -3e38)."""
    b, d = q_codes.shape
    c = codes.shape[0]
    assert b % qb == 0 and c % bc == 0, (b, qb, c, bc)
    grid = (b // qb, c // bc)
    va2 = v_add.reshape(c // bc, bc)
    vi2 = v_inv.reshape(c // bc, bc)
    vs2 = v_sink.reshape(c // bc, bc)
    kernel = _make_kernel(metric, group, bc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (qb, bc // group), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c // group), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d,
            bytes_accessed=int(
                b * d + (b // qb) * c * d + b * (c // group) * 4
            ),
            transcendentals=0,
        ),
    )(jnp.asarray(a2, jnp.float32).reshape(1, 1), q_codes, q_add, q_inv,
      codes, va2, vi2, vs2)


def u8_bin_max_from_store(metric: str, group: int, q, store, valid,
                          d_pad: int, qb: int = 512, bc: int = 1024,
                          interpret: bool = False) -> jax.Array:
    """Host-side prep of the folded correction terms + kernel call.

    ``q``/``store`` are QuantizedU8 pytrees; ``valid`` a (C,) bool mask.
    Jit-traceable (used inside the fused codes-engine program)."""
    a = q.a
    b_ = q.b
    k1 = 128.0 * a * a + a * b_
    k0 = (
        a * a * d_pad * 128.0 * 128.0
        + 2.0 * a * b_ * 128.0 * d_pad
        + b_ * b_ * q.dtrue
    )
    eps = 1e-30
    q_add = (k1 * q.sums.astype(jnp.float32) + k0)[:, None]
    if metric == "cosine":
        q_inv = (1.0 / jnp.maximum(q.mags, eps))[:, None]
        v_inv = jnp.where(valid, 1.0 / jnp.maximum(store.mags, eps), 0.0)
    else:
        q_inv = jnp.ones((q.sums.shape[0], 1), jnp.float32)
        v_inv = jnp.where(valid, 1.0, 0.0)
    v_add = k1 * store.sums.astype(jnp.float32)
    # invalid rows sink far below any real score regardless of sign
    v_sink = jnp.where(valid, 0.0, -3.0e38)
    return u8_bin_max(
        metric, group, q.data, q_add, q_inv, store.data, v_add, v_inv,
        v_sink, a * a, qb=qb, bc=bc, interpret=interpret,
    )
