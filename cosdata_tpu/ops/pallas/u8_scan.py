"""Pallas kernel: fused u8 scan — int8 MXU matmul + dequant epilogue +
per-group bin-max, with the (B, C) score matrix living ONLY in VMEM.

The XLA path (ops/flat_scan) materializes every chunk's (B, chunk) f32
scores in HBM between the matmul and the selection — measured 3.3 ms
matmul + 8.9 ms selection per 1024x65536 chunk on v5e, ~10x over the
memory bound. Here each grid step contracts a (BC, D) store block against
a (QB, D) query block on the MXU, applies the affine dequant + cosine
correction on the VPU, and max-reduces groups of store rows to bin maxima
before anything touches HBM: score traffic drops `group`-fold and the
epilogue never leaves VMEM.

Orientation: scores are computed TRANSPOSED, (BC, QB) per block, so the
group reduction runs over contiguous SUBLANE slices (lane-strided
reductions and reshapes don't lower in Mosaic; a probe of the per-column
formulation ran 1000x slower). Bins are therefore *strided row groups*:
within a store block starting at S, bin b (0 <= b < BC/G) covers rows
{S + b + g·(BC/G) : 0 <= g < G}; the caller expands winners with
flat_scan._pallas_bin_rows. Output is (C/G, B) — transposed once by XLA
outside the kernel.

Math (ops/distance.dot_u8): with centered codes cc = Σ q_i v_i,
  dot = a²·cc + k1·(sq + sv) + k0,
  k1 = 128a² + ab,  k0 = a²·D_pad·128² + 2ab·128·D_pad + b²·d_true
folded into a per-query additive row (k1·sq + k0) and a per-store-row
additive column (k1·sv); cosine multiplies by precomputed reciprocal
magnitudes; invalid rows get reciprocal 0 plus a -3e38 sink.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(metric: str, group: int, bc: int):
    nb = bc // group

    def kernel(a2_ref, q_ref, qrow_ref, qinv_ref, codes_ref, vcol_ref,
               vinv_ref, vsink_ref, out_ref):
        cc = jax.lax.dot_general(
            codes_ref[:, :],
            q_ref[:, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (BC, QB)
        dot = a2_ref[0, 0] * cc.astype(jnp.float32)
        dot = dot + vcol_ref[:, :] + qrow_ref[:, :]
        if metric == "cosine":
            sc = dot * vinv_ref[:, :] * qinv_ref[:, :]
        else:  # dot product: vinv carries the valid mask as 1/0
            sc = dot * vinv_ref[:, :]
        sc = sc + vsink_ref[:, :]
        acc = sc[0:nb, :]
        for g in range(1, group):
            acc = jnp.maximum(acc, sc[g * nb : (g + 1) * nb, :])
        out_ref[:, :] = acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("metric", "group", "qb", "bc", "interpret")
)
def u8_bin_max(
    metric: str,
    group: int,
    q_codes: jax.Array,  # (B, D) int8
    q_add: jax.Array,  # (1, B) f32: k1*sq + k0
    q_inv: jax.Array,  # (1, B) f32: 1/max(qmag, eps) (cosine) or 1
    codes: jax.Array,  # (C, D) int8
    v_add: jax.Array,  # (C, 1) f32: k1*sv
    v_inv: jax.Array,  # (C, 1) f32: valid/max(vmag, eps) (cosine) or valid
    v_sink: jax.Array,  # (C, 1) f32: 0 on valid rows, -3e38 on invalid
    a2,  # () f32 scalar a²
    qb: int = 512,
    bc: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Returns (C // group, B) f32 STRIDED bin maxima (see module doc)."""
    b, d = q_codes.shape
    c = codes.shape[0]
    assert b % qb == 0 and c % bc == 0, (b, qb, c, bc)
    nb = bc // group
    grid = (c // bc, b // qb)
    kernel = _make_kernel(metric, group, bc)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, d), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, 1), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nb, qb), lambda j, i: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((c // group, b), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * c * d,
            bytes_accessed=int(
                (b // qb) * c * d + (c // bc) * b * d
                + b * (c // group) * 4
            ),
            transcendentals=0,
        ),
    )(jnp.asarray(a2, jnp.float32).reshape(1, 1), q_codes, q_add, q_inv,
      codes, v_add, v_inv, v_sink)


def u8_bin_max_from_store(metric: str, group: int, q, store, valid,
                          d_pad: int, qb: int = 512, bc: int = 2048,
                          interpret: bool = False) -> jax.Array:
    """Host-side prep of the folded correction terms + kernel call.

    ``q``/``store`` are QuantizedU8 pytrees; ``valid`` a (C,) bool mask.
    Jit-traceable (used inside the fused codes-engine program). Returns
    (C//group, B) strided bin maxima."""
    a = q.a
    b_ = q.b
    k1 = 128.0 * a * a + a * b_
    k0 = (
        a * a * d_pad * 128.0 * 128.0
        + 2.0 * a * b_ * 128.0 * d_pad
        + b_ * b_ * q.dtrue
    )
    eps = 1e-30
    q_add = (k1 * q.sums.astype(jnp.float32) + k0)[None, :]
    if metric == "cosine":
        q_inv = (1.0 / jnp.maximum(q.mags, eps))[None, :]
        v_inv = jnp.where(valid, 1.0 / jnp.maximum(store.mags, eps), 0.0)
    else:
        q_inv = jnp.ones((1, q.sums.shape[0]), jnp.float32)
        v_inv = jnp.where(valid, 1.0, 0.0)
    v_add = k1 * store.sums.astype(jnp.float32)
    v_sink = jnp.where(valid, 0.0, -3.0e38)
    return u8_bin_max(
        metric, group, q.data, q_add, q_inv, codes=store.data,
        v_add=v_add[:, None], v_inv=v_inv[:, None], v_sink=v_sink[:, None],
        a2=a * a, qb=qb, bc=bc, interpret=interpret,
    )
