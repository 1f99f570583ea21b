"""TPU compute kernels: quantization, batched distances, top-k.

Pure jax functions; Pallas variants of the hot paths live in
``cosdata_tpu.ops.pallas``.
"""

from cosdata_tpu.ops import distance, quantize, topk  # noqa: F401
