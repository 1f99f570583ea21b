"""cosdata_tpu — a TPU-native vector database framework.

A from-scratch rebuild of the capabilities of cosdata/cosdata (Rust, CPU/SIMD)
as an idiomatic JAX/XLA/Pallas system:

- Dense ANN: HNSW re-designed as fixed-degree adjacency arrays in HBM with
  *batched* beam search (gather + MXU distance matmuls over vectorized
  frontiers) instead of per-request pointer-chasing threads.
- Scalar u8 / sub-byte (1/2/3-bit) quantization mapped onto int8 MXU matmuls
  with on-the-fly dequantization.
- Sparse (SPLADE-style) inverted index and TF-IDF/BM25 as segmented
  gather/scatter scoring kernels over CSR posting arrays.
- Hybrid search via reciprocal-rank fusion.
- Git-like versioning, explicit/implicit transactions with WAL, snapshot
  persistence, session auth, and the same REST surface as the reference.

Reference behavior citations use `/root/reference/<path>:<line>` notation.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: kernel shapes are deliberately bucketed
# (see docs/DESIGN.md "Compilation discipline"), so across-process reuse
# eliminates nearly all compile latency — critical when TPU compiles go
# through a remote-compile service (measured 20-130 s per fresh compile vs
# <1 s cached). The env var alone is NOT enough: this sandbox's
# sitecustomize imports jax before any user code, so the flag must be set
# on the live config. Opt out with JAX_COMPILATION_CACHE_DIR="".
import os as _os

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/cosdata_tpu_xla")
)
if _cache_dir:
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        pass

