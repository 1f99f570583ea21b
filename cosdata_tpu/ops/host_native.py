"""ctypes loader for the native host kernels (csrc/host_kernels.cpp).

The slow-tunnel ingest path quantizes on the host before shipping 1-byte
codes (storage.py ship_dtype="u8"); the numpy version of that pass was
measured at ~13 s per 131072x768 chunk on the single-core bench host
(three full array passes). The native kernel fuses it into one pass.
Falls back to numpy transparently when the .so is absent (built by
`make -C csrc`, like text/_native.so — never committed).

Reference role: the Rust build quantizes natively too
(/root/reference/src/quantization/scalar.rs:9-58).
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_lib = None
try:
    _p = Path(__file__).with_name("_hostkernels.so")
    if _p.exists():
        _lib = ctypes.CDLL(str(_p))
        _lib.hk_quantize_u8_centered.restype = None
        _lib.hk_quantize_u8_centered.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int8),
        ]
        _lib.hk_f32_to_f16.restype = None
        _lib.hk_f32_to_f16.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
        ]
except Exception:  # pragma: no cover - any load failure means fallback
    _lib = None


def available() -> bool:
    return _lib is not None


def quantize_u8_centered(
    x: np.ndarray, lo: float, hi: float, d_true: int
) -> np.ndarray:
    """Centered int8 codes, bit-identical to the numpy wire path
    (storage.py add(): affine scale -> clip -> u8 truncate -> zero pad
    lanes -> XOR 0x80 -> int8 view), in one fused pass."""
    x = np.ascontiguousarray(x, np.float32)
    rows, cols = x.shape
    out = np.empty((rows, cols), np.int8)
    _lib.hk_quantize_u8_centered(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols, int(d_true),
        ctypes.c_float(lo), ctypes.c_float(hi),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out


def f32_to_f16(x: np.ndarray) -> np.ndarray:
    """IEEE binary16 conversion (round-to-nearest-even), one pass."""
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint16)
    _lib.hk_f32_to_f16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
    )
    return out.view(np.float16)
