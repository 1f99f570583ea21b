"""BM25 text pipeline, matching the reference semantics exactly so that
scores are comparable (/root/reference/src/indexes/tf_idf/mod.rs:282-399):

tokenize (runs of alphanumeric/underscore) → lowercase → 35-stopword filter →
Snowball English stem → xxhash32(seed=0) term id → BM25 term frequency
normalized with k1/b at index time.

Host-side by design: stemming/hashing is branchy string work; the TPU sees
only the resulting (term_id, tf) postings.
"""

from __future__ import annotations

import re
from functools import lru_cache

import xxhash
from nltk.stem.snowball import SnowballStemmer

# the reference's 35 stopwords (tf_idf/mod.rs:282-286)
STOPWORDS = frozenset(
    [
        "a", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
        "into", "is", "it", "no", "not", "of", "on", "or", "s", "such", "t",
        "that", "the", "their", "then", "there", "these", "they", "this",
        "to", "was", "will", "with", "www",
    ]
)

# Rust char::is_alphanumeric() or '_' (tf_idf/mod.rs:288-308). Python's \w
# with UNICODE covers the same classes (letters, digits, underscore).
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

_stemmer = SnowballStemmer("english")

# Native (C++) fast path for pure-ASCII documents: tokenize + Snowball stem +
# xxhash32 + BM25 tf in one call (csrc/text_pipeline.cpp). Differentially
# tested bit-identical to the Python path (tests/test_native_text.py).
_native = None
try:
    import ctypes as _ctypes
    from pathlib import Path as _Path

    _lib_path = _Path(__file__).with_name("_native.so")
    if _lib_path.exists():
        _native = _ctypes.CDLL(str(_lib_path))
        _native.tp_process_text.restype = _ctypes.c_int
        _native.tp_process_text.argtypes = [
            _ctypes.c_char_p, _ctypes.c_int, _ctypes.c_float, _ctypes.c_float,
            _ctypes.c_float, _ctypes.POINTER(_ctypes.c_uint32),
            _ctypes.POINTER(_ctypes.c_float), _ctypes.c_int,
            _ctypes.POINTER(_ctypes.c_int),
        ]
except Exception:  # pragma: no cover - fall back to Python silently
    _native = None


def _native_process_text(text, max_token_len, avg_doc_len, k1, b):
    """Returns [(hash, tf)] or None if the native path can't handle it."""
    if _native is None:
        return None
    try:
        data = text.encode("ascii")
    except UnicodeEncodeError:
        return None
    if b"\x00" in data:
        # c_char_p is NUL-terminated: the C side would silently truncate
        # at an embedded NUL while the Python regex path skips it —
        # route such documents to Python to keep the paths identical
        return None
    import ctypes

    buf = _native_buffers()
    hashes, tfs, doc_len, cap = buf
    n = _native.tp_process_text(
        data, max_token_len, avg_doc_len, k1, b, hashes, tfs, cap,
        ctypes.byref(doc_len),
    )
    if n < 0:
        return None
    if n >= cap:
        # output buffer full: terms past the cap were dropped — fall back
        # to the Python path rather than silently losing postings
        return None
    return [(hashes[i], tfs[i]) for i in range(n)]


_tls = None


def _native_buffers():
    """Per-thread reusable output buffers (allocation dominates short docs)."""
    global _tls
    import ctypes
    import threading

    if _tls is None:
        _tls = threading.local()
    if not hasattr(_tls, "buf"):
        cap = 65536
        _tls.buf = (
            (ctypes.c_uint32 * cap)(),
            (ctypes.c_float * cap)(),
            ctypes.c_int(0),
            cap,
        )
    return _tls.buf


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


@lru_cache(maxsize=65536)
def _stem_hash(lower_token: str) -> int:
    stemmed = _stemmer.stem(lower_token)
    return xxhash.xxh32(stemmed.encode("utf-8"), seed=0).intdigest()


def _tok_len(tok: str) -> int:
    """Token length in UTF-8 BYTES: the reference checks Rust &str byte
    length (mod.rs:304), so a 25-char Cyrillic token (50 bytes) must be
    dropped by both implementations for scores to stay comparable. ASCII
    fast path avoids the encode."""
    return len(tok) if tok.isascii() else len(tok.encode("utf-8"))


def count_tokens(text: str, max_token_len: int = 40) -> int:
    """Document length = count of valid non-stopword tokens (mod.rs:373-389)."""
    n = 0
    for tok in tokenize(text):
        if _tok_len(tok) > max_token_len:
            continue
        if tok.lower() in STOPWORDS:
            continue
        n += 1
    return n


def _term_counts(text: str, max_token_len: int) -> dict[int, int]:
    freq: dict[int, int] = {}
    for tok in tokenize(text):
        if _tok_len(tok) > max_token_len:
            continue
        lower = tok.lower()
        if lower in STOPWORDS:
            continue
        h = _stem_hash(lower)
        freq[h] = freq.get(h, 0) + 1
    return freq


def compute_bm25_tf(
    count: int, doc_len: int, avg_doc_len: float, k1: float, b: float
) -> float:
    """BM25 TF with k1/b (tf_idf/mod.rs:362-371)."""
    return count * (k1 + 1.0) / (count + k1 * (1.0 - b + b * (doc_len / avg_doc_len)))


def process_text(
    text: str,
    max_token_len: int = 40,
    avg_doc_len: float = 1.0,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[int, float]]:
    """Document → [(term_hash u32, bm25_tf f32)] (mod.rs:310-360)."""
    native = _native_process_text(text, max_token_len, avg_doc_len, k1, b)
    if native is not None:
        return native
    doc_len = count_tokens(text, max_token_len)
    freq = _term_counts(text, max_token_len)
    return [
        (h, compute_bm25_tf(c, doc_len, avg_doc_len, k1, b))
        for h, c in freq.items()
    ]


def process_text_query(text: str, max_token_len: int = 40) -> list[int]:
    """Query → unique term hashes (search_bm25 only consumes the hashes,
    sparse_ann_query.rs:161-180)."""
    return list(_term_counts(text, max_token_len).keys())
