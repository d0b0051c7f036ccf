"""ctypes bridge to the native lexical analyzer (native/analyzer.cpp).

Loads ``liborag_native.so`` if built (``make -C native``); every entry
point has a pure-Python fallback so the framework works unbuilt. The
native path only handles ASCII text (byte-wise tokenization); non-ASCII
falls back to Python, which is authoritative.

Parity with index/lexical.py and models/tokenizer.py is enforced by
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "liborag_native.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "liborag_native.so"),
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.orag_tokenize.restype = ctypes.c_int64
            lib.orag_tokenize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            lib.orag_term_counts.restype = ctypes.c_int64
            lib.orag_term_counts.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.orag_model_tokenize.restype = ctypes.c_int64
            lib.orag_model_tokenize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            # Learned-vocab tokenizer entry points are absent from a
            # stale prebuilt .so; gate on presence so the fallback path
            # (not an AttributeError) handles it.
            if hasattr(lib, "orag_vocab_build"):
                lib.orag_vocab_build.restype = ctypes.c_int64
                lib.orag_vocab_build.argtypes = [
                    ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                    ctypes.c_int64, ctypes.c_int64]
                lib.orag_vocab_free.restype = None
                lib.orag_vocab_free.argtypes = [ctypes.c_int64]
                lib.orag_vocab_tokenize.restype = ctypes.c_int64
                lib.orag_vocab_tokenize.argtypes = [
                    ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
            _lib = lib
            break
    return _lib


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree. Returns availability."""
    global _load_attempted
    native_dir = os.path.dirname(_LIB_PATHS[0])
    if not os.path.exists(os.path.join(native_dir, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", native_dir],
                       capture_output=quiet, check=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    _load_attempted = False
    return _try_load() is not None


def available() -> bool:
    return _try_load() is not None


def tokenize_hash(text: str, vocab_size: int) -> Optional[np.ndarray]:
    """Native lexical tokenization -> term ids; None if unavailable or
    non-ASCII input (Python path is authoritative there)."""
    lib = _try_load()
    if lib is None or not text.isascii():
        return None
    raw = text.encode()
    cap = max(len(raw), 16)
    out = np.empty(cap, np.int32)
    n = lib.orag_tokenize(
        raw, len(raw), vocab_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    return out[:n].copy()


def term_counts(text: str, vocab_size: int
                ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Native per-doc (term_ids, tfs, doc_len); None if unavailable."""
    lib = _try_load()
    if lib is None or not text.isascii():
        return None
    raw = text.encode()
    cap = max(len(raw), 16)
    terms = np.empty(cap, np.int32)
    tfs = np.empty(cap, np.int32)
    dlen = ctypes.c_int64(0)
    n = lib.orag_term_counts(
        raw, len(raw), vocab_size,
        terms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tfs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cap, ctypes.byref(dlen))
    return terms[:n].copy(), tfs[:n].copy(), int(dlen.value)


def model_tokenize(text: str, vocab_size: int, num_special: int = 4,
                   split_len: int = 12) -> Optional[List[int]]:
    """Native HashTokenizer.tokenize; None if unavailable/non-ASCII."""
    lib = _try_load()
    if lib is None or not text.isascii():
        return None
    raw = text.encode()
    cap = max(len(raw) * 2, 16)
    out = np.empty(cap, np.int32)
    n = lib.orag_model_tokenize(
        raw, len(raw), vocab_size, num_special, split_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    return out[:n].tolist()


def vocab_build(words: List[str], vocab_size: int, num_special: int = 4,
                split_len: int = 12) -> Optional[int]:
    """Build a native learned-vocabulary tokenizer state; returns a
    handle for ``vocab_tokenize`` or None if unavailable. Words get ids
    num_special + index (VocabTokenizer's mapping); non-ASCII words are
    fine in the table (looked up by UTF-8 bytes), though such TEXT still
    routes to Python."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "orag_vocab_build"):
        return None
    blob = "\n".join(words).encode("utf-8")
    h = lib.orag_vocab_build(blob, len(blob), vocab_size, num_special,
                             split_len)
    return int(h) or None


def vocab_free(handle: int) -> None:
    lib = _try_load()
    if lib is not None and hasattr(lib, "orag_vocab_free"):
        lib.orag_vocab_free(handle)


def vocab_tokenize(handle: int, text: str) -> Optional[List[int]]:
    """Native VocabTokenizer.tokenize; None if unavailable/non-ASCII."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "orag_vocab_tokenize") \
            or not text.isascii():
        return None
    raw = text.encode()
    cap = max(len(raw) * 2, 16)
    out = np.empty(cap, np.int32)
    n = lib.orag_vocab_tokenize(
        handle, raw, len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n < 0:
        return None
    return out[:n].tolist()
