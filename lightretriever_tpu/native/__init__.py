"""Native (C++) host-side components, loaded via ctypes.

The reference leans on a Rust extension (`sparse_emb_util`) for its sparse
converter fast path; here the equivalent lives in converter.cpp, compiled
lazily with g++ into a cached shared object. Every native entry point has a
pure-numpy fallback (inference/converter.py), mirroring the reference's
``*_pt`` fallbacks (sparse_converter_mixin.py:103-188).
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from typing import Optional

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_ICU_LIB: Optional[ctypes.CDLL] = None
_ICU_TRIED = False


def _build_lib(src_name: str, extra_flags: tuple[str, ...] = ()) -> Optional[str]:
    """Lazily compile ``src_name`` (in this directory) into a content-hashed
    cached shared object; returns its path or None on toolchain failure."""
    src = os.path.join(os.path.dirname(__file__), src_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "lightretriever_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    stem = os.path.splitext(src_name)[0]
    so_path = os.path.join(cache_dir, f"{stem}_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
           "-o", so_path, *extra_flags]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so_path
    except Exception as e:  # missing toolchain etc. -> pure-python fallback
        logger.warning("native build of %s failed (%s); using fallback", src_name, e)
        return None


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build_lib("converter.cpp")
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.lr_sparse_convert.restype = ctypes.c_void_p
    lib.lr_sparse_convert.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.lr_token_counts_json.restype = ctypes.c_void_p
    lib.lr_token_counts_json.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    lib.lr_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_sparse_convert(reps, quantization_factor: int, pseudo_text: bool):
    """Dense [B, V] float32 -> list of json strs / pseudo-text strs, or None
    if the native library is unavailable."""
    import numpy as np

    lib = get_native_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(reps, np.float32)
    b, v = arr.shape
    ptr = lib.lr_sparse_convert(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, v, quantization_factor, 1 if pseudo_text else 0,
    )
    try:
        raw = ctypes.string_at(ptr).decode("utf-8")
    finally:
        lib.lr_free(ptr)
    lines = raw.split("\n")[:b]
    return lines


_HNSW_LIB: Optional[ctypes.CDLL] = None
_HNSW_TRIED = False


def get_hnsw_lib() -> Optional[ctypes.CDLL]:
    """Load the from-scratch HNSW graph engine (hnsw.cpp), or None if the
    toolchain is unavailable (callers fall back to exact flat search)."""
    global _HNSW_LIB, _HNSW_TRIED
    if _HNSW_LIB is not None or _HNSW_TRIED:
        return _HNSW_LIB
    _HNSW_TRIED = True
    so = _build_lib("hnsw.cpp")
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.lr_hnsw_build.restype = ctypes.c_void_p
    lib.lr_hnsw_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
    ]
    lib.lr_hnsw_size.restype = ctypes.c_int64
    lib.lr_hnsw_size.argtypes = [ctypes.c_void_p]
    lib.lr_hnsw_dim.restype = ctypes.c_int32
    lib.lr_hnsw_dim.argtypes = [ctypes.c_void_p]
    lib.lr_hnsw_search.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.lr_hnsw_free.argtypes = [ctypes.c_void_p]
    lib.lr_hnsw_save.restype = ctypes.c_int32
    lib.lr_hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lr_hnsw_load.restype = ctypes.c_void_p
    lib.lr_hnsw_load.argtypes = [ctypes.c_char_p]
    _HNSW_LIB = lib
    return _HNSW_LIB


def get_icu_lib() -> Optional[ctypes.CDLL]:
    """Load the ICU4C word-segmenter wrapper (icu_segmenter.cpp), or None if
    the toolchain or the system ICU runtime is unavailable."""
    global _ICU_LIB, _ICU_TRIED
    if _ICU_LIB is not None or _ICU_TRIED:
        return _ICU_LIB
    _ICU_TRIED = True
    so = _build_lib("icu_segmenter.cpp", ("-ldl",))
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.lr_icu_available.restype = ctypes.c_int
    lib.lr_icu_open.restype = ctypes.c_void_p
    lib.lr_icu_open.argtypes = [ctypes.c_char_p]
    lib.lr_icu_close.argtypes = [ctypes.c_void_p]
    lib.lr_icu_segment.restype = ctypes.c_void_p
    lib.lr_icu_segment.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64]
    lib.lr_icu_free.argtypes = [ctypes.c_void_p]
    if not lib.lr_icu_available():
        logger.warning("system ICU runtime not found; regex word segmentation fallback")
        return None
    _ICU_LIB = lib
    return _ICU_LIB
