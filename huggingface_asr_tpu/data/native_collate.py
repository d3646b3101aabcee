"""ctypes bindings for the native batch assembler (native/collate.cpp).

Compiled on first use with g++ (cached under ``native/``); every entry point
has a numpy fallback so the framework works without a toolchain. The native
path removes the per-example Python overhead from hot batch assembly — the
role PyTorch's C++ DataLoader machinery plays for the reference.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcollate.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "collate.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_SRC_PATH) > os.path.getmtime(_LIB_PATH)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                     _SRC_PATH, "-o", _LIB_PATH],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.collate_f32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.collate_i32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.pcm16_to_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int
            ]
            lib.pcm16_to_f32.restype = ctypes.c_int64
            _lib = lib
            logger.info("native collate library loaded from %s", _LIB_PATH)
        except Exception as e:  # pragma: no cover
            logger.warning("native collate unavailable (%s); numpy fallback", e)
        return _lib


def collate_f32(
    rows: List[np.ndarray], max_len: int, num_threads: int = 4
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad ragged float32 rows into a (B, max_len) batch + int32 lengths."""
    B = len(rows)
    lib = _load()
    rows = [np.ascontiguousarray(r, dtype=np.float32) for r in rows]
    out = np.empty((B, max_len), np.float32)
    out_lens = np.empty((B,), np.int32)
    if lib is None:
        out.fill(0.0)
        for i, r in enumerate(rows):
            n = min(len(r), max_len)
            out[i, :n] = r[:n]
            out_lens[i] = n
        return out, out_lens
    ptrs = (ctypes.c_void_p * B)(
        *[r.ctypes.data_as(ctypes.c_void_p).value for r in rows]
    )
    lens = (ctypes.c_int64 * B)(*[len(r) for r in rows])
    lib.collate_f32(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
        B, max_len,
        out.ctypes.data_as(ctypes.c_void_p),
        out_lens.ctypes.data_as(ctypes.c_void_p),
        num_threads,
    )
    return out, out_lens


def collate_i32(
    rows: List[List[int]], max_len: int, fill: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    B = len(rows)
    lib = _load()
    arrs = [np.ascontiguousarray(r, dtype=np.int32) for r in rows]
    out = np.empty((B, max_len), np.int32)
    out_lens = np.empty((B,), np.int32)
    if lib is None:
        out.fill(fill)
        for i, r in enumerate(arrs):
            n = min(len(r), max_len)
            out[i, :n] = r[:n]
            out_lens[i] = n
        return out, out_lens
    ptrs = (ctypes.c_void_p * B)(
        *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
    )
    lens = (ctypes.c_int64 * B)(*[len(a) for a in arrs])
    lib.collate_i32(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        ctypes.cast(lens, ctypes.POINTER(ctypes.c_int64)),
        B, max_len, fill,
        out.ctypes.data_as(ctypes.c_void_p),
        out_lens.ctypes.data_as(ctypes.c_void_p),
    )
    return out, out_lens


def pcm16_to_f32(pcm: np.ndarray, trim: bool = True) -> np.ndarray:
    """int16 PCM → float32 waveform, with zero-trim (data_utils.py:173-177)."""
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    lib = _load()
    if lib is None:
        x = np.trim_zeros(pcm) if trim else pcm
        return x.astype(np.float32) / 32768.0
    out = np.empty(len(pcm), np.float32)
    n = lib.pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.c_void_p), len(pcm),
        out.ctypes.data_as(ctypes.c_void_p), int(trim),
    )
    return out[:n]
