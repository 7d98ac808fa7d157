"""Native IO runtime: C++ WAV decoder + threaded batch loader (ctypes).

Parity target: the reference's native data path (torch DataLoader C++
worker pool + libsndfile decoding). The shared library is built from
wavio.cpp on first use with g++ (cached next to the source, rebuilt when
the source is newer); every entry point degrades to the Python
scipy/wave implementations when the toolchain or the .so is unavailable,
so the framework never hard-depends on a compiler at runtime.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger("espnet_slurp_tpu")

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "wavio.cpp"
_SO = _HERE / "_wavio.so"
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               str(_SRC), "-o", str(_SO), "-lpthread"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # no g++ / sandboxed build dir
        log.info("native wavio build unavailable (%s); python IO fallback",
                 e)
        return False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ESPNET_NO_NATIVE_IO"):
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        log.info("native wavio load failed (%s)", e)
        return None
    lib.wavio_read.restype = ctypes.c_long
    lib.wavio_read.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                               ctypes.POINTER(ctypes.c_int)]
    lib.wavio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.wavio_num_samples.restype = ctypes.c_long
    lib.wavio_num_samples.argtypes = [ctypes.c_char_p]
    lib.wavio_read_batch.restype = ctypes.c_int
    lib.wavio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode one file natively; None => caller should fall back."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n = lib.wavio_read(str(path).encode(), ctypes.byref(out),
                       ctypes.byref(sr))
    if n < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wavio_free(out)
    return arr, int(sr.value)


def num_samples(path: str) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    n = lib.wavio_num_samples(str(path).encode())
    return int(n) if n >= 0 else None


def load_batch(paths: Sequence[str], pad_to: int,
               n_threads: int = 8) -> Optional[Tuple[np.ndarray,
                                                     np.ndarray]]:
    """Decode a batch on the C++ thread pool into one padded buffer.

    Returns (wavs [B, pad_to] float32 zero-padded, lengths [B] int32), or
    None if any file needs the Python fallback.
    """
    lib = _load()
    if lib is None or not paths:
        return None
    b = len(paths)
    buf = np.zeros((b, pad_to), np.float32)
    lengths = np.zeros((b,), np.int32)
    arr = (ctypes.c_char_p * b)(*[str(p).encode() for p in paths])
    rc = lib.wavio_read_batch(
        arr, b, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pad_to, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    if rc != 0:
        return None
    return buf, lengths


# ---------------------------------------------------------------------------
# Native edit-distance scorer (edit_distance.cpp) — same lazy-build pattern.
# ---------------------------------------------------------------------------

_ED_SRC = _HERE / "edit_distance.cpp"
_ED_SO = _HERE / "_edit_distance.so"
_ED_LIB = None
_ED_TRIED = False


def _load_ed():
    global _ED_LIB, _ED_TRIED
    if _ED_LIB is not None or _ED_TRIED:
        return _ED_LIB
    _ED_TRIED = True
    if os.environ.get("ESPNET_NO_NATIVE_IO"):
        return None
    if not _ED_SO.exists() or \
            _ED_SO.stat().st_mtime < _ED_SRC.stat().st_mtime:
        try:
            subprocess.run(["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                            str(_ED_SRC), "-o", str(_ED_SO), "-lpthread"],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:
            log.info("native edit-distance build unavailable (%s)", e)
            return None
    try:
        lib = ctypes.CDLL(str(_ED_SO))
    except OSError as e:
        log.info("native edit-distance load failed (%s)", e)
        return None
    lib.edit_stats_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    _ED_LIB = lib
    return lib


def edit_stats_batch(refs: Sequence[Sequence[int]],
                     hyps: Sequence[Sequence[int]],
                     n_threads: int = 8) -> Optional[np.ndarray]:
    """Batch Levenshtein alignment counts on the C++ thread pool.

    refs/hyps: per-utterance integer token id sequences. Returns
    [B, 4] int32 (hits, subs, dels, ins) with tie-breaking identical to
    utils/metrics.align_stats, or None when the native path is unavailable.
    """
    lib = _load_ed()
    if lib is None:
        return None
    b = len(refs)
    flat_r = np.asarray([t for r in refs for t in r], np.int32)
    flat_h = np.asarray([t for h in hyps for t in h], np.int32)
    off_r = np.zeros((b + 1,), np.int64)
    off_h = np.zeros((b + 1,), np.int64)
    np.cumsum([len(r) for r in refs], out=off_r[1:])
    np.cumsum([len(h) for h in hyps], out=off_h[1:])
    out = np.zeros((b, 4), np.int32)
    # keep arrays non-empty for ctypes pointers
    if flat_r.size == 0:
        flat_r = np.zeros((1,), np.int32)
    if flat_h.size == 0:
        flat_h = np.zeros((1,), np.int32)
    lib.edit_stats_batch(
        flat_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        off_r.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flat_h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        off_h.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    return out
