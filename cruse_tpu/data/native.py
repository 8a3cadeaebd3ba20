"""ctypes bindings for the native IO core (native/cruseio.cc).

Build on demand (`ensure_built()` shells out to make); every entry point
falls back to the pure-python path when the library is unavailable, so the
framework never hard-depends on a compiler at runtime.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libcruseio.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Compile libcruseio.so if missing. Returns availability."""
    if _LIB_PATH.exists():
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return _LIB_PATH.exists()


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not ensure_built():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.cruseio_decode.restype = ctypes.c_int
    lib.cruseio_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cruseio_load_batch.restype = None
    lib.cruseio_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.cruseio_assemble_batch.restype = None
    lib.cruseio_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_uint64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode(path: str, sr: int | None = None, max_seconds: float = 120.0):
    """Decode one wav natively: returns (float32 mono array, sample_rate).
    Raises on failure (callers fall back to wavio.read_wav)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    target_sr = sr or 0
    cap = int(max_seconds * (sr or 48000))
    out = np.zeros(cap, np.float32)
    found = ctypes.c_long(0)
    sr_io = ctypes.c_int(target_sr)
    n = lib.cruseio_decode(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
        ctypes.byref(found),
        ctypes.byref(sr_io),
    )
    if n < 0:
        raise IOError(f"native decode failed: {path}")
    return out[:n].copy(), sr_io.value


def load_batch(paths: List[str], target_len: int, target_sr: int, seed: int = 0,
               threads: int = 8):
    """Decode+resample+random-crop a batch on the thread pool.

    Returns (batch [N, target_len] float32, ok [N] bool, lens [N] int64 --
    the decoded length per row, so callers can detect short files that were
    zero-padded rather than cropped)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    ok = np.zeros(n, np.int32)
    lens = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.cruseio_load_batch(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len,
        target_sr,
        seed,
        threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    return out, ok.astype(bool), lens


def assemble_batch(pool: List[str], batch_size: int, target_len: int, gap_len: int,
                   target_sr: int, seed: int = 0, threads: int = 8):
    """Reference SynDataset selection natively: per row, concat random files
    from `pool` with `gap_len` samples of silence until >= target_len, then
    random-crop. Returns (batch [B, target_len] float32, ok [B] bool)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = np.zeros((batch_size, target_len), np.float32)
    ok = np.zeros(batch_size, np.int32)
    arr = (ctypes.c_char_p * len(pool))(*[p.encode() for p in pool])
    lib.cruseio_assemble_batch(
        arr,
        len(pool),
        batch_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len,
        gap_len,
        target_sr,
        seed,
        threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    return out, ok.astype(bool)
