"""Native (C++) host runtime: built on demand with g++, loaded via ctypes."""

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None


def _build() -> Path:
    src = _HERE / "modset_native.cpp"
    stamp = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    build_dir = _HERE / "_build"
    build_dir.mkdir(exist_ok=True)
    so = build_dir / f"modset_native-{stamp}.so"
    if not so.exists():
        tmp = so.with_suffix(f".tmp{os.getpid()}.so")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(tmp), str(src)],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


def lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            _LIB = ctypes.CDLL(str(_build()))
            _declare(_LIB)
        return _LIB


def _declare(L):
    c = ctypes
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    L.ms_find_batch.restype = None
    L.ms_find_batch.argtypes = [u32p, u64p, c.c_int, c.c_uint64, c.c_int,
                                u64p, c.c_int64, u32p]
    L.ms_insert_batch.restype = c.c_int64
    L.ms_insert_batch.argtypes = [u32p, u64p, u16p, u8p, c.c_int, c.c_uint64,
                                  c.c_int, c.c_int64, c.c_int64, u64p,
                                  c.c_void_p, c.c_int64, c.c_void_p]
    L.ms_merge_batch.restype = c.c_int64
    L.ms_merge_batch.argtypes = [u32p, u64p, u16p, u8p, c.c_int, c.c_uint64,
                                 c.c_int, c.c_int64, c.c_int64, u64p, u16p,
                                 u8p, c.c_int64]
    L.ms_rebuild_table.restype = c.c_int64
    L.ms_rebuild_table.argtypes = [u32p, u64p, c.c_int, c.c_uint64, c.c_int,
                                   c.c_int64]
