"""Native (C++) components, loaded via ctypes.

The shared library is compiled lazily with g++ on first use and cached
next to the sources; everything degrades gracefully to the pure-Python
paths when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fast_parser.cpp")
_LIB = os.path.join(_HERE, "libfastparser.so")
_HASH = _LIB + ".srchash"

_lock = threading.Lock()
_lib = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(src_hash: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        with open(_HASH, "w") as f:
            f.write(src_hash)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _stale(src_hash: str) -> bool:
    # source-hash check, not mtime: git checkouts randomize mtime order,
    # which forced a spurious ~12 s g++ rebuild into the first model's
    # init_model on fresh clones (and an mtime tie could miss a REAL
    # source change committed together with a stale binary)
    if not os.path.exists(_LIB):
        return True
    try:
        with open(_HASH) as f:
            return f.read().strip() != src_hash
    except OSError:
        return True


def get_lib():
    """The loaded shared library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_hash = _src_hash()
        if _stale(src_hash):
            if not _build(src_hash):
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mml_parse.restype = ctypes.c_int64
        lib.mml_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.mml_free.restype = None
        lib.mml_free.argtypes = [ctypes.c_void_p]
        try:
            lib.mml_count_items.restype = None
            lib.mml_count_items.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
            lib.mml_bucket_count.restype = None
            lib.mml_bucket_count.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_void_p]
            lib.mml_bucket_fill_packed.restype = None
            lib.mml_bucket_fill_packed.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p]
        except AttributeError:
            pass  # stale .so without the bucketizer: parser still works
        _lib = lib
        return _lib


def _c(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


def count_items(items, size: int):
    """Threaded native bincount of an int32 id array, or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mml_count_items"):
        return None
    items = np.ascontiguousarray(items, dtype=np.int32)
    out = np.zeros(size, np.int64)
    lib.mml_count_items(_c(items), len(items), size, _c(out))
    return out


def mxu_bucketize(users, items, values, perm, new_of_old,
                  UB: int, IB: int, n_ib: int, nbkt: int, chunk_fn):
    """Native counting-sort replacement for the numpy middle of
    ``prepare_mxu_data`` (shuffle-gather + bucket argsort + padded
    scatter + stack, measured ~35 s at the Netflix 20M-rating shape).
    ``chunk_fn(bcount) -> chunk`` picks the chunk size from the bucket
    histogram (the histogram-optimal planner). Returns
    (packed [nc, 4, chunk] int32, bcount, pcount, chunk) or None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "mml_bucket_count"):
        return None
    users = np.ascontiguousarray(users, dtype=np.int32)
    items = np.ascontiguousarray(items, dtype=np.int32)
    values = np.ascontiguousarray(values, dtype=np.float32)
    new_of_old = np.ascontiguousarray(new_of_old, dtype=np.int32)
    if perm is not None:
        perm = np.ascontiguousarray(perm, dtype=np.int64)
    n = len(users)
    bcount = np.zeros(nbkt, np.int64)
    lib.mml_bucket_count(_c(users), _c(items),
                         _c(perm) if perm is not None else None, n,
                         _c(new_of_old), UB, IB, n_ib, nbkt, _c(bcount))
    chunk = int(chunk_fn(bcount))
    pcount = ((bcount + chunk - 1) // chunk) * chunk
    poff = np.concatenate([[0], np.cumsum(pcount)])
    total = int(poff[-1])
    nc = max(total // chunk, 1)
    packed = np.zeros((nc, 4, chunk), np.int32)
    cursor = np.ascontiguousarray(poff[:-1], dtype=np.int64)
    lib.mml_bucket_fill_packed(
        _c(users), _c(items), _c(values),
        _c(perm) if perm is not None else None, n, _c(new_of_old),
        UB, IB, n_ib, _c(cursor), chunk, _c(packed))
    return packed, bcount, pcount, chunk


def parse_numeric_file(path: str, min_columns: int,
                       skip_first_line: bool = False):
    """Parse a numeric interaction file natively. Returns
    (users, items, values, times) numpy arrays (values/times None when not
    requested), or None if the native parser is unavailable or the file
    contains non-numeric ids (caller falls back to the Python reader)."""
    lib = get_lib()
    if lib is None:
        return None
    users_p = ctypes.POINTER(ctypes.c_int32)()
    items_p = ctypes.POINTER(ctypes.c_int32)()
    values_p = ctypes.POINTER(ctypes.c_float)()
    times_p = ctypes.POINTER(ctypes.c_int64)()
    n = lib.mml_parse(path.encode(), min_columns, int(skip_first_line),
                      ctypes.byref(users_p), ctypes.byref(items_p),
                      ctypes.byref(values_p), ctypes.byref(times_p))
    if n < 0:
        return None
    try:
        def take(ptr, dtype, count):
            if not ptr or count == 0:
                return np.zeros(0, dtype=dtype)
            return np.ctypeslib.as_array(ptr, shape=(count,)).astype(
                dtype, copy=True)

        users = take(users_p, np.int32, n)
        items = take(items_p, np.int32, n)
        values = take(values_p, np.float32, n) if min_columns >= 3 else None
        times = take(times_p, np.int64, n) if min_columns >= 4 else None
    finally:
        for p in (users_p, items_p, values_p, times_p):
            if p:
                lib.mml_free(ctypes.cast(p, ctypes.c_void_p))
    return users, items, values, times
