"""Native host execution backend: C++ CSR joins with reference-equal counters.

Wraps ``native/hj3engine.cpp`` (built on demand with g++, loaded via ctypes).
Two roles:

* **scalable differential oracle** -- the randomized test suite checks the
  TPU engine's match counts, comparison counts and result multisets against
  this engine at sizes where the pure-Python insertion-simulating oracle
  (``tests/oracle.py``) is too slow;
* **small-query fallback** -- for tiny ad-hoc joins the remote TPU
  compile+dispatch latency (seconds through the tunnel) dwarfs execution;
  callers can route such queries here (same semantics, same counters).

Counter semantics match ``ht_chaining.hh:236-248`` / ``ht_nested.hh:354-382``
/ ``algebra.hh:625-659`` bit-exactly (verified against the python oracle and
the reference binaries' CSVs in tests).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent / "native"
_SRC = _DIR / "hj3engine.cpp"
_SO = _DIR / "libhj3engine.so"

_lib = None
_lib_tried = False


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def _i64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_engine():
    """Load (building if needed) the native engine; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-std=c++20", "-shared", "-fPIC",
                 "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        argt = [ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.c_uint32, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        lib.hj3e_chaining_join.restype = ctypes.c_int64
        lib.hj3e_chaining_join.argtypes = argt
        lib.hj3e_nested_join.restype = ctypes.c_int64
        lib.hj3e_nested_join.argtypes = argt
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def host_chaining_join(build_keys, probe_keys, num_buckets: int,
                       unique: bool = False, out_cap: int | None = None):
    """Chaining hash join on the host engine.

    Returns ``(probe_rows, build_rows, num_matches, num_cmps)``; the pair
    arrays are trimmed to the true result size.  Raises if the native engine
    is unavailable or ``out_cap`` was insufficient.
    """
    lib = native_engine()
    if lib is None:
        raise RuntimeError("native engine unavailable (g++ build failed?)")
    bk = np.ascontiguousarray(build_keys, np.uint32)
    pk = np.ascontiguousarray(probe_keys, np.uint32)
    cap = int(out_cap) if out_cap is not None else max(
        16, 4 * pk.size + bk.size)
    while True:
        op = np.empty(cap, np.int32)
        ob = np.empty(cap, np.int32)
        ctr = np.zeros(2, np.int64)
        n = lib.hj3e_chaining_join(_u32p(bk), bk.size, _u32p(pk), pk.size,
                                   num_buckets, int(unique), _i32p(op),
                                   _i32p(ob), cap, _i64p(ctr))
        if n >= 0:
            return op[:n].copy(), ob[:n].copy(), int(ctr[0]), int(ctr[1])
        if out_cap is not None:  # explicit cap: surface the overflow
            raise ValueError(f"out_cap={cap} too small (matches={ctr[0]})")
        cap = max(int(ctr[0]), 1)  # counters are exact: retry once, exact-size


def host_nested_join(build_keys, probe_keys, num_buckets: int,
                     unnest: bool = True, out_cap: int | None = None):
    """3D/nested hash join on the host engine.

    Returns ``(probe_rows, build_rows, num_matches, num_cmps, num_unnested)``
    where the pair arrays are the unnested result (empty if ``unnest=False``).
    """
    lib = native_engine()
    if lib is None:
        raise RuntimeError("native engine unavailable (g++ build failed?)")
    bk = np.ascontiguousarray(build_keys, np.uint32)
    pk = np.ascontiguousarray(probe_keys, np.uint32)
    cap = int(out_cap) if out_cap is not None else max(
        16, 4 * pk.size + bk.size)
    if not unnest:
        cap = 1
    while True:
        op = np.empty(cap, np.int32)
        ob = np.empty(cap, np.int32)
        ctr = np.zeros(3, np.int64)
        n = lib.hj3e_nested_join(_u32p(bk), bk.size, _u32p(pk), pk.size,
                                 num_buckets, int(unnest), _i32p(op),
                                 _i32p(ob), cap, _i64p(ctr))
        if n >= 0:
            return (op[:n].copy(), ob[:n].copy(),
                    int(ctr[0]), int(ctr[1]), int(ctr[2]))
        if out_cap is not None:
            raise ValueError(f"out_cap={cap} too small (unnested={ctr[2]})")
        cap = max(int(ctr[2]), 1)  # counters are exact: retry once, exact-size
