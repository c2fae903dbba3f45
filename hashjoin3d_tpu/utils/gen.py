"""Synthetic data generation: bit-exact benchmark inputs for the engine.

Re-implementation of the reference's data-generation layer
(``util/GenRandIntVec.{hh,cc}``, ``util/zipf_distribution.hh``,
``main_experiment1.cc:415-457``, ``main_experiment4.cc:517-575``) with two
backends:

* **native** (preferred): ``native/hj3gen.cpp`` compiled on demand to
  ``libhj3gen.so`` -- calls the same libstdc++ facilities as the reference in
  the same order, so streams are bit-identical by construction.
* **python**: ``mt19937.py`` -- a pure-Python replica of the same protocols,
  used when no C++ toolchain is available.  Tested for equality with native.

Distribution names/codes follow the reference (``GenRandIntVec.hh:24-34``):
key, div, uni, exp, norm, zipf, self, pois.  The python backend covers all
eight with bit-identical streams (libstdc++ exponential, Marsaglia-polar
normal and Devroye-rejection poisson protocols replicated in ``mt19937.py``).
"""

from __future__ import annotations

import ctypes
import math
import subprocess
from pathlib import Path

import numpy as np

from . import mt19937 as pymt

DIST_NAMES = ["key", "div", "uni", "exp", "norm", "zipf", "self", "pois"]
KKEY, KDIV, KUNI, KEXP, KNORM, KZIPF, KSELF, KPOIS = range(8)
FLAG_FILL, FLAG_SHUFFLE = 1, 2

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO = _NATIVE_DIR / "libhj3gen.so"
_SRC = _NATIVE_DIR / "hj3gen.cpp"

_lib = None
_lib_tried = False


def _u32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def native_lib():
    """Load (building if needed) the native generator; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-std=c++20", "-shared", "-fPIC",
                 "-o", str(_SO), str(_SRC)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.hj3_exp1.restype = ctypes.c_int64
        lib.hj3_exp1.argtypes = [ctypes.c_uint32] * 2 + [ctypes.c_int,
                                                         ctypes.c_uint32] + [
            ctypes.POINTER(ctypes.c_uint32)] * 2
        lib.hj3_exp4.restype = None
        lib.hj3_exp4.argtypes = [ctypes.c_uint32] * 5 + [ctypes.c_int] + [
            ctypes.POINTER(ctypes.c_uint32)] * 2
        lib.hj3_gen_int_vec.restype = ctypes.c_int
        lib.hj3_gen_int_vec.argtypes = [
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32)]
        lib.hj3_mt19937_stream.restype = None
        lib.hj3_mt19937_stream.argtypes = [
            ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def mt19937_stream(n: int, seed: int | None = None, backend: str = "auto"):
    """Raw engine outputs (for backend-equality tests)."""
    lib = native_lib() if backend in ("auto", "native") else None
    if lib is not None and backend != "python":
        out = np.empty(n, np.uint32)
        lib.hj3_mt19937_stream(-1 if seed is None else seed, n, _u32p(out))
        return out
    rng = pymt.MT19937(5489 if seed is None else seed)
    return rng.stream(n)


# -- generic GenRandIntVec-equivalent column generator -------------------------

def _py_gen_int_vec(dist, card, maxv, shift, param, flags, order, rng):
    fill = bool(flags & FLAG_FILL)
    shuf = bool(flags & FLAG_SHUFFLE)
    v = np.empty(card, np.uint32)

    def finish(v):
        if order < 0:
            # reference's permutation draw pattern (GenRandIntVec.cc:335-340)
            for i in range(card - 1, 0, -1):
                j = rng() % i
                v[i], v[j] = v[j], v[i]
        elif order > 0:
            v.sort()
        return v

    if dist == KKEY:
        v = np.arange(card, dtype=np.uint32)
        return finish(v)
    if dist == KDIV:
        v = (np.arange(card, dtype=np.uint32) // np.uint32(param))
        return finish(v)

    def draw():
        if dist == KUNI:
            return pymt.std_uniform_int(rng, 0, maxv - 1)
        if dist == KZIPF:
            return (zipf(rng) - 1 + shift) % maxv
        if dist == KSELF:
            u = rng() / 4294967295.0
            return int(maxv * u ** (np.log(param) / np.log(1.0 - param)))
        if dist == KEXP:
            # genval_exp (GenRandIntVec.cc:272-274)
            return int(math.floor(exp_d(rng) * maxv + shift)) % maxv
        if dist == KNORM:
            # genval_norm (GenRandIntVec.cc:277-288): truncate, retry until
            # the double lands in [0, max)
            while True:
                v = norm_d(rng)
                if 0 <= v < maxv:
                    return (int(v) + shift) % maxv
        if dist == KPOIS:
            # genval_pois (GenRandIntVec.cc, pois case)
            return (pois_d(rng) + shift) % maxv
        raise ValueError(f"bad dist code {dist}")

    zipf = pymt.ZipfSampler(maxv, param) if dist == KZIPF else None
    exp_d = pymt.StdExponential(param) if dist == KEXP else None
    norm_d = pymt.StdNormal(maxv / 2.0, param) if dist == KNORM else None
    pois_d = pymt.StdPoisson(param) if dist == KPOIS else None

    if fill or shuf:
        freq = np.ones(maxv, np.uint32) if fill else np.zeros(maxv, np.uint32)
        ndraw = card - (maxv if fill else 0)
        for _ in range(ndraw):
            freq[draw()] += 1
        if shuf and dist != KUNI:  # reference's uni path never shuffles freq
            for i in range(maxv - 1, 0, -1):
                j = rng() % i
                freq[i], freq[j] = freq[j], freq[i]
        v = np.repeat(np.arange(maxv, dtype=np.uint32), freq)
    else:
        for i in range(card):
            v[i] = draw()
    return finish(v)


def gen_rand_int_vec(dist, card, maxv, shift=0, param=0.0, flags=0, order=0,
                     seed=None, backend="auto"):
    """Generate an integer column; mirrors ``GenRandIntVec::generate``.

    ``dist`` may be a code or a name from DIST_NAMES.  ``order``: -1 permute,
    0 none, +1 sort.  ``seed=None`` means default-seeded mt19937 (5489).
    """
    if isinstance(dist, str):
        dist = DIST_NAMES.index(dist)
    lib = native_lib() if backend in ("auto", "native") else None
    if lib is not None and backend != "python":
        out = np.empty(card, np.uint32)
        rc = lib.hj3_gen_int_vec(dist, card, maxv, shift, param, flags, order,
                                 -1 if seed is None else seed, _u32p(out))
        if rc != 0:
            raise ValueError(f"bad dist code {dist}")
        return out
    rng = pymt.MT19937(5489 if seed is None else seed)
    return _py_gen_int_vec(dist, card, maxv, shift, param, flags, order, rng)


# -- experiment input builders --------------------------------------------------

def exp1_data(log2_card_r: int, log2_card_s: int, skew: bool, t: int,
              backend: str = "auto"):
    """Experiment-1 inputs: returns ``(R_k, S_a, num_dv_sa)``.

    R.k = shuffled iota(2^R); S.a uniform/zipf over [0, 2^(R-t)); S.k is a
    plain iota (``main_experiment1.cc:429``) built by the caller when needed.
    """
    card_r, card_s = 1 << log2_card_r, 1 << log2_card_s
    fk_max = 1 << (log2_card_r - t)
    lib = native_lib() if backend in ("auto", "native") else None
    if lib is not None and backend != "python":
        rk = np.empty(card_r, np.uint32)
        sa = np.empty(card_s, np.uint32)
        ndv = lib.hj3_exp1(log2_card_r, log2_card_s, int(skew), t,
                           _u32p(rk), _u32p(sa))
        return rk, sa, int(ndv)
    rng = pymt.MT19937()
    rk = np.arange(card_r, dtype=np.uint32)
    pymt.std_shuffle(rk, rng)
    sa = _py_gen_int_vec(KZIPF if skew else KUNI, card_s, fk_max, 0,
                         1.0 if skew else 0.0, 0, -1, rng)
    return rk, sa, int(np.unique(sa).size)


def exp4_data(log2_card_r: int, alpha: int, mult_a: int, beta: int,
              mult_b: int, shuffle: bool = True, backend: str = "auto"):
    """Experiment-4 FK columns: returns ``(S_a, T_a)``.

    R.k, S.k, T.k are plain iotas (``main_experiment4.cc:522-525,731-756``).
    Cardinality of S and T = (2^R / 2^alpha)*mult_a + (2^R / 2^beta)*mult_b.
    """
    card_r = 1 << log2_card_r
    n_common, n_excl = card_r >> alpha, card_r >> beta
    card = n_common * mult_a + n_excl * mult_b
    lib = native_lib() if backend in ("auto", "native") else None
    if lib is not None and backend != "python":
        sa = np.empty(card, np.uint32)
        ta = np.empty(card, np.uint32)
        lib.hj3_exp4(log2_card_r, alpha, mult_a, beta, mult_b, int(shuffle),
                     _u32p(sa), _u32p(ta))
        return sa, ta
    rng = pymt.MT19937()
    common = np.repeat(np.arange(n_common, dtype=np.uint32), mult_a)
    excl_s = np.repeat(np.arange(n_common, n_common + n_excl,
                                 dtype=np.uint32), mult_b)
    excl_t = np.repeat(np.arange(n_common + n_excl, n_common + 2 * n_excl,
                                 dtype=np.uint32), mult_b)
    if shuffle:  # order matters (main_experiment4.cc:564-574)
        pymt.std_shuffle(excl_s, rng)
        pymt.std_shuffle(excl_t, rng)
        pymt.std_shuffle(common, rng)
    sa = np.concatenate([common, excl_s])
    if shuffle:
        common = common.copy()
        pymt.std_shuffle(common, rng)
    ta = np.concatenate([common, excl_t])
    return sa, ta
