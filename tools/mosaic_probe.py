"""Mosaic capability & cost probe for the Pallas radix-sort design space.

The round-3 goal (VERDICT item 1) is a radix sort/partition >= 4x faster
than ``lax.sort`` at 2^24 (36 ms 1-op / 50 ms 2-op on v5e).  A radix pass
needs three primitives XLA does not expose: within-chunk rank-and-permute,
ragged run append (variable-length copies at dynamic offsets), and
dynamic-offset DMA at fine granularity.  Each candidate formulation leans
on Mosaic ops whose support/cost on this toolchain is undocumented -- this
probe measures them on the real chip so the kernel is designed from data,
not guesses (the same method that produced ops/windowed.py's 29x kernel).

Run:  python tools/mosaic_probe.py            # all probes
      python tools/mosaic_probe.py -k dma     # substring filter

Each probe prints PASS/FAIL, a correctness check, and fence-amortized
time.  Failures are expected and informative (Mosaic rejects plenty).
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from hashjoin3d_tpu.utils.measure import fence
from tools.roofline import timeit, fence_floor

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U32 = jnp.uint32

RESULTS = []


def probe(name):
    def deco(fn):
        fn._probe_name = name
        RESULTS.append(fn)
        return fn
    return deco


def run_case(name, build, check, n_elems, min_time=0.3):
    """build() -> (fn, args); check(np_out) -> bool."""
    try:
        fn, args = build()
        out = fn(*args)
        fence(out)
        host = jax.tree_util.tree_map(np.asarray, out)
        ok = check(host)
        t = timeit(fn, *args, min_time=min_time)
        ns = t * 1e9 / n_elems
        print(f"  {name:44s} {'OK ' if ok else 'WRONG'}  "
              f"{t*1e3:8.3f} ms  {ns:8.3f} ns/elem", flush=True)
        return t
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"  {name:44s} FAIL  {type(e).__name__}: {msg}", flush=True)
        return None


# ---------------------------------------------------------------- dynamic roll
@probe("roll: dynamic whole-tile roll along lanes")
def probe_roll_dynamic():
    n = 1 << 22
    x = jnp.arange(n, dtype=I32).reshape(n // 128, 128)

    def kernel(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], sh, 1)

    def build():
        f = jax.jit(lambda s, x: pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n // (1024 * 128),),
                in_specs=[pl.BlockSpec((1024, 128),
                                       lambda j, s: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1024, 128),
                                       lambda j, s: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct(x.shape, I32))(s, x))
        return f, (jnp.array([5], I32), x)

    def check(h):
        want = np.roll(np.asarray(x[:1024]), 5, axis=1)
        return np.array_equal(h[:1024], want)

    run_case("pltpu.roll(x, traced_shift, axis=1)", build, check, n)


# ------------------------------------------------- per-row rotate via gather
@probe("rotate: per-row arbitrary rotation via take_along_axis")
def probe_per_row_rotate():
    n = 1 << 22
    rows = n // 128
    x = jnp.arange(n, dtype=I32).reshape(rows, 128)
    shifts_np = np.arange(rows, dtype=np.int32) % 128
    shifts = jnp.asarray(shifts_np)

    def kernel(x_ref, s_ref, o_ref):
        Cr = x_ref.shape[0]
        with jax.enable_x64(False):
            lane = jax.lax.broadcasted_iota(jnp.int32, (Cr, 128), 1)
            idx = (lane + s_ref[:]) & jnp.int32(127)
            o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=1)

    def build():
        blk = 1024
        f = jax.jit(lambda x, s: pl.pallas_call(
            kernel,
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((blk, 1), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), I32))(x, s))
        return f, (x, shifts.reshape(rows, 1))

    def check(h):
        xn = np.asarray(x)
        want = np.stack([np.roll(xn[r], -int(shifts_np[r]))
                         for r in range(256)])
        return np.array_equal(h[:256], want)

    run_case("per-row rotate (lane gather)", build, check, n)


# -------------------------------------------------------------- lane cumsum
@probe("cumsum: in-kernel cumsum along lanes and sublanes")
def probe_cumsum():
    n = 1 << 22
    rows = n // 128
    x = jnp.ones((rows, 128), I32)

    def kernel_lane(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    def kernel_sub(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=0)

    for nm, kern, axis in (("jnp.cumsum axis=1 (lanes)", kernel_lane, 1),
                           ("jnp.cumsum axis=0 (sublanes)", kernel_sub, 0)):
        def build(kern=kern):
            blk = 512
            f = jax.jit(lambda x: pl.pallas_call(
                kern,
                grid=(rows // blk,),
                in_specs=[pl.BlockSpec((blk, 128),
                                       lambda j: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((blk, 128),
                                       lambda j: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 128), I32))(x))
            return f, (x,)

        def check(h, axis=axis):
            want = np.cumsum(np.ones((512, 128), np.int32), axis=axis)
            return np.array_equal(h[:512], want)

        run_case(nm, build, check, n)


# ------------------------------------------------------------ in-kernel MXU
@probe("mxu: f32 matmul inside pallas (one-hot permutation apply)")
def probe_mxu():
    n = 1 << 22
    rows = n // 128
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, (rows, 128)),
        dtype=I32)
    # per 128-row: apply the reversal permutation via one-hot matmul
    perm = jnp.asarray(np.eye(128, dtype=np.float32)[::-1])

    def kernel(x_ref, p_ref, o_ref):
        xf = x_ref[:].astype(jnp.float32)
        y = jax.lax.dot_general(
            xf, p_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = y.astype(I32)

    def build():
        blk = 512
        f = jax.jit(lambda x, p: pl.pallas_call(
            kernel,
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((128, 128), lambda j: (jnp.int32(0),
                                                          jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), I32))(x, p))
        return f, (x, perm)

    def check(h):
        want = np.asarray(x)[:512, ::-1]
        return np.array_equal(h[:512], want)

    run_case("f32 (blk,128)@(128,128) one-hot apply", build, check, n)


# ----------------------------------------------- cross-row generic permute
@probe("permute: generic (Cr,128) permutation via Cr-step select loop")
def probe_cross_row_permute():
    rng = np.random.default_rng(1)
    n = 1 << 22
    for C in (1024, 4096):
        Cr = C // 128
        nblk = n // C
        x = jnp.asarray(rng.integers(0, 1 << 30, (n // 128, 128)), dtype=I32)
        # one shared within-block permutation (cost model only cares shape)
        p = rng.permutation(C).astype(np.int32)
        hi = jnp.asarray((p >> 7).reshape(Cr, 128))
        lo = jnp.asarray((p & 127).reshape(Cr, 128))

        def kernel(x_ref, hi_ref, lo_ref, o_ref):
            Crk = x_ref.shape[0]
            acc = jnp.zeros((Crk, 128), I32)
            with jax.enable_x64(False):
                loi = lo_ref[:]
                hii = hi_ref[:]
                for r in range(Crk):
                    row = jnp.broadcast_to(x_ref[r:r + 1, :], (Crk, 128))
                    g = jnp.take_along_axis(row, loi, axis=1)
                    acc = jnp.where(hii == r, g, acc)
            o_ref[:] = acc

        def build(Cr=Cr, nblk=nblk, x=x, hi=hi, lo=lo):
            f = jax.jit(lambda x, h, l: pl.pallas_call(
                kernel,
                grid=(nblk,),
                in_specs=[pl.BlockSpec((Cr, 128), lambda j: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((Cr, 128),
                                       lambda j: (jnp.int32(0), jnp.int32(0)),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((Cr, 128),
                                       lambda j: (jnp.int32(0), jnp.int32(0)),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((Cr, 128), lambda j: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n // 128, 128), I32))(
                    x, h, l))
            return f, (x, hi, lo)

        def check(h, p=p, C=C):
            want = np.asarray(x).reshape(-1)[:C][p].reshape(Cr, 128)
            return np.array_equal(h[:Cr], want)

        run_case(f"generic permute C={C} (Cr={Cr} loop)", build, check, n)


# -------------------------------------------- masked store at dynamic offset
@probe("store: masked store at dynamic sublane offset (VMEM scratch)")
def probe_masked_store():
    n = 1 << 20
    rows = n // 128
    x = jnp.asarray(np.arange(n, dtype=np.int32).reshape(rows, 128))

    def kernel(x_ref, o_ref, scratch):
        # write each 8-row group shifted down by a traced offset, masked
        with jax.enable_x64(False):
            j = pl.program_id(0) * jnp.int32(0)  # traced zero
            val = x_ref[0:8, :]
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            mask = lane < 64
            pltpu.store(scratch.at[pl.ds(j + 8, 8), :], val, mask=mask)
            o_ref[:] = scratch[:]

    def build():
        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((rows, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((32, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, 128), I32),
            scratch_shapes=[pltpu.VMEM((32, 128), I32)])(x))
        return f, (x,)

    def check(h):
        want = np.asarray(x)[0:8, :64]
        return np.array_equal(h[8:16, :64], want)

    run_case("masked store, dynamic sublane base", build, check, n)


# ------------------------------------------------------- DMA granularity
@probe("dma: HBM->VMEM->HBM copy, K dynamic-offset DMAs of B elems")
def probe_dma_overhead():
    n = 1 << 24
    src = jnp.asarray(
        np.random.default_rng(2).integers(0, 1 << 30, n), dtype=I32)

    for B in (1024, 8192, 65536):
        K = n // B
        rows_b = B // 128

        def kernel(src_ref, o_ref, scratch, sem_in, sem_out):
            j = pl.program_id(0)
            # dynamic offset: reverse the block order (j -> K-1-j)
            K_ = pl.num_programs(0)
            srow = (K_ - 1 - j) * rows_b
            cp = pltpu.make_async_copy(
                src_ref.at[pl.ds(srow, rows_b), :], scratch, sem_in)
            cp.start()
            cp.wait()
            cp2 = pltpu.make_async_copy(
                scratch, o_ref.at[pl.ds(srow, rows_b), :], sem_out)
            cp2.start()
            cp2.wait()

        def build(K=K, rows_b=rows_b):
            f = jax.jit(lambda s: pl.pallas_call(
                kernel,
                grid=(K,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct((n // 128, 128), I32),
                scratch_shapes=[pltpu.VMEM((rows_b, 128), I32),
                                pltpu.SemaphoreType.DMA,
                                pltpu.SemaphoreType.DMA])(
                    s.reshape(n // 128, 128)))
            return f, (src,)

        def check(h):
            return np.array_equal(h.reshape(-1), np.asarray(src))

        run_case(f"dyn-offset DMA chain B={B} ({K} blocks)", build, check, n)


# --------------------------------- unaligned (non-8-row) dynamic DMA offset
@probe("dma-unaligned: DMA at sublane offsets not divisible by 8")
def probe_dma_unaligned():
    n = 1 << 18
    src = jnp.asarray(np.arange(n, dtype=np.int32)).reshape(n // 128, 128)

    def kernel(s_ref, src_ref, o_ref, scratch, sem):
        off = s_ref[0]  # = 3 rows: NOT a multiple of 8
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(off, 8), :], scratch, sem)
        cp.start()
        cp.wait()
        o_ref[:] = scratch[:]

    def build():
        f = jax.jit(lambda o, s: pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((8, 128), lambda j, o: (j, jnp.int32(0)),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), I32),
                                pltpu.SemaphoreType.DMA]),
            out_shape=jax.ShapeDtypeStruct((8, 128), I32))(o, s))
        return f, (jnp.array([3], I32), src)

    def check(h):
        return np.array_equal(h, np.asarray(src)[3:11])

    run_case("DMA at row offset 3 (unaligned)", build, check, 1 << 18)


# --------------------------------------------- one-hot build cost (P lanes)
@probe("onehot: digit one-hot build cost, P in lanes")
def probe_onehot():
    n = 1 << 22
    rows = n // 128
    x = jnp.asarray(
        np.random.default_rng(3).integers(0, 16, (rows, 128)), dtype=I32)

    def kernel(x_ref, o_ref):
        # per input row of 128 digits: count of each digit value 0..15
        with jax.enable_x64(False):
            d = x_ref[:]
            acc = jnp.zeros((d.shape[0], 128), I32)
            lane = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            for v in range(16):
                cnt = jnp.sum(jnp.where(d == v, 1, 0), axis=1, keepdims=True)
                acc = jnp.where(lane == v, cnt, acc)
            o_ref[:] = acc

    def build():
        blk = 512
        f = jax.jit(lambda x: pl.pallas_call(
            kernel,
            grid=(rows // blk,),
            in_specs=[pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, 128), lambda j: (j, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), I32))(x))
        return f, (x,)

    def check(h):
        xn = np.asarray(x)[:4]
        for r in range(4):
            cnt = np.bincount(xn[r], minlength=16)
            if not np.array_equal(h[r, :16], cnt):
                return False
        return True

    run_case("16-way digit histogram per row", build, check, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default="", help="substring filter")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    print(f"fence floor: {fence_floor()*1e3:.2f} ms", flush=True)
    for fn in RESULTS:
        if args.k and args.k not in fn._probe_name:
            continue
        print(f"[{fn._probe_name}]", flush=True)
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:
            print(f"  PROBE CRASHED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        print(f"  ({time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
