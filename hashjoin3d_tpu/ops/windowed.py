"""Pallas windowed table lookup: the TPU-native answer to random gathers.

Motivation (PERF.md roofline): XLA lowers a 1D random gather to a serialized
~10 ns/element loop on v5e -- 16.8M lookups into a 1M-entry table cost
~168 ms (~0.4 GB/s of useful reads against ~819 GB/s of HBM), *independent*
of table size or index sortedness, so the bound is the lowering, not the
hardware.  The reference's probe is exactly this access pattern
(``algebra.hh:625-659`` walks a bucket per probe; the dense-direct layout
turns it into one ``direct[key]`` gather per probe).

The windowed lookup replaces the serialized gather with data-parallel VPU
work.  Probes are first sorted by key (the engine's standing design rule:
sort + scan beat scattered random access on TPU); consecutive sorted probes
then hit a narrow, monotonically advancing window of the table.  A Pallas
kernel walks probe chunks of ``C`` keys; for each chunk it DMAs the table
window ``[base_j, base_j + W)`` into VMEM and resolves all ``C`` lookups at
once as a one-hot compare + select + row-sum over the ``(C, W)`` tile --
3 VPU ops per (probe, window) cell instead of one serialized scalar fetch
per probe.  For the experiment workloads (16 probes per key on average) the
per-chunk key spread is ~C/16, so ``W`` of 512-2048 covers every chunk; the
caller validates coverage with :func:`windowed_coverage_ok` (one device
reduction riding the same sorted keys) and falls back to the XLA gather
when the distribution is too sparse.

Measured on v5e (tools/roofline.py, fence-amortized): 16.8M lookups into a
1M-entry table in 5.0 ms vs 144 ms for the XLA gather (29x); the full
sort + windowed pipeline for UNSORTED probes is 54.6 ms (2.6x), now bounded
by the sort.  For probe streams that are already (nearly) sorted -- exp-4's
iota R.k, or any key_direct image over a dense domain -- the sort drops out
and the full 29x materializes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .layout import I32, U32

# Chunk of probes resolved per grid step and the table-window width.  C is a
# multiple of 8*128 so the (C, 128) select tiles map exactly onto VPU lanes
# (larger C inflates the kernel's scoped-VMEM stack past Mosaic's limit:
# every (C, 128) intermediate is C/2 KiB); W >= 1024 keeps the window DMA
# row offset divisible by the (8, 128) sublane tile.
DEFAULT_C = 1024
DEFAULT_W = 1024


def _windowed_kernel(bases_ref, keys_ref, table_ref, out_ref, window, sem):
    """One grid step: resolve C sorted keys against window
    [base, base + W + 1024).

    Everything is laid out 2D with a 128-lane minor axis (Mosaic's native
    (8, 128) i32 tiling; 1D formulations hit tiling-mismatch / divisibility
    errors in the DMA lowering):

    bases_ref: SMEM i32[nchunks] scalar-prefetched window bases, aligned
               to the 1024-element (8-row) sublane tile -- the minimum the
               DMA row offset needs.  Window size = the W of coverage
               (spread <= W guaranteed in-window) + 1024 of alignment
               slack; the previous W-aligned-base formulation paid a FULL
               extra W of slack (2W windows -- 44% more DMA + select work
               at W = 8192, tools/roofline.py r5)
    keys_ref:  VMEM i32[C, 1] sorted keys of this chunk
    table_ref: u32[T//128, 128] the table, 128 entries per row
               (compiler-placed, typically HBM; manually DMA'd)
    out_ref:   VMEM u32[C, 1] looked-up values (0 where key not in window)
    window:    VMEM u32[(W+1024)//128, 128] scratch

    The lookup decomposes delta = key - base into (row, lane): a static
    R-iteration select loop resolves the row (R = (W+1024)/128 = 16 at
    the default W), one lane-iota select resolves the lane -- ~W + 3*128
    VPU ops per probe instead of one serialized scalar fetch.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Cr = keys_ref.shape[0]         # == C // 128 sublane rows of 128 keys
    C = Cr * 128
    R = window.shape[0]            # == (W + 1024) // 128
    j = pl.program_id(0)
    base = pl.multiple_of(bases_ref[j], 1024)
    base_row = pl.multiple_of(jax.lax.div(base, jnp.int32(128)), 8)

    copy = pltpu.make_async_copy(
        table_ref.at[pl.ds(base_row, R), :], window, sem)
    copy.start()
    copy.wait()

    # Probes stay in their natural (Cr, 128) tile (relayouts to (C, 1)
    # columns are unsupported shape casts in Mosaic).  delta = key - base
    # decomposes into (window row, lane); the lane permutation runs on the
    # hardware gather unit via same-shape 2D take_along_axis
    # (tpu.dynamic_gather -- the one shape this toolchain lowers), one call
    # per window row, combined by an R-step select loop.
    delta = keys_ref[:] - base                                   # (Cr, 128)
    hi = jax.lax.shift_right_logical(delta, jnp.int32(7))        # window row
    lo = delta & jnp.int32(127)                                  # lane
    win_i32 = pltpu.bitcast(window[:], jnp.int32)                # (R, 128)

    acc = jnp.zeros((Cr, 128), jnp.int32)
    for r in range(R):
        row = jnp.broadcast_to(win_i32[r:r + 1, :], (Cr, 128))
        # under global x64 take_along_axis builds i64 iota indices, which
        # Mosaic rejects -- trace this op in 32-bit mode
        with jax.enable_x64(False):
            g_r = jnp.take_along_axis(row, lo, axis=1)   # win[r, lo[i,j]]
        acc = jnp.where(hi == r, g_r, acc)
    out_ref[:] = pltpu.bitcast(acc, jnp.uint32)


def _windowed_kernel_db(bases_ref, keys_ref, table_ref, out_ref, window,
                        sems):
    """Double-buffered variant of :func:`_windowed_kernel`.

    The serial start/wait per chunk leaves the VPU idle for the window
    DMA's full HBM latency every grid step (~250 ns of the ~305 ns step
    at the default shapes).  Here the window scratch has two slots: step
    j waits for the copy HIS step's predecessor started, and immediately
    starts chunk j+1's copy into the other slot -- the DMA rides under
    the select-loop compute of chunk j.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Cr = keys_ref.shape[0]
    R = window.shape[1]            # == (W + 1024) // 128
    j = pl.program_id(0)
    nch = pl.num_programs(0)
    slot = jax.lax.rem(j, jnp.int32(2))
    nslot = jax.lax.rem(j + jnp.int32(1), jnp.int32(2))

    def copy_for(chunk, s):
        base = pl.multiple_of(bases_ref[chunk], 1024)
        base_row = pl.multiple_of(jax.lax.div(base, jnp.int32(128)), 8)
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(base_row, R), :], window.at[s], sems.at[s])

    @pl.when(j == 0)
    def _first():
        copy_for(jnp.int32(0), slot).start()

    copy_for(j, slot).wait()

    @pl.when(j + 1 < nch)
    def _next():
        copy_for(j + 1, nslot).start()

    base = pl.multiple_of(bases_ref[j], 1024)
    delta = keys_ref[:] - base
    hi = jax.lax.shift_right_logical(delta, jnp.int32(7))
    lo = delta & jnp.int32(127)

    win_i32 = pltpu.bitcast(window[slot], jnp.int32)            # (R, 128)
    acc = jnp.zeros((Cr, 128), jnp.int32)
    for r in range(R):
        row = jnp.broadcast_to(win_i32[r:r + 1, :], (Cr, 128))
        with jax.enable_x64(False):
            g_r = jnp.take_along_axis(row, lo, axis=1)
        acc = jnp.where(hi == r, g_r, acc)
    out_ref[:] = pltpu.bitcast(acc, jnp.uint32)


@partial(jax.jit, static_argnames=("C", "W", "interpret", "db"))
def windowed_lookup(table: jax.Array, keys_sorted: jax.Array,
                    C: int = DEFAULT_C, W: int = DEFAULT_W,
                    interpret: bool | None = None,
                    db: bool = False) -> jax.Array:
    """``table[keys_sorted]`` for nondecreasing keys, without a gather.

    ``table``: u32[T] with T >= W + 1024 and T a multiple of 1024;
    ``keys_sorted``: i32[n], n a multiple of C (pad with -1), NEARLY
    nondecreasing: windows anchor on each chunk's max key, so interspersed
    negative miss markers (e.g. the -1 holes of a ``key_direct`` image)
    are fine as long as each chunk's in-range keys span <= W.  Keys
    outside their chunk's window -- negative or >= T -- yield 0; for
    packed direct words 0 is never a valid entry (the chain position
    field is 1-based), so 0 doubles as the miss marker.  Coverage of
    in-range keys must be pre-validated with :func:`windowed_coverage_ok`.
    ``W`` must be >= 1024 (Mosaic tiling) and a power of two; the actual
    window is W + 1024 elements (coverage + one sublane tile of
    alignment slack -- see ``chunk_bases``).  ``db=True`` double-buffers
    the window DMA (:func:`_windowed_kernel_db`) -- same results, chunk
    j+1's window ships during chunk j's compute.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:  # no Mosaic on CPU: interpret (tests, dryruns)
        interpret = jax.default_backend() == "cpu"
    n = keys_sorted.shape[0]
    T = table.shape[0]
    assert n % C == 0, f"pad keys to a multiple of {C}"
    assert C % 128 == 0, "C must be a multiple of 128"
    assert W >= 1024 and (W & (W - 1)) == 0, "W must be a power of two >= 1024"
    assert T >= W + 1024, f"table smaller than window ({T} < {W + 1024})"
    assert T % 1024 == 0, f"table size must be a multiple of 1024 ({T})"
    nchunks = n // C
    Rw = (W + 1024) // 128         # window rows

    keys_sorted = keys_sorted.astype(I32)
    bases = chunk_bases(keys_sorted, T, C, W)

    # Probes travel as a dense (n//128, 128) matrix ((C//128, 128) blocks,
    # row-major, so each block is a contiguous sorted chunk): a (n, 1)
    # probe tensor would get the (8, 128) tiled HBM layout -- 128x padding
    # (7.9 GB at 2^24 rows) -- and 1-wide blocks are rejected outright.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            # NB x64 mode: a literal python int in the index map traces as
            # i64 and Mosaic rejects the lowered transform -- keep i32
            pl.BlockSpec((C // 128, 128), lambda j, bases: (j, jnp.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # table: compiler-placed
        ],
        out_specs=pl.BlockSpec((C // 128, 128),
                               lambda j, bases: (j, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            # db: two window slots + a DMA semaphore each, so chunk j+1's
            # window ships while chunk j's select loop runs
            [pltpu.VMEM((2, Rw, 128), jnp.uint32),
             pltpu.SemaphoreType.DMA((2,))] if db else
            [pltpu.VMEM((Rw, 128), jnp.uint32),
             pltpu.SemaphoreType.DMA]
        ),
    )
    # inside shard_map (check_vma mode) every kernel operand and the output
    # must agree on how they vary across mesh axes; promote all inputs to
    # the union vma (e.g. a replicated table probed by per-shard keys) so
    # callers can keep check_vma=True on the enclosing shard_map
    table_u32 = table.astype(U32)

    def _vma(x):
        try:
            return set(jax.typeof(x).vma)
        except Exception:
            return set()

    vma = _vma(keys_sorted) | _vma(table_u32) | _vma(bases)
    if vma and interpret:
        # pallas interpret-mode lowers the grid to dynamic_slice with
        # unvarying loop indices, which check_vma rejects under shard_map
        # (a JAX interpreter gap).  Use an exact jnp twin of the kernel so
        # the enclosing shard_map keeps vma checking; compiled TPU runs
        # still take the kernel.
        delta = keys_sorted.reshape(-1, C) - bases[:, None]
        in_window = (delta >= 0) & (delta < W + 1024)
        safe = jnp.clip(keys_sorted, 0, T - 1)
        val = jnp.take(table_u32, safe, axis=0)
        return jnp.where(in_window.reshape(n), val, jnp.uint32(0))
    if vma:
        def _promote(x):
            missing = tuple(vma - _vma(x))
            return (jax.lax.pcast(x, missing, to="varying")
                    if missing else x)
        bases = _promote(bases)
        keys_sorted = _promote(keys_sorted)
        table_u32 = _promote(table_u32)
        out_shape = jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32,
                                         vma=frozenset(vma))
    else:
        out_shape = jax.ShapeDtypeStruct((n // 128, 128), jnp.uint32)
    out = pl.pallas_call(
        _windowed_kernel_db if db else _windowed_kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(bases, keys_sorted.reshape(n // 128, 128),
      table_u32.reshape(T // 128, 128))
    return out.reshape(n)


@partial(jax.jit, static_argnames=("T", "C", "W"))
def chunk_bases(keys_sorted: jax.Array, T: int, C: int, W: int) -> jax.Array:
    """Window base per chunk: ``(kmax - W)`` aligned down to the
    1024-element sublane tile, clamped into the table (T is a multiple of
    1024, so the clamp keeps the alignment Mosaic's DMA needs).  The
    window is W + 1024 elements: every key in ``[kmax - W, kmax]`` lands
    in ``[base, base + W + 1024)`` -- coverage spread W plus ONE tile of
    alignment slack, where the previous W-aligned-base formulation paid a
    full extra W (2W windows).

    Anchoring on the max (not the first key) makes miss markers robust:
    nearly-sorted key streams with interspersed ``-1`` holes (e.g. a
    ``key_direct`` image over a dense domain) still get a window covering
    every in-range key as long as the chunk's in-range spread is <= W.
    """
    kmax = jnp.max(keys_sorted.reshape(-1, C).astype(I32), axis=1)
    base = jnp.clip((kmax - W) & ~jnp.int32(1023), 0,
                    max(T - (W + 1024), 0))
    return base


@partial(jax.jit, static_argnames=("T", "C", "W"))
def windowed_coverage_ok(keys_sorted: jax.Array, T: int,
                         C: int = DEFAULT_C, W: int = DEFAULT_W) -> jax.Array:
    """True iff every in-range key of every chunk lands in its chunk window.

    One reduction over the sorted keys (rides the probe sort's output); the
    caller reads this once per plan, outside the timed loop, and falls back
    to the XLA gather on False.
    """
    keys_sorted = keys_sorted.astype(I32)
    n = keys_sorted.shape[0]
    pad = (-n) % C
    if pad:
        # pad with -1 (a miss marker): padding with T would move every
        # tail-chunk window to the end of the table, past the real keys
        keys_sorted = jnp.concatenate(
            [keys_sorted, jnp.full(pad, -1, I32)])
    k2 = keys_sorted.reshape(-1, C)
    bases = chunk_bases(keys_sorted, T, C, W)
    delta = k2 - bases[:, None]
    in_range = (k2 >= 0) & (k2 < T)
    ok = jnp.where(in_range, (delta >= 0) & (delta < W + 1024), True)
    return jnp.all(ok)
