"""Pallas fused prefix scans: N scans over parallel arrays in ONE pass.

Motivation (PERF.md roofline): after the windowed lookup killed the gather
wall and the segmented sort cut the probe sort, the strands' remaining
device time is dominated by `lax` scans -- ``run_boundaries`` is a cumsum +
cummax + reverse-cummin bundle behind every build and ``expand`` runs 2-3
output-sized cummax/cummin per probe strand.  XLA lowers each to its own
multi-pass loop; the memory floor is 2 passes of HBM (read + write), i.e.
~0.2 ms at 2^24 against the measured multi-ms actuals.

This kernel computes any number of independent scans (sum / max / min, each
over its own i32 array) in a single sequential-grid pass: per grid step one
(Cr, 128) block per array is scanned in registers (log-step lane rolls +
one row-prefix stage) and a per-array carry rides an SMEM scratch across
the sequential TPU grid.  Reverse scans run the grid and the in-block scan
backwards.  All arrays share one shape, so the pass streams at copy
bandwidth regardless of how many scans it fuses.

Mosaic idioms follow ops/windowed.py: i32 everywhere (trace under
``jax.enable_x64(False)`` where iota is involved), (Cr, 128) tiles,
interpret mode on CPU (tests, dryruns).

Reference mapping: these scans implement the same run-structure recovery
the reference gets from its sequential bucket-chain walks
(``ht_chaining.hh::insert`` arrival bookkeeping, ``algebra.hh:510-541``
unnest) -- there is no per-element reference analogue to cite because the
reference never materializes whole-column prefix structures.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .layout import I32

#: Elements per grid step (per array).  Large blocks amortize grid overhead;
#: (512, 128) i32 = 256 KiB of VMEM per array in + out, comfortably under
#: the ~100 MiB scoped limit for the 1-4 arrays the engine fuses.
DEFAULT_C = 64 * 1024

_IDENT = {"sum": 0, "max": np.iinfo(np.int32).min,
          "min": np.iinfo(np.int32).max}


def _combine(op, a, b):
    if op == "sum":
        return a + b
    if op == "max":
        return jnp.maximum(a, b)
    return jnp.minimum(a, b)


def _block_scan(x, op, reverse):
    """Flattened (row-major) inclusive scan of a (Cr, 128) i32 block.

    Log-step lane rolls within rows, then a row-prefix stage over the
    row totals; ~(7 + log2(Cr)) vector combines per element, no memory
    traffic beyond the block itself.
    """
    from jax.experimental.pallas import tpu as pltpu

    Cr = x.shape[0]
    ident = jnp.int32(_IDENT[op])
    with jax.enable_x64(False):
        lane = jax.lax.broadcasted_iota(I32, (Cr, 128), 1)
        rowi = jax.lax.broadcasted_iota(I32, (Cr, 128), 0)

    # 1) scan within each 128-lane row.  pltpu.roll is circular with a
    # non-negative shift, so a backward roll by s is a forward roll by
    # (dim - s); the iota mask kills the wrapped lanes either way.
    s = 1
    while s < 128:
        if reverse:
            sh = pltpu.roll(x, 128 - s, 1)
            x = _combine(op, x, jnp.where(lane < 128 - s, sh, ident))
        else:
            sh = pltpu.roll(x, s, 1)
            x = _combine(op, x, jnp.where(lane >= s, sh, ident))
        s *= 2

    # 2) row totals -> exclusive row prefix (scan across sublanes)
    tot_lane = 0 if reverse else 127
    totals = jnp.broadcast_to(x[:, tot_lane:tot_lane + 1], (Cr, 128))
    s = 1
    while s < Cr:
        if reverse:
            sh = pltpu.roll(totals, Cr - s, 0)
            totals = _combine(op, totals, jnp.where(rowi < Cr - s, sh, ident))
        else:
            sh = pltpu.roll(totals, s, 0)
            totals = _combine(op, totals, jnp.where(rowi >= s, sh, ident))
        s *= 2
    # totals now holds the INCLUSIVE row scan; shift one row for exclusive
    if reverse:
        excl = jnp.where(rowi < Cr - 1, pltpu.roll(totals, Cr - 1, 0), ident)
    else:
        excl = jnp.where(rowi >= 1, pltpu.roll(totals, 1, 0), ident)

    return _combine(op, x, excl)


def _make_kernel(ops, reverse):
    """Kernel over len(ops) in/out block pairs + one SMEM carry per array."""

    def kernel(*refs):
        from jax.experimental import pallas as pl

        N = len(ops)
        in_refs = refs[:N]
        out_refs = refs[N:2 * N]
        carry = refs[2 * N]          # SMEM i32[N]
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            for a, op in enumerate(ops):
                carry[a] = jnp.int32(_IDENT[op])

        for a, op in enumerate(ops):
            block = in_refs[a][:]
            scanned = _block_scan(block, op, reverse)
            c = carry[a]
            out_refs[a][:] = _combine(op, scanned, c)
            # block total from a plain reduction (cheaper for Mosaic than a
            # scalar extract from the scanned vector)
            tot = (jnp.sum(block) if op == "sum"
                   else jnp.max(block) if op == "max" else jnp.min(block))
            carry[a] = _combine(op, c, tot)

    return kernel


@partial(jax.jit, static_argnames=("ops", "reverse", "C", "interpret"))
def multi_scan(arrays, ops, reverse: bool = False, C: int = DEFAULT_C,
               interpret: bool | None = None):
    """Inclusive prefix scans of parallel i32 arrays in one fused pass.

    ``arrays``: tuple of equal-length 1D i32 arrays; ``ops``: matching tuple
    of "sum" | "max" | "min".  ``reverse=True`` scans right-to-left (the
    ``lax.cummin(..., reverse=True)`` analogue).  Lengths need not divide
    ``C``; the tail pads with each op's identity (which never changes a
    real element's prefix).  Returns a tuple of scanned arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if isinstance(arrays, jax.Array):
        arrays = (arrays,)
    if isinstance(ops, str):
        ops = (ops,)
    assert len(arrays) == len(ops) and len(arrays) >= 1
    for op in ops:
        assert op in _IDENT, f"unknown scan op {op!r}"
    n = arrays[0].shape[0]
    for a in arrays:
        assert a.shape == (n,), "all scan arrays must share one 1D shape"
    assert C % 128 == 0
    use_twin = False
    if interpret is None:  # no Mosaic on CPU
        interpret = jax.default_backend() == "cpu"
        # CPU callers (engine code under tests / shard_map dryruns) get the
        # exact jnp twin -- the interpreter emulates the sequential grid +
        # SMEM carries far too slowly for suite-sized inputs.  Tests of the
        # KERNEL itself pass interpret=True explicitly.
        use_twin = interpret

    if use_twin:
        outs = []
        for x, op in zip(arrays, ops):
            x = x.astype(I32)
            if op == "sum":
                outs.append(jnp.cumsum(x[::-1])[::-1] if reverse
                            else jnp.cumsum(x).astype(I32))
            elif op == "max":
                outs.append(jax.lax.cummax(x, 0, reverse=reverse))
            else:
                outs.append(jax.lax.cummin(x, 0, reverse=reverse))
        return tuple(o.astype(I32) for o in outs)

    pad = (-n) % C
    np_ = n + pad
    nchunks = np_ // C
    Cr = C // 128

    padded = []
    for x, op in zip(arrays, ops):
        x = x.astype(I32)
        if pad:
            x = jnp.concatenate([x, jnp.full(pad, _IDENT[op], I32)])
        padded.append(x.reshape(np_ // 128, 128))

    if reverse:
        # run the grid back-to-front so the carry flows right-to-left
        def idx(j):
            return (jnp.int32(nchunks - 1) - j, jnp.int32(0))
    else:
        def idx(j):
            return (j, jnp.int32(0))

    spec = pl.BlockSpec((Cr, 128), lambda j: idx(j),
                        memory_space=pltpu.VMEM)
    N = len(ops)
    outs = pl.pallas_call(
        _make_kernel(tuple(ops), reverse),
        grid=(nchunks,),
        in_specs=[spec] * N,
        out_specs=[spec] * N,
        out_shape=[jax.ShapeDtypeStruct((np_ // 128, 128), jnp.int32)] * N,
        scratch_shapes=[pltpu.SMEM((N,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*padded)
    return tuple(o.reshape(np_)[:n] for o in outs)


def cumsum_i32(x, **kw):
    """Fused-pass ``jnp.cumsum`` for one i32 array (see :func:`multi_scan`)."""
    return multi_scan((x,), ("sum",), **kw)[0]


def cummax_i32(x, reverse=False, **kw):
    return multi_scan((x,), ("max",), reverse=reverse, **kw)[0]


def cummin_i32(x, reverse=False, **kw):
    return multi_scan((x,), ("min",), reverse=reverse, **kw)[0]
