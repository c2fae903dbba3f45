"""Pallas fused prefix scans: N scans over parallel arrays in ONE pass.

Motivation (PERF.md roofline): after the windowed lookup killed the gather
wall and the segmented sort cut the probe sort, the strands' remaining
device time is dominated by `lax` scans -- ``run_boundaries`` is a cumsum +
cummax + reverse-cummin bundle behind every build and ``expand`` runs 2-3
output-sized cummax/cummin per probe strand.  XLA lowers each to its own
multi-pass loop; the memory floor is 2 passes of HBM (read + write), i.e.
~0.2 ms at 2^24 against the measured multi-ms actuals.

This kernel computes any number of independent scans in a single
sequential-grid pass: per grid step one (Cr, 128) block per array is
scanned in registers (log-step lane rolls + one row-prefix stage) and a
per-array carry rides an SMEM scratch across the sequential TPU grid.
Reverse scans run the grid and the in-block scan backwards.  All arrays
share one shape, so the pass streams at copy bandwidth regardless of how
many scans it fuses.

Ops: "sum" | "max" | "min" (one i32 array each) and "maxpair" (TWO i32
arrays -- a key and a payload -- combined by lexicographic maximum).
``maxpair`` is the engine's segmented-copy propagation: ``expand()``'s
strong-expansion payload path is ``cummax((rank << 26) | value)`` on
int64 -- an i64 scan costs ~2x an i32 one on v5e before XLA's scan
slowness even starts -- and ``merge_lookup`` propagates (gid, key) the
same way; both become one fused i32 pass here.

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

_I32_MIN = int(np.iinfo(np.int32).min)
_I32_MAX = int(np.iinfo(np.int32).max)

#: op -> per-slot identity elements (and, implicitly, arity)
_IDENTS = {"sum": (0,), "max": (_I32_MIN,), "min": (_I32_MAX,),
           "maxpair": (_I32_MIN, _I32_MIN)}


def _group_combine(op, a, b):
    """Combine tuples ``a`` and ``b`` of (Cr, 128) blocks (or scalars)."""
    if op == "sum":
        return (a[0] + b[0],)
    if op == "max":
        return (jnp.maximum(a[0], b[0]),)
    if op == "min":
        return (jnp.minimum(a[0], b[0]),)
    # maxpair: lexicographic max of (key, payload) -- equals cummax of the
    # packed (key << 32 | biased payload) i64 formulation bit-for-bit
    k1, v1 = a
    k2, v2 = b
    take2 = (k2 > k1) | ((k2 == k1) & (v2 >= v1))
    return (jnp.where(take2, k2, k1), jnp.where(take2, v2, v1))


def _block_scan(blocks, op, reverse):
    """Flattened (row-major) inclusive scan of a group of (Cr, 128) blocks.

    Log-step lane rolls within rows, then a row-prefix stage over the
    row totals; ~(7 + log2(Cr)) vector combines per element, no memory
    traffic beyond the blocks themselves.
    """
    from jax.experimental.pallas import tpu as pltpu

    Cr = blocks[0].shape[0]
    idents = tuple(jnp.int32(i) for i in _IDENTS[op])
    with jax.enable_x64(False):
        lane = jax.lax.broadcasted_iota(I32, (Cr, 128), 1)
        rowi = jax.lax.broadcasted_iota(I32, (Cr, 128), 0)

    # 1) scan within each 128-lane row.  pltpu.roll is circular with a
    # non-negative shift, so a backward roll by s is a forward roll by
    # (dim - s); the iota mask kills the wrapped lanes either way.
    x = blocks
    s = 1
    while s < 128:
        if reverse:
            mask = lane < 128 - s
            sh = tuple(pltpu.roll(b, 128 - s, 1) for b in x)
        else:
            mask = lane >= s
            sh = tuple(pltpu.roll(b, s, 1) for b in x)
        sh = tuple(jnp.where(mask, b, i) for b, i in zip(sh, idents))
        x = _group_combine(op, x, sh)
        s *= 2

    # 2) row totals -> exclusive row prefix (scan across sublanes)
    tot_lane = 0 if reverse else 127
    t = tuple(jnp.broadcast_to(b[:, tot_lane:tot_lane + 1], (Cr, 128))
              for b in x)
    s = 1
    while s < Cr:
        if reverse:
            mask = rowi < Cr - s
            sh = tuple(pltpu.roll(b, Cr - s, 0) for b in t)
        else:
            mask = rowi >= s
            sh = tuple(pltpu.roll(b, s, 0) for b in t)
        sh = tuple(jnp.where(mask, b, i) for b, i in zip(sh, idents))
        t = _group_combine(op, t, sh)
        s *= 2
    # t now holds the INCLUSIVE row scan; shift one row for exclusive
    if reverse:
        excl = tuple(jnp.where(rowi < Cr - 1, pltpu.roll(b, Cr - 1, 0), i)
                     for b, i in zip(t, idents))
    else:
        excl = tuple(jnp.where(rowi >= 1, pltpu.roll(b, 1, 0), i)
                     for b, i in zip(t, idents))

    return _group_combine(op, x, excl)


def _block_total(blocks, op):
    """Whole-block combine as scalars (plain reductions -- cheaper for
    Mosaic than a scalar extract from the scanned vector)."""
    if op == "sum":
        # Scalar-output reductions take Mosaic's proxy lowering, which
        # RE-TRACES `jnp.sum` at lowering time under the ambient config --
        # the package's global x64 mode then promotes the i32 accumulator
        # to i64 and Mosaic rejects the convert ("64-bit types are not
        # supported"; compiled TPU runs only, the CPU interpret/twin paths
        # never lower).  Emit the proxy's exact eqn sequence ourselves at
        # kernel-trace time (inside multi_scan's enable_x64(False) scope,
        # dtype pinned): a keepdims reduce to a non-scalar (1,1,1) takes
        # the direct vector lowering, and the squeeze-to-scalar is a plain
        # vector extract.
        s = jnp.sum(blocks[0][jnp.newaxis, ...], axis=(1, 2),
                    keepdims=True, dtype=I32)
        return (jnp.squeeze(s),)
    if op == "max":
        return (jnp.max(blocks[0]),)
    if op == "min":
        return (jnp.min(blocks[0]),)
    k, v = blocks
    k_tot = jnp.max(k)
    v_tot = jnp.max(jnp.where(k == k_tot, v, jnp.int32(_I32_MIN)))
    return (k_tot, v_tot)


def _make_kernel(ops, reverse):
    """Kernel over the flat in/out block refs + one SMEM carry per slot."""
    arities = [len(_IDENTS[op]) for op in ops]
    total = sum(arities)

    def kernel(*refs):
        from jax.experimental import pallas as pl

        in_refs = refs[:total]
        out_refs = refs[total:2 * total]
        carry = refs[2 * total]          # SMEM i32[total]
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            slot = 0
            for op in ops:
                for i in _IDENTS[op]:
                    carry[slot] = jnp.int32(i)
                    slot += 1

        slot = 0
        for op, ar in zip(ops, arities):
            blocks = tuple(in_refs[slot + i][:] for i in range(ar))
            scanned = _block_scan(blocks, op, reverse)
            c = tuple(carry[slot + i] for i in range(ar))
            out = _group_combine(op, scanned, c)
            for i in range(ar):
                out_refs[slot + i][:] = out[i]
            new_c = _group_combine(op, c, _block_total(blocks, op))
            for i in range(ar):
                carry[slot + i] = new_c[i]
            slot += ar

    return kernel


def _twin(arrays, ops, reverse):
    """Exact lax twin (CPU default path; also the test oracle)."""
    outs = []
    slot = 0
    for op in ops:
        if op == "sum":
            x = arrays[slot].astype(I32)
            outs.append(jnp.cumsum(x[::-1])[::-1].astype(I32) if reverse
                        else jnp.cumsum(x).astype(I32))
            slot += 1
        elif op in ("max", "min"):
            f = jax.lax.cummax if op == "max" else jax.lax.cummin
            outs.append(f(arrays[slot].astype(I32), 0, reverse=reverse))
            slot += 1
        else:  # maxpair == cummax of (key << 32 | biased payload) in i64
            k = arrays[slot].astype(jnp.int64)
            v = arrays[slot + 1].astype(jnp.int64)
            bias = jnp.int64(0x80000000)  # signed->unsigned order, low 32
            packed = (k << 32) | ((v & jnp.int64(0xFFFFFFFF)) ^ bias)
            m = jax.lax.cummax(packed, 0, reverse=reverse)
            outs.append((m >> 32).astype(I32))
            outs.append(((m & jnp.int64(0xFFFFFFFF)) ^ bias).astype(I32))
            slot += 2
    return tuple(outs)


@partial(jax.jit, static_argnames=("ops", "reverse", "C", "interpret"))
def multi_scan(arrays, ops, reverse: bool = False, C: int = DEFAULT_C,
               interpret: bool | None = None):
    """Inclusive prefix scans of parallel i32 arrays in one fused pass.

    ``ops``: tuple of "sum" | "max" | "min" (one array each) | "maxpair"
    (two arrays: key then payload, combined by lexicographic maximum).
    ``arrays``: the matching flat tuple of equal-length 1D i32 arrays.
    ``reverse=True`` scans right-to-left (the ``lax.cummin(...,
    reverse=True)`` analogue).  Lengths need not divide ``C``; the tail
    pads with each slot's identity (which never changes a real element's
    prefix).  Returns the flat tuple of scanned arrays.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if isinstance(arrays, jax.Array):
        arrays = (arrays,)
    if isinstance(ops, str):
        ops = (ops,)
    for op in ops:
        assert op in _IDENTS, f"unknown scan op {op!r}"
    idents = [i for op in ops for i in _IDENTS[op]]
    assert len(arrays) == len(idents), \
        f"ops {ops} consume {len(idents)} arrays, got {len(arrays)}"
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
        return _twin(arrays, ops, reverse)

    pad = (-n) % C
    np_ = n + pad
    nchunks = np_ // C
    Cr = C // 128

    padded = []
    for x, ident in zip(arrays, idents):
        x = x.astype(I32)
        if pad:
            x = jnp.concatenate([x, jnp.full(pad, ident, I32)])
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
    N = len(padded)
    # trace under x64(False): even dtype-pinned i32 reductions route
    # through an i64 accumulator under the package's global x64 mode, and
    # Mosaic rejects the convert_element_type ("64-bit types are not
    # supported" -- compiled TPU runs only; same contract as
    # ops/windowed.py / ops/bitonic.py)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _make_kernel(tuple(ops), reverse),
            grid=(nchunks,),
            in_specs=[spec] * N,
            out_specs=[spec] * N,
            out_shape=[jax.ShapeDtypeStruct((np_ // 128, 128),
                                            jnp.int32)] * N,
            scratch_shapes=[pltpu.SMEM((N,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*padded)
    return tuple(o.reshape(np_)[:n] for o in outs)


#: Engine-wide scan implementation: "lax" (XLA scans) or "pallas" (this
#: kernel).  Default is "pallas": tools/scanbench.py on the real v5e
#: (artifacts/r4/scanbench.log, 2^24 elems, bit-equal to the lax twins)
#: measured cumsum 3.62 -> 0.39 ms, the fused sum+max+min bundle
#: 16.63 -> 1.02 ms (16x) and expand()'s packed-i64 cummax vs the i32
#: maxpair pass 27.13 -> 0.91 ms (30x).  Flip back with
#: :func:`set_scan_impl("lax")`.  The pallas path self-disables on CPU
#: backends (where only the interpreter could run) and on device-varying
#: operands under shard_map (the kernel carries no vma plumbing) --
#: callers never need their own guards.
_IMPL = "pallas"


def set_scan_impl(impl: str) -> None:
    """Select the engine's scan implementation ("lax" | "pallas").

    The choice binds at trace time: already-jitted programs keep whatever
    they compiled with (call ``jax.clear_caches()`` to re-trace).
    """
    global _IMPL
    assert impl in ("lax", "pallas"), impl
    _IMPL = impl


def _has_vma(*arrays) -> bool:
    for x in arrays:
        try:
            if jax.typeof(x).vma:
                return True
        except Exception:
            pass
    return False


def engine_multi_scan(arrays, ops, reverse: bool = False):
    """:func:`multi_scan` honoring the engine-wide scan switch.

    The drop-in the layout/expand call sites use: routes to the pallas
    kernel only when enabled, compiled Mosaic is available, and no operand
    is device-varying; otherwise computes the exact lax twin (which XLA
    fuses into the surrounding program like the original inline scans).
    """
    if isinstance(arrays, jax.Array):
        arrays = (arrays,)
    if isinstance(ops, str):
        ops = (ops,)
    # gate on the backend being a TPU (axon = this host's tunneled v5e):
    # pltpu specs fail at LOWERING on any other accelerator, so "not cpu"
    # would crash rather than fall back (ADVICE r4)
    if (_IMPL == "pallas" and jax.default_backend() in ("tpu", "axon")
            and not _has_vma(*arrays)):
        return multi_scan(tuple(arrays), tuple(ops), reverse=reverse,
                          interpret=False)
    return _twin(tuple(arrays), tuple(ops), reverse)


def cumsum_i32(x, **kw):
    """Fused-pass ``jnp.cumsum`` for one i32 array (see :func:`multi_scan`)."""
    return multi_scan((x,), ("sum",), **kw)[0]


def cummax_i32(x, reverse=False, **kw):
    return multi_scan((x,), ("max",), reverse=reverse, **kw)[0]


def cummin_i32(x, reverse=False, **kw):
    return multi_scan((x,), ("min",), reverse=reverse, **kw)[0]


def cummax_pair(k, v, reverse=False, **kw):
    """Lexicographic-max scan of (key, payload) -- the i32 twin of
    ``lax.cummax((k << 32) | biased_v)`` on i64 (segmented copy/propagate)."""
    return multi_scan((k, v), ("maxpair",), reverse=reverse, **kw)
