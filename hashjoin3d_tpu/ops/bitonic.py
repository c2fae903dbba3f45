"""Pallas segmented bitonic sort: the engine's sort wall, fused in VMEM.

Motivation (PERF.md roofline, tools/sortbench.py): every probe strand is
bound by its one sort -- XLA's ``lax.sort`` runs a generic serialized
comparator network at ~2.2-3.0 ns/elem monolithic and ~2.3 ns/elem at the
(16, 2^20) segmented shape the windowed probe path needs (37.8 ms for 2^24
2-op on v5e).  A radix-sort replacement dead-ends on this hardware: the
within-chunk rank/scatter step has no fast Mosaic formulation
(tools/mosaic_probe.py measured ranking at 1-3 ns/elem, XLA scatter at
4.8 ns/update, gathers at 8.6 ns/elem -- all at or above lax.sort itself).

What DOES map onto the VPU is the bitonic network itself: each
compare-exchange stage is two circular rolls, a handful of compares, and
selects over a ``(Cr, 128)`` tile -- all full-width vector ops, with every
stage fused in VMEM (XLA materializes each sort stage through HBM).
Measured v5e, 2^24 elements (tools/sortbench.py): 6.6 ms 1-op / 16.5 ms
2-op at 2^16 segments vs 20.6 / 29.6 ms for XLA's batched sort at the
same shape and 36.2 / 49.7 ms monolithic.

The network must be UNROLLED at trace time: expressing the stages as
fori_loops (traced shifts/masks) compiles 10x faster but runs 2.9-3.6x
slower -- Mosaic neither folds the masks nor pipelines across loop
iterations (measured 53 vs 18 ms at 2^18).  Unrolled Mosaic compile time
in turn scales with stages x vector-op tiles (~9.5 min at C = 2^18 on
the remote toolchain, ~110 s at 2^16), so segments above ``UNROLL_MAX``
= 2^16 run as a two-phase hybrid whose unrolled code stays short:

1. presort: the full network sorts each 2^16 block, directions
   ALTERNATING ascending/descending (bitonic alternation rides a
   program_id parity flip);
2. one whole-level finish kernel per remaining level, over FULL-segment
   blocks: a single level is only ``l`` stages (17-18 at 2^17/2^18) and
   its static local-iota masks encode every sub-block direction.

Layout/semantics match ``ops/sort.py:sort_segmented`` exactly: elements
are row-major within the ``(Cr, 128)`` block, segments sort independently
and ascending, and the 2-op variant orders lexicographically by
``(key, payload)`` -- bit-equal to a *stable* 1-key ``lax.sort`` whenever
payloads are distinct within a segment (they are: the engine's payload is
the segment-local row id).  Keys compare in u32 order via the sign-flip
bitcast; payloads compare as i32.

This is engine infrastructure for the probe-side sort of the hash join
(reference ``algebra.hh:625-659``: the reference probes tuple-at-a-time
and needs no sort; the TPU formulation sorts probes once and resolves all
lookups against advancing table windows, see ops/windowed.py).

Mosaic idioms follow ops/windowed.py / ops/scan.py: i32 everywhere (trace
under ``jax.enable_x64(False)``), (Cr, 128) tiles, i32 roll shifts
(python-int shifts trace as i64 under global x64 and tpu.dynamic_rotate
rejects them), interpret-twin on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .layout import I32

_SIGN = -0x80000000  # i32 sign bit: x ^ _SIGN maps u32 order onto i32 order

#: Largest segment the single unrolled kernel compiles in reasonable time
#: (~110 s remote at 2^16; 2^18 took ~9.5 min).  Larger segments use the
#: three-phase hybrid.
UNROLL_MAX = 1 << 16

#: Largest segment ``bitonic_sort_segmented`` accepts: the hybrid's
#: cross stages are cheap XLA passes, but each extra level adds one
#: full-array pass per stage plus a merge-finish kernel pass, so past
#: 4 x UNROLL_MAX the win over XLA's own segmented sort fades.
MAX_SEGMENT_BITONIC = 1 << 18


def _le(a, b, take_min, stable=True):
    """Comparator a <= b over parallel (key[, payload]) tuples.

    Evaluated INDEPENDENTLY at both partner positions, so its TIE decision
    must be consistent between them or both sides grab the same payload
    (a duplicated + lost row -- caught by test_kernel_2op_unstable_mode).
    ``stable=True`` gets consistency from the lexicographic payload
    tiebreak (payloads distinct per segment) and matches the stable lax
    twin bit-for-bit.  ``stable=False`` resolves key ties as ``take_min``
    instead: a_le_b == take_min makes take_self true at BOTH positions,
    for either direction (each side keeps its element on a tie) -- 2
    fewer vector ops per stage, equal-key payload order network-defined."""
    if len(a) == 1:
        return a[0] <= b[0]
    if not stable:
        return (a[0] < b[0]) | ((a[0] == b[0]) & take_min)
    return (a[0] < b[0]) | ((a[0] == b[0]) & (a[1] <= b[1]))


def _partner(x, j: int, Cr: int, lane, rowi):
    """Value at index i ^ j for every element of the (Cr, 128) blocks in
    ``x`` (i = row * 128 + lane, row-major).  XOR by a power of two is
    i+j where the bit is clear and i-j where it is set -- two static
    circular rolls and one select per array."""
    from jax.experimental.pallas import tpu as pltpu

    if j < 128:
        bit = (lane & jnp.int32(j)) != 0
        return tuple(
            jnp.where(bit, pltpu.roll(b, jnp.int32(j), 1),
                      pltpu.roll(b, jnp.int32(128 - j), 1))
            for b in x), bit
    jr = j // 128
    bit = (rowi & jnp.int32(jr)) != 0
    return tuple(
        jnp.where(bit, pltpu.roll(b, jnp.int32(jr), 0),
                  pltpu.roll(b, jnp.int32(Cr - jr), 0))
        for b in x), bit


def _exchange(x, part, bit, up, stable=True):
    """One compare-exchange: element i holds ``x``, its partner (index
    i ^ j, ``bit`` = that bit of i) holds ``part``; ``up`` = ascending
    pair (array or scalar bool)."""
    take_min = bit == ~up                    # lower index of an asc pair
    a_le_b = _le(x, part, take_min, stable)
    take_self = take_min == a_le_b
    return tuple(jnp.where(take_self, s, p) for s, p in zip(x, part))


def _make_kernel(nops: int, C: int, unsigned: bool, alt: bool,
                 level_only: int | None, stable: bool = True,
                 level_range: tuple | None = None,
                 parity_top: bool = False):
    """Unrolled stage-network kernel over one (Cr, 128) block per grid
    step.

    ``alt``: XOR every stage direction with the block's program_id parity
    -- the hybrid presort, leaving blocks alternating asc/desc.
    ``level_only``: if set, run ONLY merge level ``l`` of the network
    (stages j = 2^(l-1)..1 with direction ``(i & 2^l) == 0``) -- the
    hybrid's per-level finish over full-segment blocks, whose static
    local-iota masks encode every sub-block direction.
    ``level_range=(lo, hi)``: run merge levels lo..hi fused in one pass
    over C = 2^hi blocks.  For l < hi the direction masks are local
    (bit l of the in-segment position equals bit l of the in-block
    position); the TOP level's direction (bit hi == block parity within
    the segment) rides ``parity_top`` -- set it when the block is
    SMALLER than the segment (the packed-hybrid middle pass), leave it
    False when C == segment (final all-ascending level).
    """
    Cr = C // 128
    logC = C.bit_length() - 1

    def kernel(*refs):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        in_refs = refs[:nops]
        out_refs = refs[nops:2 * nops]
        with jax.enable_x64(False):
            lane = jax.lax.broadcasted_iota(I32, (Cr, 128), 1)
            rowi = jax.lax.broadcasted_iota(I32, (Cr, 128), 0)

        key = pltpu.bitcast(in_refs[0][:], jnp.int32)
        if unsigned:
            key = key ^ jnp.int32(_SIGN)
        x = (key,) + tuple(pltpu.bitcast(r[:], jnp.int32)
                           for r in in_refs[1:])

        par = None
        if level_range is not None:
            lo, hi = level_range
            assert hi <= logC, (level_range, C)
            schedule = [(1 << l, 1 << t) for l in range(lo, hi + 1)
                        for t in range(l - 1, -1, -1)]
            flip = None
            if parity_top:
                par = (pl.program_id(0) & jnp.int32(1)) != 0
        elif level_only is not None:
            schedule = [(1 << level_only, 1 << t)
                        for t in range(level_only - 1, -1, -1)]
            flip = None
        else:
            flip = ((pl.program_id(0) & jnp.int32(1)) != 0 if alt
                    else None)
            schedule = [(k, k >> (t + 1))
                        for k in (1 << i for i in range(1, logC + 1))
                        for t in range(k.bit_length() - 1)]

        for k, j in schedule:
            part, bit = _partner(x, j, Cr, lane, rowi)
            # ascending iff (i & k) == 0; k == C is all-ascending
            if k < 128:
                up = (lane & jnp.int32(k)) == 0
            elif k // 128 < Cr:
                up = (rowi & jnp.int32(k // 128)) == 0
            elif par is not None:             # k == C < segment: parity
                up = ~par
            else:                             # k == C: all-ascending
                up = jnp.bool_(True)
            if flip is not None:
                up = up != flip               # flip odd blocks
            x = _exchange(x, part, bit, up, stable)

        key = x[0] ^ jnp.int32(_SIGN) if unsigned else x[0]
        out_refs[0][:] = pltpu.bitcast(key, out_refs[0].dtype)
        for o, b in zip(out_refs[1:], x[1:]):
            o[:] = pltpu.bitcast(b, o.dtype)

    return kernel


def _pallas_pass(ops, C: int, unsigned: bool, alt: bool,
                 level_only: int | None, interpret: bool,
                 stable: bool = True, level_range: tuple | None = None,
                 parity_top: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = ops[0].shape[0]
    spec = pl.BlockSpec((C // 128, 128), lambda s: (s, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(len(ops), C, unsigned, alt, level_only, stable,
                     level_range, parity_top),
        grid=(P // C,),
        in_specs=[spec] * len(ops),
        out_specs=[spec] * len(ops),
        out_shape=[jax.ShapeDtypeStruct((P // 128, 128), o.dtype)
                   for o in ops],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(o.reshape(P // 128, 128) for o in ops))
    return tuple(o.reshape(P) for o in outs)


def _twin(ops, chunk: int, num_keys: int):
    """Exact lax twin: lexicographic segmented sort (CPU path + oracle)."""
    P = ops[0].shape[0]
    K = P // chunk
    outs = lax.sort(tuple(o.reshape(K, chunk) for o in ops),
                    num_keys=num_keys, dimension=1)
    return tuple(o.reshape(P) for o in outs)


@partial(jax.jit, static_argnames=("chunk", "unsigned", "interpret",
                                   "stable"))
def bitonic_sort_segmented(keys: jax.Array, chunk: int,
                           payload: jax.Array | None = None,
                           unsigned: bool = True,
                           interpret: bool | None = None,
                           stable: bool = True):
    """Sort ``chunk``-sized segments ascending, entirely on-chip.

    ``keys``: u32 (``unsigned=True``, the default) or i32 column, length a
    multiple of ``chunk`` (a power of two, 256..MAX_SEGMENT_BITONIC).
    ``payload``: optional i32 column carried through and used as the
    lexicographic tiebreak -- with per-segment-unique payloads the result
    is bit-equal to ``lax.sort(..., num_keys=1, is_stable=True)``.

    ``stable=False`` drops the payload tiebreak from every comparator
    (the keys still sort exactly; the payload permutation stays aligned
    with its key, but equal-key payload ORDER becomes network-defined):
    ~4 of the ~14 vector ops per stage go away, measured 20.5 -> ~15 ms
    for the 2-op hybrid at 2^24/2^18 on v5e.  Safe wherever the consumer
    treats equal-key payloads as a multiset -- the probe strands do
    (duplicate probes of one key have identical match sets, so swapping
    their row ids permutes the result multiset onto itself).

    Returns ``(sorted_keys,)`` or ``(sorted_keys, sorted_payload)``.
    """
    P = keys.shape[0]
    assert chunk & (chunk - 1) == 0 and 256 <= chunk <= MAX_SEGMENT_BITONIC, \
        f"chunk must be a power of two in [256, {MAX_SEGMENT_BITONIC}]"
    assert P % chunk == 0, f"length {P} not a multiple of segment {chunk}"
    ops = (keys,) if payload is None else (keys, payload.astype(I32))
    num_keys = len(ops)  # lexicographic over every column

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
        if interpret:
            # the interpreter emulates the stage network far too slowly
            # for suite-sized inputs; kernel tests pass interpret=True
            # explicitly via _bitonic_pallas.  The stable twin is a valid
            # stable=False implementation too (payload order unspecified).
            return _twin(ops, chunk, num_keys)
    return _bitonic_pallas(ops, chunk, unsigned, interpret, stable)


@partial(jax.jit, static_argnames=("chunk", "key_bits", "interpret"))
def bitonic_sort_packed_segmented(keys: jax.Array, chunk: int,
                                  key_bits: int,
                                  interpret: bool | None = None):
    """(sorted keys u32, segment-local row ids i32) for SMALL key domains:
    the 2-op probe sort with its first ``sub_bits`` levels collapsed to a
    1-op network on packed words.

    The 2-op network's payload carry costs ~2.5x the 1-op per stage, but
    the payload is just the segment-local iota: within a 2^sub_bits
    sub-block the local id fits the low bits, so levels 1..sub_bits sort
    ONE packed word ``(key << sub_bits) | local_id`` (u32 order =
    (key, local) lexicographic), and the full row id is recovered
    EXACTLY afterwards from the element's position (its sub-block never
    changes during phase 1).  Only the remaining merge levels carry the
    row as a second op.  sub_bits = min(32 - key_bits, 16, log2 chunk):
    20-bit keys (the exp-1 dense domain) get 12 one-op levels -- 78 of
    171 stages at 2^18 segments, measured ~20.5 -> ~15 ms for 2^24 on
    v5e.

    REQUIRES every key < 2^key_bits: the caller must route streams with
    larger keys (misses past the domain) to the generic path -- see
    ``ops/sort.py:sort_segmented``'s runtime switch.  Equal-key row order
    is network-defined (the phase-2 merge is the unstable comparator);
    per-key row multisets are exact.
    """
    P = keys.shape[0]
    assert chunk & (chunk - 1) == 0 and 256 <= chunk <= MAX_SEGMENT_BITONIC
    assert P % chunk == 0
    assert 1 <= key_bits <= 31
    sub_bits = min(32 - key_bits, 16, chunk.bit_length() - 1)
    sub = 1 << sub_bits
    assert sub >= 256, f"sub-block {sub} below the kernel's 256 floor"
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
        if interpret:
            lid = jnp.arange(P, dtype=I32) % jnp.int32(chunk)
            return _twin((keys.astype(jnp.uint32), lid), chunk, 2)

    pos = jnp.arange(P, dtype=jnp.uint32)
    lid = pos & jnp.uint32(sub - 1)
    w = (keys.astype(jnp.uint32) << jnp.uint32(sub_bits)) | lid
    logc = chunk.bit_length() - 1
    # phase 1: 1-op ranged network, levels 1..sub_bits, over UNROLL_MAX
    # grid blocks.  NOT per-sub-block grid steps: (32, 128) blocks cost
    # ~5.5 us of fixed per-step overhead each (22.4 ms for 2^24 at
    # C=2^12, artifacts/r5/packedprof.log) where the same stages inside
    # 2^16 blocks with local direction masks stream at full rate.  The
    # level-sub_bits direction (bit sub_bits of the segment position) is
    # a local mask too, so sub-blocks come out alternating asc/desc
    # exactly as the merge levels expect.
    Cb = min(chunk, UNROLL_MAX)
    (ws,) = _pallas_pass(
        (w,), Cb, True, False, None, interpret,
        level_range=(1, sub_bits),
        parity_top=(sub_bits == Cb.bit_length() - 1) and Cb < chunk)
    skey = ws >> jnp.uint32(sub_bits)
    # the element never left its sub-block in phase 1: full local row id =
    # (sub-block base within the segment) | packed low bits
    base = (pos & jnp.uint32((chunk - 1) & ~(sub - 1)))
    srow = (base | (ws & jnp.uint32(sub - 1))).astype(I32)
    if sub == chunk:
        return skey, srow

    x = (skey, srow)
    # phase 2a: merge levels sub_bits+1 .. min(16, logc), fused over
    # UNROLL_MAX blocks (levels below the block size use local masks; the
    # top level's direction is the block's parity within the segment)
    mid_hi = min(UNROLL_MAX.bit_length() - 1, logc)
    if sub_bits < mid_hi:   # sub == UNROLL_MAX skips straight to 2b
        x = _pallas_pass(x, 1 << mid_hi, True, False, None, interpret,
                         stable=False, level_range=(sub_bits + 1, mid_hi),
                         parity_top=mid_hi < logc)
    # phase 2b: one whole-level pass per remaining level (as the hybrid)
    for l in range(mid_hi + 1, logc + 1):
        x = _pallas_pass(x, chunk, True, False, l, interpret, stable=False)
    return x


def _bitonic_pallas(ops, chunk: int, unsigned: bool, interpret: bool,
                    stable: bool = True):
    if chunk <= UNROLL_MAX:
        return _pallas_pass(ops, chunk, unsigned, False, None, interpret,
                            stable)

    # hybrid: alternating presort at UNROLL_MAX blocks, then one
    # whole-level finish kernel per remaining level over FULL-chunk
    # blocks (a single level is 17-18 stages at 2^17/2^18 -- cheap to
    # compile where the full 171-stage network at 2^18 took ~9.5 min,
    # and every stage stays fused in VMEM)
    sub = UNROLL_MAX
    x = _pallas_pass(ops, sub, unsigned, True, None, interpret, stable)
    for l in range(sub.bit_length(), chunk.bit_length()):
        x = _pallas_pass(x, chunk, unsigned, False, l, interpret, stable)
    return x
