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


def _le(a, b):
    """Lexicographic a <= b over parallel (key[, payload]) tuples."""
    if len(a) == 1:
        return a[0] <= b[0]
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


def _exchange(x, part, bit, up):
    """One compare-exchange: element i holds ``x``, its partner (index
    i ^ j, ``bit`` = that bit of i) holds ``part``; ``up`` = ascending
    pair (array or scalar bool)."""
    take_min = bit == ~up                    # lower index of an asc pair
    a_le_b = _le(x, part)
    take_self = take_min == a_le_b
    return tuple(jnp.where(take_self, s, p) for s, p in zip(x, part))


def _make_kernel(nops: int, C: int, unsigned: bool, alt: bool,
                 level_only: int | None):
    """Unrolled stage-network kernel over one (Cr, 128) block per grid
    step.

    ``alt``: XOR every stage direction with the block's program_id parity
    -- the hybrid presort, leaving blocks alternating asc/desc.
    ``level_only``: if set, run ONLY merge level ``l`` of the network
    (stages j = 2^(l-1)..1 with direction ``(i & 2^l) == 0``) -- the
    hybrid's per-level finish over full-segment blocks, whose static
    local-iota masks encode every sub-block direction.
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

        if level_only is not None:
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
            else:                             # k == C: all-ascending
                up = jnp.bool_(True)
            if flip is not None:
                up = up != flip               # flip odd blocks
            x = _exchange(x, part, bit, up)

        key = x[0] ^ jnp.int32(_SIGN) if unsigned else x[0]
        out_refs[0][:] = pltpu.bitcast(key, out_refs[0].dtype)
        for o, b in zip(out_refs[1:], x[1:]):
            o[:] = pltpu.bitcast(b, o.dtype)

    return kernel


def _pallas_pass(ops, C: int, unsigned: bool, alt: bool,
                 level_only: int | None, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = ops[0].shape[0]
    spec = pl.BlockSpec((C // 128, 128), lambda s: (s, jnp.int32(0)),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel(len(ops), C, unsigned, alt, level_only),
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


@partial(jax.jit, static_argnames=("chunk", "unsigned", "interpret"))
def bitonic_sort_segmented(keys: jax.Array, chunk: int,
                           payload: jax.Array | None = None,
                           unsigned: bool = True,
                           interpret: bool | None = None):
    """Sort ``chunk``-sized segments ascending, entirely on-chip.

    ``keys``: u32 (``unsigned=True``, the default) or i32 column, length a
    multiple of ``chunk`` (a power of two, 256..MAX_SEGMENT_BITONIC).
    ``payload``: optional i32 column carried through and used as the
    lexicographic tiebreak -- with per-segment-unique payloads the result
    is bit-equal to ``lax.sort(..., num_keys=1, is_stable=True)``.

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
            # explicitly via _bitonic_pallas
            return _twin(ops, chunk, num_keys)
    return _bitonic_pallas(ops, chunk, unsigned, interpret)


def _bitonic_pallas(ops, chunk: int, unsigned: bool, interpret: bool):
    if chunk <= UNROLL_MAX:
        return _pallas_pass(ops, chunk, unsigned, False, None, interpret)

    # hybrid: alternating presort at UNROLL_MAX blocks, then one
    # whole-level finish kernel per remaining level over FULL-chunk
    # blocks (a single level is 17-18 stages at 2^17/2^18 -- cheap to
    # compile where the full 171-stage network at 2^18 took ~9.5 min,
    # and every stage stays fused in VMEM)
    sub = UNROLL_MAX
    x = _pallas_pass(ops, sub, unsigned, True, None, interpret)
    for l in range(sub.bit_length(), chunk.bit_length()):
        x = _pallas_pass(x, chunk, unsigned, False, l, interpret)
    return x
