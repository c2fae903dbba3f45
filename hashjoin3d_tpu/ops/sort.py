"""Sort and radix-partition primitives.

On TPU, XLA's fused sort runs at near memory bandwidth (~60 ms for 16.8M u32 on
v5e -- measured) and is the engine's workhorse: hash-table builds, merge
lookups, and shuffles are all expressed through it.  This module wraps it as
the engine's sort operator and provides the radix partition used by the
distributed exchange (``parallel/shuffle.py``) as a local operator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .hashing import murmur32
from .layout import I32, U32, run_boundaries, sorted_histogram


@jax.jit
def sort_by_key(keys: jax.Array, *payloads: jax.Array):
    """Stable sort of payload columns by a key column (ascending).

    Returns ``(sorted_keys, *sorted_payloads)``.
    """
    out = lax.sort((keys, *payloads), num_keys=1, is_stable=True)
    return out


@jax.jit
def sort_rows(keys: jax.Array):
    """Argsort-style: returns (sorted_keys, row_ids) -- a permutation handle."""
    n = keys.shape[0]
    return lax.sort((keys, jnp.arange(n, dtype=I32)), num_keys=1,
                    is_stable=True)


def _pow2_ceil(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


#: Largest within-segment sort row the TPU backend can compile: XLA's 2-op
#: bitonic sort keeps a whole row on the scoped-VMEM stack, and (8, 2^21)
#: u32/i32 needs 19.09 MB against the 16 MB scoped limit (measured compile
#: failure on v5e); 2^20-element rows fit.  Above this, coverage margin
#: comes from WIDER LOOKUP WINDOWS (:func:`window_for_chunk`), not longer
#: segments.
MAX_SEGMENT = 1 << 20

#: Engine-wide segmented-sort implementation: "lax" (XLA's sort),
#: "bitonic" (the fused Pallas stage network, ops/bitonic.py), or "auto"
#: (bitonic on compiled TPU backends, lax on CPU).  Measured on v5e
#: (tools/sortbench.py pallas rows): the kernel sorts (64, 2^18) 2-op in
#: a fraction of XLA's time at the same shape, so "auto" routes to it
#: wherever the probe policy can use segments <= MAX_SEGMENT_BITONIC.
#: Binds at trace time (jax.clear_caches() to re-trace after flipping).
_SORT_IMPL = "auto"


def set_sort_impl(impl: str) -> None:
    """Select the segmented-sort implementation ("auto"|"lax"|"bitonic")."""
    global _SORT_IMPL
    assert impl in ("auto", "lax", "bitonic"), impl
    _SORT_IMPL = impl


def _use_bitonic() -> bool:
    impl = _SORT_IMPL
    if impl == "auto":
        # only route to the Pallas kernel on a real TPU backend (axon =
        # this host's tunneled v5e); other accelerators fail at pltpu
        # lowering rather than falling back (same gate as scan.py)
        impl = "bitonic" if jax.default_backend() in ("tpu", "axon") else "lax"
    return impl == "bitonic"


def _has_vma(*arrays) -> bool:
    for x in arrays:
        try:
            if jax.typeof(x).vma:
                return True
        except Exception:
            pass
    return False


def probe_sort_chunk(P: int, domain: int | None, min_k: int = 8,
                     max_k: int = 64, align: int = 1024) -> int | None:
    """Segment size for a batched (segmented) probe sort, or None.

    XLA's TPU sort runs along the minor axis independently per row with
    bitonic depth ~log^2(C), so sorting K segments of C costs measurably
    less than one monolithic sort (tools/sortbench.py on v5e, 2^24 keys:
    2-op 49.9 ms monolithic -> 38.2 ms at (16, 2^20), 11.6 ms at
    (4096, 2^12)).  A segment-sorted stream stays windowed-lookup-friendly
    (ops/windowed.py) as long as each segment covers the whole key domain
    WITH MARGIN (window-chunk spread ~ domain * C_window / segment must sit
    well below W, not at it) and segment boundaries land on window-chunk
    boundaries (``align``).  Returns the
    smallest valid power-of-two segment, or None when a global sort is
    required (unknown domain, indivisible P, or too few segments to pay
    off -- batch dims < 8 are padded to the sublane tile and LOSE to the
    monolithic sort: (4, 2^22) measured slower than (2^24,)).
    """
    if domain is None or domain <= 0:
        return None
    # 2x the pow2-ceiled domain: a segment EQUAL to the domain puts the
    # expected C-chunk key spread (domain * C / segment) exactly at the
    # default W with zero margin -- fluctuations push ~every 64th chunk
    # past W, the patch budget overflows, and the whole stream degrades to
    # the serialized gather (the round-3 headline regression: simulated
    # 256 uncovered chunks at 2^24/2^20 with seg = domain and W = 1024).
    chunk0 = max(2 * _pow2_ceil(domain), align)
    # cap the segment count: downstream safe_lookup patches ~nsegments
    # boundary chunks per expansion stream (its budget scales with the
    # stream length)
    chunk0 = max(chunk0, _pow2_ceil(-(-P // max_k)))
    # Try the Pallas bitonic cap first when that engine is active: its
    # fused VMEM stage network is ~3-5x XLA per element but tops out at
    # MAX_SEGMENT_BITONIC; the lost coverage margin is won back by wider
    # lookup windows (window_for_chunk), viable down to W = 8192 <->
    # segment >= pow2_domain / 4.  Fall back to the XLA scoped-VMEM cap
    # (see MAX_SEGMENT) when the window can't cover the shorter segment.
    from .bitonic import MAX_SEGMENT_BITONIC
    caps = ([(MAX_SEGMENT_BITONIC, 1)] if _use_bitonic() else []) \
        + [(MAX_SEGMENT, min_k)]
    for cap, mk in caps:
        chunk = min(chunk0, cap)
        if 2 * 1024 * _pow2_ceil(domain) > 8192 * chunk:
            continue  # needed window exceeds the kernel's 8K cap
        if chunk * mk > P or P % chunk:
            continue
        return chunk
    return None


def window_for_chunk(chunk: int | None, domain: int, C: int = 1024,
                     base_w: int = 1024, max_w: int = 8192) -> int:
    """Lookup-window width for key streams sorted in ``chunk``-sized
    segments over ``domain``: the expected per-C-chunk key spread is
    ``C * pow2_ceil(domain) / chunk``; keep a 2x margin (W >= 2 * spread,
    simulated zero uncovered chunks at all canonical shapes --
    tests/test_sort_segmented.py).  ``chunk=None`` (global sort) keeps the
    kernel default."""
    if chunk is None:
        return base_w
    spread = -(-C * _pow2_ceil(domain) // chunk)
    W = base_w
    while W < 2 * spread and W < max_w:
        W *= 2
    return W


@partial(jax.jit, static_argnames=("chunk", "stable"))
def sort_segmented(keys_u32: jax.Array, chunk: int, stable: bool = True):
    """Sort u32 keys independently within contiguous ``chunk``-sized
    segments; returns (seg-sorted keys, original row ids).

    The fast replacement for the probe strands' global 2-op sort when the
    key domain is known (see :func:`probe_sort_chunk`); row ids are
    recovered from segment-local ids, so the sort stays 2-op u32/i32.
    Routes to the fused Pallas stage network (ops/bitonic.py) when the
    engine switch allows, the segment fits its VMEM cap, and no operand is
    device-varying under shard_map; the per-segment row ids make the
    lexicographic kernel bit-equal to this stable 1-key XLA sort.

    ``stable=False`` lets the kernel drop the row-id tiebreak from its
    comparators (~25% fewer vector ops; bitonic.py): keys still sort
    exactly and each row id stays aligned with its key, but equal-key row
    ORDER becomes network-defined.  The probe strands opt in -- duplicate
    probes of one key are interchangeable (identical match sets), so
    counters and result multisets are unchanged.  (The lax path is stable
    either way; ``stable`` only relaxes what the caller may assume.)
    """
    from .bitonic import MAX_SEGMENT_BITONIC, bitonic_sort_segmented
    P = keys_u32.shape[0]
    K = P // chunk
    if (_use_bitonic() and chunk <= MAX_SEGMENT_BITONIC
            and not _has_vma(keys_u32)):
        lid = jnp.broadcast_to(jnp.arange(chunk, dtype=I32)[None, :],
                               (K, chunk)).reshape(P)
        sk, sr = bitonic_sort_segmented(keys_u32.astype(U32), chunk,
                                        payload=lid, stable=stable)
        sr = (sr.reshape(K, chunk)
              + (jnp.arange(K, dtype=I32) * jnp.int32(chunk))[:, None])
        return sk.reshape(P), sr.reshape(P)
    k2 = keys_u32.reshape(K, chunk)
    r2 = jnp.broadcast_to(jnp.arange(chunk, dtype=I32)[None, :], (K, chunk))
    sk, sr = lax.sort((k2, r2), num_keys=1, dimension=1)
    sr = sr + (jnp.arange(K, dtype=I32) * jnp.int32(chunk))[:, None]
    return sk.reshape(P), sr.reshape(P)


@partial(jax.jit, static_argnames=("chunk",))
def sort_segmented_1op(vals_i32: jax.Array, chunk: int) -> jax.Array:
    """1-op within-segment ascending sort (counter streams: bucket ids
    with -1 dead markers sorting to each segment's front)."""
    from .bitonic import MAX_SEGMENT_BITONIC, bitonic_sort_segmented
    P = vals_i32.shape[0]
    if (_use_bitonic() and chunk <= MAX_SEGMENT_BITONIC
            and not _has_vma(vals_i32)):
        (sv,) = bitonic_sort_segmented(vals_i32.astype(I32), chunk,
                                       unsigned=False)
        return sv
    return lax.sort((vals_i32.reshape(P // chunk, chunk),), num_keys=1,
                    dimension=1)[0].reshape(P)


@partial(jax.jit, static_argnames=("num_partitions", "by_hash"))
def radix_partition(keys: jax.Array, num_partitions: int,
                    *payloads: jax.Array, by_hash: bool = True,
                    valid: jax.Array | None = None):
    """Partition rows by ``murmur32(key) % p`` (or ``key % p``).

    Returns ``(part_id_sorted, keys_sorted, payloads_sorted..., part_start,
    part_len)`` -- rows grouped by partition (one stable sort), with the CSR
    over partitions.  This is the single-chip analogue of the distributed
    hash-partition exchange and the building block of radix joins.
    """
    k = keys.astype(U32)
    p = (murmur32(k) if by_hash else k) % jnp.uint32(num_partitions)
    p = p.astype(I32)
    if valid is not None:
        p = jnp.where(valid, p, num_partitions)
    sorted_ops = lax.sort((p, k, *payloads), num_keys=1, is_stable=True)
    psort = sorted_ops[0]
    # histogram rides the sort (bincount's scatter-add is ~35x slower)
    is_first, _, _, run_len = run_boundaries(
        psort.astype(U32), jnp.int32(psort.shape[0]))
    part_start, part_len = sorted_histogram(psort, num_partitions,
                                            is_first, run_len)
    return (*sorted_ops, part_start, part_len)
