"""Out-of-core probe streaming: probe relations larger than device memory.

SURVEY §5.7's "long sequence" axis applied to memory: the build table stays
resident in HBM while the probe column streams from HOST memory in fixed
chunks.  Transfers overlap compute double-buffered: chunk i+1's
``jax.device_put`` (async) is issued before chunk i's probe is fenced, so
the PCIe/tunnel transfer of the next chunk rides under the current chunk's
device time.  Counters accumulate ON DEVICE across chunks (one scalar
carry, no per-chunk host sync); materialized row-id pairs are returned to
the host per chunk (they must leave the device anyway for an out-of-core
consumer).

This bounds device residency at O(table + 2 * chunk + chunk_out) bytes
regardless of the probe relation's size -- a 2^30-row probe column (4 GB)
streams through a v5e with the same footprint as a 2^24 one.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .layout import I32


@partial(jax.jit, static_argnames=("unique",))
def _chunk_probe_direct(table, pk_chunk, n_valid, unique=True):
    """One chunk through the windowed direct-table probe strand; returns
    (probe_row_local, build_row, matches_i64, cmps_i64)."""
    from .strands_windowed import direct_probe_strand_sorted

    live = jnp.arange(pk_chunk.shape[0], dtype=I32) < n_valid
    # dead tail rows become the all-ones key: out of range, miss, and their
    # bucket walk is skipped below by masking the counters
    pk = jnp.where(live, pk_chunk, jnp.uint32(0xFFFFFFFF))
    out = direct_probe_strand_sorted(table, pk, unique=unique)
    # out-of-range misses contributed bucket walks for the PAD rows too;
    # recompute the pad contribution and subtract (pads all share one key)
    from .hashing import bucket_of, hash_key
    pad_b = bucket_of(hash_key(jnp.uint32(0xFFFFFFFF)), table.num_buckets)
    pad_cmps = (table.bucket_len[pad_b].astype(jnp.int64)
                * (pk_chunk.shape[0] - n_valid))
    return (out["probe_row"], out["build_row"], out["c_htProbe"],
            out["c_htProbeCmp"] - pad_cmps)


def stream_probe_chaining(table, probe_keys_host, chunk_size: int = 1 << 22,
                          unique: bool = True, collect_pairs: bool = False):
    """Probe a device-resident chaining table with a HOST-resident key
    column of any size (numpy array or memmap), in overlapped chunks.

    Returns ``(num_matches, num_cmps, pairs)`` where ``pairs`` is a list of
    per-chunk ``(probe_row_global, build_row)`` numpy arrays when
    ``collect_pairs`` (valid rows only), else ``[]``.  Counters are
    bit-equal to a whole-column probe.  Requires a dense-direct table (the
    windowed strand layout).
    """
    if getattr(table, "direct", None) is None:
        raise ValueError(
            "stream_probe_chaining requires a dense-direct table "
            "(build with the dense_direct layout)")
    if not unique and getattr(table, "chain_by_key", None) is None:
        raise ValueError(
            "stream_probe_chaining(unique=False) counts full chain walks "
            "per probe: build the table with full_chain_index=True")
    pk = np.asarray(probe_keys_host)
    n = pk.shape[0]
    n_chunks = max(1, -(-n // chunk_size))
    matches = jnp.int64(0)
    cmps = jnp.int64(0)
    pairs = []

    def put(i):
        lo = i * chunk_size
        hi = min(lo + chunk_size, n)
        buf = pk[lo:hi]
        if hi - lo < chunk_size:  # static shapes: pad the tail chunk
            buf = np.concatenate(
                [buf, np.zeros(chunk_size - (hi - lo), pk.dtype)])
        return jax.device_put(buf), hi - lo, lo

    nxt = put(0)
    for i in range(n_chunks):
        chunk, n_valid, base = nxt
        if i + 1 < n_chunks:
            nxt = put(i + 1)  # async: overlaps this chunk's probe
        prow, brow, m, c = _chunk_probe_direct(
            table, chunk, jnp.int32(n_valid), unique=unique)
        matches = matches + m
        cmps = cmps + c
        if collect_pairs:
            prow_np = np.asarray(prow)   # syncs this chunk only
            brow_np = np.asarray(brow)
            v = prow_np >= 0
            pairs.append((prow_np[v] + base, brow_np[v]))
    return int(matches), int(cmps), pairs
