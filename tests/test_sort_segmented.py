"""Segmented probe sorts + chunk-patched windowed lookups.

The probe strands' one global 2-op sort is the measured bound of every
unsorted-probe pipeline (PERF.md).  ``ops/sort.py:sort_segmented`` replaces
it with a batched within-segment sort when the key domain is known
(tools/sortbench.py: 49.9 -> 38.2 ms at 2^24 over a 2^20 domain), and
``safe_lookup``'s chunk patching keeps the downstream expansion lookups
windowed across the ~K segment-boundary chunks.  These tests pin:

* sort_segmented/sort_segmented_1op semantics (per-segment ordering, row
  id recovery, miss keys at segment tails);
* probe_sort_chunk's routing policy;
* safe_lookup's patched path against brute force on adversarial streams;
* full strand counters/result parity vs the python oracles when the
  segmented paths are active (P large enough, domain small enough).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import hashjoin3d_tpu as hj
from hashjoin3d_tpu.ops.sort import (probe_sort_chunk, sort_segmented,
                                     sort_segmented_1op, window_for_chunk)
from hashjoin3d_tpu.ops.strands_windowed import safe_lookup
from oracle import ChainingOracle, NestedOracle

I32 = np.int32
U32 = np.uint32


def test_probe_sort_chunk_policy():
    # unknown domain -> global sort
    assert probe_sort_chunk(1 << 24, None) is None
    # canonical bench shape: 2^24 probes over 2^20 domain.  The margin
    # policy wants segments of 2x the domain, but XLA's 2-op sort cannot
    # compile rows past MAX_SEGMENT = 2^20 (scoped VMEM), so the segment
    # caps there and the coverage margin moves into a 2x window instead.
    assert probe_sort_chunk(1 << 24, 1 << 20) == 1 << 20
    assert window_for_chunk(1 << 20, 1 << 20) == 2048
    # sub-cap domain: the full 2x-domain segment, default window
    assert probe_sort_chunk(1 << 20, 1 << 16) == 1 << 17
    assert window_for_chunk(1 << 17, 1 << 16) == 1024
    # domain not a power of two rounds up (then doubles)
    assert probe_sort_chunk(1 << 20, (1 << 16) - 3) == 1 << 17
    # large domains stay segmentable until the needed window exceeds the
    # kernel's 8K cap (domain > 4 * MAX_SEGMENT)
    assert probe_sort_chunk(1 << 24, 1 << 22) == 1 << 20
    assert window_for_chunk(1 << 20, 1 << 22) == 8192
    assert probe_sort_chunk(1 << 26, 1 << 23) is None
    # indivisible P
    assert probe_sort_chunk((1 << 20) + 512, 1 << 16) is None
    # segment floor: window-chunk alignment
    assert probe_sort_chunk(1 << 16, 16) == 1024
    # segment count cap (max_k=64): tiny domain under a huge P
    assert probe_sort_chunk(1 << 24, 16) == 1 << 18


# -- window-coverage simulation (numpy, no device): pins the margin policy ----


def _simulate_uncovered_chunks(P, domain, segment, W, C=1024, seed=0):
    """Uncovered window chunks of a segment-sorted uniform key stream,
    computed with safe_lookup's exact coverage math (chunk_bases policy,
    r5: base = align1024(chunk max - W), window [base, base + W + 1024))."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, domain, P, dtype=np.int64)
    k2 = np.sort(keys.reshape(P // segment, segment), axis=1).reshape(P)
    T = max(W + 1024, -(-domain // 1024) * 1024)
    c2 = k2.reshape(P // C, C)
    kmax = c2.max(axis=1)
    base = np.clip((kmax - W) & ~1023, 0, max(T - (W + 1024), 0))
    delta = c2 - base[:, None]
    covered = (delta >= 0) & (delta < W + 1024)
    return int((~covered.all(axis=1)).sum())


@pytest.mark.parametrize("logp,logd", [(24, 20), (25, 21), (24, 21)])
def test_segment_margin_covers_canonical_shapes(logp, logd):
    """The regression test VERDICT r3 asked for: at the canonical bench
    shapes the policy's (segment, window) pair must leave ZERO uncovered
    window chunks, while the round-3 policy (domain-sized segment, default
    1024 window) overflows the patch budget and would serialize the whole
    stream."""
    P, domain = 1 << logp, 1 << logd
    chunk = probe_sort_chunk(P, domain)
    assert chunk is not None
    W = window_for_chunk(chunk, domain)
    assert W >= 2 * (1024 * domain) // chunk  # the 2x margin itself
    assert _simulate_uncovered_chunks(P, domain, chunk, W) == 0
    # the old zero-margin policy: hundreds of uncovered chunks, beyond the
    # old fixed patch budget (measured 256 at 2^24/2^20 in VERDICT r3)
    if logp == 24 and logd == 20:
        assert _simulate_uncovered_chunks(P, domain, domain, 1024) > 64


def test_sort_segmented_semantics():
    rng = np.random.default_rng(0)
    P, chunk = 8192, 1024
    pk = rng.integers(0, 600, P, dtype=U32)
    sk, sr = (np.asarray(x) for x in sort_segmented(jnp.asarray(pk), chunk))
    for s in range(P // chunk):
        seg = slice(s * chunk, (s + 1) * chunk)
        # ascending within the segment
        assert np.all(np.diff(sk[seg].astype(np.int64)) >= 0)
        # row ids point back into this segment and recover the keys
        assert np.all((sr[seg] >= s * chunk) & (sr[seg] < (s + 1) * chunk))
        assert np.array_equal(pk[sr[seg]], sk[seg])
    # global multiset preserved
    assert np.array_equal(np.sort(sk), np.sort(pk))


def test_sort_segmented_miss_keys_at_tails():
    rng = np.random.default_rng(1)
    P, chunk = 4096, 1024
    pk = rng.integers(0, 512, P, dtype=U32)
    miss = rng.choice(P, 100, replace=False)
    pk[miss] = rng.integers(1 << 30, 1 << 31, 100)  # far out of domain
    sk, sr = (np.asarray(x) for x in sort_segmented(jnp.asarray(pk), chunk))
    for s in range(P // chunk):
        seg = sk[s * chunk:(s + 1) * chunk]
        big = seg >= 512
        # miss keys occupy a contiguous tail of the segment
        assert np.all(big == (np.arange(chunk) >= chunk - big.sum()))


def test_sort_segmented_1op_dead_markers():
    rng = np.random.default_rng(2)
    P, chunk = 4096, 1024
    b = rng.integers(0, 64, P).astype(I32)
    b[rng.choice(P, 500, replace=False)] = -1
    out = np.asarray(sort_segmented_1op(jnp.asarray(b), chunk))
    for s in range(P // chunk):
        seg = out[s * chunk:(s + 1) * chunk]
        assert np.all(np.diff(seg) >= 0)  # -1s at the front
    assert np.array_equal(np.sort(out), np.sort(b))


def _brute(values, keys):
    T = values.shape[0]
    ok = (keys >= 0) & (keys < T)
    return np.where(ok, values[np.clip(keys, 0, T - 1)], 0).astype(U32)


def test_safe_lookup_patches_boundary_chunks():
    """A segment-restarting key stream: most chunks covered, K-1 boundary
    chunks straddle the wrap and must be patched, not degrade the whole
    stream to the gather."""
    rng = np.random.default_rng(3)
    T = 1 << 14
    values = rng.integers(1, 1 << 30, T).astype(U32)
    K, seg = 8, 4096
    # each segment sweeps the full value range; offsets misalign the
    # wrap-around from the 1024-chunk grid -> uncovered boundary chunks
    keys = np.concatenate([
        np.sort(rng.integers(0, T, seg)).astype(I32)[
            np.r_[np.arange(137, seg), np.arange(137)]]
        for _ in range(K)])
    out = np.asarray(safe_lookup(jnp.asarray(values), jnp.asarray(keys)))
    assert np.array_equal(out, _brute(values, keys))


def test_safe_lookup_gather_fallback_beyond_patch_budget():
    """More uncovered chunks than max_patch -> exact via the full gather."""
    rng = np.random.default_rng(4)
    T = 1 << 14
    values = rng.integers(1, 1 << 30, T).astype(U32)
    keys = rng.integers(0, T, 1 << 15).astype(I32)  # fully random stream
    out = np.asarray(safe_lookup(jnp.asarray(values), jnp.asarray(keys),
                                 max_patch=4))
    assert np.array_equal(out, _brute(values, keys))


def test_safe_lookup_patch_with_misses_and_pad():
    rng = np.random.default_rng(5)
    T = 5000  # not a multiple of W: exercises table padding
    values = rng.integers(1, 1 << 30, T).astype(U32)
    n = 3 * 1024 + 700  # not a multiple of C: exercises key padding
    keys = np.sort(rng.integers(0, T, n)).astype(I32)
    keys[rng.choice(n, 50, replace=False)] = -1
    keys[rng.choice(n, 50, replace=False)] = T + 17
    # one artificial wrap to force a patch
    keys[2048:2060] = np.arange(12, dtype=I32)
    out = np.asarray(safe_lookup(jnp.asarray(values), jnp.asarray(keys)))
    assert np.array_equal(out, _brute(values, keys))


# -- full strands with segmentation active -----------------------------------


def test_direct_strand_segmented_counters():
    """Csr/CsrUU over a dense-direct table, P large enough that the
    segmented sort engages (probe_sort_chunk != None)."""
    rng = np.random.default_rng(6)
    dom = 512
    bk = rng.permutation(dom).astype(U32)
    pk = rng.integers(0, 600, 8192, dtype=U32)  # ~15% misses
    assert probe_sort_chunk(8192, dom) is not None

    for unique in (False, True):
        res = hj.join(bk, pk, how="chaining", unique=unique, num_buckets=64,
                      backend="device")
        orc = ChainingOracle(bk, 64)
        pairs, matches, cmps = orc.probe(pk, unique=unique)
        assert res.num_matches == matches
        assert res.num_cmps == cmps
        assert sorted(res.pairs()) == sorted(pairs)


def test_keydirect_nested_strand_segmented_counters():
    """Nrs expansion path with segment-restarting group-position streams:
    the patched safe_lookup keeps build_row exact."""
    rng = np.random.default_rng(7)
    dom = 512
    bk = rng.integers(0, dom, 4096, dtype=U32)  # ~8 rows per key
    pk = rng.integers(0, 600, 8192, dtype=U32)
    res = hj.join(bk, pk, how="nested", num_buckets=128, backend="device",
                  key_domain=dom)
    orc = NestedOracle(bk, 128)
    nested, matches, cmps = orc.probe(pk)
    assert res.num_matches == matches
    assert res.num_cmps == cmps
    assert sorted(res.pairs()) == sorted(orc.unnest(nested))


def test_keydirect_chaining_strand_segmented_counters():
    rng = np.random.default_rng(8)
    dom = 512
    bk = rng.integers(0, dom, 4096, dtype=U32)
    pk = rng.integers(0, 600, 8192, dtype=U32)
    res = hj.join(bk, pk, how="chaining", num_buckets=128, backend="device",
                  key_domain=dom)
    orc = ChainingOracle(bk, 128)
    pairs, matches, cmps = orc.probe(pk)
    assert res.num_matches == matches
    assert res.num_cmps == cmps
    assert sorted(res.pairs()) == sorted(pairs)


def test_zipf_skewed_segmented():
    """Heavy duplicate skew: segment spreads shrink, coverage trivially
    holds; counters stay exact."""
    rng = np.random.default_rng(9)
    dom = 512
    bk = rng.integers(0, dom, 2048, dtype=U32)
    z = np.minimum((rng.pareto(1.2, 8192) * 3).astype(np.int64), dom - 1)
    pk = z.astype(U32)
    res = hj.join(bk, pk, how="nested", num_buckets=64, backend="device",
                  key_domain=dom)
    orc = NestedOracle(bk, 64)
    nested, matches, cmps = orc.probe(pk)
    assert res.num_matches == matches
    assert res.num_cmps == cmps
    assert res.num_results == len(orc.unnest(nested))


def _simulate_rows_stream_uncovered(P, domain, segment, n_rows, W, C=1024,
                                    seed=3):
    """Uncovered chunks of the EXPANSION position stream
    (``group_start[g] + within``, strands_windowed.py emission): a
    segment-sorted probe stream revisits the whole [0, n_rows) CSR range
    once per segment, so the position stream restarts at every segment
    boundary and advances ``P/segment`` times faster than under a global
    sort.  Uses safe_lookup's exact coverage math."""
    rng = np.random.default_rng(seed)
    glen = n_rows // domain
    nseg = P // segment
    pos = []
    for s in range(nseg):
        keys = np.sort(rng.choice(domain, segment, replace=(P > domain)))
        # each probe emits its group's glen consecutive CSR positions
        pos.append((keys[:, None] * glen
                    + np.arange(glen)[None, :]).reshape(-1))
    stream = np.concatenate(pos).astype(np.int64)
    n = (len(stream) // C) * C
    c2 = stream[:n].reshape(-1, C)
    T = max(W + 1024, -(-n_rows // 1024) * 1024)
    kmax = c2.max(axis=1)
    base = np.clip((kmax - W) & ~1023, 0, max(T - (W + 1024), 0))
    delta = c2 - base[:, None]
    covered = (delta >= 0) & (delta < W + 1024)
    return int((~covered.all(axis=1)).sum())


def test_directory_fetch_window_covers_head_stream():
    """The build-side directory fetch (layout.compact_group_index): head
    positions of sorted key runs fluctuate with the group-size draw, so
    the window needs the standard 2x margin.  Under margin 1 the r5
    tile-aligned windows (which removed the old 2W formulation's
    incidental slack) silently degraded the exp-4 12.6M-row builds to the
    serialized gather (build 226 -> 429 ms, artifacts/r5/exp4_24c.log) --
    builds carry no route output, so only this simulation and the wall
    clock can catch it."""
    from hashjoin3d_tpu.ops.strands_windowed import stride_params

    rng = np.random.default_rng(17)
    # exp-4's BIMODAL fk multiplicity: a common region at ~4 rows/key next
    # to an exclusive region at ~2 (mean 2.4) -- the head-position stride
    # is REGIONAL, so a window sized for the mean stride under-covers the
    # dense region (this, not mere fluctuation, is what degraded)
    dv_a, dv_b = 1 << 18, 1 << 20
    keys = np.sort(np.concatenate([
        rng.integers(0, dv_a, 4 * dv_a),
        dv_a + rng.integers(0, dv_b, 2 * dv_b)]))
    n, cap = keys.size, dv_a + dv_b
    first = np.concatenate([[True], keys[1:] != keys[:-1]])
    hp = np.flatnonzero(first)               # ascending head positions
    hp = np.concatenate([hp, np.full(cap - hp.size, n - 1)])[:cap]

    def uncovered(W, C):
        m = (hp.size // C) * C
        c2 = hp[:m].reshape(-1, C)
        T = max(W + 1024, -(-n // 1024) * 1024)
        kmax = c2.max(axis=1)
        base = np.clip((kmax - W) & ~1023, 0, max(T - (W + 1024), 0))
        delta = c2 - base[:, None]
        return int((~((delta >= 0) & (delta < W + 1024)).all(axis=1)).sum())

    W2, C2 = stride_params(n / cap, margin=2.0)
    assert uncovered(W2, C2) == 0            # the shipped margin covers
    W1, C1 = stride_params(n / cap, margin=1.0)
    # margin 1 leaks uncovered chunks (scale-dependent count; at the real
    # 12.6M-row shape enough of them overflow the patch budget and the
    # whole directory fetch serializes)
    assert uncovered(W1, C1) > 0


@pytest.mark.parametrize("logp,logd,logn", [(20, 20, 24),   # exp-1 Crs
                                            (21, 21, 25),   # exp-1 2x Crs
                                            (24, 20, 24)])  # Csr-shaped
def test_rows_window_covers_expansion_streams(logp, logd, logn):
    """The round-4 Crs finding: the emission lookup
    (``group_rows[group_start[g] + within]``) was left at the default
    1024 window while the segmented probe sort multiplied the position
    stream's per-chunk spread by P/segment -- every chunk failed coverage
    and the WHOLE 16.8M-row emission serialized to the 144 ms gather
    (measured 191 ms vs 49 ms strand, artifacts/r4/exp1_t0.log).
    ``rows_window`` must leave zero uncovered chunks at the canonical
    shapes; the old default must fail at the Crs shape (proving the test
    bites)."""
    from hashjoin3d_tpu.ops.sort import set_sort_impl
    from hashjoin3d_tpu.ops.strands_windowed import rows_window
    P, domain, n_rows = 1 << logp, 1 << logd, 1 << logn
    # pin the TPU routing: probe_sort_chunk is engine-dependent (the Crs
    # shape P == domain only segments under the Pallas bitonic cap; on the
    # CPU test backend "auto" resolves to lax, which returns None there).
    # The simulation below is pure numpy, so no Pallas sort ever compiles.
    set_sort_impl("bitonic")
    try:
        chunk = probe_sort_chunk(P, domain)
    finally:
        set_sort_impl("auto")
    if (logp, logd) == (20, 20):
        assert chunk is not None      # bitonic 2^18 segments, W = 8192
    elif (logp, logd) == (21, 21):
        # the needed window (2 * 1024 * 2^21 / 2^18 = 16K) exceeds the
        # kernel's 8K cap at every legal segment: the policy must route
        # this shape to the GLOBAL sort, whose streams the default
        # rows_window covers below
        assert chunk is None
    # simulate the shipped route: chunk=None = one global segment
    sim_seg = chunk if chunk is not None else P
    Wr, Cr = rows_window(P, chunk, n_rows, out_size=n_rows)
    assert _simulate_rows_stream_uncovered(P, domain, sim_seg, n_rows,
                                           Wr, Cr) == 0
    if (logp, logd, logn) == (20, 20, 24):
        # the pre-fix default window: every chunk uncovered
        assert _simulate_rows_stream_uncovered(P, domain, chunk, n_rows,
                                               1024, 1024) > 1000
