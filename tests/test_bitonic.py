"""Pallas segmented bitonic sort (ops/bitonic.py).

The kernel replaces XLA's segmented ``lax.sort`` on the probe strands'
one sort (the engine's measured wall, PERF.md).  These tests pin, on the
CPU interpreter at small shapes:

* the stage network itself (interpret=True) against the lexicographic
  ``lax.sort`` twin -- u32 keys incl. values >= 2^31 (sign-flip order),
  duplicate keys (payload tiebreak = stability), i32 1-op with -1 markers;
* ``sort_segmented`` / ``sort_segmented_1op`` routing under the engine
  switch (``ops.sort.set_sort_impl``), bit-equal outputs either way;
* ``probe_sort_chunk``'s bitonic-aware policy: shorter VMEM-capped
  segments with the window widened to keep ZERO uncovered chunks at the
  canonical shapes (the VERDICT r3 margin rule, extended to the kernel).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hashjoin3d_tpu.ops import sort as sort_mod
from hashjoin3d_tpu.ops.bitonic import (MAX_SEGMENT_BITONIC,
                                        _bitonic_pallas, _twin,
                                        bitonic_sort_segmented)
from hashjoin3d_tpu.ops.sort import (probe_sort_chunk, set_sort_impl,
                                     sort_segmented, sort_segmented_1op,
                                     window_for_chunk)
from test_sort_segmented import _simulate_uncovered_chunks

I32 = np.int32
U32 = np.uint32


@pytest.fixture
def bitonic_impl():
    set_sort_impl("bitonic")
    yield
    set_sort_impl("auto")
    jax.clear_caches()  # the switch binds at trace time


def _kernel_vs_twin(ops, chunk, unsigned=True):
    got = _bitonic_pallas(tuple(jnp.asarray(o) for o in ops), chunk,
                          unsigned, True)
    want = _twin(tuple(jnp.asarray(o) for o in ops), chunk, len(ops))
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.parametrize("chunk", [256, 512])
def test_kernel_2op_random_u32(chunk):
    rng = np.random.default_rng(0)
    P = 4 * chunk
    keys = rng.integers(0, 1 << 32, P, dtype=np.uint64).astype(U32)
    pay = np.arange(P, dtype=I32) % chunk
    _kernel_vs_twin((keys, pay), chunk)


def test_kernel_2op_duplicate_keys_payload_tiebreak():
    """Dense duplicates: the lexicographic payload tiebreak makes the
    kernel bit-equal to a stable 1-key sort (payload = segment-local id)."""
    rng = np.random.default_rng(1)
    chunk, P = 256, 1024
    keys = rng.integers(0, 7, P).astype(U32)  # heavy ties
    pay = np.tile(np.arange(chunk, dtype=I32), P // chunk)
    got = _bitonic_pallas((jnp.asarray(keys), jnp.asarray(pay)), chunk,
                          True, True)
    k2 = keys.reshape(-1, chunk)
    want_k = np.sort(k2, axis=1, kind="stable")
    want_p = np.argsort(k2, axis=1, kind="stable").astype(I32)
    assert np.array_equal(np.asarray(got[0]).reshape(-1, chunk), want_k)
    assert np.array_equal(np.asarray(got[1]).reshape(-1, chunk), want_p)


def test_kernel_2op_unstable_mode():
    """stable=False (the probe strands' mode, r5): keys must still sort
    EXACTLY; each payload must stay aligned with its key (the per-key
    payload multiset is preserved) and the whole payload column must
    remain a permutation -- only the equal-key payload ORDER may differ
    from the stable twin."""
    rng = np.random.default_rng(7)
    chunk, P = 512, 4096
    keys = rng.integers(0, 11, P).astype(U32)   # heavy ties
    pay = np.tile(np.arange(chunk, dtype=I32), P // chunk)
    got_k, got_p = (np.asarray(x) for x in _bitonic_pallas(
        (jnp.asarray(keys), jnp.asarray(pay)), chunk, True, True,
        stable=False))
    k2 = keys.reshape(-1, chunk)
    assert np.array_equal(got_k.reshape(-1, chunk), np.sort(k2, axis=1))
    for s in range(P // chunk):
        gk, gp = got_k.reshape(-1, chunk)[s], got_p.reshape(-1, chunk)[s]
        assert sorted(gp) == list(range(chunk))       # a permutation
        # payloads follow their keys: keys[gp] == gk elementwise
        assert np.array_equal(k2[s][gp], gk)

    # the hybrid (multi-pass) path too
    from hashjoin3d_tpu.ops import bitonic as B
    chunk2, P2 = 1024, 4096
    keys2 = rng.integers(0, 5, P2).astype(U32)
    pay2 = np.tile(np.arange(chunk2, dtype=I32), P2 // chunk2)
    import unittest.mock as mock
    with mock.patch.object(B, "UNROLL_MAX", 256):
        gk2, gp2 = (np.asarray(x) for x in _bitonic_pallas(
            (jnp.asarray(keys2), jnp.asarray(pay2)), chunk2, True, True,
            stable=False))
    k22 = keys2.reshape(-1, chunk2)
    assert np.array_equal(gk2.reshape(-1, chunk2), np.sort(k22, axis=1))
    for s in range(P2 // chunk2):
        gp = gp2.reshape(-1, chunk2)[s]
        assert sorted(gp) == list(range(chunk2))
        assert np.array_equal(k22[s][gp], gk2.reshape(-1, chunk2)[s])


def _check_packed(keys, chunk, key_bits, patch_unroll=None):
    """Packed sort invariants: keys sort EXACTLY per segment, srow is a
    per-segment-local permutation, and each row id carries its own key."""
    from hashjoin3d_tpu.ops import bitonic as B
    import unittest.mock as mock

    ctx = (mock.patch.object(B, "UNROLL_MAX", patch_unroll)
           if patch_unroll else mock.MagicMock())
    with ctx:
        sk, sr = B.bitonic_sort_packed_segmented(
            jnp.asarray(keys), chunk, key_bits, interpret=True)
    sk, sr = np.asarray(sk), np.asarray(sr)
    k2 = keys.reshape(-1, chunk)
    assert np.array_equal(sk.reshape(-1, chunk), np.sort(k2, axis=1))
    for s in range(keys.size // chunk):
        rows = sr.reshape(-1, chunk)[s]
        assert sorted(rows) == list(range(chunk))      # local permutation
        assert np.array_equal(k2[s][rows], sk.reshape(-1, chunk)[s])


def test_kernel_packed_pure_phase1():
    """sub == chunk: the whole sort is one 1-op packed pass."""
    rng = np.random.default_rng(21)
    chunk, P = 1024, 4096
    keys = rng.integers(0, 61, P).astype(U32)          # key_bits = 6
    _check_packed(keys, chunk, key_bits=6)


def test_kernel_packed_with_merge_levels():
    """sub < chunk: phase 2a (fused ranged levels) runs, final level
    all-ascending."""
    rng = np.random.default_rng(22)
    chunk, P = 1024, 4096
    keys = rng.integers(0, 1 << 24, P, dtype=np.int64).astype(U32)
    _check_packed(keys, chunk, key_bits=24)            # sub = 2^8


def test_kernel_packed_hybrid_with_parity_top():
    """chunk > UNROLL_MAX: phase 2a's top level rides the block parity
    and phase 2b finishes per level (the real 2^18 shape, shrunk)."""
    rng = np.random.default_rng(23)
    chunk, P = 2048, 8192
    keys = rng.integers(0, 1 << 24, P, dtype=np.int64).astype(U32)
    _check_packed(keys, chunk, key_bits=24, patch_unroll=512)


def test_kernel_packed_out_of_domain_tail():
    """Keys above the declared domain but under 2^key_bits (misses within
    the packable range) must sort to each segment's tail exactly."""
    rng = np.random.default_rng(24)
    chunk, P = 1024, 2048
    keys = rng.integers(0, 200, P).astype(U32)
    keys[rng.choice(P, 100, replace=False)] = (1 << 24) - 1  # miss marker
    _check_packed(keys, chunk, key_bits=24)


def test_kernel_sign_flip_order():
    """Keys straddling 2^31 must sort in u32 order, not i32."""
    rng = np.random.default_rng(2)
    chunk = 256
    keys = np.concatenate([
        rng.integers(0, 100, 128), rng.integers((1 << 32) - 100, 1 << 32,
                                                128)]).astype(U32)
    rng.shuffle(keys)
    pay = np.arange(chunk, dtype=I32)
    _kernel_vs_twin((keys, pay), chunk)


def test_kernel_1op_i32_with_markers():
    rng = np.random.default_rng(3)
    chunk, P = 512, 2048
    v = rng.integers(0, 64, P).astype(I32)
    v[rng.choice(P, 300, replace=False)] = -1
    got = _bitonic_pallas((jnp.asarray(v),), chunk, False, True)
    want = np.sort(v.reshape(-1, chunk), axis=1).reshape(-1)
    assert np.array_equal(np.asarray(got[0]), want)


@pytest.mark.parametrize("chunk", [512, 1024])
def test_kernel_hybrid_path(monkeypatch, chunk):
    """Segments above UNROLL_MAX run presort-alt + XLA cross stages +
    merge-finish kernels; shrink the cap to exercise all three phases on
    the interpreter (512 = one level, 1024 = two levels incl. the
    multi-j cross loop)."""
    import hashjoin3d_tpu.ops.bitonic as bi
    monkeypatch.setattr(bi, "UNROLL_MAX", 256)
    rng = np.random.default_rng(6)
    P = 4 * chunk
    keys = rng.integers(0, 1 << 32, P, dtype=np.uint64).astype(U32)
    pay = np.tile(np.arange(chunk, dtype=I32), P // chunk)
    got = bi._bitonic_pallas((jnp.asarray(keys), jnp.asarray(pay)),
                             chunk, True, True)
    want = bi._twin((jnp.asarray(keys), jnp.asarray(pay)), chunk, 2)
    for g, w in zip(got, want):
        assert np.array_equal(np.asarray(g), np.asarray(w))
    # 1-op i32 through the same phases
    v = rng.integers(-50, 50, P).astype(I32)
    (g1,) = bi._bitonic_pallas((jnp.asarray(v),), chunk, False, True)
    assert np.array_equal(np.asarray(g1),
                          np.sort(v.reshape(-1, chunk), axis=1).reshape(-1))


def test_kernel_single_segment_and_presorted_inputs():
    chunk = 256
    asc = np.arange(chunk, dtype=U32)
    desc = asc[::-1].copy()
    const = np.full(chunk, 7, U32)
    for keys in (asc, desc, const):
        _kernel_vs_twin((keys, np.arange(chunk, dtype=I32)), chunk)


# -- engine routing -----------------------------------------------------------


def test_sort_segmented_routes_bit_equal(bitonic_impl):
    """On CPU the bitonic route resolves to the lexicographic twin; its
    output must be bit-equal to the stable lax path it replaces."""
    rng = np.random.default_rng(4)
    P, chunk = 8192, 1024
    pk = rng.integers(0, 600, P, dtype=U32)
    sk_b, sr_b = sort_segmented(jnp.asarray(pk), chunk)
    set_sort_impl("lax")
    jax.clear_caches()
    sk_l, sr_l = sort_segmented(jnp.asarray(pk), chunk)
    assert np.array_equal(np.asarray(sk_b), np.asarray(sk_l))
    assert np.array_equal(np.asarray(sr_b), np.asarray(sr_l))


def test_sort_segmented_1op_routes_bit_equal(bitonic_impl):
    rng = np.random.default_rng(5)
    P, chunk = 4096, 1024
    b = rng.integers(0, 64, P).astype(I32)
    b[rng.choice(P, 500, replace=False)] = -1
    out_b = np.asarray(sort_segmented_1op(jnp.asarray(b), chunk))
    set_sort_impl("lax")
    jax.clear_caches()
    out_l = np.asarray(sort_segmented_1op(jnp.asarray(b), chunk))
    assert np.array_equal(out_b, out_l)


# -- bitonic-aware probe policy ----------------------------------------------


def test_probe_sort_chunk_bitonic_policy(bitonic_impl):
    # canonical bench shape: the VMEM cap takes over and the window
    # widens to keep the 2x margin
    assert probe_sort_chunk(1 << 24, 1 << 20) == MAX_SEGMENT_BITONIC
    assert window_for_chunk(MAX_SEGMENT_BITONIC, 1 << 20) == 8192
    # small domains: same segment as the lax policy
    assert probe_sort_chunk(1 << 20, 1 << 16) == 1 << 17
    # domains too large for the VMEM cap's window fall back to the lax cap
    # (sort_segmented then routes that chunk to lax)
    assert probe_sort_chunk(1 << 24, 1 << 22) == 1 << 20
    # the shorter cap also unlocks streams too small for the lax policy
    assert probe_sort_chunk(1 << 21, 1 << 20) == MAX_SEGMENT_BITONIC


@pytest.mark.parametrize("logp,logd", [(24, 20), (25, 21), (24, 21),
                                       (21, 20)])
def test_bitonic_segment_margin_covers_canonical_shapes(
        bitonic_impl, logp, logd):
    """Zero uncovered window chunks under the bitonic policy's shorter
    segments + wider windows (the r3 regression guard, kernel edition)."""
    P, domain = 1 << logp, 1 << logd
    chunk = probe_sort_chunk(P, domain)
    assert chunk is not None
    W = window_for_chunk(chunk, domain)
    assert W >= 2 * (1024 * domain) // chunk
    # subsample the stream: coverage statistics are per-segment
    Ps = min(P, 1 << 22)
    Ps -= Ps % chunk
    assert _simulate_uncovered_chunks(Ps, domain, chunk, W) == 0
