"""Core table semantics vs the pure-Python reference oracle.

Property tests (SURVEY.md section 4): random workloads from several key
distributions, checked for exact counter equality and result-multiset equality
against the insertion-simulating oracle in ``oracle.py``.
"""

import numpy as np
import pytest

from hashjoin3d_tpu.ops import (
    build_chaining,
    build_nested,
    materialize_chaining_join,
    probe_chaining,
    probe_nested,
    unnest,
)
from hashjoin3d_tpu.ops.hashing import murmur32, murmur32_np

from oracle import ChainingOracle, NestedOracle, murmur32_py


def workloads():
    rng = np.random.default_rng(42)
    cases = []
    # (build_keys, probe_keys, num_buckets)
    cases.append((np.array([1, 1, 1, 2, 2, 3], np.uint32),
                  np.array([1, 2, 3, 4], np.uint32), 5))
    cases.append((rng.integers(0, 50, 200, dtype=np.uint32),
                  rng.integers(0, 80, 300, dtype=np.uint32), 16))
    cases.append((rng.integers(0, 1 << 31, 500, dtype=np.uint32),
                  rng.integers(0, 1 << 31, 500, dtype=np.uint32), 128))
    # heavy skew: zipf-ish duplicates
    z = np.minimum(rng.zipf(1.3, 800), 60).astype(np.uint32)
    cases.append((z, rng.integers(0, 70, 400, dtype=np.uint32), 33))
    # all-same key, single bucket
    cases.append((np.full(64, 7, np.uint32),
                  np.array([7, 8], np.uint32), 1))
    # unique keys (permutation), like experiment 1's R.k
    perm = rng.permutation(256).astype(np.uint32)
    cases.append((perm, rng.integers(0, 300, 512, dtype=np.uint32), 64))
    return cases


def test_murmur32_matches_scalar_reference():
    xs = np.array([0, 1, 2, 12345, 0xFFFFFFFF, 0xDEADBEEF], np.uint32)
    expect = np.array([murmur32_py(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(murmur32_np(xs), expect)
    np.testing.assert_array_equal(np.asarray(murmur32(xs)), expect)


@pytest.mark.parametrize("case", range(len(workloads())))
def test_chaining_vs_oracle(case):
    bk, pk, nb = workloads()[case]
    oracle = ChainingOracle(bk, nb)
    tbl = build_chaining(bk, nb)

    # bucket occupancy
    blen = np.asarray(tbl.bucket_len)
    for b in range(nb):
        assert blen[b] == len(oracle.chain(b))

    # chain positions per row
    pos = np.asarray(tbl.pos_by_row)
    for b in range(nb):
        for want_pos, (row, _k) in enumerate(oracle.chain(b)):
            assert pos[row] == want_pos, (b, row)

    for unique in (False, True):
        opairs, omatches, ocmps = oracle.probe(pk, unique=unique)
        pr = probe_chaining(tbl, pk, unique=unique)
        assert int(pr.num_matches) == omatches
        assert int(pr.num_cmps) == ocmps
        # the merge (sort-based) lookup must agree with the binary search
        prm = probe_chaining(tbl, pk, unique=unique, method="merge")
        assert int(prm.num_matches) == omatches
        assert int(prm.num_cmps) == ocmps

        out_size = max(len(opairs) + 3, 8)
        prow, brow, valid, total = materialize_chaining_join(
            tbl, pr, out_size, unique=unique
        )
        got = sorted(
            (int(p), int(r))
            for p, r, v in zip(np.asarray(prow), np.asarray(brow), np.asarray(valid))
            if v
        )
        assert int(total) == len(opairs)
        assert got == sorted(opairs)


@pytest.mark.parametrize("case", range(len(workloads())))
def test_nested_vs_oracle(case):
    bk, pk, nb = workloads()[case]
    oracle = NestedOracle(bk, nb)
    tbl = build_nested(bk, nb)

    # main-chain lengths per bucket
    bml = np.asarray(tbl.bucket_main_len)
    for b in range(nb):
        assert bml[b] == len(oracle.buckets.get(b, []))

    # main-chain positions: distinct key -> (bucket, position)
    ukey = np.asarray(tbl.groups.ukey)
    mpos = np.asarray(tbl.main_pos_by_group)
    nkeys = int(tbl.groups.n_keys)
    got_pos = {int(ukey[g]): int(mpos[g]) for g in range(nkeys)}
    for b, mains in oracle.buckets.items():
        for want_pos, m in enumerate(mains):
            assert got_pos[m["key"]] == want_pos

    onested, omatches, ocmps = oracle.probe(pk)
    nb_batch = probe_nested(tbl, pk)
    assert int(nb_batch.num_matches) == omatches
    assert int(nb_batch.num_cmps) == ocmps
    nbm = probe_nested(tbl, pk, method="merge")
    assert int(nbm.num_matches) == omatches
    assert int(nbm.num_cmps) == ocmps

    oout = NestedOracle.unnest(onested)
    out_size = max(len(oout) + 3, 8)
    prow, brow, valid, total = unnest(tbl, nb_batch, out_size)
    assert int(total) == len(oout)
    got = sorted(
        (int(p), int(r))
        for p, r, v in zip(np.asarray(prow), np.asarray(brow), np.asarray(valid))
        if v
    )
    assert got == sorted(oout)

    # exact unnest ORDER per group: [first inserted, rest LIFO] -- compare the
    # sequence of build rows for each probe row, not just the multiset.
    got_by_probe = {}
    for p, r, v in zip(np.asarray(prow), np.asarray(brow), np.asarray(valid)):
        if v:
            got_by_probe.setdefault(int(p), []).append(int(r))
    want_by_probe = {}
    for p, r in oout:
        want_by_probe.setdefault(p, []).append(r)
    assert got_by_probe == want_by_probe


def test_probe_mask_semantics():
    bk = np.array([1, 2, 3, 3], np.uint32)
    pk = np.array([1, 3, 9, 3], np.uint32)
    mask = np.array([True, False, True, True])
    tbl = build_nested(bk, 4)
    full = probe_nested(tbl, pk)
    masked = probe_nested(tbl, pk, mask=mask)
    # row 1 (key 3, 2 dups) is masked out: one fewer match
    assert int(masked.num_matches) == int(full.num_matches) - 1
    assert not bool(np.asarray(masked.hit)[1])


def test_probe_key_equal_to_pad_sentinel():
    """A probe key of 0xFFFFFFFF must not false-hit the UKEY_PAD padding."""
    bk = np.array([1, 2, 3], np.uint32)
    pk = np.array([0xFFFFFFFF], np.uint32)
    nt = build_nested(bk, 4)
    assert int(probe_nested(nt, pk).num_matches) == 0
    ct = build_chaining(bk, 4)
    assert int(probe_chaining(ct, pk, unique=True).num_matches) == 0
    # and a real key of that value still hits
    bk2 = np.array([1, 0xFFFFFFFF, 0xFFFFFFFF], np.uint32)
    nt2 = build_nested(bk2, 4)
    res = probe_nested(nt2, pk)
    assert int(res.num_matches) == 1
    _, brow, valid, total = unnest(nt2, res, 4)
    assert int(total) == 2


def test_masked_build_equals_compacted_build():
    """Building with a validity mask == building on the compacted rows."""
    rng = np.random.default_rng(3)
    bk = rng.integers(0, 40, 120, dtype=np.uint32)
    valid = rng.random(120) < 0.7
    pk = rng.integers(0, 50, 200, dtype=np.uint32)
    compact = bk[valid]

    for build, probe in ((build_nested, probe_nested),
                         (build_chaining, probe_chaining)):
        masked_tbl = build(bk, 16, valid=np.asarray(valid))
        # note: chain/cmp counters differ (insertion order changes), but match
        # sets and group sizes must be identical
        r1 = probe(masked_tbl, pk)
        tbl2 = build(compact.copy(), 16)
        r2 = probe(tbl2, pk)
        assert int(r1.num_matches) == int(r2.num_matches)
        if hasattr(r1, "group_len"):
            np.testing.assert_array_equal(
                np.asarray(r1.group_len), np.asarray(r2.group_len))


def test_masked_build_maps_rows_correctly():
    bk = np.array([5, 9, 5, 7, 5], np.uint32)
    valid = np.array([True, False, True, True, False])
    tbl = build_nested(bk, 4, valid=valid)
    res = probe_nested(tbl, np.array([5, 9, 7], np.uint32))
    assert int(res.num_matches) == 2  # 9 is masked out
    prow, brow, v, total = unnest(tbl, res, 8)
    pairs = sorted((int(p), int(b)) for p, b, ok in
                   zip(np.asarray(prow), np.asarray(brow), np.asarray(v)) if ok)
    # key 5 -> rows 0,2 (row 4 masked); key 7 -> row 3
    assert pairs == [(0, 0), (0, 2), (2, 3)]


def test_merge_lookup_equals_binary_search():
    from hashjoin3d_tpu.ops.layout import key_group_index, lookup, merge_lookup
    rng = np.random.default_rng(9)
    for bk, pk in [
        (rng.integers(0, 60, 300, dtype=np.uint32),
         rng.integers(0, 90, 500, dtype=np.uint32)),
        (np.array([0xFFFFFFFF, 5, 5], np.uint32),
         np.array([0xFFFFFFFF, 5, 6], np.uint32)),
        (np.array([7], np.uint32), np.array([7, 8], np.uint32)),
    ]:
        groups = key_group_index(bk)
        g1, h1 = lookup(groups, pk)
        g2, h2 = merge_lookup(groups, pk)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        # where hit, group ids must agree
        hm = np.asarray(h1)
        np.testing.assert_array_equal(np.asarray(g1)[hm], np.asarray(g2)[hm])
        # with a probe mask
        mask = rng.random(len(pk)) < 0.5
        _, h3 = merge_lookup(groups, pk, mask=jnp.asarray(mask))
        np.testing.assert_array_equal(np.asarray(h3), np.asarray(h1) & mask)


import jax.numpy as jnp  # noqa: E402


def test_host_builds_equal_padded_builds():
    """Two-phase compacted host builds == pure-jit padded builds."""
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host
    from hashjoin3d_tpu.ops.stats import chaining_statistics, nested_statistics

    rng = np.random.default_rng(17)
    for bk, pk, nb in [
        (rng.integers(0, 50, 300, dtype=np.uint32),
         rng.integers(0, 80, 500, dtype=np.uint32), 16),
        (np.full(64, 9, np.uint32), np.array([9, 1], np.uint32), 4),
        (rng.permutation(128).astype(np.uint32),
         rng.integers(0, 160, 256, dtype=np.uint32), 128),
    ]:
        tp = build_nested(bk, nb)
        th = build_nested_host(bk, nb)
        rp = probe_nested(tp, pk, method="search")
        rh = probe_nested(th, pk, method="search")
        assert int(rp.num_matches) == int(rh.num_matches)
        assert int(rp.num_cmps) == int(rh.num_cmps)
        out = 4 * len(pk)
        a = unnest(tp, rp, out)
        b = unnest(th, rh, out)
        pa = sorted((int(x), int(y)) for x, y, v in zip(*map(np.asarray, a[:3])) if v)
        pb = sorted((int(x), int(y)) for x, y, v in zip(*map(np.asarray, b[:3])) if v)
        assert pa == pb and int(a[3]) == int(b[3])
        sp, sh_ = nested_statistics(tp), nested_statistics(th)
        assert sp.to_csv_fields() == sh_.to_csv_fields()

        cp = build_chaining(bk, nb)
        ch = build_chaining_host(bk, nb)
        for unique in (False, True):
            r1 = probe_chaining(cp, pk, unique=unique, method="search")
            r2 = probe_chaining(ch, pk, unique=unique, method="search")
            assert int(r1.num_matches) == int(r2.num_matches)
            assert int(r1.num_cmps) == int(r2.num_cmps), (unique, nb)
            m1 = materialize_chaining_join(cp, r1, len(pk) * 4, unique=unique)
            m2 = materialize_chaining_join(ch, r2, len(pk) * 4, unique=unique)
            q1 = sorted((int(x), int(y)) for x, y, v in zip(*map(np.asarray, m1[:3])) if v)
            q2 = sorted((int(x), int(y)) for x, y, v in zip(*map(np.asarray, m2[:3])) if v)
            assert q1 == q2
        s1, s2 = chaining_statistics(cp), chaining_statistics(ch)
        assert s1.to_csv_fields() == s2.to_csv_fields()


def test_host_build_dense_direct_matches():
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host
    rng = np.random.default_rng(23)
    perm = rng.permutation(256).astype(np.uint32)
    pk = rng.integers(0, 300, 512, dtype=np.uint32)
    t1 = build_chaining(perm, 256, dense_direct=True)
    t2 = build_chaining_host(perm, 256, dense_direct=True)
    r1 = probe_chaining(t1, pk, unique=True)
    r2 = probe_chaining(t2, pk, unique=True)
    assert int(r1.num_matches) == int(r2.num_matches)
    assert int(r1.num_cmps) == int(r2.num_cmps)
    n1 = build_nested(perm, 256, dense_direct=True)
    n2 = build_nested_host(perm, 256, dense_direct=True)
    q1 = probe_nested(n1, pk)
    q2 = probe_nested(n2, pk)
    assert int(q1.num_cmps) == int(q2.num_cmps)
    np.testing.assert_array_equal(np.asarray(n1.direct), np.asarray(n2.direct))


def test_merge_lookup_probe_zero_not_clobbered():
    """Directory entries must not scatter onto probe slot 0 (regression:
    srow=-1 was clamped to 0, silently dropping probe 0's match)."""
    from hashjoin3d_tpu.ops.layout import key_group_index, merge_lookup
    # probe 0 matches the SMALLEST key so directory writes would come later
    bk = np.array([10, 20, 30, 40, 50], np.uint32)
    pk = np.array([10, 99, 30], np.uint32)
    groups = key_group_index(bk)
    g, hit = merge_lookup(groups, pk)
    np.testing.assert_array_equal(np.asarray(hit), [True, False, True])
    assert int(np.asarray(groups.ukey)[np.asarray(g)[0]]) == 10


def test_dense_direct_nonunique_probe_matches_oracle():
    """CsrUU on a dense-direct table: full-chain-walk cmps from bucket_len,
    match rows from the one-gather direct word, materialization positional."""
    from hashjoin3d_tpu.ops.chaining import build_chaining_host

    rng = np.random.default_rng(31)
    perm = rng.permutation(128).astype(np.uint32)
    pk = rng.integers(0, 160, 256, dtype=np.uint32)  # includes misses
    nb = 32

    orc = ChainingOracle(perm, nb)
    pairs, matches, cmps = orc.probe(pk, unique=False)

    for tbl in (build_chaining(perm, nb, dense_direct=True),
                build_chaining_host(perm, nb, dense_direct=True, n_keys=128)):
        res = probe_chaining(tbl, pk, unique=False)
        assert res.from_direct
        assert int(res.num_matches) == matches
        assert int(res.num_cmps) == cmps
        prow, brow, valid, total = materialize_chaining_join(
            tbl, res, pk.size, unique=False)
        got = sorted((int(p), int(b)) for p, b, v in
                     zip(np.asarray(prow), np.asarray(brow), np.asarray(valid))
                     if v)
        assert got == sorted(pairs)
        assert int(total) == matches

    # masked probe: dead rows contribute no matches and no comparisons
    tbl = build_chaining(perm, nb, dense_direct=True)
    mask = np.arange(256) % 2 == 0
    res_m = probe_chaining(tbl, pk, unique=False, mask=jnp_array(mask))
    orc_pairs, orc_m, orc_c = orc.probe(pk[mask], unique=False)
    assert int(res_m.num_matches) == orc_m
    assert int(res_m.num_cmps) == orc_c


def jnp_array(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_host_build_n_keys_hint_equivalent():
    """Passing the exact distinct-key count must yield an identical table."""
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host

    rng = np.random.default_rng(57)
    keys = rng.integers(0, 200, 1000, dtype=np.uint32)
    nk = int(np.unique(keys).size)
    pk = rng.integers(0, 256, 300, dtype=np.uint32)

    t_sync = build_chaining_host(keys, 64)
    t_hint = build_chaining_host(keys, 64, n_keys=nk)
    for a, b in zip((t_sync.groups.ukey, t_sync.bucket_len, t_sync.pos_by_row),
                    (t_hint.groups.ukey, t_hint.bucket_len, t_hint.pos_by_row)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    n_sync = build_nested_host(keys, 64)
    n_hint = build_nested_host(keys, 64, n_keys=nk)
    r1 = probe_nested(n_sync, pk)
    r2 = probe_nested(n_hint, pk)
    assert int(r1.num_matches) == int(r2.num_matches)
    assert int(r1.num_cmps) == int(r2.num_cmps)


def test_key_direct_domain_index_matches_oracle():
    """Dense key-domain index: one-gather lookup, counters unchanged."""
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host

    rng = np.random.default_rng(91)
    bk = rng.integers(0, 300, 2000, dtype=np.uint32)   # dense domain [0, 300)
    pk = rng.integers(0, 400, 700, dtype=np.uint32)    # includes out-of-domain
    nb = 64
    nk = int(np.unique(bk).size)

    corc = ChainingOracle(bk, nb)
    cpairs, cm, cc = corc.probe(pk, unique=False)
    ct = build_chaining_host(bk, nb, n_keys=nk, key_domain=300)
    assert ct.key_direct is not None and ct.key_direct.shape == (300,)
    res = probe_chaining(ct, pk, unique=False)
    assert int(res.num_matches) == cm and int(res.num_cmps) == cc
    prow, brow, valid, total = materialize_chaining_join(ct, res, 8 * 700)
    got = sorted((int(p), int(b)) for p, b, v in
                 zip(np.asarray(prow), np.asarray(brow), np.asarray(valid)) if v)
    assert got == sorted(cpairs)

    norc = NestedOracle(bk, nb)
    nested, nm, nc = norc.probe(pk)
    nt = build_nested_host(bk, nb, n_keys=nk, key_domain=300)
    nres = probe_nested(nt, pk)
    assert int(nres.num_matches) == nm and int(nres.num_cmps) == nc
    up, ub, uv, ut = unnest(nt, nres, 8 * 700)
    want = sorted(norc.unnest(nested))
    got_n = sorted((int(p), int(b)) for p, b, v in
                   zip(np.asarray(up), np.asarray(ub), np.asarray(uv)) if v)
    assert got_n == want


def test_u64_and_composite_keys():
    """Tables are dtype-generic: u64 keys (HashMurmur<uint64_t> analogue) and
    composite (hi, lo) keys packed via pack2u32 produce oracle-exact joins."""
    import jax.numpy as jnp
    from hashjoin3d_tpu.ops.layout import pack2u32
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host

    rng = np.random.default_rng(3)
    # u64 keys with values far above 2^32 (truncation would collide them)
    base = (np.arange(40, dtype=np.uint64) << np.uint64(33)) | np.uint64(5)
    bk = np.repeat(base, 3)  # 3 duplicates each
    rng.shuffle(bk)
    pk = np.concatenate([base[:20], base[:20] ^ np.uint64(1 << 32)])
    rng.shuffle(pk)
    nb = 16

    # numpy multiset oracle (hash-independent properties)
    want = sorted(
        (int(p), int(b))
        for p, k in enumerate(pk)
        for b in np.nonzero(bk == k)[0])

    for build in (build_chaining, lambda k, n: build_chaining_host(k, n)):
        t = build(jnp.asarray(bk), nb)
        assert t.keys.dtype == jnp.uint64
        res = probe_chaining(t, jnp.asarray(pk))
        prow, brow, valid, total = materialize_chaining_join(t, res, 4 * pk.size)
        got = sorted((int(a), int(b)) for a, b, v in
                     zip(np.asarray(prow), np.asarray(brow), np.asarray(valid))
                     if v)
        assert got == want
        assert int(res.num_matches) == len(want)

    nt = build_nested_host(jnp.asarray(bk), nb)
    nres = probe_nested(nt, jnp.asarray(pk))
    assert int(nres.num_matches) == 20  # one nested tuple per hit probe
    up, ub, uv, ut = unnest(nt, nres, 4 * pk.size)
    got_n = sorted((int(a), int(b)) for a, b, v in
                   zip(np.asarray(up), np.asarray(ub), np.asarray(uv)) if v)
    assert got_n == want

    # composite (hi, lo) keys: pack -> u64 join
    hi_b = rng.integers(0, 1000, 300, dtype=np.uint32)
    lo_b = rng.integers(0, 7, 300, dtype=np.uint32)
    hi_p = rng.integers(0, 1200, 150, dtype=np.uint32)
    lo_p = rng.integers(0, 7, 150, dtype=np.uint32)
    bk2 = np.asarray(pack2u32(hi_b, lo_b))
    pk2 = np.asarray(pack2u32(hi_p, lo_p))
    want2 = sorted(
        (int(p), int(b))
        for p in range(150)
        for b in np.nonzero((hi_b == hi_p[p]) & (lo_b == lo_p[p]))[0])
    t2 = build_chaining(jnp.asarray(bk2), 64)
    r2 = probe_chaining(t2, jnp.asarray(pk2))
    p2, b2, v2, _ = materialize_chaining_join(t2, r2, 8 * 150)
    got2 = sorted((int(a), int(b)) for a, b, v in
                  zip(np.asarray(p2), np.asarray(b2), np.asarray(v2)) if v)
    assert got2 == want2


def test_memory_consumption():
    """HBM accounting: the reference's memoryConsupmtion{,Dir,Chains} split
    (ht_chaining.hh:161-177, ht_nested.hh:261-284) as actual array bytes."""
    import jax.numpy as jnp
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.nested import build_nested_host

    bk = jnp.asarray(np.arange(256, dtype=np.uint32))
    ct = build_chaining_host(bk, 64)
    mem = ct.memory_consumption()
    assert mem["total"] == mem["dir"] + mem["chains"]
    # per-bucket arrays: bucket_start + bucket_len, 4 bytes each
    assert mem["dir"] == 2 * 64 * 4
    assert mem["chains"] >= bk.nbytes  # at least the retained key column

    nt = build_nested_host(bk, 64)
    memn = nt.memory_consumption()
    assert memn["total"] == memn["dir"] + memn["main"] + memn["sub"]
    assert memn["dir"] == 64 * 4
    assert memn["sub"] >= bk.nbytes

    # slim dense-direct build: no directory arrays -> strictly smaller
    ctd = build_chaining_host(bk, 64, dense_direct=True, n_keys=256)
    assert ctd.memory_consumption()["chains"] < mem["chains"]


def test_padded_build_early_exit_flag():
    """early_exit_index=False on the padded build skips the chain-position
    index; full-chain probes are bit-equal, unique probes raise."""
    import jax
    from hashjoin3d_tpu.ops.chaining import (build_chaining,
                                             materialize_chaining_join,
                                             probe_chaining)

    rng = np.random.default_rng(9)
    bk = jnp.asarray(rng.integers(0, 50, 400, dtype=np.uint32))
    pk = jnp.asarray(rng.integers(0, 80, 300, dtype=np.uint32))

    t_full = build_chaining(bk, 16)
    t_slim = build_chaining(bk, 16, early_exit_index=False)
    assert t_slim.group_min_pos.shape[0] == 0
    assert t_slim.pos_by_row.shape[0] == 0

    r_full = probe_chaining(t_full, pk)
    r_slim = probe_chaining(t_slim, pk)
    for a, b in zip(jax.tree_util.tree_leaves(r_full),
                    jax.tree_util.tree_leaves(r_slim)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    m_full = materialize_chaining_join(t_full, r_full, 4096)
    m_slim = materialize_chaining_join(t_slim, r_slim, 4096)
    for a, b in zip(m_full, m_slim):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="early_exit_index"):
        probe_chaining(t_slim, pk, unique=True)

    # masked build variant
    valid = jnp.asarray(rng.random(400) < 0.8)
    tm = build_chaining(bk, 16, valid=valid, early_exit_index=False)
    rm = probe_chaining(tm, pk)
    rf = probe_chaining(build_chaining(bk, 16, valid=valid), pk)
    assert int(rm.num_matches) == int(rf.num_matches)
    assert int(rm.num_cmps) == int(rf.num_cmps)
