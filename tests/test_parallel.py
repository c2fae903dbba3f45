"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md section 4d).

The distributed joins must agree with the single-chip engine on match counts
and result-id multisets for uniform and skewed keys.
"""

import jax
import numpy as np
import pytest

from hashjoin3d_tpu.ops import build_nested, probe_nested
from hashjoin3d_tpu.parallel import (
    dist_chaining_join,
    dist_nested_join,
    make_mesh,
    shard_axis,
)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def _pairs(out):
    return sorted(
        (int(p), int(b))
        for p, b, v in zip(np.asarray(out["probe_row"]),
                           np.asarray(out["build_row"]),
                           np.asarray(out["out_valid"]))
        if v)


def _oracle_pairs(bk, pk):
    want = []
    for p, k in enumerate(pk):
        for b in np.nonzero(bk == k)[0]:
            want.append((p, int(b)))
    return sorted(want)


@pytest.mark.parametrize("skewed", [False, True])
def test_dist_nested_join_matches_oracle(mesh, skewed):
    rng = np.random.default_rng(11)
    n_b, n_p = 1024, 2048
    if skewed:
        bk = np.minimum(rng.zipf(1.2, n_b), 300).astype(np.uint32)
    else:
        bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)

    sh = shard_axis(mesh)
    bk_d = jax.device_put(bk, sh)
    pk_d = jax.device_put(pk, sh)

    cap_b = n_b  # generous: skew can put most duplicates on one shard
    cap_p = n_p
    out_cap = 8 * n_p
    step = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=cap_b, probe_capacity=cap_p,
                            out_capacity=out_cap)
    out = step(bk_d, pk_d)
    assert int(out["overflow"]) == 0

    want = _oracle_pairs(bk, pk)
    assert _pairs(out) == want

    # single-chip equivalence of the counters that are layout-independent
    tbl = build_nested(bk, 64)
    res = probe_nested(tbl, pk)
    assert int(out["num_matches"]) == int(res.num_matches)
    assert int(out["num_unnested"]) == len(want)


def test_dist_chaining_join_matches_oracle(mesh):
    rng = np.random.default_rng(5)
    bk = rng.integers(0, 100, 512, dtype=np.uint32)
    pk = rng.integers(0, 130, 1024, dtype=np.uint32)
    sh = shard_axis(mesh)
    step = dist_chaining_join(mesh, num_buckets_per_shard=32,
                              build_capacity=512, probe_capacity=1024,
                              out_capacity=8 * 1024)
    out = step(jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert int(out["overflow"]) == 0
    assert _pairs(out) == _oracle_pairs(bk, pk)


def test_dist_overflow_detected(mesh):
    """Deliberately undersized capacity must report dropped rows, not corrupt."""
    bk = np.full(256, 7, np.uint32)  # all rows route to one shard
    pk = np.array([7] * 8, np.uint32)
    step = dist_nested_join(mesh, num_buckets_per_shard=8,
                            build_capacity=16, probe_capacity=8,
                            out_capacity=4096)
    out = step(jax.device_put(bk, shard_axis(mesh)),
               jax.device_put(pk, shard_axis(mesh)))
    assert int(out["overflow"]) > 0


def test_broadcast_join_matches_oracle(mesh):
    from hashjoin3d_tpu.parallel.skew import detect_skew, dist_broadcast_join
    rng = np.random.default_rng(21)
    # heavy skew: a single hot key dominates
    bk = np.concatenate([np.full(64, 5, np.uint32),
                         rng.integers(0, 100, 192, dtype=np.uint32)]).astype(np.uint32)
    rng.shuffle(bk)
    pk = np.concatenate([np.full(512, 5, np.uint32),
                         rng.integers(0, 120, 512, dtype=np.uint32)]).astype(np.uint32)
    rng.shuffle(pk)

    rep = detect_skew(pk, 8)
    assert rep["strategy"] in ("broadcast", "hybrid")
    assert rep["top_key_fraction"] > 0.4

    from hashjoin3d_tpu.parallel import shard_axis
    sh = shard_axis(mesh)
    step = dist_broadcast_join(mesh, num_buckets=64,
                               out_capacity=16 * 1024, nested=True)
    out = step(jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert _pairs(out) == _oracle_pairs(bk, pk)


def test_suggest_capacity():
    from hashjoin3d_tpu.parallel.skew import suggest_capacity
    assert suggest_capacity(1024, 8, 1.0) >= 1024 // 8
    assert suggest_capacity(1024, 8, 4.0) > suggest_capacity(1024, 8, 1.0)


def test_dist_filter_join_aggregate(mesh):
    """Full pipeline query: filter -> 3D join -> aggregate (BASELINE config 5)."""
    from hashjoin3d_tpu.parallel.pipeline import dist_filter_join_aggregate
    from hashjoin3d_tpu.parallel import shard_axis

    rng = np.random.default_rng(33)
    n_b, n_p = 512, 1024
    bk = rng.integers(0, 120, n_b, dtype=np.uint32)
    bv = rng.integers(0, 50, n_b, dtype=np.int32)
    pk = rng.integers(0, 150, n_p, dtype=np.uint32)
    pp = rng.integers(0, 100, n_p, dtype=np.int32)  # payload for the filter

    step = dist_filter_join_aggregate(
        mesh, num_buckets_per_shard=32, build_capacity=n_b,
        probe_capacity=n_p, out_capacity=8 * n_p,
        predicate=lambda payload: payload < 60)

    sh = shard_axis(mesh)
    out = step(jax.device_put(bk, sh), jax.device_put(bv, sh),
               jax.device_put(pk, sh), jax.device_put(pp, sh))
    assert int(out["overflow"]) == 0

    # numpy oracle
    keep = pp < 60
    joined = [(int(k), int(bv[b]))
              for k, ok in zip(pk, keep) if ok
              for b in np.nonzero(bk == k)[0]]
    assert int(out["num_filtered"]) == int(keep.sum())
    assert int(out["num_joined"]) == len(joined)
    assert int(out["sum_v"]) == sum(v for _, v in joined)

    # per-key aggregates across shards == oracle group sums
    want = {}
    for k, v in joined:
        c, s = want.get(k, (0, 0))
        want[k] = (c + 1, s + v)
    gk = np.asarray(out["group_keys"])
    gc = np.asarray(out["group_count"])
    gs = np.asarray(out["group_sum"])
    got = {}
    for k, c, s in zip(gk, gc, gs):
        if c > 0:
            assert int(k) not in got, "key must live on exactly one shard"
            got[int(k)] = (int(c), int(s))
    assert got == want


@pytest.mark.parametrize("skewed", [False, True])
def test_ring_join_matches_all_to_all(mesh, skewed):
    """Ring-scheduled probe == exchange-scheduled join == oracle.

    Under skew the ring schedule must succeed with UNIFORM per-shard probe
    capacity (probes never move by key), where the exchange join would need
    a hot-shard-sized probe capacity.
    """
    from hashjoin3d_tpu.parallel import dist_ring_nested_join

    rng = np.random.default_rng(17)
    n_b, n_p = 1024, 2048
    if skewed:
        pk = np.minimum(rng.zipf(1.2, n_p), 400).astype(np.uint32)
    else:
        pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)

    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)
    out_cap = 16 * n_p

    ring = dist_ring_nested_join(mesh, num_buckets_per_shard=64,
                                 build_capacity=n_b, out_capacity=out_cap,
                                 step_out_capacity=out_cap // 2)
    out = ring(bk_d, pk_d)
    assert int(out["overflow"]) == 0

    want = _oracle_pairs(bk, pk)
    assert _pairs(out) == want
    assert int(out["num_unnested"]) == len(want)

    a2a = dist_nested_join(mesh, num_buckets_per_shard=64,
                           build_capacity=n_b, probe_capacity=4 * n_p,
                           out_capacity=out_cap)
    out2 = a2a(bk_d, pk_d)
    assert int(out["num_matches"]) == int(out2["num_matches"])
    assert _pairs(out2) == want


def test_hier_2d_join_matches_flat(mesh):
    """(host, chip) hierarchical two-hop exchange == flat 1D join == oracle."""
    from hashjoin3d_tpu.parallel import (
        dist_nested_join_2d, make_mesh_2d, shard_axis)
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh2 = make_mesh_2d(2, 4)
    rng = np.random.default_rng(29)
    n_b, n_p = 1024, 2048
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)

    sh2 = NamedSharding(mesh2, P(("host", "chip")))
    step2 = dist_nested_join_2d(mesh2, num_buckets_per_shard=64,
                                build_capacity=n_b, probe_capacity=n_p,
                                out_capacity=16 * n_p)
    out = step2(jax.device_put(bk, sh2), jax.device_put(pk, sh2))
    assert int(out["overflow"]) == 0

    want = _oracle_pairs(bk, pk)
    assert _pairs(out) == want
    assert int(out["num_unnested"]) == len(want)

    flat = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p)
    out1 = flat(jax.device_put(bk, shard_axis(mesh)),
                jax.device_put(pk, shard_axis(mesh)))
    assert int(out["num_matches"]) == int(out1["num_matches"])


def test_hybrid_join_survives_skew_that_overflows_flat(mesh):
    """Hybrid hot-key replication: correct under skew that the flat join's
    per-shard probe capacity cannot absorb."""
    from hashjoin3d_tpu.parallel import (
        detect_skew, dist_hybrid_nested_join)

    rng = np.random.default_rng(41)
    n_b, n_p = 1024, 4096
    # one key carries half of the probe volume and has 8 duplicates in build
    hot = 123
    bk = np.concatenate([np.full(8, hot, np.uint32),
                         rng.integers(0, 400, n_b - 8, dtype=np.uint32)])
    rng.shuffle(bk)
    pk = np.concatenate([np.full(n_p // 2, hot, np.uint32),
                         rng.integers(0, 500, n_p // 2, dtype=np.uint32)])
    rng.shuffle(pk)

    rep = detect_skew(pk, 8)
    assert rep["strategy"] == "hybrid"
    assert hot in rep["hot_keys"].tolist()

    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)
    tight_cap = int(n_p / 8 / 8 * 1.5)  # ~uniform per-(src,dst) + 50% slack

    flat = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=tight_cap * 8,
                            out_capacity=16 * n_p)
    # exchange capacity is per (src, dst) pair: the hot key's owner shard
    # receives ~n_p/16 rows from each source, far above tight_cap
    flat_tight = dist_nested_join(mesh, num_buckets_per_shard=64,
                                  build_capacity=n_b,
                                  probe_capacity=tight_cap,
                                  out_capacity=16 * n_p)
    out_flat = flat_tight(bk_d, pk_d)
    assert int(out_flat["overflow"]) > 0  # skew breaks the flat exchange

    hyb = dist_hybrid_nested_join(
        mesh, rep["hot_keys"], num_buckets_per_shard=64,
        build_capacity=n_b, probe_capacity=tight_cap,
        hot_build_capacity=64, out_capacity=16 * n_p)
    out = hyb(bk_d, pk_d)
    assert int(out["overflow"]) == 0  # same tight capacity survives

    want = _oracle_pairs(bk, pk)
    assert _pairs(out) == want
    assert int(out["num_unnested"]) == len(want)

    # sanity vs a roomy flat join
    out_ok = flat(bk_d, pk_d)
    assert int(out_ok["num_matches"]) == int(out["num_matches"])


def test_hybrid_survives_exp1_zipf_where_flat_overflows(mesh):
    """VERDICT r4 item 8: the REAL exp-1 zipf(1.0) key distribution (not a
    synthetic half-volume key) must overflow a uniformly-capacity-sized
    flat partition exchange, and the hybrid join replicating detect_skew's
    ``top_keys`` must survive with the SAME cold capacity -- counters and
    pairs exact.  Per-shard receive volumes are measured host-side (the
    exact shard_of_key mirror) so the capacity claims aren't circular.
    (Full 2^24-scale receive-volume evidence: tools/zipf_capacity.py,
    PERF.md "Zipf capacity".)"""
    from hashjoin3d_tpu.ops.hashing import hash_key_np
    from hashjoin3d_tpu.parallel import detect_skew, dist_hybrid_nested_join
    from hashjoin3d_tpu.utils import exp1_data

    ns = 8
    rk, sa, _ = exp1_data(14, 18, True, 0)    # zipf(1.0) S.a over 2^14 keys
    n_p, n_b = sa.size, rk.size

    rep = detect_skew(sa, ns)
    top = rep["top_keys"]
    assert len(top) == 16

    # host mirror of the exchange routing: per-(src, dst) receive counts
    def max_src_dst(keys, mask=None):
        d = (hash_key_np(hash_key_np(keys)) % np.uint32(ns)).astype(np.int64)
        src = np.arange(keys.size) // (keys.size // ns)
        w = None if mask is None else mask.astype(np.int64)
        return int(np.bincount(src * ns + d, weights=w,
                               minlength=ns * ns).max())

    uniform_cap = int(n_p / ns / ns * 1.25)   # mean per (src,dst) + 25%
    assert max_src_dst(sa) > uniform_cap      # zipf head breaks uniform
    cold = ~np.isin(sa, top)
    assert max_src_dst(sa, cold) <= uniform_cap  # replication restores it

    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(rk, sh), jax.device_put(sa, sh)
    flat = dist_nested_join(mesh, num_buckets_per_shard=1 << 11,
                            build_capacity=n_b, probe_capacity=uniform_cap,
                            out_capacity=2 * (n_p // ns))
    out_flat = flat(bk_d, pk_d)
    assert int(out_flat["overflow"]) > 0      # the device agrees

    hyb = dist_hybrid_nested_join(
        mesh, top, num_buckets_per_shard=1 << 11,
        build_capacity=n_b, probe_capacity=uniform_cap,
        hot_build_capacity=32, out_capacity=2 * (n_p // ns))
    out = hyb(bk_d, pk_d)
    assert int(out["overflow"]) == 0
    # R.k is a permutation of the zipf domain: every probe matches exactly 1
    assert int(out["num_matches"]) == n_p
    assert int(out["num_unnested"]) == n_p
    inv = np.empty(n_b, np.int64)             # key -> build row (permutation)
    inv[rk] = np.arange(n_b)
    want = sorted((p, int(inv[k])) for p, k in enumerate(sa))
    assert _pairs(out) == want


def test_ring_join_step_truncation_reported(mesh):
    """A ring step whose unnest exceeds step_out_capacity must report
    overflow, never emit phantom valid (-1,-1) rows (code-review repro)."""
    from hashjoin3d_tpu.parallel import dist_ring_nested_join

    bk = np.full(16, 5, np.uint32)   # 16 duplicates of one key
    pk = np.full(16, 5, np.uint32)   # every probe expands to 16 rows
    sh = shard_axis(mesh)
    ring = dist_ring_nested_join(mesh, num_buckets_per_shard=8,
                                 build_capacity=16, out_capacity=256,
                                 step_out_capacity=8)  # deliberately tiny
    out = ring(jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert int(out["overflow"]) > 0
    pr = np.asarray(out["probe_row"])[np.asarray(out["out_valid"])]
    br = np.asarray(out["build_row"])[np.asarray(out["out_valid"])]
    assert (pr >= 0).all() and (br >= 0).all()  # no phantom rows
    # true c_unnest is still reported
    assert int(out["num_unnested"]) == 16 * 16


def test_detect_skew_hybrid_requires_full_hot_coverage():
    """hybrid must not be recommended when hot keys exceed max_hot
    (the returned set would be incomplete; code-review repro)."""
    from hashjoin3d_tpu.parallel import detect_skew

    # 40 keys, each ~1/40 of the volume; with 64 shards all are "hot"
    pk = np.repeat(np.arange(40, dtype=np.uint32), 100)
    rep = detect_skew(pk, 64, max_hot=16)
    assert rep["strategy"] != "hybrid"
    rep2 = detect_skew(pk, 64, max_hot=40)
    assert rep2["strategy"] == "hybrid"
    assert len(rep2["hot_keys"]) == 40


def test_dist_deferred_two_join_matches_exp4_oracle(mesh):
    """Distributed Ndu (R >< S >< T, deferred unnest) == exp-4 numpy oracle.

    S/T co-partitioned on the shared key: nested tuples never cross the
    wire, and the counters match the single-chip exp-4 semantics."""
    from hashjoin3d_tpu.models.exp4 import Experiment4
    from hashjoin3d_tpu.parallel import dist_deferred_two_join
    from hashjoin3d_tpu.utils import exp4_data

    exp = Experiment4(8, 2, 2, 3, 2, plans=("none",))
    sa, ta = exp4_data(8, 2, 2, 3, 2)
    rk = np.arange(exp.card_r, dtype=np.uint32)

    want = sorted(
        (int(k), int(si), int(ti))
        for k in rk
        for si in np.nonzero(sa == k)[0]
        for ti in np.nonzero(ta == k)[0])
    assert len(want) == exp.calc_join_card2()

    sh = shard_axis(mesh)
    step = dist_deferred_two_join(
        mesh, num_buckets_per_shard=64,
        fk_capacity=sa.size, r_capacity=rk.size,
        out1_capacity=4 * exp.calc_join_card2(),
        out2_capacity=4 * exp.calc_join_card2())
    out = step(jax.device_put(rk, sh), jax.device_put(sa, sh),
               jax.device_put(ta, sh))
    assert int(out["overflow"]) == 0
    assert int(out["c_top"]) == exp.calc_join_card2()
    # matches equal the single-chip plan's layout-independent counters:
    # one nested tuple per R row whose key exists in the FK relation
    assert int(out["c_probe_RS"]) == exp.num_fk_common + exp.num_fk_exclusive
    assert int(out["c_probe_RT"]) == exp.num_fk_common

    got = sorted(
        (int(r), int(s), int(t))
        for r, s, t, v in zip(np.asarray(out["r_row"]),
                              np.asarray(out["s_row"]),
                              np.asarray(out["t_row"]),
                              np.asarray(out["out_valid"]))
        if v)
    assert got == want


def test_dist_join_u64_merged_strand(mesh):
    """u64 shard-local probes auto-route to the merged windowed strand
    (dist_join.py `merged`): pairs equal the oracle and every counter
    equals the default gather path on the same exchange."""
    from hashjoin3d_tpu.parallel import dist_chaining_join, dist_nested_join

    rng = np.random.default_rng(67)
    base = (rng.choice(1 << 20, 96, replace=False).astype(np.uint64)
            << np.uint64(40)) | np.uint64(0xABCDEF)
    bk = np.repeat(base[:64], rng.integers(1, 6, 64)).astype(np.uint64)
    rng.shuffle(bk)
    pk = rng.choice(base, 256).astype(np.uint64)

    sh = shard_axis(mesh)
    bk = bk[: bk.size - bk.size % 8]
    args = dict(num_buckets_per_shard=16, build_capacity=bk.size,
                probe_capacity=256, out_capacity=4096)
    out_m = dist_nested_join(mesh, **args)(jax.device_put(bk, sh),
                                           jax.device_put(pk, sh))
    out_g = dist_nested_join(mesh, **args, merged=False)(
        jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert int(out_m["overflow"]) == 0
    assert _pairs(out_m) == _oracle_pairs(bk, pk)
    for c in ("num_matches", "num_cmps", "num_unnested"):
        assert int(out_m[c]) == int(out_g[c]), c

    outc_m = dist_chaining_join(mesh, **args)(jax.device_put(bk, sh),
                                              jax.device_put(pk, sh))
    outc_g = dist_chaining_join(mesh, **args, merged=False)(
        jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert _pairs(outc_m) == _pairs(outc_g) == _oracle_pairs(bk, pk)
    for c in ("num_matches", "num_cmps", "num_results"):
        assert int(outc_m[c]) == int(outc_g[c]), c


def test_dist_join_u64_keys(mesh):
    """Distributed joins route and ship 64-bit keys without truncation."""
    from hashjoin3d_tpu.parallel import dist_nested_join

    rng = np.random.default_rng(61)
    base = (np.arange(256, dtype=np.uint64) << np.uint64(33)) | np.uint64(7)
    bk = np.repeat(base[:128], 4).astype(np.uint64)   # 512 rows, 4 dups each
    rng.shuffle(bk)
    # collide-if-truncated probes: same low 32 bits, different high bits
    pk = np.concatenate([base[:200], base[:56] ^ np.uint64(1 << 37)])
    rng.shuffle(pk)

    step = dist_nested_join(mesh, num_buckets_per_shard=32,
                            build_capacity=512, probe_capacity=256,
                            out_capacity=8192)
    sh = shard_axis(mesh)
    out = step(jax.device_put(bk, sh), jax.device_put(pk, sh))
    assert int(out["overflow"]) == 0

    want = []
    for p, k in enumerate(pk):
        for b in np.nonzero(bk == k)[0]:
            want.append((p, int(b)))
    assert _pairs(out) == sorted(want)


def test_pipeline_u64_keys_not_merged(mesh):
    """Filter->join->aggregate keeps u64 group keys distinct (review repro:
    the aggregate stage used to truncate keys to u32, merging groups)."""
    from hashjoin3d_tpu.parallel.pipeline import dist_filter_join_aggregate

    # two keys sharing low 32 bits
    k1, k2 = np.uint64(7), np.uint64((1 << 33) | 7)
    bk = np.array([k1, k2] * 128, np.uint64)
    bv = np.arange(256, dtype=np.int32) % 10
    pk = np.array([k1, k2] * 64, np.uint64)
    pp = np.zeros(128, np.int32)

    step = dist_filter_join_aggregate(
        mesh, num_buckets_per_shard=16, build_capacity=256,
        probe_capacity=128, out_capacity=65536,
        predicate=lambda payload: payload < 1)
    sh = shard_axis(mesh)
    out = step(jax.device_put(bk, sh), jax.device_put(bv, sh),
               jax.device_put(pk, sh), jax.device_put(pp, sh))
    assert int(out["overflow"]) == 0
    gk = np.asarray(out["group_keys"])
    gc = np.asarray(out["group_count"])
    live = {int(k) for k, c in zip(gk, gc) if c > 0}
    assert live == {int(k1), int(k2)}  # distinct groups survive


def test_hier_2d_join_u64_keys(mesh):
    """u64 keys through the two-hop hierarchical exchange: shipped as
    (hi, lo) u32 halves, no truncation (mirrors test_dist_join_u64_keys)."""
    from hashjoin3d_tpu.parallel import dist_nested_join_2d, make_mesh_2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(67)
    base = (np.arange(256, dtype=np.uint64) << np.uint64(33)) | np.uint64(7)
    bk = np.repeat(base[:128], 4).astype(np.uint64)   # 512 rows, 4 dups each
    rng.shuffle(bk)
    # collide-if-truncated probes: same low 32 bits, different high bits
    pk = np.concatenate([base[:200], base[:56] ^ np.uint64(1 << 37)])
    rng.shuffle(pk)

    mesh2 = make_mesh_2d(2, 4)
    sh2 = NamedSharding(mesh2, P(("host", "chip")))
    step = dist_nested_join_2d(mesh2, num_buckets_per_shard=32,
                               build_capacity=512, probe_capacity=256,
                               out_capacity=8192)
    out = step(jax.device_put(bk, sh2), jax.device_put(pk, sh2))
    assert int(out["overflow"]) == 0

    want = []
    for p, k in enumerate(pk):
        for b in np.nonzero(bk == k)[0]:
            want.append((p, int(b)))
    assert _pairs(out) == sorted(want)


@pytest.mark.parametrize("prefetch", [True, False])
def test_chunked_flat_join_matches_one_shot(mesh, prefetch):
    """Chunked (pipelined) flat join == one-shot flat join == oracle, with
    and without exchange prefetch."""
    from hashjoin3d_tpu.parallel import (
        dist_nested_join, dist_nested_join_chunked)

    rng = np.random.default_rng(73)
    n_b, n_p = 1024, 4096
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)

    chunked = dist_nested_join_chunked(
        mesh, num_buckets_per_shard=64, build_capacity=n_b,
        probe_capacity=n_p, out_capacity=16 * n_p, n_chunks=4,
        prefetch=prefetch)
    out = chunked(bk_d, pk_d)
    assert int(out["overflow"]) == 0

    want = _oracle_pairs(bk, pk)
    assert _pairs(out) == want

    flat = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p)
    ref = flat(bk_d, pk_d)
    assert int(out["num_matches"]) == int(ref["num_matches"])
    assert int(out["num_unnested"]) == int(ref["num_unnested"])


def test_ring_join_prefetch_matches_sequential(mesh):
    """Ring join with pipelined hops == strictly sequential hops."""
    from hashjoin3d_tpu.parallel import dist_ring_nested_join

    rng = np.random.default_rng(74)
    n_b, n_p = 512, 1024
    bk = rng.integers(0, 300, n_b, dtype=np.uint32)
    pk = rng.integers(0, 400, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)

    outs = []
    for prefetch in (True, False):
        ring = dist_ring_nested_join(
            mesh, num_buckets_per_shard=32, build_capacity=n_b,
            out_capacity=8 * n_p, step_out_capacity=4 * n_p,
            prefetch=prefetch)
        out = ring(bk_d, pk_d)
        assert int(out["overflow"]) == 0
        outs.append(out)
    assert _pairs(outs[0]) == _pairs(outs[1]) == _oracle_pairs(bk, pk)


def test_dist_join_windowed_probe_matches_default(mesh):
    """key_domain (windowed shard-local probe) == default path == oracle,
    counters included."""
    from hashjoin3d_tpu.parallel import dist_nested_join

    rng = np.random.default_rng(77)
    n_b, n_p = 1024, 4096
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)

    base = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p)(bk_d, pk_d)
    win = dist_nested_join(mesh, num_buckets_per_shard=64,
                           build_capacity=n_b, probe_capacity=n_p,
                           out_capacity=16 * n_p, key_domain=600)(bk_d, pk_d)
    assert int(win["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(win[k]) == int(base[k]), k
    assert _pairs(win) == _pairs(base) == _oracle_pairs(bk, pk)


def test_ring_join_windowed_probe_matches_default(mesh):
    """Ring join with the windowed local probe (key_domain) == default."""
    from hashjoin3d_tpu.parallel import dist_ring_nested_join

    rng = np.random.default_rng(79)
    n_b, n_p = 1024, 2048
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(bk, sh), jax.device_put(pk, sh)

    base = dist_ring_nested_join(
        mesh, num_buckets_per_shard=64, build_capacity=n_b,
        out_capacity=16 * n_p, step_out_capacity=8 * n_p)(bk_d, pk_d)
    win = dist_ring_nested_join(
        mesh, num_buckets_per_shard=64, build_capacity=n_b,
        out_capacity=16 * n_p, step_out_capacity=8 * n_p,
        key_domain=600)(bk_d, pk_d)
    assert int(win["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(win[k]) == int(base[k]), k
    assert _pairs(win) == _pairs(base) == _oracle_pairs(bk, pk)


def test_hier_2d_join_windowed_probe_matches_default(mesh):
    """2D hierarchical join with the windowed local probe == default."""
    from hashjoin3d_tpu.parallel import dist_nested_join_2d, make_mesh_2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(83)
    n_b, n_p = 1024, 2048
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    mesh2 = make_mesh_2d(2, 4)
    sh2 = NamedSharding(mesh2, P(("host", "chip")))
    args = (jax.device_put(bk, sh2), jax.device_put(pk, sh2))

    base = dist_nested_join_2d(mesh2, num_buckets_per_shard=64,
                               build_capacity=n_b, probe_capacity=n_p,
                               out_capacity=16 * n_p)(*args)
    win = dist_nested_join_2d(mesh2, num_buckets_per_shard=64,
                              build_capacity=n_b, probe_capacity=n_p,
                              out_capacity=16 * n_p, key_domain=600)(*args)
    assert int(win["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(win[k]) == int(base[k]), k
    assert _pairs(win) == _pairs(base) == _oracle_pairs(bk, pk)


@pytest.mark.parametrize("unique", [False, True])
def test_dist_chaining_windowed_probe_matches_default(mesh, unique):
    """Chaining dist join with the windowed local probe == default path,
    both unique (early-exit) and full-chain modes."""
    from hashjoin3d_tpu.parallel import dist_chaining_join

    rng = np.random.default_rng(91)
    n_b, n_p = 1024, 2048
    if unique:
        bk = rng.permutation(2048)[:n_b].astype(np.uint32)
    else:
        bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600 if not unique else 2048, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    args = (jax.device_put(bk, sh), jax.device_put(pk, sh))

    base = dist_chaining_join(mesh, num_buckets_per_shard=64,
                              build_capacity=n_b, probe_capacity=n_p,
                              out_capacity=16 * n_p, unique=unique)(*args)
    win = dist_chaining_join(mesh, num_buckets_per_shard=64,
                             build_capacity=n_b, probe_capacity=n_p,
                             out_capacity=16 * n_p, unique=unique,
                             key_domain=2048)(*args)
    assert int(win["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_results"):
        assert int(win[k]) == int(base[k]), k
    assert _pairs(win) == _pairs(base)


@pytest.mark.parametrize("skewed", [False, True])
def test_dist_nested_join_fast_path_matches_default(mesh, skewed):
    """n_keys + key_domain: fused compacted shard builds (sentinel pad
    groups dropped, global build ids riding the build sort) + presorted
    windowed probe over the key-sorted exchange == default path == oracle,
    counters included."""
    from hashjoin3d_tpu.parallel import dist_nested_join

    rng = np.random.default_rng(97)
    n_b, n_p = 1024, 2048
    if skewed:
        bk = np.minimum(rng.zipf(1.2, n_b), 300).astype(np.uint32)
    else:
        bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    args = (jax.device_put(bk, sh), jax.device_put(pk, sh))

    base = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p)(*args)
    fast = dist_nested_join(mesh, num_buckets_per_shard=64,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p, key_domain=600,
                            n_keys=600)(*args)
    assert int(fast["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(fast[k]) == int(base[k]), k
    assert _pairs(fast) == _pairs(base) == _oracle_pairs(bk, pk)


def test_dist_nested_join_n_keys_without_key_domain(mesh):
    """n_keys alone: fused compacted build + default (gather) probe."""
    from hashjoin3d_tpu.parallel import dist_nested_join

    rng = np.random.default_rng(101)
    n_b, n_p = 512, 1024
    bk = rng.integers(0, 300, n_b, dtype=np.uint32)
    pk = rng.integers(0, 400, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    args = (jax.device_put(bk, sh), jax.device_put(pk, sh))

    base = dist_nested_join(mesh, num_buckets_per_shard=32,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p)(*args)
    fast = dist_nested_join(mesh, num_buckets_per_shard=32,
                            build_capacity=n_b, probe_capacity=n_p,
                            out_capacity=16 * n_p, n_keys=300)(*args)
    assert int(fast["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(fast[k]) == int(base[k]), k
    assert _pairs(fast) == _pairs(base) == _oracle_pairs(bk, pk)


@pytest.mark.parametrize("unique", [False, True])
def test_dist_chaining_join_fast_path_matches_default(mesh, unique):
    """Chaining fast path (fused compacted build incl. the early-exit
    index with global-id chain heads) == default, both probe modes."""
    from hashjoin3d_tpu.parallel import dist_chaining_join

    rng = np.random.default_rng(103)
    n_b, n_p = 1024, 2048
    if unique:
        bk = rng.permutation(2048)[:n_b].astype(np.uint32)
        dom, nk = 2048, 2048
    else:
        bk = rng.integers(0, 500, n_b, dtype=np.uint32)
        dom, nk = 600, 500
    pk = rng.integers(0, dom, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    args = (jax.device_put(bk, sh), jax.device_put(pk, sh))

    base = dist_chaining_join(mesh, num_buckets_per_shard=64,
                              build_capacity=n_b, probe_capacity=n_p,
                              out_capacity=16 * n_p, unique=unique)(*args)
    fast = dist_chaining_join(mesh, num_buckets_per_shard=64,
                              build_capacity=n_b, probe_capacity=n_p,
                              out_capacity=16 * n_p, unique=unique,
                              key_domain=dom, n_keys=nk)(*args)
    assert int(fast["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_results"):
        assert int(fast[k]) == int(base[k]), k
    assert _pairs(fast) == _pairs(base)


@pytest.mark.parametrize("skewed", [False, True])
def test_ring_join_fast_path_matches_default(mesh, skewed):
    """Ring fast path: chunk sorted once at home (global ids circulate
    with it), fused resident builds == default ring == oracle."""
    from hashjoin3d_tpu.parallel import dist_ring_nested_join

    rng = np.random.default_rng(107)
    n_b, n_p = 1024, 2048
    if skewed:
        bk = np.minimum(rng.zipf(1.2, n_b), 300).astype(np.uint32)
    else:
        bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    sh = shard_axis(mesh)
    args = (jax.device_put(bk, sh), jax.device_put(pk, sh))

    base = dist_ring_nested_join(
        mesh, num_buckets_per_shard=64, build_capacity=n_b,
        out_capacity=16 * n_p, step_out_capacity=8 * n_p)(*args)
    fast = dist_ring_nested_join(
        mesh, num_buckets_per_shard=64, build_capacity=n_b,
        out_capacity=16 * n_p, step_out_capacity=8 * n_p,
        key_domain=600, n_keys=600)(*args)
    assert int(fast["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(fast[k]) == int(base[k]), k
    assert _pairs(fast) == _pairs(base) == _oracle_pairs(bk, pk)


def test_hier_2d_join_fast_path_matches_default(mesh):
    """2D hierarchical fast path: key-ordered DCN receive blocks consumed
    presorted + fused compacted shard builds == default 2D == oracle."""
    from hashjoin3d_tpu.parallel import dist_nested_join_2d, make_mesh_2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(109)
    n_b, n_p = 1024, 2048
    bk = rng.integers(0, 500, n_b, dtype=np.uint32)
    pk = rng.integers(0, 600, n_p, dtype=np.uint32)
    mesh2 = make_mesh_2d(2, 4)
    sh2 = NamedSharding(mesh2, P(("host", "chip")))
    args = (jax.device_put(bk, sh2), jax.device_put(pk, sh2))

    base = dist_nested_join_2d(mesh2, num_buckets_per_shard=64,
                               build_capacity=n_b, probe_capacity=n_p,
                               out_capacity=16 * n_p)(*args)
    fast = dist_nested_join_2d(mesh2, num_buckets_per_shard=64,
                               build_capacity=n_b, probe_capacity=n_p,
                               out_capacity=16 * n_p, key_domain=600,
                               n_keys=600)(*args)
    assert int(fast["overflow"]) == 0
    for k in ("num_matches", "num_cmps", "num_unnested"):
        assert int(fast[k]) == int(base[k]), k
    assert _pairs(fast) == _pairs(base) == _oracle_pairs(bk, pk)
