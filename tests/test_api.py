"""Top-level join() convenience API: device and host backends vs oracle."""

import numpy as np
import pytest

import hashjoin3d_tpu as hj
from oracle import ChainingOracle, NestedOracle


@pytest.mark.parametrize("backend", ["device", "host"])
def test_join_nested(backend):
    if backend == "host":
        from hashjoin3d_tpu.hostengine import native_engine
        if native_engine() is None:
            pytest.skip("no native toolchain")
    rng = np.random.default_rng(8)
    bk = rng.integers(0, 40, 300, dtype=np.uint32)
    pk = rng.integers(0, 50, 200, dtype=np.uint32)

    res = hj.join(bk, pk, backend=backend)
    orc = NestedOracle(bk, int(np.unique(bk).size))
    nested, matches, _ = orc.probe(pk)
    want = sorted(orc.unnest(nested))
    assert res.num_matches == matches
    assert sorted(res.pairs()) == want
    assert res.num_results == len(want)


@pytest.mark.parametrize("unique", [False, True])
def test_join_chaining(unique):
    rng = np.random.default_rng(9)
    bk = rng.permutation(64).astype(np.uint32)
    pk = rng.integers(0, 80, 128, dtype=np.uint32)

    res = hj.join(bk, pk, how="chaining", unique=unique)
    orc = ChainingOracle(bk, 64)
    pairs, matches, cmps = orc.probe(pk, unique=unique)
    assert res.num_matches == matches
    assert res.num_cmps == cmps
    assert sorted(res.pairs()) == sorted(pairs)


def test_join_validates_args():
    with pytest.raises(ValueError, match="how"):
        hj.join(np.zeros(1, np.uint32), np.zeros(1, np.uint32), how="x")
    with pytest.raises(ValueError, match="backend"):
        hj.join(np.zeros(1, np.uint32), np.zeros(1, np.uint32), backend="x")


def test_join_edge_cases():
    """Empty sides, u64 key width preserved on both backends."""
    e = np.zeros(0, np.uint32)
    r = hj.join(e, np.array([1, 2], np.uint32))
    assert r.num_results == 0 and r.pairs() == []
    r2 = hj.join(np.array([1], np.uint32), e, how="chaining")
    assert r2.num_results == 0

    bk64 = np.array([1, (1 << 40) | 1, 2], np.uint64)
    pk64 = np.array([1], np.uint64)
    # both backends distinguish the high bits (the host engine dispatches
    # to its u64 instantiation; it must not truncate)
    r3 = hj.join(bk64, pk64, backend="device")
    assert sorted(r3.pairs()) == [(0, 0)]
    from hashjoin3d_tpu.hostengine import native_engine
    if native_engine() is not None:
        r4 = hj.join(bk64, pk64, backend="host")
        assert sorted(r4.pairs()) == [(0, 0)]
        assert (r4.num_matches, r4.num_cmps) == (r3.num_matches,
                                                 r3.num_cmps)


def test_hash_aggregate_float_precision_and_clamp():
    import jax.numpy as jnp
    from hashjoin3d_tpu.ops.aggregate import hash_aggregate

    # float32 sums must not inherit global-prefix rounding (review repro:
    # 1M rows of 0.1 in groups of 4 gave up to 2.3% error pre-fix)
    n = 1 << 20
    keys = jnp.asarray(np.arange(n, dtype=np.uint32) // 4)
    vals = jnp.full(n, 0.1, jnp.float32)
    res = hash_aggregate(keys, {"v": vals}, n_keys=n // 4)
    s = np.asarray(res.sums["v"])[: n // 4]
    np.testing.assert_allclose(s, 0.4, rtol=1e-6)

    # undershooting n_keys clamps the REPORTED count to the arrays' prefix
    keys2 = jnp.asarray(np.arange(40, dtype=np.uint32))
    res2 = hash_aggregate(keys2, {"v": jnp.ones(40, jnp.int32)}, n_keys=8)
    assert int(res2.n_keys) == int(np.asarray(res2.keys).shape[0])

    # empty input keeps per-column dtypes and sentinels
    res3 = hash_aggregate(jnp.zeros(0, jnp.uint32),
                          {"v": jnp.zeros(0, jnp.float32)}, n_keys=4)
    assert res3.mins["v"].dtype == jnp.float32
    assert np.isinf(np.asarray(res3.mins["v"])).all()


@pytest.mark.parametrize("mode", ["left", "semi", "anti"])
def test_join_modes(mode):
    rng = np.random.default_rng(12)
    bk = rng.integers(0, 30, 100, dtype=np.uint32)
    pk = rng.integers(0, 60, 80, dtype=np.uint32)  # half the domain misses

    res = hj.join(bk, pk, mode=mode)
    hits = np.isin(pk, bk)
    if mode == "semi":
        want_rows = sorted(np.nonzero(hits)[0].tolist())
        assert sorted(res.probe_rows.tolist()) == want_rows
        assert (res.build_rows == -1).all()
    elif mode == "anti":
        want_rows = sorted(np.nonzero(~hits)[0].tolist())
        assert sorted(res.probe_rows.tolist()) == want_rows
    else:  # left
        inner = hj.join(bk, pk)
        want = sorted(inner.pairs()) + [
            (int(p), -1) for p in np.nonzero(~hits)[0]]
        assert sorted(res.pairs()) == sorted(want)
    # counters describe the underlying probe regardless of mode
    assert res.num_matches == hj.join(bk, pk).num_matches

    # empty build side: left/anti emit every probe row with -1
    e = np.zeros(0, np.uint32)
    r = hj.join(e, pk, mode=mode)
    if mode in ("left", "anti"):
        assert sorted(r.probe_rows.tolist()) == list(range(pk.size))
    else:
        assert r.num_results == 0


def test_semi_anti_skip_inner_materialization():
    """semi/anti on duplicate-heavy keys: result is per-probe-row, never the
    (potentially quadratic) inner pair set (review repro)."""
    bk = np.full(3000, 9, np.uint32)   # inner join would be 9M pairs
    pk = np.full(3000, 9, np.uint32)
    r = hj.join(bk, pk, mode="semi")
    assert r.num_results == 3000
    assert (r.build_rows == -1).all()
    assert r.num_matches == 3000  # probe hits, not expanded pairs
    assert hj.join(bk, pk, mode="anti").num_results == 0


def test_join_result_take():
    bk = np.array([1, 1, 3], np.uint32)
    bv = np.array([10, 11, 30], np.int32)
    pk = np.array([1, 2, 3], np.uint32)
    pv = np.array([100, 200, 300], np.int32)

    r = hj.join(bk, pk)
    cols = r.take(probe_cols={"pv": pv}, build_cols={"bv": bv})
    got = sorted(zip(cols["pv"].tolist(), cols["bv"].tolist()))
    assert got == [(100, 10), (100, 11), (300, 30)]

    left = hj.join(bk, pk, mode="left")
    cols = left.take(build_cols={"bv": bv})
    # matchless probe (key 2) carries the dtype zero for the build side
    by_probe = dict(zip(left.probe_rows.tolist(), cols["bv"].tolist()))
    assert by_probe[1] == 0


def test_take_empty_build_column():
    """left join against an empty build side: take() yields dtype zeros."""
    pk = np.array([1, 2], np.uint32)
    r = hj.join(np.zeros(0, np.uint32), pk, mode="left")
    cols = r.take(build_cols={"bv": np.zeros(0, np.int32)})
    np.testing.assert_array_equal(cols["bv"], np.zeros(2, np.int32))


def test_join_backend_auto_routing():
    """auto = host for small queries (when native available), any key
    width; results identical either way."""
    from hashjoin3d_tpu.hostengine import native_engine

    rng = np.random.default_rng(11)
    bk = rng.integers(0, 40, 100, dtype=np.uint32)
    pk = rng.integers(0, 50, 200, dtype=np.uint32)
    ra = hj.join(bk, pk, backend="auto")
    rd = hj.join(bk, pk, backend="device")
    assert ra.num_matches == rd.num_matches
    assert ra.num_cmps == rd.num_cmps
    assert sorted(ra.pairs()) == sorted(rd.pairs())
    if native_engine() is not None:
        rh = hj.join(bk, pk, backend="host")
        assert sorted(ra.pairs()) == sorted(rh.pairs())

    # u64 keys auto-route like u32 (small -> host when available); the
    # high bits must be distinguished on every route
    bk64 = np.array([1, (1 << 40) | 1], np.uint64)
    r64 = hj.join(bk64, np.array([(1 << 40) | 1], np.uint64), backend="auto")
    assert sorted(r64.pairs()) == [(0, 1)]


def test_join_device_windowed_paths():
    """Explicitly exercise the api's windowed physical plans (dense-direct
    chaining, keydirect nested) vs the host engine."""
    from hashjoin3d_tpu.hostengine import native_engine
    if native_engine() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(23)
    n = 512
    bk = rng.permutation(n).astype(np.uint32)        # dense-direct eligible
    pk = rng.integers(0, n + 32, 2000, dtype=np.uint32)
    for unique in (True, False):
        rd = hj.join(bk, pk, how="chaining", unique=unique,
                     backend="device", num_buckets=n)
        rh = hj.join(bk, pk, how="chaining", unique=unique,
                     backend="host", num_buckets=n)
        assert (rd.num_matches, rd.num_cmps) == (rh.num_matches, rh.num_cmps)
        assert sorted(rd.pairs()) == sorted(rh.pairs())

    bk2 = rng.integers(0, 300, 2048, dtype=np.uint32)  # keydirect eligible
    pk2 = rng.integers(0, 400, 1024, dtype=np.uint32)
    rd2 = hj.join(bk2, pk2, backend="device")
    rh2 = hj.join(bk2, pk2, backend="host")
    assert (rd2.num_matches, rd2.num_cmps) == (rh2.num_matches, rh2.num_cmps)
    assert sorted(rd2.pairs()) == sorted(rh2.pairs())

    # keydirect CHAINING: duplicate keys (not dense-direct eligible) with an
    # inferable dense domain must ride the key_direct windowed strand and
    # stay counter-equal with the host engine (review fix: the chaining
    # branch used to build key_direct and then never read it)
    for unique in (False, True):
        bk3 = (rng.permutation(300)[:256].astype(np.uint32) if unique
               else bk2)
        rd3 = hj.join(bk3, pk2, how="chaining", unique=unique,
                      backend="device")
        rh3 = hj.join(bk3, pk2, how="chaining", unique=unique,
                      backend="host")
        assert (rd3.num_matches, rd3.num_cmps) == (rh3.num_matches,
                                                   rh3.num_cmps)
        assert sorted(rd3.pairs()) == sorted(rh3.pairs())
