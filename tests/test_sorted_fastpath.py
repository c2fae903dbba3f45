"""Runtime sortedness detection: presorted streams skip the phase-1 sort.

`layout.sort_rows_maybe_skip` / `strands_windowed._sort_probes` wrap the
build/probe sorts in a ``lax.cond`` on `layout.is_sorted_ascending`; an
already-ascending key column (clustered primary keys, the output of a sorted
operator) skips the engine's dominant cost at runtime with bit-identical
semantics (a STABLE sort of an ascending stream is the identity with
``srow == arange``).  The reference's per-tuple inserts have no such path
(``ht_chaining.hh::insert`` costs the same either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from hashjoin3d_tpu.ops.layout import (I32, is_sorted_ascending,
                                       sort_rows_maybe_skip)


@pytest.mark.parametrize("arr,want", [
    ([1, 2, 2, 5], True),
    ([5, 2], False),
    ([3], True),
    ([], True),
    ([9] * 7, True),
    ([0, 1, 0], False),
])
def test_is_sorted_ascending(arr, want):
    got = bool(is_sorted_ascending(jnp.asarray(np.asarray(arr, np.uint32))))
    assert got == want


def test_is_sorted_ascending_u64():
    hi = np.array([1 << 40, 1 << 41], np.uint64)
    assert bool(is_sorted_ascending(jnp.asarray(hi)))
    assert not bool(is_sorted_ascending(jnp.asarray(hi[::-1].copy())))


@pytest.mark.parametrize("case", ["random", "sorted", "descending", "equal"])
def test_sort_rows_maybe_skip_matches_stable_sort(case):
    rng = np.random.default_rng(11)
    n = 1000
    keys = rng.integers(0, 100, n).astype(np.uint32)
    if case == "sorted":
        keys = np.sort(keys)
    elif case == "descending":
        keys = np.sort(keys)[::-1].copy()
    elif case == "equal":
        keys = np.full(n, 3, np.uint32)
    pay = rng.integers(0, 1 << 30, n).astype(np.int32)

    got = sort_rows_maybe_skip(jnp.asarray(keys), jnp.asarray(pay))
    want = lax.sort((jnp.asarray(keys), jnp.arange(n, dtype=I32),
                     jnp.asarray(pay)), num_keys=1, is_stable=True)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    if case in ("sorted", "equal"):
        # the skip branch: identity permutation
        np.testing.assert_array_equal(np.asarray(got[1]), np.arange(n))


@pytest.mark.parametrize("how", ["nested", "chaining"])
def test_join_presorted_inputs(how):
    """End-to-end: presorted build AND probe columns, vs the np oracle."""
    import collections

    import hashjoin3d_tpu as hj

    rng = np.random.default_rng(23)
    bk = np.sort(rng.integers(0, 5000, 20000)).astype(np.uint32)
    pk = np.sort(rng.integers(0, 6000, 30000)).astype(np.uint32)
    r = hj.join(bk, pk, how=how, backend="device")

    cnt = collections.Counter(bk.tolist())
    want_total = sum(cnt[k] for k in pk.tolist())
    assert r.num_results == want_total
    assert r.probe_rows.size == want_total
    assert (pk[r.probe_rows] == bk[r.build_rows]).all()
    # multiset of pairs is exactly the cross product per key
    got = collections.Counter(zip(r.probe_rows.tolist(),
                                  r.build_rows.tolist()))
    assert all(v == 1 for v in got.values())


def test_sort_probes_skip_inside_shard_map():
    """The detection cond compiles and takes the skip branch per shard."""
    from jax.sharding import Mesh, PartitionSpec as P

    from hashjoin3d_tpu.ops.strands_windowed import _sort_probes

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("x",))
    n_local = 256
    # each shard's local slice ascending (the global array is NOT sorted)
    base = np.tile(np.sort(np.random.default_rng(5).integers(
        0, 1000, n_local)).astype(np.uint32), 8)

    @jax.jit
    def step(pk):
        return jax.shard_map(
            lambda x: _sort_probes(x, domain=1024)[:2],
            mesh=mesh, in_specs=P("x"), out_specs=P("x"))(pk)

    sk, sr = step(jnp.asarray(base))
    sk, sr = np.asarray(sk), np.asarray(sr)
    for s in range(8):
        sl = slice(s * n_local, (s + 1) * n_local)
        np.testing.assert_array_equal(sk[sl], base[sl])
        np.testing.assert_array_equal(sr[sl], np.arange(n_local))


def test_sort_probes_sort_inside_shard_map():
    """Unsorted shards still sort correctly through the cond."""
    from jax.sharding import Mesh, PartitionSpec as P

    from hashjoin3d_tpu.ops.strands_windowed import _sort_probes

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("x",))
    n_local = 256
    rng = np.random.default_rng(7)
    base = rng.integers(0, 1000, 8 * n_local).astype(np.uint32)

    @jax.jit
    def step(pk):
        return jax.shard_map(
            lambda x: _sort_probes(x, domain=1024)[:2],
            mesh=mesh, in_specs=P("x"), out_specs=P("x"))(pk)

    sk, sr = step(jnp.asarray(base))
    sk, sr = np.asarray(sk), np.asarray(sr)
    for s in range(8):
        sl = slice(s * n_local, (s + 1) * n_local)
        np.testing.assert_array_equal(sk[sl], np.sort(base[sl]))
        np.testing.assert_array_equal(base[sl][sr[sl]], sk[sl])


@pytest.mark.parametrize("how", ["nested", "chaining"])
def test_fused_build_sorted_keys_equals_unsorted_table_semantics(how):
    """A build over ascending keys probes identically to the same multiset
    of keys in scrambled order (row ids mapped through the permutation)."""
    import hashjoin3d_tpu as hj

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 300, 2000).astype(np.uint32)
    perm = rng.permutation(2000)
    bk_sorted = np.sort(vals)
    bk_scram = bk_sorted[perm]
    pk = rng.integers(0, 350, 3000).astype(np.uint32)

    a = hj.join(bk_sorted, pk, how=how, backend="device", n_keys=None)
    b = hj.join(bk_scram, pk, how=how, backend="device", n_keys=None)
    assert a.num_results == b.num_results
    assert a.num_matches == b.num_matches
    # pair multisets agree after mapping scrambled build rows back:
    # bk_scram[i] == bk_sorted[perm[i]], so scrambled row i <-> sorted row
    # perm[i]
    pa = sorted(zip(a.probe_rows.tolist(), a.build_rows.tolist()))
    pb = sorted(zip(b.probe_rows.tolist(),
                    perm[b.build_rows].tolist()))
    assert pa == pb
