"""Native host engine: differential tests vs the python oracle and TPU engine.

The C++ engine (``native/hj3engine.cpp``) must reproduce the reference's
chain orders and counters exactly; the JAX engine already does (pinned by
the reference-CSV tests), so all three must agree pairwise.
"""

import numpy as np
import pytest

from hashjoin3d_tpu.hostengine import (
    host_chaining_join, host_nested_join, native_engine)
from oracle import ChainingOracle, NestedOracle

pytestmark = pytest.mark.skipif(native_engine() is None,
                                reason="no native toolchain")


def _workloads():
    rng = np.random.default_rng(42)
    yield (rng.integers(0, 50, 200, dtype=np.uint32),
           rng.integers(0, 64, 300, dtype=np.uint32), 16)
    yield (np.full(64, 7, np.uint32),  # one hot key
           np.array([7, 7, 9], np.uint32), 4)
    yield (rng.permutation(256).astype(np.uint32),  # unique keys
           rng.integers(0, 300, 512, dtype=np.uint32), 256)
    yield (np.array([], np.uint32), np.array([3], np.uint32), 8)


@pytest.mark.parametrize("unique", [False, True])
def test_chaining_matches_python_oracle(unique):
    for bk, pk, nb in _workloads():
        orc = ChainingOracle(bk, nb)
        pairs, matches, cmps = orc.probe(pk, unique=unique)
        op, ob, m, c = host_chaining_join(bk, pk, nb, unique=unique)
        assert (m, c) == (matches, cmps)
        # exact emission order, not just multiset: chain order must match
        assert list(zip(op.tolist(), ob.tolist())) == pairs


def test_nested_matches_python_oracle():
    for bk, pk, nb in _workloads():
        orc = NestedOracle(bk, nb)
        nested, matches, cmps = orc.probe(pk)
        expanded = orc.unnest(nested)
        op, ob, m, c, u = host_nested_join(bk, pk, nb)
        assert (m, c, u) == (matches, cmps, len(expanded))
        assert list(zip(op.tolist(), ob.tolist())) == expanded
        # no-unnest variant: counters identical, nothing materialized
        op2, ob2, m2, c2, u2 = host_nested_join(bk, pk, nb, unnest=False)
        assert (m2, c2, u2) == (matches, cmps, len(expanded))
        assert op2.size == 0


def test_host_engine_vs_jax_engine_large():
    """At sizes beyond the python oracle, host C++ and TPU-path JAX engines
    must agree on matches, comparison counts and the result multiset."""
    from hashjoin3d_tpu.ops import build_chaining, build_nested, probe_chaining
    from hashjoin3d_tpu.ops import materialize_chaining_join, probe_nested, unnest

    rng = np.random.default_rng(7)
    n_b, n_p, nb = 20_000, 50_000, 4096
    bk = rng.integers(0, 8_000, n_b, dtype=np.uint32)
    pk = rng.integers(0, 10_000, n_p, dtype=np.uint32)

    op, ob, m, c = host_chaining_join(bk, pk, nb, out_cap=16 * n_p)
    tbl = build_chaining(bk, nb)
    res = probe_chaining(tbl, pk)
    assert int(res.num_matches) == m
    assert int(res.num_cmps) == c
    jp, jb, jv, jt = materialize_chaining_join(tbl, res, 16 * n_p)
    got = sorted(zip(np.asarray(jp)[np.asarray(jv)].tolist(),
                     np.asarray(jb)[np.asarray(jv)].tolist()))
    assert got == sorted(zip(op.tolist(), ob.tolist()))
    assert int(jt) == m

    onp, onb, nm, nc, nu = host_nested_join(bk, pk, nb, out_cap=16 * n_p)
    ntbl = build_nested(bk, nb)
    nres = probe_nested(ntbl, pk)
    assert int(nres.num_matches) == nm
    assert int(nres.num_cmps) == nc
    up, ub, uv, ut = unnest(ntbl, nres, 16 * n_p)
    assert int(ut) == nu
    got_n = sorted(zip(np.asarray(up)[np.asarray(uv)].tolist(),
                       np.asarray(ub)[np.asarray(uv)].tolist()))
    assert got_n == sorted(zip(onp.tolist(), onb.tolist()))


def test_host_engine_overflow():
    bk = np.full(32, 1, np.uint32)
    pk = np.full(8, 1, np.uint32)
    with pytest.raises(ValueError, match="too small"):
        host_chaining_join(bk, pk, 4, out_cap=8)
    with pytest.raises(ValueError, match="too small"):
        host_nested_join(bk, pk, 4, out_cap=8)
