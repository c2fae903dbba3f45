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
