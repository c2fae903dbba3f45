"""Randomized differential fuzz: JAX engine vs native C++ engine.

Both implementations were designed independently from the reference's
semantics (CSR + arithmetic chain order on device, CSR + explicit loops in
C++), so agreement across random workloads is strong evidence of both.
Covers uniform/zipf/dense/hot-key distributions, both table kinds, both
probe modes, masked probes, and the key_domain/n_keys build hints.
"""

import numpy as np
import pytest

from hashjoin3d_tpu.hostengine import (
    host_chaining_join, host_nested_join, native_engine)
from hashjoin3d_tpu.ops import (
    build_chaining, build_nested, materialize_chaining_join,
    probe_chaining, probe_nested, unnest)
from hashjoin3d_tpu.ops.chaining import build_chaining_host
from hashjoin3d_tpu.ops.nested import build_nested_host

pytestmark = pytest.mark.skipif(native_engine() is None,
                                reason="no native toolchain")


def _configs():
    rng = np.random.default_rng(2026)
    for trial in range(14):
        n_b = int(rng.integers(1, 5000))
        n_p = int(rng.integers(1, 8000))
        dist = rng.choice(["uniform", "zipf", "dense", "hot"])
        if dist == "uniform":
            dom = int(rng.integers(1, 4 * n_b + 2))
            bk = rng.integers(0, dom, n_b, dtype=np.uint32)
            pk = rng.integers(0, dom + 10, n_p, dtype=np.uint32)
        elif dist == "zipf":
            bk = np.minimum(rng.zipf(1.3, n_b), n_b).astype(np.uint32)
            pk = np.minimum(rng.zipf(1.2, n_p), 2 * n_b).astype(np.uint32)
        elif dist == "dense":
            dom = max(1, n_b // 2)
            bk = rng.integers(0, dom, n_b, dtype=np.uint32)
            pk = rng.integers(0, dom, n_p, dtype=np.uint32)
        else:  # hot: one key dominates
            hot = int(rng.integers(0, 100))
            bk = np.where(rng.random(n_b) < 0.5, hot,
                          rng.integers(0, 200, n_b)).astype(np.uint32)
            pk = np.where(rng.random(n_p) < 0.5, hot,
                          rng.integers(0, 250, n_p)).astype(np.uint32)
        # presorted columns hit the runtime sortedness-detection skip branch
        # (layout.sort_rows_maybe_skip / strands_windowed._sort_probes);
        # the native oracle sees the same arrays, so the diff stays exact
        if rng.random() < 0.25:
            bk = np.sort(bk)
        if rng.random() < 0.25:
            pk = np.sort(pk)
        nb = int(rng.integers(1, 2 * n_b + 2))
        yield trial, bk, pk, nb, rng


def test_fuzz_chaining_vs_native():
    for trial, bk, pk, nb, rng in _configs():
        unique = bool(np.unique(bk).size == bk.size) and bool(
            rng.integers(0, 2))
        op, ob, m, c = host_chaining_join(bk, pk, nb, unique=unique)

        use_hint = bool(rng.integers(0, 2))
        if use_hint:
            tbl = build_chaining_host(bk, nb,
                                      n_keys=int(np.unique(bk).size))
        else:
            tbl = build_chaining(bk, nb)
        res = probe_chaining(tbl, pk, unique=unique)
        assert int(res.num_matches) == m, f"trial {trial}"
        assert int(res.num_cmps) == c, f"trial {trial}"
        cap = max(1, m)
        prow, brow, valid, total = materialize_chaining_join(
            tbl, res, cap, unique=unique)
        got = sorted(zip(np.asarray(prow)[np.asarray(valid)].tolist(),
                         np.asarray(brow)[np.asarray(valid)].tolist()))
        assert got == sorted(zip(op.tolist(), ob.tolist())), f"trial {trial}"


def test_fuzz_nested_vs_native():
    for trial, bk, pk, nb, rng in _configs():
        onp_, onb, m, c, u = host_nested_join(bk, pk, nb)

        if bool(rng.integers(0, 2)):
            dom = int(bk.max()) + 1
            tbl = build_nested_host(bk, nb, n_keys=int(np.unique(bk).size),
                                    key_domain=dom if dom < 1 << 20 else None)
        else:
            tbl = build_nested(bk, nb)
        res = probe_nested(tbl, pk)
        assert int(res.num_matches) == m, f"trial {trial}"
        assert int(res.num_cmps) == c, f"trial {trial}"
        cap = max(1, u)
        up, ub, uv, ut = unnest(tbl, res, cap)
        assert int(ut) == u, f"trial {trial}"
        got = sorted(zip(np.asarray(up)[np.asarray(uv)].tolist(),
                         np.asarray(ub)[np.asarray(uv)].tolist()))
        assert got == sorted(zip(onp_.tolist(), onb.tolist())), f"trial {trial}"


def test_fuzz_masked_probes_vs_native_subset():
    """Masked device probes == native engine on the masked subset."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    for trial in range(6):
        n_b, n_p = int(rng.integers(10, 2000)), int(rng.integers(10, 3000))
        bk = rng.integers(0, n_b, n_b, dtype=np.uint32)
        pk = rng.integers(0, 2 * n_b, n_p, dtype=np.uint32)
        nb = int(rng.integers(1, n_b + 1))
        mask = rng.random(n_p) < 0.6

        _, _, m, c, u = host_nested_join(bk, pk[mask], nb)
        tbl = build_nested(bk, nb)
        res = probe_nested(tbl, pk, mask=jnp.asarray(mask))
        assert int(res.num_matches) == m, f"trial {trial}"
        assert int(res.num_cmps) == c, f"trial {trial}"


def test_fuzz_u64_vs_python_oracle():
    """u64 random workloads vs the insertion-simulating python oracle."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from oracle import NestedOracle

    rng = np.random.default_rng(123)
    for trial in range(4):
        n_b, n_p = int(rng.integers(5, 800)), int(rng.integers(5, 1200))
        lo = rng.integers(0, 50, n_b).astype(np.uint64)
        hi = rng.integers(0, 6, n_b).astype(np.uint64)
        bk = (hi << np.uint64(40)) | lo
        plo = rng.integers(0, 60, n_p).astype(np.uint64)
        phi = rng.integers(0, 6, n_p).astype(np.uint64)
        pk = (phi << np.uint64(40)) | plo
        nb = int(rng.integers(1, n_b + 1))

        orc = NestedOracle(bk, nb)
        nested, matches, _ = orc.probe(pk)
        want = sorted(orc.unnest(nested))

        tbl = build_nested(bk, nb)
        res = probe_nested(tbl, pk)
        assert int(res.num_matches) == matches, f"trial {trial}"
        up, ub, uv, ut = unnest(tbl, res, max(1, len(want)))
        got = sorted(zip(np.asarray(up)[np.asarray(uv)].tolist(),
                         np.asarray(ub)[np.asarray(uv)].tolist()))
        assert got == want, f"trial {trial}"
