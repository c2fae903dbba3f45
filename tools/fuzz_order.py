"""Randomized fuzz of the clarity ops' EXACT per-group emission order.

The CI suite pins emission order on fixed workloads
(tests/test_tables.py); this sweep randomizes tables (both kinds, padded
and compacted-host builds, build hints, both nested probe methods) and
asserts, per probe row, the exact emitted build-row SEQUENCE:

- nested ``unnest``: [first-inserted, rest LIFO] == the reference's
  MainNode-then-subchain walk (``ht_nested.hh:398-412``), ground truth
  from the insertion-simulating oracle -- exact reference parity;
- chaining ``materialize_chaining_join`` unique=True: the single emitted
  row is the FIRST MATCH IN BUCKET-CHAIN ORDER (``algebra.hh:625-659``
  early exit), ground truth from the oracle's chain walk;
- chaining unique=False: the engine's documented convention -- the key
  group emits [first-inserted, rest LIFO] (layout.emit_pos; global order
  unspecified, as in the reference where it is a linked-list artifact).

Counters (c_htProbe / c_htProbeCmp) are asserted against the oracle in
every trial.

Usage: python tools/fuzz_order.py [--trials 40] [--seed SEED]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def emitted_sequences(prow, brow, valid):
    seq = {}
    for p, r, v in zip(np.asarray(prow).tolist(), np.asarray(brow).tolist(),
                       np.asarray(valid).tolist()):
        if v:
            seq.setdefault(p, []).append(r)
    return seq


def first_lifo(rows):
    """[first-inserted, rest LIFO] of an arrival-ordered row list."""
    return [rows[0]] + rows[1:][::-1] if rows else []


def one_trial(rng, trial):
    import jax

    from hashjoin3d_tpu.ops.chaining import (
        build_chaining, build_chaining_host, materialize_chaining_join,
        probe_chaining)
    from hashjoin3d_tpu.ops.nested import (
        build_nested, build_nested_host, probe_nested, unnest)
    from oracle import ChainingOracle, NestedOracle

    n_b = int(rng.integers(1, 1500))
    n_p = int(rng.integers(1, 2500))
    dom = int(rng.integers(2, 3 * max(n_b, 4)))
    bk = rng.integers(0, dom, n_b, dtype=np.uint32)
    pk = rng.integers(0, dom + dom // 4 + 1, n_p, dtype=np.uint32)
    if rng.random() < 0.3:  # heavy duplicates
        bk[: n_b // 2] = bk[0]
        pk[: n_p // 3] = bk[0]
    ndv = int(np.unique(bk).size)
    nbkt = int(rng.integers(1, 2 * ndv + 2))
    how = rng.choice(["nested", "chaining"])
    builder = rng.choice(["padded", "host"])
    kw = {}
    if builder == "host":
        if rng.random() < 0.5:
            kw["n_keys"] = ndv
        if rng.random() < 0.5:
            kw["key_domain"] = dom + dom // 4 + 1
    cfg = (f"trial {trial}: {how}/{builder} nb={n_b} np={n_p} dom={dom} "
           f"bkt={nbkt} hints={sorted(kw)}")

    if how == "nested":
        orc = NestedOracle(bk, nbkt)
        nested, matches, cmps = orc.probe(pk)
        want_seq = {}
        for p, r in NestedOracle.unnest(nested):
            want_seq.setdefault(p, []).append(r)

        tbl = (build_nested(bk, nbkt) if builder == "padded"
               else build_nested_host(bk, nbkt, **kw))
        method = rng.choice(["default", "merge"])
        res = (probe_nested(tbl, pk) if method == "default"
               else probe_nested(tbl, pk, method="merge"))
        assert int(res.num_matches) == matches, (cfg, "matches")
        assert int(res.num_cmps) == cmps, (cfg, "cmps")
        total = int(np.sum(np.asarray(jax.device_get(res.group_len))))
        prow, brow, valid, tot = unnest(tbl, res, max(total, 1)
                                        + int(rng.integers(0, 8)))
        assert int(tot) == sum(len(v) for v in want_seq.values())
        got_seq = emitted_sequences(prow, brow, valid)
        assert got_seq == want_seq, (cfg, "unnest order")
        return cfg + f" method={method}"

    unique = bool(rng.random() < 0.5)
    orc = ChainingOracle(bk, nbkt)
    pairs, matches, cmps = orc.probe(pk, unique=unique)
    tbl = (build_chaining(bk, nbkt) if builder == "padded"
           else build_chaining_host(bk, nbkt, **kw))
    res = probe_chaining(tbl, pk, unique=unique)
    assert int(res.num_matches) == matches, (cfg, "matches")
    assert int(res.num_cmps) == cmps, (cfg, "cmps")
    out_size = (n_p if rng.random() < 0.5  # exercise both layouts
                else max(matches, 1) + int(rng.integers(0, 8)))
    if out_size < matches:
        out_size = matches
    prow, brow, valid, tot = materialize_chaining_join(
        tbl, res, out_size, unique=unique)
    assert int(tot) == matches, (cfg, "total")
    got_seq = emitted_sequences(prow, brow, valid)

    if unique:
        # exact reference parity: the first match in bucket-chain order
        want_seq = {}
        for p, r in pairs:
            want_seq.setdefault(p, []).append(r)
        assert got_seq == want_seq, (cfg, "unique chain-first")
    else:
        # engine convention: key group emits [first-inserted, rest LIFO]
        by_key = {}
        for row, k in enumerate(bk.tolist()):
            by_key.setdefault(k, []).append(row)
        want_seq = {}
        for p, k in enumerate(pk.tolist()):
            if by_key.get(k):
                want_seq[p] = first_lifo(by_key[k])
        assert got_seq == want_seq, (cfg, "group emit order")
    return cfg + f" unique={unique} out={out_size}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    seed = (args.seed if args.seed is not None
            else int(time.time()) % (1 << 31))
    print(f"master seed {seed} ({args.trials} trials)", flush=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for trial in range(args.trials):
        msg = one_trial(rng, trial)
        print(f"ok {msg}  [{time.time()-t0:6.1f}s]", flush=True)
        if trial % 10 == 9:
            jax.clear_caches()  # bound XLA-CPU JIT state (see fuzz_api.py)
    print(f"ALL {args.trials} TRIALS PASSED (seed {seed})")


if __name__ == "__main__":
    main()
