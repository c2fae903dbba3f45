"""Randomized fuzz of the out-of-core streaming probes.

Random table layouts (dense-direct / keydirect / merged u32 / merged
u64) x hash functors x chunk sizes (ragged tails guaranteed) x probe
modes through ``ops.streaming.stream_probe_{chaining,nested}``, checked
against the insertion-simulating python oracle: counters bit-equal and
pair multisets identical to a whole-column probe.

Motivated by a real escape: the round-3 review found the dense-direct
ragged-tail pad-comparison correction hashing the pad key with the
murmur default instead of the table's functor -- a hole exactly at the
layout x hashfun x ragged-tail intersection the fixed-seed tests did
not cross (tests/test_ops_misc.py now pins that case; this sweep
randomizes the whole cross product).

Usage: python tools/fuzz_stream.py [--trials 40] [--seed SEED]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def one_trial(rng, trial):
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.hashing import HASH_FUNCTORS_NP
    from hashjoin3d_tpu.ops.nested import build_nested_host
    from hashjoin3d_tpu.ops.streaming import (
        stream_probe_chaining, stream_probe_nested)
    from oracle import ChainingOracle, NestedOracle

    layout = rng.choice(["dense", "keydirect", "merged32", "merged64"])
    hf = rng.choice(["murmur", "boncz", "fib", "mult", "identity"])
    how = rng.choice(["chaining", "nested"])
    unique = bool(rng.random() < 0.5)
    n_p = int(rng.integers(1, 8192))
    chunk = int(rng.integers(32, 4096))

    if layout == "dense":
        n_b = int(rng.integers(1, 4096))
        bk = rng.permutation(max(n_b, 1))[:n_b].astype(np.uint32)
        pk = rng.integers(0, n_b + 32, n_p, dtype=np.uint32)
    else:
        n_b = int(rng.integers(1, 3000))
        dom = int(rng.integers(2, 3 * max(n_b, 4)))
        bk = rng.integers(0, dom, n_b, dtype=np.uint32)
        pk = rng.integers(0, dom + 8, n_p, dtype=np.uint32)
        if layout == "merged32":
            bk = bk * np.uint32(65521) + np.uint32(3)  # sparse domain
            pk = pk * np.uint32(65521) + np.uint32(3)
        elif layout == "merged64":
            hi = np.uint64(int(rng.integers(1, 1 << 16))) << np.uint64(40)
            bk = bk.astype(np.uint64) | hi
            pk = pk.astype(np.uint64) | hi
    ndv = int(np.unique(bk).size)
    nbkt = int(rng.integers(1, 2 * ndv + 2))

    kw = dict(hashfun=hf)
    if layout == "dense":
        nbkt = min(nbkt, max(n_b, 1))
        kw.update(dense_direct=True, n_keys=n_b)
        if how == "chaining" and not unique:
            kw.update(full_chain_index=True)
    elif layout == "keydirect":
        kw.update(key_domain=int(pk.max()) + 1, n_keys=ndv)

    wide = bk.dtype.itemsize == 8
    f = HASH_FUNCTORS_NP[hf][1 if wide else 0]
    np_t = np.uint64 if wide else np.uint32

    def hfn(k):
        return int(f(np_t(k)))

    cfg = (f"trial {trial}: {how}/{layout} hf={hf} u={unique} nb={n_b} "
           f"np={n_p} bkt={nbkt} chunk={chunk}")

    if how == "chaining":
        if layout == "dense" and not unique:
            pass  # full_chain_index set above
        tbl = build_chaining_host(bk, nbkt, **kw)
        orc = ChainingOracle(bk, nbkt, hashfun=hfn)
        pairs, matches, cmps = orc.probe(pk, unique=unique)
        m, c, got = stream_probe_chaining(
            tbl, pk, chunk_size=chunk, unique=unique, collect_pairs=True,
            out_per_chunk=16 * chunk + 16)
        assert m == matches, (cfg, m, matches)
        assert c == cmps, (cfg, c, cmps)
        flat = sorted((int(a), int(b)) for pr, br in got
                      for a, b in zip(pr, br))
        assert flat == sorted(pairs), (cfg, len(flat), len(pairs))
    else:
        if layout == "dense":
            kw.pop("full_chain_index", None)
        tbl = build_nested_host(bk, nbkt, **kw)
        orc = NestedOracle(bk, nbkt, hashfun=hfn)
        nested, matches, cmps = orc.probe(pk)
        want = NestedOracle.unnest(nested)
        m, c, u, got = stream_probe_nested(
            tbl, pk, chunk_size=chunk, collect_pairs=True,
            out_per_chunk=16 * chunk + 16)
        assert m == matches, (cfg, m, matches)
        assert c == cmps, (cfg, c, cmps)
        assert u == len(want), (cfg, u, len(want))
        flat = sorted((int(a), int(b)) for pr, br in got
                      for a, b in zip(pr, br))
        assert flat == sorted(want), (cfg, len(flat), len(want))
    return cfg


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
        if trial % 8 == 7:
            jax.clear_caches()  # bound XLA-CPU JIT state (see fuzz_api.py)
    print(f"ALL {args.trials} TRIALS PASSED (seed {seed})")


if __name__ == "__main__":
    main()
