"""Extended randomized differential fuzz of ``api.join``'s routing tree.

``api.join`` picks a physical plan from the data (dense-direct vs
keydirect vs merged strand x nested/chaining x unique x u32/u64 x
hashfun x backend x mode) -- this sweep drives random workloads through
every route and checks counters AND result multisets against the
pure-Python reference-semantics oracle (``tests/oracle.py``), which
models ``ht_chaining.hh`` / ``ht_nested.hh`` insertion per tuple.

Complements the fixed-seed suite fuzz (tests/test_fuzz_differential.py,
engine-vs-native at the ops layer) by fuzzing the user-facing decision
tree itself, where route-selection bugs live (e.g. the round-3 review's
keydirect-chaining miss).

Usage: python tools/fuzz_api.py [--trials 60] [--seed SEED] [--platform cpu]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def gen_keys(rng, n, dtype, dist):
    dom = int(rng.integers(4, max(8, 4 * n)))
    if dist == "perm":
        vals = rng.permutation(max(n, 1))[:n].astype(np.uint32)
    elif dist == "uniform":
        vals = rng.integers(0, dom, n, dtype=np.uint32)
    elif dist == "hot":
        vals = rng.integers(0, dom, n, dtype=np.uint32)
        vals[: n // 2] = vals[0]
    elif dist == "dense":
        vals = (np.arange(n) % max(dom // 4, 1)).astype(np.uint32)
    else:  # sparse: anywhere in the 30-bit space
        vals = rng.integers(0, 1 << 30, n, dtype=np.uint32)
    if dtype == np.uint64:
        hi = np.uint64(int(rng.integers(0, 1 << 20))) << np.uint64(32)
        wide = vals.astype(np.uint64) | hi
        if rng.random() < 0.3:  # some rows in a second hi-plane
            wide[rng.random(n) < 0.3] |= np.uint64(1) << np.uint64(52)
        return wide
    return vals


def oracle_pairs(bk, pk, how, unique, num_buckets, hf_name):
    from hashjoin3d_tpu.ops.hashing import HASH_FUNCTORS_NP

    from oracle import ChainingOracle, NestedOracle

    wide = bk.dtype.itemsize == 8
    f = HASH_FUNCTORS_NP[hf_name][1 if wide else 0]
    np_t = np.uint64 if wide else np.uint32

    def hf(k):
        return int(f(np_t(k)))

    if how == "chaining":
        orc = ChainingOracle(bk, num_buckets, hashfun=hf)
        pairs, matches, cmps = orc.probe(pk, unique=unique)
    else:
        orc = NestedOracle(bk, num_buckets, hashfun=hf)
        nested, matches, cmps = orc.probe(pk)
        pairs = orc.unnest(nested)
    return pairs, matches, cmps


def mode_view(pairs, n_probe, mode):
    """Expected (probe_row, build_row) multiset for each join mode."""
    matched = {p for p, _ in pairs}
    if mode == "inner":
        return sorted(pairs)
    if mode == "left":
        return sorted(pairs + [(p, -1) for p in range(n_probe)
                               if p not in matched])
    if mode == "semi":
        return sorted((p, -1) for p in matched)
    return sorted((p, -1) for p in range(n_probe) if p not in matched)


def one_trial(rng, trial):
    import hashjoin3d_tpu as hj

    dtype = np.uint64 if rng.random() < 0.25 else np.uint32
    n_b = int(rng.integers(1, 3000))
    n_p = int(rng.integers(1, 5000))
    dist_b = rng.choice(["perm", "uniform", "hot", "dense", "sparse"])
    dist_p = rng.choice(["uniform", "hot", "dense", "sparse"])
    bk = gen_keys(rng, n_b, dtype, dist_b)
    pk = gen_keys(rng, n_p, dtype, dist_p)
    if dtype == np.uint64 and rng.random() < 0.5:
        pk = (pk & np.uint64(0xFFFFFFFF)) | (bk[0] & ~np.uint64(0xFFFFFFFF))

    how = rng.choice(["nested", "chaining"])
    unique = bool(rng.random() < 0.5) if how == "chaining" else False
    mode = rng.choice(["inner", "inner", "left", "semi", "anti"])
    hf = rng.choice(["murmur", "boncz", "fib", "mult", "identity"])
    ndv = int(np.unique(bk).size)
    num_buckets = (None if rng.random() < 0.3
                   else int(rng.integers(1, 2 * ndv + 8)))
    kw = {}
    if rng.random() < 0.3:
        kw["n_keys"] = ndv
    if dtype == np.uint32 and rng.random() < 0.3:
        kw["key_domain"] = int(bk.max()) + 1 + int(rng.integers(0, 64))
    backend = "device"
    if hf == "murmur" and rng.random() < 0.6:  # host handles u64 too
        backend = rng.choice(["auto", "host"])

    res = hj.join(bk, pk, how=how, unique=unique, num_buckets=num_buckets,
                  backend=backend, mode=mode, hashfun=hf, **kw)

    nb_eff = (num_buckets if num_buckets is not None
              else max(1, kw.get("n_keys", ndv)))
    pairs, matches, cmps = oracle_pairs(bk, pk, how, unique, nb_eff, hf)
    want = mode_view(pairs, n_p, mode)

    cfg = (f"trial {trial}: {how} u={unique} m={mode} hf={hf} "
           f"dt={np.dtype(dtype).name} nb={n_b} np={n_p} "
           f"bkt={nb_eff} be={backend} hints={sorted(kw)} "
           f"dist=({dist_b},{dist_p})")
    assert res.num_matches == matches, (cfg, res.num_matches, matches)
    assert res.num_cmps == cmps, (cfg, res.num_cmps, cmps)
    got = sorted(res.pairs())
    assert got == want, (cfg, len(got), len(want))
    assert res.num_results == len(want), (cfg, res.num_results, len(want))
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=60)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    seed = (args.seed if args.seed is not None
            else int(time.time()) % (1 << 31))
    print(f"master seed {seed} ({args.trials} trials)", flush=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for trial in range(args.trials):
        cfg = one_trial(rng, trial)
        print(f"ok {cfg}  [{time.time()-t0:6.1f}s]", flush=True)
        if trial % 10 == 9:
            # every trial compiles fresh shapes; unbounded XLA-CPU compiler
            # state exhausts the LLVM JIT arena after ~100 trials (same
            # issue tests/conftest.py clears between modules)
            import jax
            jax.clear_caches()
    print(f"ALL {args.trials} TRIALS PASSED (seed {seed})")


if __name__ == "__main__":
    main()
