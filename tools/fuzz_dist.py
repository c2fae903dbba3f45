"""Randomized differential fuzz of the distributed join schedules.

Random mesh sizes x dtypes x key distributions x capacity policies x
build hints, on the virtual CPU mesh (the same surface the driver's
``dryrun_multichip`` validates).  Every trial runs the flat nested join
plus a randomly chosen second schedule (chaining / ring / hierarchical
2D) on the same data and checks, against plain-numpy ground truth:

- ``num_matches`` / ``num_unnested`` (psum'd global counters),
- the global-id (probe_row, build_row) pair MULTISET across shards,
- ``overflow == 0`` under exact host-side capacity accounting -- or,
  on deliberate-undersize trials, that overflow is detected (> 0).

Counter equality BETWEEN schedules (same shard routing => same per-shard
tables) additionally pins num_cmps without re-deriving chain walks here.

Usage: python tools/fuzz_dist.py [--trials 30] [--seed SEED] [--devices 8]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def routing(keys, num_shards):
    """Host twin of shuffle.shard_of_key (double hash, width-matched)."""
    from hashjoin3d_tpu.ops.hashing import hash_key_np
    return (hash_key_np(hash_key_np(keys))
            % keys.dtype.type(num_shards)).astype(np.int64)


def exact_caps(keys, num_shards, n_loc):
    d = routing(keys, num_shards)
    src = np.arange(keys.size) // n_loc
    per_pair = np.bincount(src * num_shards + d,
                           minlength=num_shards * num_shards)
    per_shard_distinct = max(
        int(np.unique(keys[d == s]).size) for s in range(num_shards))
    return int(per_pair.max()), per_shard_distinct, d


def ground_truth(bk, pk):
    """(pairs multiset, matches, per-probe match counts) via numpy."""
    order = np.argsort(bk, kind="stable")
    sbk = bk[order]
    lo = np.searchsorted(sbk, pk, side="left")
    hi = np.searchsorted(sbk, pk, side="right")
    counts = hi - lo
    pairs = []
    for p in np.nonzero(counts)[0]:
        pairs.extend((int(p), int(order[j]))
                     for j in range(lo[p], hi[p]))
    return sorted(pairs), int(np.count_nonzero(counts)), counts


def got_pairs(out):
    import jax
    pr, br, v = jax.device_get(
        (out["probe_row"], out["build_row"], out["out_valid"]))
    pr, br, v = (np.asarray(pr).ravel(), np.asarray(br).ravel(),
                 np.asarray(v).ravel())
    return sorted(zip(pr[v].tolist(), br[v].tolist()))


def one_trial(rng, trial, max_devices):
    import jax

    from hashjoin3d_tpu.parallel import (
        dist_chaining_join, dist_nested_join, dist_ring_nested_join,
        make_mesh, shard_axis)

    nd = int(rng.choice([d for d in (1, 2, 4, 8) if d <= max_devices]))
    n_b = int(rng.integers(1, 400)) * nd
    n_p = int(rng.integers(1, 600)) * nd
    wide = rng.random() < 0.3
    dom = int(rng.integers(2, 3 * max(n_b, 4)))
    bk = rng.integers(0, dom, n_b, dtype=np.uint32)
    pk = rng.integers(0, dom, n_p, dtype=np.uint32)
    dist = rng.choice(["uniform", "hot", "dense"])
    if dist == "hot":
        bk[: n_b // 2] = bk[0]
        pk[: n_p // 3] = bk[0]
    elif dist == "dense":
        bk = (np.arange(n_b) % max(dom // 2, 1)).astype(np.uint32)
    if wide:
        hi = np.uint64(int(rng.integers(1, 1 << 16))) << np.uint64(40)
        bk, pk = bk.astype(np.uint64) | hi, pk.astype(np.uint64) | hi

    want, matches, counts = ground_truth(bk, pk)
    bcap, b_nk, _ = exact_caps(bk, nd, n_b // nd)
    pcap, _, pdest = exact_caps(pk, nd, n_p // nd)
    # per-shard output: keyed shards (flat) or probe-home shards (ring)
    out_by_key = max((int(counts[pdest == s].sum()) for s in range(nd)),
                     default=0)
    home = np.arange(n_p) // (n_p // nd)
    out_by_home = max((int(counts[home == s].sum()) for s in range(nd)),
                      default=0)
    ocap = max(out_by_key, out_by_home, 1)

    undersize = rng.random() < 0.15 and pcap > 1
    if undersize:
        pcap_run = int(rng.integers(1, pcap))
    else:
        pcap_run = pcap + int(rng.integers(0, 5))

    nbkt = int(rng.integers(1, 2 * max(b_nk, 1) + 2))
    kw = {}
    if not wide and rng.random() < 0.5:
        kw["key_domain"] = dom
    if rng.random() < 0.5:
        kw["n_keys"] = b_nk + 1
    if wide and rng.random() < 0.3:
        kw["merged"] = bool(rng.random() < 0.5)

    mesh = make_mesh(nd)
    sh = shard_axis(mesh)
    bkd, pkd = jax.device_put(bk, sh), jax.device_put(pk, sh)

    cfg = (f"trial {trial}: nd={nd} nb={n_b} np={n_p} dom={dom} "
           f"wide={wide} dist={dist} nbkt={nbkt} hints={sorted(kw)} "
           f"undersize={undersize}")

    flat = dist_nested_join(mesh, num_buckets_per_shard=nbkt,
                            build_capacity=bcap, probe_capacity=pcap_run,
                            out_capacity=ocap, **kw)
    out = flat(bkd, pkd)
    if undersize:
        assert int(out["overflow"]) > 0, (cfg, "overflow undetected")
        return cfg + "  [overflow detected]"
    assert int(out["overflow"]) == 0, (cfg, int(out["overflow"]))
    assert int(out["num_matches"]) == matches, (cfg, "matches")
    assert int(out["num_unnested"]) == len(want), (cfg, "unnested")
    assert got_pairs(out) == want, (cfg, "flat pairs")

    other = rng.choice(["chaining", "ring", "2d"] if nd >= 2
                       else ["chaining", "ring"])
    if other == "chaining":
        ch_kw = {k: v for k, v in kw.items() if k != "merged"}
        step2 = dist_chaining_join(mesh, num_buckets_per_shard=nbkt,
                                   build_capacity=bcap,
                                   probe_capacity=pcap_run,
                                   out_capacity=ocap, **ch_kw)
        out2 = step2(bkd, pkd)
        assert int(out2["overflow"]) == 0, (cfg, "chaining overflow")
        assert int(out2["num_results"]) == len(want), (cfg, "chaining total")
        assert got_pairs(out2) == want, (cfg, "chaining pairs")
    elif other == "ring":
        ring_kw = {k: v for k, v in kw.items() if k != "merged"}
        step2 = dist_ring_nested_join(mesh, num_buckets_per_shard=nbkt,
                                      build_capacity=bcap,
                                      out_capacity=ocap, **ring_kw)
        out2 = step2(bkd, pkd)
        assert int(out2["overflow"]) == 0, (cfg, "ring overflow")
        assert int(out2["num_matches"]) == matches, (cfg, "ring matches")
        assert got_pairs(out2) == want, (cfg, "ring pairs")
    elif nd >= 2:  # 2d
        from jax.sharding import NamedSharding, PartitionSpec as P
        from hashjoin3d_tpu.parallel import (
            dist_nested_join_2d, make_mesh_2d)
        mesh2 = make_mesh_2d(2, nd // 2)
        sh2 = NamedSharding(mesh2, P(("host", "chip")))
        kw2 = {k: v for k, v in kw.items() if k != "merged"}
        step2 = dist_nested_join_2d(mesh2, num_buckets_per_shard=nbkt,
                                    build_capacity=n_b, probe_capacity=n_p,
                                    out_capacity=len(want) + 1, **kw2)
        out2 = step2(jax.device_put(bk, sh2), jax.device_put(pk, sh2))
        assert int(out2["overflow"]) == 0, (cfg, "2d overflow")
        assert int(out2["num_matches"]) == matches, (cfg, "2d matches")
        assert int(out2["num_unnested"]) == len(want), (cfg, "2d unnested")
        assert got_pairs(out2) == want, (cfg, "2d pairs")
    return cfg + f"  [+{other}]"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=30)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    import os
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")

    seed = (args.seed if args.seed is not None
            else int(time.time()) % (1 << 31))
    print(f"master seed {seed} ({args.trials} trials)", flush=True)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    for trial in range(args.trials):
        msg = one_trial(rng, trial, args.devices)
        print(f"ok {msg}  [{time.time()-t0:6.1f}s]", flush=True)
        if trial % 6 == 5:
            jax.clear_caches()  # bound XLA-CPU JIT state (see fuzz_api.py)
    print(f"ALL {args.trials} TRIALS PASSED (seed {seed})")


if __name__ == "__main__":
    main()
