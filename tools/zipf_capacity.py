"""Zipf distributed-capacity evidence at full exp-1 scale (VERDICT r4 #8).

Measures, for the exp-1 zipf(1.0) key column at |S| = 2^24 over a 2^20
domain and an 8-shard mesh:

* exact per-shard / per-(src,dst) receive volumes of the hash-partition
  exchange (host mirror of shuffle.shard_of_key), with and without
  replicating detect_skew's top-16 keys;
* the uniformly-sized capacity both joins are given;
* a live run of the flat join (must overflow) and the hybrid join (must
  not) on the virtual 8-device CPU mesh, counters checked exactly.

Run: python tools/zipf_capacity.py [--logp 24] [--logr 20] [--shards 8]
     [--no-run] (volumes only, skip the mesh execution)
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logp", type=int, default=24)
    ap.add_argument("--logr", type=int, default=20)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--no-run", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # virtual mesh; see conftest

    from hashjoin3d_tpu.ops.hashing import hash_key_np
    from hashjoin3d_tpu.parallel import detect_skew
    from hashjoin3d_tpu.utils import exp1_data

    ns = args.shards
    rk, sa, _ = exp1_data(args.logr, args.logp, True, 0)
    n_p, n_b = sa.size, rk.size
    print(f"|R|=2^{args.logr} (permutation), |S|=2^{args.logp} zipf(1.0), "
          f"{ns} shards")

    rep = detect_skew(sa, ns)
    top = rep["top_keys"]
    print(f"detect_skew: top_key_fraction={rep['top_key_fraction']:.4f}, "
          f"shard_imbalance={rep['shard_imbalance']:.3f}, "
          f"strategy={rep['strategy']}")

    def volumes(keys, mask=None):
        d = (hash_key_np(hash_key_np(keys)) % np.uint32(ns)).astype(np.int64)
        w = None if mask is None else mask.astype(np.int64)
        per_shard = np.bincount(d, weights=w, minlength=ns).astype(np.int64)
        src = np.arange(keys.size) // (keys.size // ns)
        per_pair = np.bincount(src * ns + d, weights=w,
                               minlength=ns * ns).astype(np.int64)
        return per_shard, int(per_pair.max())

    uniform_cap = int(n_p / ns / ns * 1.25)
    ps_flat, pair_flat = volumes(sa)
    cold = ~np.isin(sa, top)
    ps_cold, pair_cold = volumes(sa, cold)
    hot_total = int(n_p - cold.sum())
    print(f"uniform per-(src,dst) capacity (mean + 25%): {uniform_cap}")
    print("flat exchange per-shard receive:  "
          + " ".join(f"{v}" for v in ps_flat)
          + f"  (max/mean {ps_flat.max()/ps_flat.mean():.3f}, "
          f"max per-(src,dst) {pair_flat})")
    print("cold-only (top-16 replicated):    "
          + " ".join(f"{v}" for v in ps_cold)
          + f"  (max/mean {ps_cold.max()/max(ps_cold.mean(),1):.3f}, "
          f"max per-(src,dst) {pair_cold})")
    print(f"replicated hot volume: {hot_total} rows "
          f"({100*hot_total/n_p:.1f}% of probes) never exchanged")
    print(f"flat overflows uniform capacity: {pair_flat > uniform_cap}; "
          f"hybrid fits: {pair_cold <= uniform_cap}")

    if args.no_run:
        return

    from hashjoin3d_tpu.parallel import (dist_hybrid_nested_join,
                                         dist_nested_join, make_mesh,
                                         shard_axis)
    mesh = make_mesh(ns)
    sh = shard_axis(mesh)
    bk_d, pk_d = jax.device_put(rk, sh), jax.device_put(sa, sh)
    flat = dist_nested_join(mesh, num_buckets_per_shard=1 << 17,
                            build_capacity=n_b, probe_capacity=uniform_cap,
                            out_capacity=2 * (n_p // ns))
    out_flat = flat(bk_d, pk_d)
    print(f"flat join overflow rows: {int(out_flat['overflow'])}")
    assert int(out_flat["overflow"]) > 0

    hyb = dist_hybrid_nested_join(
        mesh, top, num_buckets_per_shard=1 << 17,
        build_capacity=n_b, probe_capacity=uniform_cap,
        hot_build_capacity=32, out_capacity=2 * (n_p // ns))
    out = hyb(bk_d, pk_d)
    print(f"hybrid join overflow rows: {int(out['overflow'])}, "
          f"matches {int(out['num_matches'])} (expect {n_p}), "
          f"unnested {int(out['num_unnested'])}")
    assert int(out["overflow"]) == 0
    assert int(out["num_matches"]) == n_p
    assert int(out["num_unnested"]) == n_p
    print("OK")


if __name__ == "__main__":
    main()
