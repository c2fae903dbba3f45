"""Stage-level decomposition of the HEADLINE Csr probe strand.

bench.py's strand (ops/strands_windowed.py:direct_probe_strand_sorted,
2^24 uniform probes over a 2^20 dense-direct table) measures ~39.7 ms on
v5e, but its roofline parts (2-op segmented bitonic 16.5 ms + W=8192
windowed lookup 6.1 ms + a handful of copy-speed passes) sum to ~25 ms.
This tool times each stage in isolation on the real chip (fence-amortized,
same harness as tools/roofline.py) so the residual is attributed to a
specific op before round 5 spends effort on the wrong one.

Run: python tools/csrprof.py [--logp 24] [--logt 20]
"""

import argparse
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U32 = jnp.uint32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logp", type=int, default=24)
    ap.add_argument("--logt", type=int, default=20)
    ap.add_argument("--min-time", type=float, default=0.4)
    args = ap.parse_args()

    from tools.roofline import timeit, fence_floor
    from hashjoin3d_tpu.ops.chaining import (build_chaining_host,
                                             can_use_dense_direct)
    from hashjoin3d_tpu.ops.strands_windowed import (
        _miss_chain_cmps, _sort_probes, direct_probe_strand_sorted,
        safe_lookup)
    from hashjoin3d_tpu.ops.sort import (probe_sort_chunk, sort_segmented,
                                         window_for_chunk)
    from hashjoin3d_tpu.ops.layout import is_sorted_ascending
    from hashjoin3d_tpu.ops.windowed import windowed_lookup, chunk_bases
    from hashjoin3d_tpu.utils import exp1_data
    from hashjoin3d_tpu.utils.measure import fence

    P, T = 1 << args.logp, 1 << args.logt
    mt = args.min_time
    rk, sa, _ = exp1_data(args.logt, args.logp, False, 0)
    dd = can_use_dense_direct(rk, T)
    assert dd
    pk = jax.device_put(sa)
    tbl = build_chaining_host(jax.device_put(rk), T, dense_direct=dd)
    fence((tbl.direct, pk))
    print(f"P=2^{args.logp} probes, T=2^{args.logt} keys; fence floor "
          f"{fence_floor()*1e3:.1f} ms", flush=True)

    def row(name, fn, *xs, n=P):
        t = timeit(fn, *xs, min_time=mt)
        print(f"  {name:46s} {t*1e3:8.2f} ms  {t*1e9/n:6.3f} ns/elem",
              flush=True)
        return t

    # full strand, for reference
    full = jax.jit(partial(direct_probe_strand_sorted, unique=True))
    row("FULL Csr strand (unique)", lambda t, p: full(t, p), tbl, pk)

    # stage 1: the probe sort
    chunk = probe_sort_chunk(P, T)
    Wk = window_for_chunk(chunk, T)
    print(f"  [probe_sort_chunk={chunk}, Wk={Wk}]", flush=True)
    sort1 = jax.jit(lambda p: _sort_probes(p, domain=T)[:2])
    skey, srow = sort1(pk)
    fence((skey, srow))
    row("1 _sort_probes (cond + segmented 2-op)", sort1, pk)
    rowv = jnp.arange(P, dtype=I32)
    row("1a sort_segmented alone (no cond)",
        jax.jit(lambda p: sort_segmented(p.astype(U32), chunk)), pk)
    row("1b is_sorted_ascending check",
        jax.jit(lambda p: is_sorted_ascending(p.astype(U32))), pk)
    sk = skey.astype(I32)

    # stage 2: the windowed direct-word lookup
    d_full = jax.jit(lambda t, s: safe_lookup(t.direct, s, W=Wk))
    d = d_full(tbl, sk)
    fence(d)
    row("2 safe_lookup(direct) W=Wk (cond+patch)", d_full, tbl, sk)
    row("2a windowed_lookup raw W=Wk", jax.jit(
        lambda t, s: windowed_lookup(t, s, W=Wk)), tbl.direct.view(U32), sk)
    row("2b windowed_lookup raw W=Wk db=True", jax.jit(
        lambda t, s: windowed_lookup(t, s, W=Wk, db=True)),
        tbl.direct.view(U32), sk)
    row("2c windowed raw W=1024 (global-sort W)", jax.jit(
        lambda t, s: windowed_lookup(t, s, W=1024)), tbl.direct.view(U32),
        sk)
    row("2d windowed raw W=1024 db=True", jax.jit(
        lambda t, s: windowed_lookup(t, s, W=1024, db=True)),
        tbl.direct.view(U32), sk)
    row("2e chunk_bases + coverage reductions", jax.jit(
        lambda s: chunk_bases(s, T, 1024, Wk)), sk)

    # stage 3: decode + counters + miss cond
    def decode(d):
        hit = d != 0
        row_ = (d & jnp.uint32((1 << tbl.direct_shift) - 1)).astype(I32)
        pos1 = (d >> jnp.uint32(tbl.direct_shift)).astype(I32)
        return hit, row_, pos1
    hit, brow, pos1 = jax.jit(decode)(d)
    fence((hit, brow, pos1))
    row("3 decode packed word (3 elementwise)", jax.jit(decode), d)
    row("3a miss_cmps cond (0 misses)", jax.jit(
        lambda t, s, h: _miss_chain_cmps(t.bucket_len, t.num_buckets, s,
                                         ~h, t.hashfun)), tbl, skey, hit)
    row("3b counter sums (2x i64)", jax.jit(
        lambda h, p1: (jnp.sum(h.astype(jnp.int64)),
                       jnp.sum(jnp.where(h, p1, 0).astype(jnp.int64)))),
        hit, pos1)

    # stage 4: emission wheres
    row("4 emission wheres (2x)", jax.jit(
        lambda h, sr, rw: (jnp.where(h, sr, -1), jnp.where(h, rw, -1))),
        hit, srow, brow)


if __name__ == "__main__":
    main()
