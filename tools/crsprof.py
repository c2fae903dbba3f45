"""Stage-level decomposition of the Crs chaining probe strand.

Round 4's fence-amortized battery (artifacts/r4/exp1_t0.log) measured the
exp-1 Crs probe (keydirect chaining table, 1M permutation probes -> 16.8M
emitted rows; /root/reference/algebra.hh:625-659) at 191 ms while its
nested twin Nrs runs the same 1M -> 16.8M shape at 48.7 ms.  This tool
times each stage of ops/strands_windowed.py:keydirect_chaining_strand_sorted
in isolation on the real chip (fence-amortized) and prints the full
strand's route_worst/route_nbad, so the 4x gap is attributed to a specific
op rather than guessed.

Run: python tools/crsprof.py [--logr 20] [--logs 24] [--min-time 0.4]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
U32 = jnp.uint32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logr", type=int, default=20)
    ap.add_argument("--logs", type=int, default=24)
    ap.add_argument("--min-time", type=float, default=0.4)
    args = ap.parse_args()
    mt = args.min_time

    from tools.roofline import fence_floor, timeit
    from hashjoin3d_tpu.ops.chaining import build_chaining_host
    from hashjoin3d_tpu.ops.hashing import bucket_of, hash_key
    from hashjoin3d_tpu.ops.layout import expand, inverse_permute
    from hashjoin3d_tpu.ops.strands_windowed import (
        _sort_bucket_ids, keydirect_chaining_strand_sorted, rows_window,
        safe_lookup, stride_params, DEFAULT_W)
    from hashjoin3d_tpu.utils.gen import exp1_data
    from hashjoin3d_tpu.utils.measure import fence

    P = 1 << args.logr
    out_size = 1 << args.logs
    rk, sa, ndv = exp1_data(args.logr, args.logs, False, 0)
    print(f"devices: {jax.devices()}  P=2^{args.logr} -> out=2^{args.logs}"
          f"  ndv={ndv}", flush=True)
    print(f"fence floor: {fence_floor()*1e3:.2f} ms", flush=True)

    rk = jax.device_put(np.asarray(rk))
    sa = jax.device_put(np.asarray(sa))
    table = build_chaining_host(sa, ndv, n_keys=ndv, key_domain=P,
                                early_exit_index=False)
    fence(table)

    # full strand first: time + route truth
    full = jax.jit(lambda p: keydirect_chaining_strand_sorted(
        table, p, out_size, unique=False, probes_permutation=True))
    out = full(rk)
    fence(out)
    print(f"route_worst={int(out['route_worst'])} "
          f"route_nbad={int(out['route_nbad'])} "
          f"c_htProbe={int(out['c_htProbe'])} "
          f"c_htProbeCmp={int(out['c_htProbeCmp'])}", flush=True)
    t = timeit(full, rk, min_time=mt)
    print(f"{'FULL strand':42s} {t*1e3:9.2f} ms", flush=True)

    # stage inputs, materialized once (mirrors the probes_permutation path)
    Wk = DEFAULT_W
    kd = table.key_direct
    srow = jax.jit(lambda p: inverse_permute(
        p.astype(I32), jnp.arange(P, dtype=I32)))(rk)
    g = kd[:P]
    skey = jnp.arange(P, dtype=U32)
    sk = skey.astype(I32)
    glen = jax.jit(lambda gg: safe_lookup(
        table.groups.group_len, gg, W=Wk).astype(I32))(g)
    gstart = jax.jit(lambda gg: safe_lookup(
        table.groups.group_start, gg, W=Wk).astype(I32))(g)
    p_, within, valid, total = jax.jit(
        lambda c: expand(c, out_size)[:4])(glen)
    Wp, Cp = stride_params(P / out_size)
    gst = jax.jit(lambda pp: safe_lookup(
        gstart, pp, W=Wp, C=Cp).astype(I32))(p_)
    Wr, Cr = rows_window(P, None, int(table.groups.group_rows.shape[0]),
                         out_size)
    fence((srow, g, glen, gstart, p_, within, gst))
    print(f"windows: Wk={Wk} (Wp,Cp)=({Wp},{Cp}) (Wr,Cr)=({Wr},{Cr})",
          flush=True)

    def row(name, fn, *xs):
        t = timeit(jax.jit(fn), *xs, min_time=mt)
        print(f"{name:42s} {t*1e3:9.2f} ms", flush=True)

    row("inverse_permute srow (1M)", lambda p: inverse_permute(
        p.astype(I32), jnp.arange(P, dtype=I32)), rk)
    row("glen lookup (1M, W=Wk)", lambda gg: safe_lookup(
        table.groups.group_len, gg, W=Wk), g)

    def cmps_stage(s):
        b = bucket_of(hash_key(s, table.hashfun),
                      table.num_buckets).astype(I32)
        b_sorted, Wb = _sort_bucket_ids(b, table.num_buckets)
        return jnp.sum(safe_lookup(table.bucket_len, b_sorted,
                                   W=Wb).astype(jnp.int64))

    row("cmps bucket pass (hash+sort+lookup, 1M)", cmps_stage, skey)
    row("gstart lookup (1M, W=Wk)", lambda gg: safe_lookup(
        table.groups.group_start, gg, W=Wk), g)
    row("expand(counts, 16.8M)", lambda c: expand(c, out_size)[:4], glen)
    row("gst windowed (16.8M, Wp/Cp)", lambda pp: safe_lookup(
        gstart, pp, W=Wp, C=Cp), p_)
    row("group_rows windowed (16.8M, Wr/Cr)",
        lambda a, b: safe_lookup(table.groups.group_rows, a + b,
                                 W=Wr, C=Cr), gst, within)
    row("srow windowed (16.8M, Wp/Cp)", lambda pp: safe_lookup(
        srow, pp, W=Wp, C=Cp), p_)


if __name__ == "__main__":
    main()
