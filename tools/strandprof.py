"""Stage-level decomposition of the keydirect nested probe strand.

tools/roofline.py's strand rows (added for VERDICT r2 item 6) measured the
full keydirect strand at ~987 ms for 2^24 probes over a 2^20-key nested
table -- far above the sum of its parts (~330 ms by the roofline's own
component numbers).  This tool times each stage in isolation on the real
chip (fence-amortized, same harness) so the gap is attributed to a specific
op, not guessed.  Stages mirror ops/strands_windowed.py:
keydirect_nested_strand_sorted line by line.

Run: python tools/strandprof.py [--logp 24] [--logt 20]
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
    from hashjoin3d_tpu.ops.nested import build_nested_host
    from hashjoin3d_tpu.ops.strands_windowed import (
        _keydirect_probe, _miss_chain_cmps, _sort_probes, safe_lookup,
        stride_params, keydirect_nested_strand_sorted)
    from hashjoin3d_tpu.ops.layout import expand
    from hashjoin3d_tpu.ops.scan import engine_multi_scan
    from hashjoin3d_tpu.utils.measure import fence

    P, T = 1 << args.logp, 1 << args.logt
    mt = args.min_time
    rng = np.random.default_rng(11)
    bk32 = rng.permutation(np.arange(T, dtype=np.uint32))
    pk = jnp.asarray(rng.integers(0, T, P, dtype=np.uint32))
    tbl = build_nested_host(jnp.asarray(bk32), T, n_keys=T, key_domain=T)
    fence((tbl.key_direct, pk))
    print(f"P=2^{args.logp} probes, T=2^{args.logt} keys; fence floor "
          f"{fence_floor()*1e3:.1f} ms", flush=True)

    def row(name, fn, *xs, n=P):
        t = timeit(fn, *xs, min_time=mt)
        print(f"  {name:44s} {t*1e3:8.2f} ms  {t*1e9/n:6.3f} ns/elem",
              flush=True)
        return t

    # full strand, for reference
    full = jax.jit(partial(keydirect_nested_strand_sorted, out_size=P))
    row("FULL keydirect strand (unnest)", lambda t, p: full(t, p), tbl, pk)
    full_nu = jax.jit(partial(keydirect_nested_strand_sorted, out_size=P,
                              do_unnest=False))
    row("FULL strand, do_unnest=False", lambda t, p: full_nu(t, p), tbl, pk)

    # stage 1: probe sort (segmented, domain=T)
    sort1 = jax.jit(lambda p: _sort_probes(p, domain=T)[:2])
    skey, srow = sort1(pk)
    fence((skey, srow))
    row("1 _sort_probes (segmented)", sort1, pk)
    sk = skey.astype(I32)

    # stage 2: key_direct windowed lookup + derived streams (the strand's
    # segment-aware window width, ops/sort.py:window_for_chunk)
    from hashjoin3d_tpu.ops.sort import probe_sort_chunk, window_for_chunk
    Wk = window_for_chunk(probe_sort_chunk(P, T), T)
    kd = jax.jit(lambda t, s, k: _keydirect_probe(t, s, k, W=Wk))
    g, hit, glen, pos1, miss_cmps = kd(tbl, sk, skey)
    fence(g)
    row("2 _keydirect_probe (kd+glen+pos1+miss)", kd, tbl, sk, skey)

    kd_only = jax.jit(lambda t, s: safe_lookup(
        (t.key_direct + 1).view(U32), s))
    row("2a key_direct lookup alone", kd_only, tbl, sk)
    glen_only = jax.jit(lambda t, gg: safe_lookup(t.groups.group_len, gg))
    row("2b group_len lookup alone", glen_only, tbl, g)
    miss_only = jax.jit(lambda t, s, h: _miss_chain_cmps(
        t.bucket_main_len, t.num_buckets, s, ~h, t.hashfun))
    row("2c _miss_chain_cmps (cond, 0 misses)", miss_only, tbl, skey, hit)

    # stage 3: counter sums
    sums = jax.jit(lambda h, p1: (jnp.sum(h.astype(jnp.int64)),
                                  jnp.sum(p1.astype(jnp.int64))))
    row("3 counter sums (2x i64)", sums, hit, pos1)

    # stage 4: expand(glen, P) and its pieces
    exp_full = jax.jit(lambda c: expand(c, P)[:3])
    row("4 expand(glen, out=P)", exp_full, glen)
    row("4a cumsum i32", jax.jit(lambda c: jnp.cumsum(c)), glen)

    def heads(c):
        cum = jnp.cumsum(c)
        off = (cum - c).astype(I32)
        tgt = jnp.where(c > 0, off, P)
        rank = jnp.arange(c.shape[0], dtype=I32)
        hp = jnp.full(P, -1, I32).at[tgt].set(rank, mode="drop")
        ho = jnp.full(P, -1, I32).at[tgt].set(off, mode="drop")
        return hp, ho
    hp, ho = jax.jit(heads)(glen)
    fence((hp, ho))
    row("4b cumsum + 2x head scatter", jax.jit(heads), glen)
    row("4c engine_multi_scan 2x cummax", jax.jit(
        lambda a, b: engine_multi_scan((a, b), ("max", "max"))), hp, ho)

    # stage 5: emission lookups
    gstart = jax.jit(lambda t, gg: safe_lookup(t.groups.group_start, gg))
    gst_by_p = gstart(tbl, g)
    fence(gst_by_p)
    row("5a group_start lookup (by g)", gstart, tbl, g)
    Wp, Cp = stride_params(1.0)
    p_ids = jax.jit(lambda c: expand(c, P)[0])(glen)
    fence(p_ids)
    gst_l = jax.jit(lambda v, pp: safe_lookup(v, pp, W=Wp, C=Cp))
    row("5b gstart_by_p lookup (by p)", gst_l, gst_by_p, p_ids)
    row("5c group_rows lookup", jax.jit(
        lambda t, i: safe_lookup(t.groups.group_rows, i)), tbl,
        jax.jit(lambda a, b: a + b)(gst_by_p, jnp.zeros(P, I32)))
    row("5d srow lookup (by p)", gst_l, srow, p_ids)


if __name__ == "__main__":
    main()
