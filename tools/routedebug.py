"""Attribute a route_worst regression to a specific safe_lookup.

Runs one probe strand with strands_windowed.ROUTE_VERBOSE on and prints
each lookup's (route, nbad) in trace order.  Round-5 use: the Crs strand
at -R 21 -S 25 reports route_worst=1 / nbad=38 (artifacts/r5/exp1_25.log);
this names the marginal stream so its window can be widened instead of
blanket-allowing patched routes.

Run: python tools/routedebug.py [--logr 21] [--logs 25] [--plan Crs]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logr", type=int, default=21)
    ap.add_argument("--logs", type=int, default=25)
    ap.add_argument("--plan", default="Crs",
                    choices=["Crs", "Csr", "Nrs", "NrsNU"])
    args = ap.parse_args()

    import jax
    import numpy as np

    from hashjoin3d_tpu.ops import strands_windowed as sw
    from hashjoin3d_tpu.ops.chaining import (build_chaining_host,
                                             can_use_dense_direct)
    from hashjoin3d_tpu.ops.nested import build_nested_host
    from hashjoin3d_tpu.utils import exp1_data
    from hashjoin3d_tpu.utils.measure import fence

    sw.ROUTE_VERBOSE = True
    jax.clear_caches()

    card_r, card_s = 1 << args.logr, 1 << args.logs
    rk, sa, ndv = exp1_data(args.logr, args.logs, False, 0)
    dd_r = can_use_dense_direct(rk, card_r)

    if args.plan in ("Crs",):
        tbl = build_chaining_host(jax.device_put(sa), ndv,
                                  n_keys=ndv, key_domain=card_r,
                                  early_exit_index=False)
        fence(tbl.key_direct)
        out = sw.keydirect_chaining_strand_sorted(
            tbl, jax.device_put(rk), card_s, probes_permutation=dd_r)
    elif args.plan == "Csr":
        tbl = build_chaining_host(jax.device_put(rk), card_r,
                                  dense_direct=dd_r)
        fence(tbl.direct)
        out = sw.direct_probe_strand_sorted(tbl, jax.device_put(sa),
                                            unique=True)
    else:
        tbl = build_nested_host(jax.device_put(sa), ndv, key_domain=card_r)
        fence(tbl.key_direct)
        out = sw.keydirect_nested_strand_sorted(
            tbl, jax.device_put(rk), card_s,
            do_unnest=(args.plan == "Nrs"), probes_permutation=dd_r)

    n = len([k for k in out if k.startswith("route_i_")
             and not k.endswith("_nbad")])
    print(f"plan {args.plan}: route_worst={int(out['route_worst'])} "
          f"nbad={int(out['route_nbad'])}; {n} recorded lookups:")
    for i in range(n):
        r = int(out[f"route_i_{i}"])
        b = int(out[f"route_i_{i}_nbad"])
        flag = "  <-- " + ("PATCHED" if r == 1 else "GATHER") if r else ""
        print(f"  lookup {i:2d}: route={r} nbad={b}{flag}")


if __name__ == "__main__":
    main()
