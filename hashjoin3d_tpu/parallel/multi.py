"""Distributed two-join pipeline with deferred unnesting (exp-4, distributed).

The paper's core result (SURVEY.md §0) is that nested tuples let expansion
wait until after later joins have dropped groups.  Distribution amplifies
this: in a partitioned R |><| S |><| T plan the *intermediate* join result
is what crosses the wire, so keeping it nested shrinks the exchange from
|R >< S| expanded pairs to at most one ``(row, group)`` tuple per surviving
probe row.

Here even that exchange disappears: S.a and T.a join R on the SAME key, so
the S- and T-tables are co-partitioned by one hash function and every R row
meets both tables on one shard --

  1. one exchange each routes S rows, T rows and R rows to the key's shard;
  2. shard-locally: probe S (nested), probe T under the S-hit mask (nested),
     unnest T then S -- exactly ``main_experiment4.cc:832-941``'s Ndu strand;
  3. counters psum'd; (r, s, t) global row-id triples materialize per shard.

The chaining control plan (Chj) would expand R><S *before* probing T; its
distributed analogue ships/holds the expanded intermediate, which is the
cost this plan structure avoids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import build_nested
from ..ops.nested import deferred_two_join_strand
from .dist_join import _global_rows
from .mesh import SHARD_AXIS
from .shuffle import partition_exchange


def dist_deferred_two_join(mesh: Mesh, num_buckets_per_shard: int,
                           fk_capacity: int, r_capacity: int,
                           out1_capacity: int, out2_capacity: int,
                           axis: str = SHARD_AXIS):
    """Build a jitted distributed Ndu step: R |><| S |><| T, unnests deferred.

    Returns ``step(r_keys, s_keys, t_keys) -> dict`` with replicated counters
    (num_matches/num_cmps per probe, c_unnest per stage, overflow) and
    shard-local ``(r_row, s_row, t_row)`` global-id triples.  ``fk_capacity``
    bounds each FK side's exchange, ``r_capacity`` the R exchange;
    ``out1_capacity`` the stage-1 (T) expansion, ``out2_capacity`` the final
    result rows per shard.
    """
    ns = mesh.shape[axis]

    def step(r_keys, s_keys, t_keys):
        nr, nsn, ntn = (r_keys.shape[0], s_keys.shape[0], t_keys.shape[0])

        skeys, spay, svalid, sovf = partition_exchange(
            axis, s_keys, {"row": _global_rows(nsn, axis)}, ns, fk_capacity)
        tbl_s = build_nested(skeys, num_buckets_per_shard, valid=svalid)
        tkeys, tpay, tvalid, tovf = partition_exchange(
            axis, t_keys, {"row": _global_rows(ntn, axis)}, ns, fk_capacity)
        tbl_t = build_nested(tkeys, num_buckets_per_shard, valid=tvalid)

        rkeys, rpay, rvalid, rovf = partition_exchange(
            axis, r_keys, {"row": _global_rows(nr, axis)}, ns, r_capacity)

        # probe strand (main_experiment4.cc:832-941), shard-local throughout:
        # both nested batches stay un-expanded through the second probe
        # (shared strand body: ops.nested.deferred_two_join_strand)
        st = deferred_two_join_strand(tbl_s, tbl_t, rkeys, out1_capacity,
                                      out2_capacity, mask=rvalid)
        v2 = st["valid"]

        # local -> global row ids
        r_row = jnp.where(v2, rpay["row"][jnp.maximum(st["r_row"], 0)], -1)
        s_row = jnp.where(v2, spay["row"][jnp.maximum(st["s_row"], 0)], -1)
        t_row = jnp.where(v2, tpay["row"][jnp.maximum(st["t_row"], 0)], -1)

        out_ovf = (jnp.maximum(st["c_unnest_1"] - out1_capacity, 0)
                   + jnp.maximum(st["c_unnest_2"] - out2_capacity, 0))

        return dict(
            c_probe_RS=lax.psum(st["c_probe_RS"], axis),
            c_probe_RS_cmp=lax.psum(st["c_probe_RS_cmp"], axis),
            c_probe_RT=lax.psum(st["c_probe_RT"], axis),
            c_probe_RT_cmp=lax.psum(st["c_probe_RT_cmp"], axis),
            c_unnest_1=lax.psum(st["c_unnest_1"], axis),
            c_top=lax.psum(st["c_unnest_2"], axis),
            overflow=sovf + tovf + rovf + lax.psum(out_ovf, axis),
            r_row=r_row, s_row=s_row, t_row=t_row,
            out_valid=v2,
        )

    specs_in = (P(axis), P(axis), P(axis))
    specs_out = dict(
        c_probe_RS=P(), c_probe_RS_cmp=P(), c_probe_RT=P(),
        c_probe_RT_cmp=P(), c_unnest_1=P(), c_top=P(), overflow=P(),
        r_row=P(axis), s_row=P(axis), t_row=P(axis), out_valid=P(axis),
    )
    return jax.jit(shard_map(step, mesh=mesh, in_specs=specs_in,
                             out_specs=specs_out))
