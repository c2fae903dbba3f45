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

from ..ops import build_nested, probe_nested
from ..ops.layout import I32, expand
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
        rs = probe_nested(tbl_s, rkeys, mask=rvalid)
        rst = probe_nested(tbl_t, rkeys, mask=rs.hit)

        both = rst.hit
        t_counts = jnp.where(both, rst.group_len, 0)
        p1, w1, v1, n_un1, gst_t, gs1 = expand(
            t_counts, out1_capacity,
            (tbl_t.groups.group_start[rst.g], jnp.where(both, rs.g, 0)))
        t_row_l = tbl_t.groups.group_rows[gst_t + w1]

        s_counts = jnp.where(v1, tbl_s.groups.group_len[gs1], 0)
        p2, w2, v2, n_un2, gst_s, t_prop, r_prop = expand(
            s_counts, out2_capacity,
            (tbl_s.groups.group_start[gs1],
             jnp.where(v1, t_row_l, 0),
             jnp.where(v1, p1, 0)))
        s_row_l = tbl_s.groups.group_rows[gst_s + w2]

        # local -> global row ids
        r_row = jnp.where(v2, rpay["row"][jnp.maximum(r_prop, 0)], -1)
        s_row = jnp.where(v2, spay["row"][jnp.maximum(s_row_l, 0)], -1)
        t_row = jnp.where(v2, tpay["row"][jnp.maximum(t_prop, 0)], -1)

        out_ovf = (jnp.maximum(n_un1.astype(jnp.int64) - out1_capacity, 0)
                   + jnp.maximum(n_un2.astype(jnp.int64) - out2_capacity, 0))

        return dict(
            c_probe_RS=lax.psum(rs.num_matches, axis),
            c_probe_RS_cmp=lax.psum(rs.num_cmps, axis),
            c_probe_RT=lax.psum(rst.num_matches, axis),
            c_probe_RT_cmp=lax.psum(rst.num_cmps, axis),
            c_unnest_1=lax.psum(n_un1.astype(jnp.int64), axis),
            c_top=lax.psum(n_un2.astype(jnp.int64), axis),
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
