"""Filter (selection) and stream compaction.

The vectorized counterpart of ``AlgSelection`` / ``AlgDynSelection``
(``algebra.hh:279-358``): predicates are traced callables over column dicts
producing liveness masks; masks flow through probes/builds (every operator
accepts one) so filtered pipelines never materialize intermediate copies.
``compact`` materializes a masked batch densely when a downstream consumer
needs contiguous rows (e.g. before a host transfer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layout import I32


def apply_predicate(pred, columns: dict, mask: jax.Array | None = None):
    """Evaluate ``pred(columns) -> bool[n]`` and conjoin with an input mask."""
    sel = pred(columns)
    return sel if mask is None else (sel & mask)


@partial(jax.jit, static_argnames=("out_size",))
def compact(mask: jax.Array, columns: dict, out_size: int):
    """Dense-pack live rows into ``out_size`` slots (prefix sum + scatter).

    Returns ``(packed_columns, row_ids, count)``; slots past ``count`` hold the
    fill pattern (-1 for the row ids).
    """
    n = mask.shape[0]
    m = mask.astype(I32)
    off = (jnp.cumsum(m) - m).astype(I32)
    count = jnp.sum(m.astype(jnp.int64))
    tgt = jnp.where(mask, off, out_size)
    row_ids = jnp.full(out_size, -1, I32).at[tgt].set(
        jnp.arange(n, dtype=I32), mode="drop")
    packed = {
        k: jnp.zeros(out_size, v.dtype).at[tgt].set(v, mode="drop")
        for k, v in columns.items()
    }
    return packed, row_ids, count
