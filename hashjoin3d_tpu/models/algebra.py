"""Composable physical algebra over columnar relations.

The user-facing query API, re-designed from the reference's templated
push-based algebra (``algebra.hh:14-34``): the same operator vocabulary --
Scan, Selection, DynSelection, HashJoinBuild/Probe (chaining),
NestJoinBuild/Probe (3D), UnnestHt, Top -- wired into the same two/three-strand
plan shapes, but each operator is a *whole-column* transform over a
:class:`Batch` instead of a per-tuple ``step()``.  A plan executes by running
its build strands, then the probe strand; every operator keeps the reference's
observability surface (``count``, inclusive runtime, ``runs``; ``print_strand``
/ ``get_runtime_excl``, ``algebra.hh:127-162``).

Where the reference resolves tuple types, hash functions and predicates at
compile time through C++20 concepts (``concepts.hh:22-86``), here they are
plain callables over column dicts, traced by JAX on first execution:

  * predicate (``alg_predicate_c``):  ``lambda cols: cols["b"] < 40``
  * key extractor (``alg_hashfun_c``): a column name or ``lambda cols: ...``
  * concat/unnest functions are replaced by explicit column prefixes -- the
    output batch carries gathered columns from both sides.

This layer favors clarity and composability (one device sync per operator to
surface counts); the fused experiment pipelines in ``models/exp1.py`` /
``models/exp4.py`` are the performance path.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    build_chaining,
    build_nested,
    materialize_chaining_join,
    probe_chaining,
    probe_nested,
    unnest,
)


# -- storage -------------------------------------------------------------------

class Relation:
    """Columnar relation: named equal-length device columns (``RelationRS``
    equivalent, ``algebra.hh:98-106``)."""

    def __init__(self, **columns):
        lens = {len(v) for v in columns.values()}
        assert len(lens) == 1, "columns must have equal length"
        self.columns = {k: jnp.asarray(v) for k, v in columns.items()}
        self.card = lens.pop()

    def __repr__(self):
        return f"Relation({', '.join(self.columns)}; card={self.card})"


@dataclass
class Nest:
    """One nested attribute: per-row duplicate-group ids into a 3D table.

    The vectorized ``MainNode*`` of a nested tuple (``algebra.hh:404-473``);
    a batch may carry several (e.g. experiment 4's nested_tuple_RST carries
    both an S and a T group, ``main_experiment4.cc:407-412``).
    """

    group: jax.Array          # i32[n] group id per row (valid where batch.mask)
    table: object             # NestedTable owning the groups
    build_batch: "Batch"      # build-side batch (for unnest column emission)


@dataclass
class Batch:
    """A whole-column tuple stream: columns + liveness mask + named nests.

    ``mask=None`` means all rows live.
    """

    columns: dict
    mask: jax.Array | None = None
    nests: dict = field(default_factory=dict)

    @property
    def n(self):
        return next(iter(self.columns.values())).shape[0]

    def live_count(self) -> int:
        if self.mask is None:
            return self.n
        return int(jnp.sum(self.mask))


@dataclass
class GlobStat0:
    """Global plan-state knobs (``algebra.hh:118-123``; unused there too)."""

    ht_num_buckets: int = 0
    ht_rsv_log2_chunksize_main: int = 0
    ht_rsv_log2_chunksize_sub: int = 0
    ht_rsv_log2_chunksize: int = 0


# -- operator base ----------------------------------------------------------------

class AlgBase:
    """Counter/timer surface shared by all operators (``algebra.hh:166-200``)."""

    def __init__(self, name):
        self._name = name
        self._count = 0
        self._ok = True
        self._runs = 0
        self._t0 = self._t1 = 0.0

    def reset(self):
        self._count = 0
        self._ok = True
        self._runs += 1
        self._t0 = time.perf_counter()

    def stop_timer(self):
        self._t1 = time.perf_counter()

    @property
    def name(self):
        return self._name

    def count(self):
        return self._count

    def ok(self):
        return self._ok

    def runs(self):
        return self._runs

    def runtime(self) -> float:
        """Inclusive runtime in seconds (includes downstream operators,
        exactly like the reference's, ``algebra.hh:186-189``)."""
        return self._t1 - self._t0

    def consumer(self):
        return getattr(self, "_consumer", None)


def get_runtime_excl(op: AlgBase) -> float:
    """Approximate exclusive runtime; inaccurate under fusion exactly as the
    reference warns for pipelining (``algebra.hh:127-138``)."""
    c = op.consumer()
    return op.runtime() - (c.runtime() if c is not None else 0.0)


def print_strand(op, indent=0, out=None):
    """Top-down operator dump: name|count|excl-runtime|runs
    (``algebra.hh:148-162``)."""
    out = out or sys.stdout
    c = op.consumer()
    if c is not None:
        print_strand(c, indent, out)
    out.write("  " * indent +
              f"{op.name}|{op.count()}|{get_runtime_excl(op)*1e3:.3f} ms|"
              f"{op.runs()}\n")


# -- sinks and sources -------------------------------------------------------------

class AlgTop(AlgBase):
    """Plan root: counts (and optionally prints) result tuples
    (``algebra.hh:204-243``).  Keeps the final batch for inspection."""

    def __init__(self, out=None, print_result=False, print_fun=None):
        super().__init__("AlgTop")
        self._out = out or sys.stdout
        self.print_result = print_result
        self._print_fun = print_fun or (lambda row, o: o.write(repr(row)))
        self.result: Batch | None = None

    def consume(self, batch: Batch, gs):
        self.reset()
        self.result = batch
        self._count = batch.live_count()
        if self.print_result and self.runs() == 1:
            cols = {k: np.asarray(v) for k, v in batch.columns.items()}
            mask = np.asarray(batch.mask) if batch.mask is not None else None
            for i in range(batch.n):
                if mask is None or mask[i]:
                    self._print_fun({k: v[i] for k, v in cols.items()},
                                    self._out)
                    self._out.write("\n")
        self.stop_timer()


class AlgScan(AlgBase):
    """Producer: streams a relation into its consumer (``algebra.hh:247-275``).

    One ``consume`` with the whole column set replaces the per-tuple loop."""

    def __init__(self, consumer, relation: Relation):
        super().__init__("AlgScan")
        self._consumer = consumer
        self._relation = relation

    def run(self, gs=None):
        self.reset()
        self._count = self._relation.card
        self._consumer.consume(Batch(dict(self._relation.columns)), gs)
        self.stop_timer()


# -- filters ------------------------------------------------------------------------

class AlgSelection(AlgBase):
    """Static-predicate filter (``algebra.hh:279-315``): the predicate is a
    traced callable over the column dict, fixed at plan build time."""

    def __init__(self, consumer, predicate):
        super().__init__("AlgSelection")
        self._consumer = consumer
        self._pred = predicate

    def consume(self, batch: Batch, gs):
        self.reset()
        sel = self._pred(batch.columns)
        mask = sel if batch.mask is None else (sel & batch.mask)
        out = Batch(batch.columns, mask, dict(batch.nests))
        self._count = out.live_count()
        self._consumer.consume(out, gs)
        self.stop_timer()


class AlgDynSelection(AlgSelection):
    """Runtime-predicate filter (``algebra.hh:319-358``); same columnar
    semantics, the predicate object is supplied per instance."""

    def __init__(self, consumer, predicate):
        super().__init__(consumer, predicate)
        self._name = "AlgDynSelection"


# -- chaining hash join ---------------------------------------------------------------

class AlgHashJoinBuild(AlgBase):
    """Chaining-table build (``algebra.hh:556-586``)."""

    def __init__(self, key, num_buckets: int, relation: Relation = None,
                 hashfun="murmur"):
        super().__init__("AlgHashJoinBuild")
        self._key = key if callable(key) else (lambda cols: cols[key])
        self.num_buckets = num_buckets
        self.hashfun = hashfun  # pluggable Thashfun (ht_chaining.hh:236-248)
        self.build_batch: Batch | None = None
        self.table = None

    def consume(self, batch: Batch, gs):
        self.reset()
        keys = self._key(batch.columns)
        self.table = build_chaining(keys, self.num_buckets, valid=batch.mask,
                                    hashfun=self.hashfun)
        self.build_batch = batch
        self._count = batch.live_count()
        self.stop_timer()

    def hashtable(self):
        return self.table

    def clear_ht(self):
        self.table = None


class AlgHashJoinProbe(AlgBase):
    """Chaining-table probe (``algebra.hh:589-672``): emits one concatenated
    output row per match, columns prefixed ``l.``/``r.`` (the concat-fun
    equivalent).  ``unique`` is IsBuildKeyUnique."""

    def __init__(self, consumer, build_op: AlgHashJoinBuild, key,
                 unique: bool = False, lprefix: str = "l.", rprefix: str = "r.",
                 residual=None):
        super().__init__("AlgHashJoinProbe")
        self._consumer = consumer
        self._build = build_op
        self._key = key if callable(key) else (lambda cols: cols[key])
        self._unique = unique
        self._lp, self._rp = lprefix, rprefix
        # Residual join predicate (``alg_binary_predicate_c``,
        # concepts.hh:49-56): ``residual(probe_cols, build_cols) -> bool``
        # over the matched pairs' columns.  Applied as a post-filter on the
        # hash-equality matches (the reference evaluates it inside the
        # chain walk, algebra.hh:647-648): _count reflects SURVIVING pairs,
        # num_cmps still counts hash-chain comparisons.
        self._residual = residual
        self.num_cmps = 0

    def consume(self, batch: Batch, gs):
        self.reset()
        table = self._build.hashtable()
        keys = self._key(batch.columns)
        res = probe_chaining(table, keys, unique=self._unique, mask=batch.mask)
        self._count = int(res.num_matches)
        self.num_cmps = int(res.num_cmps)
        out_size = max(1, 1 << (self._count - 1).bit_length())
        prow, brow, valid, _ = materialize_chaining_join(
            table, res, out_size, unique=self._unique)
        pr = jnp.maximum(prow, 0)
        br = jnp.maximum(brow, 0)
        if self._residual is not None:
            pcols = {k: v[pr] for k, v in batch.columns.items()}
            bcols = {k: v[br]
                     for k, v in self._build.build_batch.columns.items()}
            valid = valid & jnp.asarray(self._residual(pcols, bcols), bool)
            self._count = int(jnp.sum(valid.astype(jnp.int32)))
        cols = {self._lp + k: v[pr] for k, v in batch.columns.items()}
        cols.update({self._rp + k: v[br]
                     for k, v in self._build.build_batch.columns.items()})
        self._consumer.consume(Batch(cols, valid), gs)
        self.stop_timer()


# -- 3D (nested) hash join ---------------------------------------------------------------

class AlgNestJoinBuild(AlgBase):
    """3D-table build (``algebra.hh:362-401``)."""

    def __init__(self, key, num_buckets: int, hashfun="murmur"):
        super().__init__("AlgNestJoinBuild")
        self._key = key if callable(key) else (lambda cols: cols[key])
        self.num_buckets = num_buckets
        self.hashfun = hashfun  # pluggable Thashfun (ht_nested.hh:355-363)
        self.build_batch: Batch | None = None
        self.table = None

    def consume(self, batch: Batch, gs):
        self.reset()
        keys = self._key(batch.columns)
        self.table = build_nested(keys, self.num_buckets, valid=batch.mask,
                                  hashfun=self.hashfun)
        self.build_batch = batch
        self._count = batch.live_count()
        self.stop_timer()

    def hashtable(self):
        return self.table

    def clear_ht(self):
        self.table = None


class AlgNestJoinProbe(AlgBase):
    """3D-table probe (``algebra.hh:404-473``): emits at most one *nested*
    tuple per probe row -- the output batch keeps the probe columns and a
    ``group`` column naming the matched duplicate group."""

    def __init__(self, consumer, build_op: AlgNestJoinBuild, key,
                 nest: str = "nest"):
        super().__init__("AlgNestJoinProbe")
        self._consumer = consumer
        self._build = build_op
        self._key = key if callable(key) else (lambda cols: cols[key])
        self._nest = nest
        self.num_cmps = 0

    def consume(self, batch: Batch, gs):
        self.reset()
        table = self._build.hashtable()
        keys = self._key(batch.columns)
        res = probe_nested(table, keys, mask=batch.mask)
        self._count = int(res.num_matches)
        self.num_cmps = int(res.num_cmps)
        nests = dict(batch.nests)
        nests[self._nest] = Nest(res.g, table, self._build.build_batch)
        out = Batch(batch.columns, res.hit, nests)
        self._consumer.consume(out, gs)
        self.stop_timer()


class AlgUnnestHt(AlgBase):
    """Unnest (``algebra.hh:476-552``): expands each nested tuple into one
    output row per duplicate, [MainNode row, then SubNodes LIFO] order."""

    def __init__(self, consumer, nest: str = "nest",
                 lprefix: str = "", rprefix: str = "r.", residual=None):
        super().__init__("AlgUnnest")
        self._consumer = consumer
        self._nest = nest
        self._lp, self._rp = lprefix, rprefix
        # Residual pair predicate for nested plans: nested probes emit group
        # handles, so the pair-level filter (concepts.hh:49-56) applies at
        # expansion, over (probe cols, build cols) of each unnested pair.
        self._residual = residual

    def consume(self, batch: Batch, gs):
        self.reset()
        nest = batch.nests[self._nest]
        table = nest.table
        mask = batch.mask if batch.mask is not None else jnp.ones(batch.n, bool)
        glen = jnp.where(mask, table.groups.group_len[nest.group], 0)
        total = int(jnp.sum(glen))
        out_size = max(1, 1 << (total - 1).bit_length())
        from ..ops.nested import NestedBatch
        nb = NestedBatch(
            probe_row=jnp.arange(batch.n, dtype=jnp.int32),
            g=nest.group, hit=mask, group_len=glen,
            num_matches=jnp.int64(0), num_cmps=jnp.int64(0))
        prow, brow, valid, n_out = unnest(table, nb, out_size)
        self._count = int(n_out)
        pr = jnp.maximum(prow, 0)
        br = jnp.maximum(brow, 0)
        if self._residual is not None:
            pcols = {k: v[pr] for k, v in batch.columns.items()}
            bcols = {k: v[br]
                     for k, v in nest.build_batch.columns.items()}
            valid = valid & jnp.asarray(self._residual(pcols, bcols), bool)
            self._count = int(jnp.sum(valid.astype(jnp.int32)))
        cols = {self._lp + k: v[pr] for k, v in batch.columns.items()}
        cols.update({self._rp + k: v[br]
                     for k, v in nest.build_batch.columns.items()})
        # remaining nests stay nested: re-gather their group ids per output row
        nests = {name: Nest(nst.group[pr], nst.table, nst.build_batch)
                 for name, nst in batch.nests.items() if name != self._nest}
        out = Batch(cols, valid, nests)
        self._consumer.consume(out, gs)
        self.stop_timer()


# -- strand fusion -----------------------------------------------------------------

def _strand_ops(scan: AlgScan):
    """The operator chain from a scan's consumer down to (incl.) AlgTop."""
    ops = []
    op = scan._consumer
    while op is not None:
        ops.append(op)
        op = op.consumer()
    return ops


def compile_strand(scan: AlgScan, out_sizes: dict | None = None,
                   growth: int = 2):
    """Fuse a composed probe strand into ONE jitted device program.

    The interpreted algebra executes one operator at a time with a host
    sync per expanding operator (match counts size the output buffers) --
    clear, but a composed plan can never run as a single fused device
    program.  ``compile_strand`` closes that gap: it walks the strand from
    ``scan`` to its ``AlgTop``, assigns every expanding operator a STATIC
    output capacity, traces the whole chain as one pure function, and
    returns a zero-argument callable that runs the strand end-to-end in
    one dispatch (one device sync total, at the end, to surface counters).

    Capacities come from, in priority order: ``out_sizes[op]`` (explicit),
    the operator's count from a prior interpreted run rounded up to a
    power of two ("profile-then-fuse" -- run the plan once interpreted,
    then compile), or ``growth * input_size`` as a last resort.  Results
    are exact whenever capacities suffice; each expanding operator's true
    total is returned alongside, and the callable raises if any capacity
    was exceeded (counters stay exact; rows would have been truncated).

    Build strands run (interpreted) before compilation -- their tables are
    inputs to the fused function, not baked-in constants, so rebuilt
    tables of the same shape reuse the compiled program.
    """
    ops = _strand_ops(scan)
    assert ops and isinstance(ops[-1], AlgTop), "strand must end in AlgTop"
    out_sizes = out_sizes or {}

    def capacity(op, n_in):
        if op in out_sizes:
            return max(int(out_sizes[op]), 1)
        if op.count() > 0:
            return max(1, 1 << (int(op.count()) - 1).bit_length())
        return max(1, growth * n_in)

    # static capacity per expanding op (resolved at compile time)
    caps = {}
    n = scan._relation.card
    for op in ops:
        if isinstance(op, (AlgHashJoinProbe, AlgUnnestHt)):
            caps[id(op)] = n = capacity(op, n)

    # gather the non-constant inputs: tables + build-side columns
    aux = {}
    for op in ops:
        if isinstance(op, AlgHashJoinProbe):
            aux[f"t{id(op)}"] = op._build.hashtable()
            aux[f"b{id(op)}"] = dict(op._build.build_batch.columns)
        elif isinstance(op, AlgNestJoinProbe):
            aux[f"t{id(op)}"] = op._build.hashtable()
            aux[f"b{id(op)}"] = dict(op._build.build_batch.columns)

    def run_fused(columns, aux):
        batch = Batch(dict(columns))
        counters = {}
        for op in ops:
            oid = id(op)
            if isinstance(op, AlgTop):
                m = (jnp.sum(batch.mask.astype(jnp.int64))
                     if batch.mask is not None else jnp.int64(batch.n))
                counters[f"count{oid}"] = m
            elif isinstance(op, AlgSelection):  # covers AlgDynSelection
                sel = op._pred(batch.columns)
                mask = sel if batch.mask is None else (sel & batch.mask)
                batch = Batch(batch.columns, mask, dict(batch.nests))
                counters[f"count{oid}"] = jnp.sum(mask.astype(jnp.int64))
            elif isinstance(op, AlgHashJoinProbe):
                table = aux[f"t{oid}"]
                keys = op._key(batch.columns)
                res = probe_chaining(table, keys, unique=op._unique,
                                     mask=batch.mask)
                prow, brow, valid, total = materialize_chaining_join(
                    table, res, caps[oid], unique=op._unique)
                pr, br = jnp.maximum(prow, 0), jnp.maximum(brow, 0)
                cols = {op._lp + k: v[pr] for k, v in batch.columns.items()}
                cols.update({op._rp + k: v[br]
                             for k, v in aux[f"b{oid}"].items()})
                nests = {name: Nest(nst.group[pr], nst.table, nst.build_batch)
                         for name, nst in batch.nests.items()}
                batch = Batch(cols, valid, nests)
                counters[f"count{oid}"] = res.num_matches
                counters[f"cmps{oid}"] = res.num_cmps
                counters[f"total{oid}"] = total
            elif isinstance(op, AlgNestJoinProbe):
                table = aux[f"t{oid}"]
                keys = op._key(batch.columns)
                res = probe_nested(table, keys, mask=batch.mask)
                nests = dict(batch.nests)
                nests[op._nest] = Nest(res.g, table,
                                       Batch(aux[f"b{oid}"]))
                batch = Batch(batch.columns, res.hit, nests)
                counters[f"count{oid}"] = res.num_matches
                counters[f"cmps{oid}"] = res.num_cmps
            elif isinstance(op, AlgUnnestHt):
                nest = batch.nests[op._nest]
                table = nest.table
                mask = (batch.mask if batch.mask is not None
                        else jnp.ones(batch.n, bool))
                glen = jnp.where(mask, table.groups.group_len[nest.group], 0)
                from ..ops.nested import NestedBatch
                nb = NestedBatch(
                    probe_row=jnp.arange(batch.n, dtype=jnp.int32),
                    g=nest.group, hit=mask, group_len=glen,
                    num_matches=jnp.int64(0), num_cmps=jnp.int64(0))
                prow, brow, valid, n_out = unnest(table, nb, caps[oid])
                pr, br = jnp.maximum(prow, 0), jnp.maximum(brow, 0)
                cols = {op._lp + k: v[pr] for k, v in batch.columns.items()}
                cols.update({op._rp + k: v[br]
                             for k, v in nest.build_batch.columns.items()})
                nests = {name: Nest(nst.group[pr], nst.table, nst.build_batch)
                         for name, nst in batch.nests.items()
                         if name != op._nest}
                batch = Batch(cols, valid, nests)
                counters[f"count{oid}"] = n_out
                counters[f"total{oid}"] = n_out
            else:
                raise NotImplementedError(
                    f"compile_strand: unsupported operator {op.name}")
        out_cols = dict(batch.columns)
        out_mask = (batch.mask if batch.mask is not None
                    else jnp.ones(batch.n, bool))
        return out_cols, out_mask, counters

    fused = jax.jit(run_fused)

    def run():
        """Execute the fused strand; fills every operator's counters and
        the AlgTop result; returns the AlgTop.  One device sync."""
        for op in ops:
            op.reset()
        cols, mask, counters = fused(dict(scan._relation.columns), aux)
        counters = jax.device_get(counters)
        scan._count = scan._relation.card
        top = ops[-1]
        for op in ops:
            oid = id(op)
            if f"count{oid}" in counters:
                op._count = int(counters[f"count{oid}"])
            if f"cmps{oid}" in counters:
                op.num_cmps = int(counters[f"cmps{oid}"])
            if oid in caps and int(counters[f"total{oid}"]) > caps[oid]:
                raise ValueError(
                    f"{op.name}: fused capacity {caps[oid]} exceeded "
                    f"(true total {int(counters[f'total{oid}'])}); re-run "
                    f"interpreted or pass a larger out_sizes hint")
            op.stop_timer()
        top.result = Batch(cols, mask)
        scan.stop_timer()
        return top

    return run
