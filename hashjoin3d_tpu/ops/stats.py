"""Hash-table quality statistics, mirroring ``ht_statistics.{hh,cc}``.

The reference walks every bucket and chain after a build
(``ht_chaining.hh:260-292``, ``ht_nested.hh:450-482``); here the same numbers
fall out of the CSR histograms in one vectorized pass (host-side numpy -- stats
run outside the timed region, exactly as the reference computes them after the
measurement loop).

Semantics notes preserved from the reference:
  * chaining ``num_distinct_keys`` counts distinct *hash values*, not keys
    (the chaining node stores no key accessor, ``ht_chaining.hh:282-283``);
  * collision-chain length counts the directory entry, so non-empty buckets
    have length >= 1; empty buckets contribute 0 to the all-buckets aggregate
    only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils.aggregate import Aggregate
from .hashing import murmur32_np
from .chaining import ChainingTable
from .nested import NestedTable


@dataclass
class HtStatistics:
    num_buckets: int = 0
    num_empty_buckets: int = 0
    num_entries: int = 0
    num_distinct_keys: int = 0
    collision_chain_len: Aggregate = field(default_factory=Aggregate)
    collision_chain_len_nonempty: Aggregate = field(default_factory=Aggregate)

    def num_entries_per_key(self) -> float:
        return self.num_entries / self.num_distinct_keys

    def frac_empty_buckets(self) -> float:
        return self.num_empty_buckets / self.num_buckets

    def print(self, out=None):
        import sys
        out = out or sys.stdout
        cc0, cc1 = self.collision_chain_len, self.collision_chain_len_nonempty
        out.write(
            "HtStatistics:\n"
            f"  #buckets:        {self.num_buckets}\n"
            f"  #empty buckets:  {self.num_empty_buckets}"
            f" ({self.frac_empty_buckets():.6g})\n"
            f"  #entries:        {self.num_entries}\n"
            f"  #distinct keys:  {self.num_distinct_keys}\n"
            f"  chain len (all):      min={cc0.min()} avg={cc0.avg():.6g}"
            f" max={cc0.max()}\n"
            f"  chain len (nonempty): min={cc1.min()} avg={cc1.avg():.6g}"
            f" max={cc1.max()}\n"
        )

    def to_csv_fields(self):
        """The per-plan HT columns of the measurement CSV
        (main_experiment1.cc:719-726)."""
        cc0, cc1 = self.collision_chain_len, self.collision_chain_len_nonempty
        return [
            self.num_buckets,
            self.frac_empty_buckets(),
            float(cc0.avg()),
            cc0.min(),
            cc0.max(),
            float(cc1.avg()),
            cc1.min(),
            cc1.max(),
        ]

    # -- serialization mirroring ht_statistics.cc:40-112 -----------------------

    CSV_HEADER = ("numBuckets;numEmptyBuckets;numEntries;numDistinctKeys;"
                  "cc0_avg;cc0_min;cc0_max;cc1_avg;cc1_min;cc1_max")

    def to_csv_string(self) -> str:
        f = self.to_csv_fields()
        return ";".join(str(v) if not isinstance(v, float) else f"{v:.6g}"
                        for v in [self.num_buckets, self.num_empty_buckets,
                                  self.num_entries, self.num_distinct_keys,
                                  f[2], f[3], f[4], f[5], f[6], f[7]])


@dataclass
class HtBucketStatistics:
    """Per-bucket stats row (``ht_statistics.hh:9-15``)."""

    bucket_index: int
    num_entries: int
    chain_len: int

    CSV_HEADER = "bucketIndex;numEntries;chainLen"

    def to_csv_string(self) -> str:
        return f"{self.bucket_index};{self.num_entries};{self.chain_len}"


def bucket_statistics_chaining(table: ChainingTable):
    """Per-bucket dump: chaining chain length == entries per bucket."""
    blen = np.asarray(table.bucket_len)
    return [HtBucketStatistics(i, int(l), int(l)) for i, l in enumerate(blen)]


def bucket_statistics_nested(table: NestedTable):
    """Per-bucket dump: chain length = #MainNodes; entries = rows in bucket."""
    bml = np.asarray(table.bucket_main_len)
    from .hashing import murmur32_np
    keys = np.asarray(table.keys)
    rows_per_bucket = np.bincount(
        murmur32_np(keys) % np.uint32(table.num_buckets),
        minlength=table.num_buckets)
    return [HtBucketStatistics(i, int(rows_per_bucket[i]), int(bml[i]))
            for i in range(table.num_buckets)]


def _from_chain_lens(chain_lens: np.ndarray, num_entries: int,
                     num_distinct: int) -> HtStatistics:
    s = HtStatistics()
    s.num_buckets = int(chain_lens.size)
    s.num_empty_buckets = int((chain_lens == 0).sum())
    s.num_entries = int(num_entries)
    s.num_distinct_keys = int(num_distinct)
    s.collision_chain_len = Aggregate.from_array(chain_lens)
    s.collision_chain_len_nonempty = Aggregate.from_array(
        chain_lens[chain_lens > 0])
    return s


def chaining_statistics(table: ChainingTable) -> HtStatistics:
    """``HtChaining1::makeStatistics`` equivalent (``ht_chaining.hh:260-292``)."""
    blen = np.asarray(table.bucket_len)
    keys = np.asarray(table.keys)
    ndistinct_hash = np.unique(murmur32_np(keys)).size
    return _from_chain_lens(blen, keys.size, ndistinct_hash)


def nested_statistics(table: NestedTable) -> HtStatistics:
    """``HtNested1::makeStatistics`` equivalent (``ht_nested.hh:450-482``).

    Chain lengths count MainNodes (distinct keys) per bucket; SubNodes are not
    chain entries.
    """
    bml = np.asarray(table.bucket_main_len)
    return _from_chain_lens(bml, table.keys.shape[0], int(table.groups.n_keys))


def chaining_statistics_np(build_keys: np.ndarray,
                           num_buckets: int) -> HtStatistics:
    """Same statistics computed from the raw build keys (host backend path:
    no device table exists).  Equal to :func:`chaining_statistics` of a table
    built from the same keys."""
    bk = np.asarray(build_keys, np.uint32)
    h = murmur32_np(bk)
    blen = np.bincount(h % np.uint32(num_buckets), minlength=num_buckets)
    return _from_chain_lens(blen, bk.size, np.unique(h).size)


def nested_statistics_np(build_keys: np.ndarray,
                         num_buckets: int) -> HtStatistics:
    """Host-backend twin of :func:`nested_statistics`."""
    bk = np.asarray(build_keys, np.uint32)
    uk = np.unique(bk)
    bml = np.bincount(murmur32_np(uk) % np.uint32(num_buckets),
                      minlength=num_buckets)
    return _from_chain_lens(bml, bk.size, uk.size)
