"""URL-seen set: Bloom-filter pre-pass + exact anti-join, with a
cuckoo-filter fallback for deletion semantics.

Reference: the seen set is MongoDB's unique index on ``resources.url``
with duplicate-key errors swallowed on insert
(models/src/Resource.ts:72,101-135). At 10^10-URL scale the Spark
equivalent is a LEFT ANTI JOIN of candidate URLs against the
``resources`` table — expensive if every round shuffles the full seen
set. The Bloom pre-pass (north rule) makes the common case cheap:

1. build/maintain a Bloom filter over all seen URLs (broadcast, a few
   hundred MB at 10^10 keys / 1% fpp, rebuilt incrementally per round);
2. candidates that MISS the Bloom filter are *definitely new* — they
   skip the join entirely;
3. only Bloom HITS (true dupes + ~1% false positives) go through the
   exact anti-join, shrinking the join's probe side by ~the novelty
   rate.

Deletions (the ``resetErrors`` step flag reverts error→unvisited,
models/src/Process/Process.ts:562-664 — and a re-queued URL must be
*fetchable* again but stays in the seen set, so only full removals of
poisoned entries need true deletion) can't be expressed with a Bloom
filter; the cuckoo filter supports delete at the same fpp.

Both filters are pure numpy bit/bucket arrays — picklable, so they
broadcast to executors and are applied inside an Arrow-batched
pandas UDF.

NOTE: no ``from __future__ import annotations`` — the pandas UDF in
``split_by_bloom`` needs real (non-string) type hints for pyspark's
eval-type inference.
"""

import hashlib
import math

import numpy as np


def _h64(value: str, salt: int) -> int:
    digest = hashlib.blake2b(
        value.encode("utf-8"), digest_size=8, salt=salt.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(digest, "little")


class BloomFilter:
    """Plain numpy Bloom filter (k hash functions via salted blake2b)."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.capacity = capacity
        self.fpp = fpp
        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / capacity * math.log(2)))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _positions(self, value: str) -> list[int]:
        h1 = _h64(value, 0)
        h2 = _h64(value, 1) | 1
        return [((h1 + i * h2) % self.m) for i in range(self.k)]

    def add(self, value: str) -> None:
        for pos in self._positions(value):
            self.bits[pos >> 3] |= 1 << (pos & 7)

    def add_many(self, values) -> None:
        for v in values:
            self.add(v)

    def might_contain(self, value: str) -> bool:
        return all(
            self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(value)
        )

    def might_contain_many(self, values) -> np.ndarray:
        return np.fromiter(
            (self.might_contain(v) for v in values), dtype=bool,
            count=len(values),
        )

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        out = BloomFilter.__new__(BloomFilter)
        out.capacity, out.fpp, out.m, out.k = (
            self.capacity, self.fpp, self.m, self.k)
        out.bits = self.bits | other.bits
        return out


class CuckooFilter:
    """Cuckoo filter (2 buckets/key, 4 slots/bucket, 16-bit fingerprints)
    — supports ``delete`` for the error-reset path (SURVEY.md §2.8)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0):
        n_buckets = 1
        while n_buckets * self.SLOTS < capacity * 1.25:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(seed)

    def _fp(self, value: str) -> int:
        fp = _h64(value, 2) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, value: str) -> int:
        return _h64(value, 3) % self.n_buckets

    def _i2(self, i1: int, fp: int) -> int:
        return (i1 ^ _h64(str(fp), 4)) % self.n_buckets

    def _insert_at(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def add(self, value: str) -> bool:
        fp = self._fp(value)
        i1 = self._i1(value)
        i2 = self._i2(i1, fp)
        if self._insert_at(i1, fp) or self._insert_at(i2, fp):
            return True
        i = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(self.SLOTS))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            if self._insert_at(i, fp):
                return True
        raise RuntimeError("cuckoo filter full")

    def might_contain(self, value: str) -> bool:
        fp = self._fp(value)
        i1 = self._i1(value)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, value: str) -> bool:
        fp = self._fp(value)
        for i in (self._i1(value), self._i2(self._i1(value), fp)):
            hits = np.nonzero(self.table[i] == fp)[0]
            if len(hits):
                self.table[i, hits[0]] = 0
                return True
        return False


def split_by_bloom(spark, candidates, url_col: str, bloom: BloomFilter,
                   bc=None):
    """Partition candidate URLs into (definitely_new, maybe_seen) using a
    broadcast Bloom filter inside an Arrow-batched UDF.

    ``definitely_new`` rows skip the exact anti-join; only ``maybe_seen``
    (dupes + fpp false positives) join against the seen-set table.
    Pass ``bc`` (a Broadcast of the same filter) to reuse an existing
    broadcast across calls.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    if bc is None:
        bc = spark.sparkContext.broadcast(bloom)

    @pandas_udf(BooleanType())
    def _might_contain(urls: pd.Series) -> pd.Series:
        f = bc.value
        return pd.Series(f.might_contain_many(urls.tolist()))

    flagged = candidates.withColumn("_maybe_seen", _might_contain(F.col(url_col)))
    definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe_seen = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    return definitely_new, maybe_seen


def bloom_from_dataframe(df, url_col: str, capacity: int,
                         fpp: float = 0.01) -> BloomFilter:
    """Build the seen-set Bloom filter executor-side: each partition
    folds its URLs into a partial filter and partials merge with a
    treeAggregate of bitwise unions. At 10^10 keys this is the only
    viable construction — the driver never materializes the URL set,
    only the final (capacity-sized) bit array.
    """
    cap, f = capacity, fpp

    def seq_op(b: BloomFilter, row) -> BloomFilter:
        v = row[0]
        if v is not None:
            b.add(v)
        return b

    return df.select(url_col).rdd.treeAggregate(
        BloomFilter(cap, f), seq_op, lambda a, b: a.union(b))
