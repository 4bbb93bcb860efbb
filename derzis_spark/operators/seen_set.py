"""URL-seen set: Bloom-filter pre-pass + exact anti-join, with a
cuckoo-filter fallback for deletion semantics.

Reference: the seen set is MongoDB's unique index on ``resources.url``
with duplicate-key errors swallowed on insert
(models/src/Resource.ts:72,101-135). At 10^10-URL scale the Spark
equivalent is a LEFT ANTI JOIN of candidate URLs against the
``resources`` table — expensive if every round shuffles the full seen
set. The Bloom pre-pass (north rule) makes the common case cheap:

1. build/maintain a Bloom filter over all seen URLs (broadcast ONCE per
   filter version, a few hundred MB at 10^10 keys / 1% fpp, maintained
   incrementally per checkpoint);
2. candidates that MISS the Bloom filter are *definitely new* — they
   skip the join entirely;
3. only Bloom HITS (true dupes + ~1% false positives) go through the
   exact anti-join, shrinking the join's probe side by ~the novelty
   rate.

Design (r3): the hot path has ZERO per-row Python and ZERO plan
literals. String hashing happens JVM-side (``xxhash64`` inside
whole-stage codegen); the filter itself is a numpy uint64 word array
addressed with Kirsch-Mitzenmacher double hashing, so both build and
probe are k vectorized array ops per Arrow batch. The bit array is
shipped with ``sparkContext.broadcast`` exactly once per filter version
(old broadcasts are unpersisted on invalidation). An earlier r3 draft
used the catalyst ``BloomFilterMightContain`` expression over a
serialized-sketch *literal* — rejected after measurement: every job
re-serializes the sketch into its task binary, and the accumulated
broadcast/literal copies (one per Spark job) thrashed a long-running
driver into full-GC livelock. A broadcast variable costs one transfer
per executor per version instead of one per job.

Sizing at the top of the north rule's range: 10^10 keys × ~9.6
bits/key (1% fpp) is ~12 GB of words — past the 8 GB broadcast limit
and too big for one executor. The design at that scale is R range
shards of one filter: shard s holds the keys whose ``xxhash64`` falls
in its range, the probe side repartitions by the same hash ranges, and
each task loads only its ~words/R shard (the partial-union build below
already produces exactly these shards if the fold keys are
range-partitioned first). Down a tier, capacity overflow degrades
gracefully instead of breaking: fpp rises, so the exact join behind
every probe just sees a bigger probe side — correctness never depends
on the sizing.

Deletions (the ``resetErrors`` step flag reverts error→unvisited,
models/src/Process/Process.ts:562-664 — and a re-queued URL must be
*fetchable* again but stays in the seen set, so only full removals of
poisoned entries need true deletion) can't be expressed with a Bloom
filter; the cuckoo filter supports delete at the same fpp.

NOTE: no ``from __future__ import annotations`` — the pandas UDF in
``BloomFilter.might_contain`` needs real (non-string) type hints for
pyspark's eval-type inference.
"""

import hashlib
import math

import numpy as np

#: odd 64-bit mixing constant (golden-ratio) for the second hash of the
#: Kirsch-Mitzenmacher double-hashing scheme
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (avalanche). Without it the
    power-of-two ``& mask`` addressing uses only the LOW log2(m) bits
    of the input hash for EVERY probe (both h1 and h1·odd share their
    low bits), so two keys colliding in those bits collide in all k
    probes and the measured fpp degrades to ~n/m regardless of k —
    found by tests/test_property_seen_set.py (measured 7.7% vs the
    requested 1% at 20k keys). The finalizer folds the high bits down
    so the probe family sees the full 64 bits."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k) — m rounded UP to a power of two so bit addressing
    is a mask, k from the standard optimum for the requested fpp."""
    m_req = max(1024, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = 1
    while m < m_req:
        m <<= 1
    k = max(1, round(m / capacity * math.log(2)))
    return m, min(k, 16)


def _bit_positions(m: int, k: int, hashes: np.ndarray):
    """Yield (word_idx, bit_mask) arrays for each of the k probes —
    pure vectorized uint64 arithmetic, no per-row anything."""
    raw = hashes.astype(np.int64, copy=False).view(np.uint64)
    h1 = _mix64(raw)
    # h2 must be INDEPENDENT of h1's low bits: h1·odd shares its low
    # log2(m) bits with h1 under the power-of-two mask, which would
    # make every low-bit h1 collision a full k-probe collision — so h2
    # is a second avalanche of the raw hash under a different constant
    h2 = _mix64(raw ^ _MIX) | np.uint64(1)
    mask = np.uint64(m - 1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        yield (idx >> np.uint64(6)).astype(np.int64), \
            np.uint64(1) << (idx & np.uint64(63))


class BloomFilter:
    """Vectorized Bloom filter over JVM ``xxhash64`` values.

    The driver/executors only ever hold the fixed-size uint64 word
    array; all string hashing is Spark's codegen'd ``xxhash64``. Build
    is one ``mapInArrow`` job producing per-partition partial word
    arrays OR-folded on the driver (n_partitions × m/8 bytes — for a
    10^10-key filter fold partials pairwise executor-side instead,
    same associative union)."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        self.capacity = int(capacity)
        self.fpp = float(fpp)
        self.m, self.k = _bloom_params(self.capacity, self.fpp)
        self.words = np.zeros(self.m // 64, dtype=np.uint64)
        self._spark = None
        self._bc = None  # broadcast of (m, k, words), one per version

    # -- core vectorized ops (driver or executor side) -----------------
    def add_hashes(self, hashes: np.ndarray) -> None:
        for w_idx, bit in _bit_positions(self.m, self.k, hashes):
            np.bitwise_or.at(self.words, w_idx, bit)

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        ok = np.ones(len(hashes), dtype=bool)
        for w_idx, bit in _bit_positions(self.m, self.k, hashes):
            ok &= (self.words[w_idx] & bit) != 0
        return ok

    def union(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.words |= other.words
        self._invalidate()
        return self

    # -- Spark integration --------------------------------------------
    # key columns may be names or Column expressions; multi-column keys
    # hash through one codegen'd ``xxhash64(c1, c2, …)`` (null columns
    # are skipped by Spark's hash — a (a,null)/(null,a) collision is
    # just another false positive, verified by the exact join behind
    # every probe; identical key tuples always hash identically, so no
    # false negatives)
    @classmethod
    def build(cls, spark, df, *key_cols, capacity: int,
              fpp: float = 0.01) -> "BloomFilter":
        """One executor-side job: xxhash64 in codegen → per-partition
        partial word arrays folded per Arrow batch → driver ORs the
        fixed-size partials. No key (or hash) set ever materializes on
        the driver."""
        bf = cls(capacity, fpp)
        bf._spark = spark
        bf._fold_df(df, *key_cols)
        return bf

    def _fold_df(self, df, *key_cols) -> None:
        import pyarrow as pa
        from pyspark.sql import functions as F

        m, k, cap, fpp = self.m, self.k, self.capacity, self.fpp

        def fold(batches):
            part = BloomFilter(cap, fpp)
            assert (part.m, part.k) == (m, k)
            for batch in batches:
                arr = batch.column(0).to_numpy(zero_copy_only=False)
                part.add_hashes(arr)
            yield pa.RecordBatch.from_arrays(
                [pa.array([part.words.tobytes()])], names=["bits"])

        cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
        hdf = df.select(F.xxhash64(*cols).alias("h"))
        # one partial per fold task is m/8 bytes on the driver; cap the
        # collected total at ~16 MB by coalescing the hash column — the
        # fold is vectorized (µs per 100k keys), so the collect's
        # serialization dominates: measured 3.4 s at 16×8 MB partials
        # vs 0.5 s at 2×8 MB for the same 400k keys. Giant filters
        # (≥128 MB words) degrade to one fold task — at that scale fold
        # partials pairwise executor-side instead (module docstring)
        max_parts = max(1, (16 << 20) // max(1, self.words.nbytes))
        if hdf.rdd.getNumPartitions() > max_parts:
            hdf = hdf.coalesce(max_parts)
        for row in hdf.mapInArrow(fold, "bits binary").collect():
            self.words |= np.frombuffer(row["bits"], dtype=np.uint64)
        self._invalidate()

    def merge_from(self, df, *key_cols) -> None:
        """Fold a batch of new keys into the filter (same-shaped
        partial built executor-side, bitwise OR)."""
        self._fold_df(df, *key_cols)

    def _invalidate(self) -> None:
        if self._bc is not None:
            self._bc.unpersist(blocking=False)
            self._bc = None

    def might_contain(self, *cols):
        """Column[bool]: Bloom membership of the key column(s).
        Hashing runs JVM-side; the probe is k vectorized numpy ops per
        Arrow batch against the broadcast word array (false ⇒
        definitely new; true ⇒ maybe seen)."""
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BooleanType

        assert self._spark is not None, "build() the filter first"
        if self._bc is None:
            self._bc = self._spark.sparkContext.broadcast(
                (self.m, self.k, self.words))
        bc = self._bc

        @pandas_udf(BooleanType())
        def _probe(h: pd.Series) -> pd.Series:
            m, k, words = bc.value
            hashes = h.to_numpy(dtype=np.int64, na_value=0)
            ok = np.ones(len(hashes), dtype=bool)
            for w_idx, bit in _bit_positions(m, k, hashes):
                ok &= (words[w_idx] & bit) != 0
            return pd.Series(ok)

        kcols = [F.col(c) if isinstance(c, str) else c for c in cols]
        return _probe(F.xxhash64(*kcols))


def _h64(value: str, salt: int) -> int:
    digest = hashlib.blake2b(
        value.encode("utf-8"), digest_size=8, salt=salt.to_bytes(8, "little")
    ).digest()
    return int.from_bytes(digest, "little")


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
