"""Property-based tests for the vectorized seen-set filters
(VERDICT r3 #8): the numpy Bloom path must never produce a false
negative through build / merge / probe — including negative int64 hash
values (Spark's ``xxhash64`` is signed; the Kirsch-Mitzenmacher probe
reinterprets the bits as uint64 via ``.view``, which Hypothesis must
not be able to break at the int64 boundaries). Pure numpy (no Spark
session) — the Spark integration of the SAME add/contains kernels is
covered by the engine trace suites and tests/test_batch_fetch.py."""

import numpy as np
from hypothesis import given, settings, strategies as st

from derzis_spark.operators.seen_set import (
    BloomFilter, CuckooFilter, _bloom_params)

_i64 = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
#: hash batches biased toward the nasty edges (0, ±1, int64 min/max)
_hash_lists = st.lists(
    st.one_of(
        _i64,
        st.sampled_from([0, 1, -1, 2 ** 63 - 1, -(2 ** 63),
                         # the KM mixing constant as SIGNED int64 (what
                         # xxhash64 would hand the probe), and its flip
                         0x9E3779B97F4A7C15 - 2 ** 64,
                         2 ** 64 - 0x9E3779B97F4A7C15])),
    min_size=0, max_size=200)


@settings(max_examples=200, deadline=None)
@given(_hash_lists, st.integers(min_value=1, max_value=5))
def test_bloom_no_false_negatives_across_merged_partials(hashes, n_parts):
    """Keys added across several same-shaped partials (the executor-side
    partial-union build) are all positive after the union fold."""
    cap, fpp = 1000, 0.01
    parts = [BloomFilter(cap, fpp) for _ in range(n_parts)]
    for i, h in enumerate(hashes):
        parts[i % n_parts].add_hashes(np.array([h], dtype=np.int64))
    bf = parts[0]
    for p in parts[1:]:
        bf.union(p)
    arr = np.array(hashes, dtype=np.int64)
    assert bf.contains_hashes(arr).all()


@settings(max_examples=200, deadline=None)
@given(_hash_lists)
def test_bloom_batch_and_scalar_probes_agree(hashes):
    """Probing one batch equals probing element-wise (the vectorized
    gather has no cross-row interaction)."""
    bf = BloomFilter(512, 0.02)
    arr = np.array(hashes, dtype=np.int64)
    bf.add_hashes(arr[::2])
    batch = bf.contains_hashes(arr)
    singles = np.array(
        [bf.contains_hashes(np.array([h], dtype=np.int64))[0]
         for h in hashes], dtype=bool)
    assert (batch == singles).all()
    # everything added is found
    assert batch[::2].all()


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=10, max_value=10 ** 7),
       st.floats(min_value=1e-4, max_value=0.3))
def test_bloom_params_sane(capacity, fpp):
    m, k = _bloom_params(capacity, fpp)
    assert m >= 1024 and (m & (m - 1)) == 0  # power-of-two bit count
    assert 1 <= k <= 16


def test_bloom_fpp_stays_near_requested():
    """At exactly `capacity` inserted keys the measured false-positive
    rate stays within 3× the requested fpp (deterministic key sets)."""
    rng = np.random.default_rng(42)
    cap = 20_000
    bf = BloomFilter(cap, 0.01)
    seen = rng.integers(-(2 ** 62), 2 ** 62, size=cap, dtype=np.int64)
    bf.add_hashes(seen)
    probe = rng.integers(-(2 ** 62), 2 ** 62, size=50_000, dtype=np.int64)
    novel = probe[~np.isin(probe, seen)]
    fp_rate = bf.contains_hashes(novel).mean()
    assert fp_rate < 0.03, fp_rate


_urls = st.lists(
    st.text(alphabet="abcdefghij:/.-_0123456789", min_size=1,
            max_size=40),
    min_size=0, max_size=60, unique=True)


@settings(max_examples=100, deadline=None)
@given(_urls)
def test_cuckoo_add_probe_delete_roundtrip(urls):
    """The deletion-capable fallback: everything added is found;
    deleting removes exactly one copy (no false negatives on the
    still-present keys)."""
    cf = CuckooFilter(max(64, len(urls) * 4))
    for u in urls:
        cf.add(u)
    assert all(cf.might_contain(u) for u in urls)
    for u in urls[::2]:
        assert cf.delete(u)
    assert all(cf.might_contain(u) for u in urls[1::2])
