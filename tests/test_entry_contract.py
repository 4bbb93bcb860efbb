"""Driver-contract invariants for __spark_entry__ (VERDICT r3 #1).

Round 3 lost `fetch_extract_batch` from the driver's correctness sweep
because the dict had grown to 51 entries and the driver records at most
50 (CORRECTNESS_r03.json: exactly 50 rows, the 51st key silently
dropped). These tests make a silent drop impossible again:

- queries() and oracle_sql() cover exactly the same keys;
- the dict never exceeds the observed 50-entry driver cap;
- the iterative engine entries lead the ordering, so even a SMALLER
  cap would check them first;
- the merged crawl_trace entry really carries both engine modes.
"""

import __spark_entry__ as entry_mod

#: the driver's observed correctness-sweep cap (r3: 51 exported → 50
#: recorded). If the entry count must grow past this, merge entries
#: (as crawl_trace does) instead of appending.
DRIVER_QUERY_CAP = 50


def test_queries_and_oracles_cover_same_keys():
    assert sorted(entry_mod.queries()) == sorted(entry_mod.oracle_sql())


def test_entry_count_within_driver_cap():
    n = len(entry_mod.queries())
    assert n <= DRIVER_QUERY_CAP, (
        f"{n} entries > driver cap {DRIVER_QUERY_CAP}: the driver would "
        f"silently drop {n - DRIVER_QUERY_CAP} (this is how "
        "fetch_extract_batch vanished from CORRECTNESS_r03)")


def test_iterative_entries_lead_the_dict():
    keys = list(entry_mod.queries())
    assert keys.index("crawl_trace") < 3
    assert keys.index("fetch_extract_batch") < 3


def test_crawl_trace_union_carries_both_modes(spark):
    df = entry_mod._crawl_trace_both(spark, "")
    modes = {r["mode"] for r in df.select("mode").distinct().collect()}
    assert modes == {"mini", "endpoint"}


def test_crawl_trace_oracle_carries_both_modes():
    import duckdb

    rows = duckdb.connect().execute(entry_mod.SQL_CRAWL_TRACE).fetchall()
    modes = {r[0] for r in rows}
    assert modes == {"mini", "endpoint"}
    assert len(rows) == 14  # 7 trace rows per mode (frozen oracles)
