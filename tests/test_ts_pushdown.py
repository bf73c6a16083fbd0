"""Timestamp range scans must push down to the parquet scan.

The events table stores TIMESTAMP(NANOS); the loader converts to micros
AFTER applying range bounds to the raw long, so the predicate survives as
a PushedFilter (row-group pruning on column stats). These tests pin both
the plan property and the integer-exact equivalence with post-conversion
filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.sources.parquet import (
    _iso_to_micros,
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_iso_to_micros_exact():
    assert _iso_to_micros("1970-01-01") == 0
    assert _iso_to_micros("1970-01-02") == 86400 * 1_000_000
    assert _iso_to_micros("2024-01-10 01:02:03.000004") == (
        (19732 * 86400 + 3723) * 1_000_000 + 4
    )


def test_ts_range_pushes_to_scan(spark):
    lo, hi = "2024-01-10", "2024-01-20"
    ev = load_table(spark, SF, "events", ts_range={"ts": (lo, hi)})
    plan = ev._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1][:400]
    lo_n = _iso_to_micros(lo) * 1000
    hi_n = _iso_to_micros(hi) * 1000
    assert f"GreaterThanOrEqual(ts,{lo_n})" in pushed, plan[:2000]
    assert f"LessThan(ts,{hi_n})" in pushed, plan[:2000]


def test_ts_range_matches_post_conversion_filter(spark):
    lo, hi = "2024-01-10", "2024-01-20"
    fast = load_table(spark, SF, "events", ts_range={"ts": (lo, hi)})
    slow = load_table(spark, SF, "events").filter(
        (F.col("ts") >= F.lit(lo).cast("timestamp"))
        & (F.col("ts") < F.lit(hi).cast("timestamp"))
    )
    n_fast, n_slow = fast.count(), slow.count()
    assert n_fast == n_slow > 0
    # one open bound on each side
    # ranges [lo, ∞) and (−∞, hi) overlap exactly on [lo, hi): the counts
    # sum to total + n_fast — pins half-open boundary semantics.
    ge_only = load_table(spark, SF, "events", ts_range={"ts": (lo, None)})
    lt_only = load_table(spark, SF, "events", ts_range={"ts": (None, hi)})
    total = load_table(spark, SF, "events").count()
    assert ge_only.count() + lt_only.count() - n_fast == total
