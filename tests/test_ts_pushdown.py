"""Timestamp range scans must push down to the parquet scan.

``load_table`` applies range bounds to the column AS STORED — raw longs
for TIMESTAMP(NANOS) parquet (converted to micros only afterwards),
plain timestamp literals for micro-precision storage — so the predicate
survives as a PushedFilter (row-group pruning on column stats) either
way. These tests pin the plan property for both storage types plus the
integer-exact equivalence with post-conversion filtering.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.sources.parquet import (
    _iso_to_micros,
    _nanos_timestamp_cols,
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
    if "ts" in _nanos_timestamp_cols(f"{SF}/events.parquet"):
        # nanos storage: the bound is compared against the raw long
        lo_b, hi_b = _iso_to_micros(lo) * 1000, _iso_to_micros(hi) * 1000
    else:
        # micros storage: Spark renders the pushed bound as a timestamp
        lo_b, hi_b = f"{lo} 00:00:00.0", f"{hi} 00:00:00.0"
    assert f"GreaterThanOrEqual(ts,{lo_b})" in pushed, plan[:2000]
    assert f"LessThan(ts,{hi_b})" in pushed, plan[:2000]


def test_ts_range_pushes_to_scan_nanos(spark, tmp_path):
    """Raw-long pushdown path stays covered via a generated nanos fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = _iso_to_micros("2024-01-01") * 1000
    day_ns = 86_400 * 1_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(range(30), type=pa.int64()),
            "ts": pa.array(
                [base + i * day_ns for i in range(30)],
                type=pa.timestamp("ns"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    lo, hi = "2024-01-10", "2024-01-20"
    ev = load_table(spark, str(tmp_path), "events", ts_range={"ts": (lo, hi)})
    plan = ev._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1][:400]
    lo_n, hi_n = _iso_to_micros(lo) * 1000, _iso_to_micros(hi) * 1000
    assert f"GreaterThanOrEqual(ts,{lo_n})" in pushed, plan[:2000]
    assert f"LessThan(ts,{hi_n})" in pushed, plan[:2000]
    rows = ev.orderBy("event_id").collect()
    assert len(rows) == 10  # [Jan 10, Jan 20) inclusive-exclusive
    assert str(rows[0]["ts"]).startswith("2024-01-10")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"


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
