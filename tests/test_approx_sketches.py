"""Accuracy contract for the approximate sketch aggregates: HLL++
distinct counts within the configured relative error of exact, GK
percentiles within rank tolerance.

Since r4 the registered query emits in-plan accuracy VERDICTS (its
oracle asserts them TRUE against DuckDB's groups); this test both pins
that public shape and re-derives the raw sketch-vs-exact comparison
independently so a loosened in-plan bound cannot hide drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.registry import QUERIES
from sql_database_to_elastic_datalake_spark.sources.parquet import load_table


def test_registered_query_verdicts_all_true(spark, sf_dir):
    rows = QUERIES["approx_sketches"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["users_hll_ok"] is True
        assert r["events_hll_ok"] is True
        assert r["p50_ok"] is True
        assert r["p95_ok"] is True
        assert r["n_rows"] > 0


def test_raw_sketches_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.approx_count_distinct("event_id", rsd=0.02).alias("approx_events"),
            F.percentile_approx("value", F.lit(0.5), 10000).alias("value_p50"),
            F.percentile_approx("value", F.lit(0.95), 10000).alias("value_p95"),
        )
        .collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.countDistinct("event_id").alias("events"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for et, a in approx.items():
        e = exact[et]
        # HLL++ at rsd=0.02: allow 3 sigma
        assert abs(a["approx_users"] - e["users"]) <= max(3, 0.06 * e["users"])
        assert abs(a["approx_events"] - e["events"]) <= max(
            3, 0.06 * e["events"]
        )
        # GK percentile: value must lie within the exact p45–p55 /
        # p90–p99 envelope of the group's values
        vals = [
            r["value"]
            for r in ev.filter(F.col("event_type") == et)
            .select("value")
            .collect()
            if r["value"] is not None
        ]
        vals.sort()
        p50, p95 = a["value_p50"], a["value_p95"]
        lo50, hi50 = vals[int(0.45 * len(vals))], vals[int(0.55 * len(vals))]
        lo95, hi95 = vals[int(0.90 * len(vals))], vals[
            min(len(vals) - 1, int(0.99 * len(vals)))
        ]
        assert lo50 <= p50 <= hi50
        assert lo95 <= p95 <= hi95


def test_null_group_key_gets_true_verdicts(spark, tmp_path):
    """A NULL event_type is a legitimate group: groupBy and the oracle's
    GROUP BY both emit it, so the bracket joins must be null-SAFE — a
    plain equi-join drops the NULL group's bracket and turns its
    verdicts FALSE (the class this test pins)."""
    import datetime as dt

    d = str(tmp_path / "lake")
    import os

    os.makedirs(d)
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 5), i % 7,
         None if i % 3 == 0 else "click", float(i) * 1.25, None)
        for i in range(300)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in
           QUERIES["approx_sketches"](spark, d).collect()}
    assert set(out) == {None, "click"}
    for r in out.values():
        assert r["p50_ok"] is True and r["p95_ok"] is True
        assert r["users_hll_ok"] is True and r["events_hll_ok"] is True
