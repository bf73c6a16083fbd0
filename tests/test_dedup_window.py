from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark.operators.dedup_window import (
    latest_event_agg,
    latest_event_per_key,
    top_k_per_group,
)


def _events(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        Row(k="a", id=1, ts=t, v=10.0),
        Row(k="a", id=2, ts=t + dt.timedelta(hours=1), v=20.0),
        # tie on ts with id=2 — tie-breaker must pick higher id
        Row(k="a", id=3, ts=t + dt.timedelta(hours=1), v=30.0),
        Row(k="b", id=4, ts=t, v=40.0),
    ]
    return spark.createDataFrame(rows)


def test_latest_event_per_key_deterministic_ties(spark):
    out = latest_event_per_key(
        _events(spark), keys=["k"], ts_col="ts", tie_breakers=["id"]
    )
    got = {r["k"]: r["id"] for r in out.collect()}
    assert got == {"a": 3, "b": 4}


def test_top_k_per_group(spark):
    out = top_k_per_group(
        _events(spark), keys=["k"], order_by=["v", "id"], k=2
    )
    got = sorted((r["k"], r["id"]) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


def test_latest_event_agg_matches_window(spark):
    df = _events(spark)
    via_agg = latest_event_agg(
        df, keys=["k"], ts_col="ts", value_cols=["id", "v"], tie_breaker="id"
    )
    got = {r["k"]: (r["id"], r["v"]) for r in via_agg.collect()}
    assert got == {"a": (3, 30.0), "b": (4, 40.0)}
