"""asof_join: backward as-of semantics vs a hand-computed expectation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.joins import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _build(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01 10:00:00")),
            (2, "k1", _ts("2024-01-01 12:00:00")),
            (3, "k1", _ts("2024-01-01 09:00:00")),  # before any right row
            (4, "k2", _ts("2024-01-01 10:30:00")),  # key with no right rows
            (5, "k3", _ts("2024-01-01 10:00:00")),  # exact-tie with right ts
        ],
        "event_id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "k1", _ts("2024-01-01 09:30:00"), 10.0),
            (101, "k1", _ts("2024-01-01 11:00:00"), 20.0),
            (102, "k1", _ts("2024-01-01 11:00:00"), 30.0),  # ts tie → id 102 wins
            (103, "k3", _ts("2024-01-01 10:00:00"), 40.0),  # same-ts inclusive
        ],
        "rid long, k string, rts timestamp, val double",
    )
    return left, right


def test_asof_backward_with_ties_and_misses(spark):
    left, right = _build(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        right_cols={"rid": "rid", "val": "val"},
        right_tiebreak="rid",
    )
    got = {r["event_id"]: (r["rid"], r["val"]) for r in out.collect()}
    assert got == {
        1: (100, 10.0),  # latest rts <= 10:00 is 09:30
        2: (102, 30.0),  # 11:00 tie broken by greatest rid
        3: (None, None),  # nothing before 09:00
        4: (None, None),  # key absent on right
        5: (103, 40.0),  # rts == ts is eligible (backward inclusive)
    }
    # left row count and columns preserved
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _build(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        right_cols={"rid": "rid"},
        right_tiebreak="rid",
        tolerance_seconds=1800,
    )
    got = {r["event_id"]: r["rid"] for r in out.collect()}
    # event 1 at 10:00 matched 09:30 (exactly 1800s: kept);
    # event 2 at 12:00 matched 11:00 (3600s: dropped)
    assert got[1] == 100
    assert got[2] is None
    assert got[5] == 103


def test_asof_single_shuffle_plan(spark):
    left, right = _build(spark)
    out = asof_join(
        left,
        right,
        on=["k"],
        left_ts="ts",
        right_ts="rts",
        right_cols={"rid": "rid"},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window: exactly one exchange per input branch on the key,
    # and no join operator at all (the point of the composition)
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning(k") <= 2, plan
