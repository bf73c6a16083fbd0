"""range_join: bucketized interval join vs the naive nested-loop result.

The operator must be exactly equivalent to `left ⋈ right ON keys AND
start (<|<=) point AND point (<|<=) end` for every inclusivity combination
and across bin boundaries — the bin trick is a physical rewrite only.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.joins import range_join


def _naive(left, right, on, start_inclusive, end_inclusive):
    r = right.select(
        F.col("k").alias("rk"),
        F.col("rstart"),
        F.col("rend"),
        F.col("rid").alias("matched_rid"),
    )
    lo = (
        F.col("rstart") <= F.col("ts")
        if start_inclusive
        else F.col("rstart") < F.col("ts")
    )
    hi = (
        F.col("ts") <= F.col("rend")
        if end_inclusive
        else F.col("ts") < F.col("rend")
    )
    cond = lo & hi
    if on:
        cond = (F.col("k") == F.col("rk")) & cond
    return left.join(r, cond, "inner").select("event_id", "matched_rid")


def _random_frames(spark, seed):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    # points scattered across ~6 hours with second/microsecond jitter,
    # including exact bin-boundary timestamps (10:00:00.000000)
    left_rows = [
        (
            i,
            rng.choice(["a", "b", "c"]),
            base
            + dt.timedelta(
                seconds=rng.randrange(0, 6 * 3600),
                microseconds=rng.choice([0, 1, 999_999]),
            ),
        )
        for i in range(120)
    ] + [(1000, "a", base + dt.timedelta(hours=2))]  # boundary point
    right_rows = []
    for j in range(40):
        start = base + dt.timedelta(seconds=rng.randrange(0, 6 * 3600))
        # interval lengths from sub-bucket to several buckets
        length = dt.timedelta(seconds=rng.choice([60, 1800, 3600, 9000]))
        right_rows.append((j, rng.choice(["a", "b", "c"]), start, start + length))
    # interval ending exactly on a bin boundary
    right_rows.append(
        (500, "a", base + dt.timedelta(hours=1), base + dt.timedelta(hours=2))
    )
    left = spark.createDataFrame(
        left_rows, "event_id long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "rid long, k string, rstart timestamp, rend timestamp"
    )
    return left, right


def test_range_join_matches_naive_all_inclusivities(spark):
    left, right = _random_frames(spark, seed=7)
    for start_inc in (True, False):
        for end_inc in (True, False):
            got = (
                range_join(
                    left,
                    right,
                    left_point="ts",
                    right_start="rstart",
                    right_end="rend",
                    right_cols={"rid": "matched_rid"},
                    on=["k"],
                    bucket_seconds=3600,
                    start_inclusive=start_inc,
                    end_inclusive=end_inc,
                )
                .select("event_id", "matched_rid")
                .collect()
            )
            want = _naive(left, right, ["k"], start_inc, end_inc).collect()
            assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (
                start_inc,
                end_inc,
            )


def test_range_join_no_equi_keys(spark):
    left, right = _random_frames(spark, seed=11)
    got = (
        range_join(
            left,
            right,
            left_point="ts",
            right_start="rstart",
            right_end="rend",
            right_cols={"rid": "matched_rid"},
            on=[],
            bucket_seconds=1800,
        )
        .select("event_id", "matched_rid")
        .collect()
    )
    want = _naive(left, right, [], True, False).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_range_join_is_equi_join_plan(spark):
    """The physical plan must be a hash/sort-merge EQUI join on the bin —
    no BroadcastNestedLoopJoin, no CartesianProduct."""
    left, right = _random_frames(spark, seed=3)
    plan = range_join(
        left,
        right,
        left_point="ts",
        right_start="rstart",
        right_end="rend",
        right_cols={"rid": "matched_rid"},
        on=["k"],
        bucket_seconds=3600,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
