"""Concurrency-relevant algebraic properties of the MERGE core.

Plain parquet has no commit protocol, so multi-writer safety rests on
``merge_latest_wins`` being idempotent and (for disjoint keys)
commutative — see docs/merge-concurrency.md for the full contract.
"""

from __future__ import annotations

from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark.sinks.upsert import merge_latest_wins


def _rows(df):
    return sorted(
        (r["k"], r["v"], r["payload"]) for r in df.select("k", "v", "payload").collect()
    )


def _tbl(spark, *rows):
    return spark.createDataFrame([Row(k=k, v=v, payload=p) for k, v, p in rows])


def test_merge_idempotent(spark):
    base = _tbl(spark, (1, 1, "a"), (2, 1, "b"))
    upd = _tbl(spark, (1, 2, "a2"), (3, 1, "c"))
    once = merge_latest_wins(base, upd, keys=["k"], version_col="v")
    twice = merge_latest_wins(once, upd, keys=["k"], version_col="v")
    assert _rows(once) == _rows(twice) == [(1, 2, "a2"), (2, 1, "b"), (3, 1, "c")]


def test_merge_commutes_on_disjoint_keys(spark):
    base = _tbl(spark, (1, 1, "a"), (2, 1, "b"))
    u1 = _tbl(spark, (1, 2, "a2"))
    u2 = _tbl(spark, (2, 2, "b2"))
    ab = merge_latest_wins(
        merge_latest_wins(base, u1, ["k"], "v"), u2, ["k"], "v"
    )
    ba = merge_latest_wins(
        merge_latest_wins(base, u2, ["k"], "v"), u1, ["k"], "v"
    )
    assert _rows(ab) == _rows(ba) == [(1, 2, "a2"), (2, 2, "b2")]


def test_merge_same_key_higher_version_wins_either_order(spark):
    base = _tbl(spark, (1, 1, "orig"))
    lo = _tbl(spark, (1, 2, "low"))
    hi = _tbl(spark, (1, 3, "high"))
    lo_then_hi = merge_latest_wins(
        merge_latest_wins(base, lo, ["k"], "v"), hi, ["k"], "v"
    )
    hi_then_lo = merge_latest_wins(
        merge_latest_wins(base, hi, ["k"], "v"), lo, ["k"], "v"
    )
    assert _rows(lo_then_hi) == _rows(hi_then_lo) == [(1, 3, "high")]


def test_merge_version_tie_prefers_update_side(spark):
    base = _tbl(spark, (1, 5, "stale"))
    upd = _tbl(spark, (1, 5, "fresh"))
    out = merge_latest_wins(base, upd, keys=["k"], version_col="v")
    assert _rows(out) == [(1, 5, "fresh")]
