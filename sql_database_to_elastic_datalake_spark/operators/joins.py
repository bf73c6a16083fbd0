"""Join operators beyond plain equi-joins: alias self-joins, grouped-child
joins, semi/anti membership joins.

Reference semantics covered (SURVEY.md §2.3):
  * J5 parent lookup — the reference resolves each Module's parent by a
    per-row pandas scan (/root/reference/src/data_sync.py:509-514). Spark-first
    it is an alias self-join, broadcast when the dimension is small.
  * J6/J7 grouped-child attach — dict-grouped children per parent
    (/root/reference/src/data_sync.py:436-461, /root/reference/src/document_utils.py:78-99)
    become groupBy/collect + a single left join.
  * Semi/anti joins are not in the reference (its EXISTS-style needs are
    pushed to Elasticsearch); our engine exposes them because they are
    the scalable form of membership predicates — no fan-out, no dedup
    after the join, and Spark can plan them as broadcast or shuffled
    hash joins.

Scale notes:
  * ``parent_lookup`` broadcasts the parent side by default — correct
    for dimension hierarchies (modules, categories). For self-joins on
    fact-sized tables, pass ``broadcast_parent=False`` to let AQE pick.
  * ``attach_children`` shuffles the child table once on the parent key;
    the parent join then reuses that partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.nest import (
    group_to_sorted_string,
)


def parent_lookup(
    df: DataFrame,
    parent_fk: str,
    parent_pk: str,
    parent_cols: dict[str, str],
    broadcast_parent: bool = True,
) -> DataFrame:
    """Alias self-join: attach parent-row columns to each child row.

    ``parent_cols`` maps parent column -> output alias.
    """
    parent = df.select(
        F.col(parent_pk).alias("__parent_pk"),
        *[F.col(c).alias(alias) for c, alias in parent_cols.items()],
    )
    if broadcast_parent:
        parent = F.broadcast(parent)
    return df.join(
        parent, F.col(parent_fk) == F.col("__parent_pk"), "left"
    ).drop("__parent_pk")


def attach_children(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_fk: str,
    child_value: str,
    out_col: str,
) -> DataFrame:
    """Left-join a sorted, grouped representation of children onto parents."""
    grouped = group_to_sorted_string(
        child, keys=[child_fk], value_col=child_value, out_col=out_col
    ).withColumnRenamed(child_fk, "__child_fk")
    return parent.join(
        grouped, F.col(parent_key) == F.col("__child_fk"), "left"
    ).drop("__child_fk")


def semi_join(
    left: DataFrame, right: DataFrame, on: Column | Sequence[str]
) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return left.join(right, on, "left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: Column | Sequence[str]
) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    right_tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward as-of join: attach to each left row the columns of the
    LATEST right row with ``right_ts <= left_ts`` per join key (pandas
    ``merge_asof`` / kdb ``aj`` semantics; ties on ``right_ts`` broken by
    the greatest ``right_tiebreak``).

    Not expressible as a Spark equi-join; the naive form is an unbounded
    range join (quadratic). Spark-first composition with ONE shuffle:
    union both sides tagged, sort within key partitions by
    ``(ts, side, tiebreak)`` — right rows first at equal ts, so same-ts
    matches are eligible — and carry the most recent right row forward
    with ``last(struct, ignoreNulls) OVER (ROWS UNBOUNDED PRECEDING)``.
    The struct keeps all attached columns from the SAME right row. Cost
    is sort-within-partition of |L|+|R| after one hash shuffle on the
    key: linear, skew-safe under AQE, no broadcast needed on either side.

    ``right_cols`` maps right column -> output alias. ``tolerance_seconds``
    nulls out matches older than the given horizon (pandas ``tolerance``).
    """
    on = list(on)
    keep = list(right_cols.keys())
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0)
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c).alias(a) for c, a in right_cols.items()],
        ).alias("__rrow"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rrow"].dataType).alias("__rrow"),
    )
    unioned = l.select(
        *on,
        "__ts",
        "__side",
        "__tb",
        "__rrow",
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    ).unionByName(
        r.select(
            *on,
            "__ts",
            "__side",
            "__tb",
            "__rrow",
            F.lit(None)
            .cast(
                l.select(
                    F.struct(*[F.col(c) for c in left.columns]).alias("s")
                ).schema["s"].dataType
            )
            .alias("__lrow"),
        )
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("__rrow"), ignorenulls=True).over(w)
    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .select("__lrow.*", "__m")
    )
    if tolerance_seconds is not None:
        horizon = F.col(left_ts).cast("double") - F.lit(float(tolerance_seconds))
        out = out.withColumn(
            "__m",
            F.when(F.col("__m.__matched_ts").cast("double") >= horizon, F.col("__m")),
        )
    for _, alias in right_cols.items():
        out = out.withColumn(alias, F.col(f"__m.{alias}"))
    return out.drop("__m")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    right_cols: dict[str, str],
    on: Sequence[str] = (),
    bucket_seconds: int = 3600,
    start_inclusive: bool = True,
    end_inclusive: bool = False,
) -> DataFrame:
    """Bucketized interval (range) join: pair each left row with every
    right row whose ``[right_start, right_end)`` interval contains
    ``left_point``, optionally under extra equi keys ``on``.

    The reference has no range join (SURVEY.md §2.3 "not present");
    this is a scale extension. Spark plans a bare non-equi condition as
    a broadcast-nested-loop (or, with equi keys, a sort-merge join that
    buffers every same-key row) — quadratic in the worst case. The
    scalable plan is the classic bin trick: quantize time into
    ``bucket_seconds``-wide bins, EXPLODE each right interval into the
    bins it overlaps, tag each left point with its bin, then run a
    plain equi-join on ``(on..., bin)`` and re-check the exact interval
    predicate. One hash shuffle, no per-key buffering, AQE-skew-safe.
    Bins per right row = interval_len/bucket + 1, so pick the bucket
    near the typical interval length (duplication factor ≤ 2).

    ``right_cols`` maps right column -> output alias (the right side is
    re-projected, so self-joins need no aliasing dance). Inner-join
    semantics; for left-outer aggregation, aggregate this result and
    join back onto ``left``.
    """
    on = list(on)
    us = int(bucket_seconds) * 1_000_000
    # exclusive end: an interval ending exactly on a bin boundary does
    # not reach into that bin; inclusive end: it does
    end_trim = 0 if end_inclusive else 1
    r = right.select(
        *[F.col(k).alias(f"__rk_{i}") for i, k in enumerate(on)],
        F.col(right_start).alias("__rstart"),
        F.col(right_end).alias("__rend"),
        *[F.col(c).alias(a) for c, a in right_cols.items()],
    ).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col("__rstart")) / F.lit(us)),
                F.floor(
                    (F.unix_micros(F.col("__rend")) - F.lit(end_trim))
                    / F.lit(us)
                ),
            )
        ),
    )
    l = left.withColumn(
        "__lbin", F.floor(F.unix_micros(F.col(left_point)) / F.lit(us))
    )
    point = F.col(left_point)
    lo = (
        F.col("__rstart") <= point
        if start_inclusive
        else F.col("__rstart") < point
    )
    hi = (
        point <= F.col("__rend") if end_inclusive else point < F.col("__rend")
    )
    cond = F.col("__lbin") == F.col("__bin")
    for i, k in enumerate(on):
        cond = cond & (F.col(k) == F.col(f"__rk_{i}"))
    drop = (
        ["__lbin", "__bin", "__rstart", "__rend"]
        + [f"__rk_{i}" for i in range(len(on))]
    )
    return l.join(r, cond & lo & hi, "inner").drop(*drop)
