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
