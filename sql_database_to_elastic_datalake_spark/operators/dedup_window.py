"""Latest-event-per-key and top-k-per-group — the window-dedup operators.

The reference's richest relational computation is Postgres
``DISTINCT ON (ts."ticketId") ... ORDER BY ts."ticketId", ts."createdAt"
DESC`` (/root/reference/src/db_connector.py:262-268): newest status row
per ticket. Spark-first, that is a ranking window.

Scale notes (100 TB):
  * ``row_number`` over ``partitionBy(keys)`` is a single hash shuffle on
    the keys followed by a per-partition sort — the minimal plan for this
    semantics. No self-join, no global sort.
  * Tie-breaking MUST be total: Postgres DISTINCT ON resolves equal
    ``createdAt`` by plan order (non-deterministic). We require explicit
    tie-breaker columns so results are stable under any parallelism
    (SURVEY.md §7.3 hard-part #1).
  * For heavily skewed keys AQE skew handling does not apply to window
    functions; callers with pathological skew should pre-aggregate with
    ``max_by`` semantics instead (see ``latest_event_agg``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by: Sequence[str | Column], descending: bool) -> list[Column]:
    """PostgreSQL null placement, explicitly: DESC puts NULLs FIRST and
    ASC puts them LAST (what the reference's DISTINCT ON produces, and
    DuckDB's default) — Spark's bare desc()/asc() are the OPPOSITE
    (nulls last / nulls first), which silently picks a different
    "latest" row whenever the timestamp is NULL."""
    cols: list[Column] = []
    for c in order_by:
        col = F.col(c) if isinstance(c, str) else c
        cols.append(col.desc_nulls_first() if descending else col.asc_nulls_last())
    return cols


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    k: int = 1,
    descending: bool = True,
    rank_col: str = "_rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the top-``k`` rows per key group under a total order.

    ``order_by`` must define a total order within each group (include a
    unique id as the final tie-breaker) or results are nondeterministic.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    out = ranked.filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def latest_event_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_breakers: Sequence[str] = (),
) -> DataFrame:
    """Newest row per key: ``DISTINCT ON`` with a deterministic total order.

    Equivalent reference semantics: /root/reference/src/db_connector.py:262-268.
    """
    order = [ts_col, *tie_breakers]
    return top_k_per_group(df, keys, order, k=1, descending=True)


def latest_event_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tie_breaker: str | None = None,
) -> DataFrame:
    """Skew-robust ``latest per key`` via max_by aggregation.

    Same semantics as :func:`latest_event_per_key` restricted to
    ``value_cols``, but expressed as an aggregate so Spark applies
    map-side partial aggregation — each input partition reduces to at
    most one row per key *before* the shuffle. On a skewed 100 TB event
    stream this moves O(rows) work off the shuffle and is the plan of
    choice when only selected columns are needed.

    The ordering key is ``struct(ts, tie_breaker)`` so ties resolve
    deterministically (struct comparison is lexicographic).
    """
    ord_expr = (
        F.struct(F.col(ts_col), F.col(tie_breaker))
        if tie_breaker
        else F.col(ts_col)
    )
    aggs = [F.max_by(F.col(c), ord_expr).alias(c) for c in value_cols]
    aggs.append(F.max(F.col(ts_col)).alias(ts_col))
    return df.groupBy(*keys).agg(*aggs)
