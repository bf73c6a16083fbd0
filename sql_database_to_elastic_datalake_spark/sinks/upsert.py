"""Upsert / merge semantics on plain Parquet: latest-version-wins.

The reference upserts by writing a document under an existing id —
``es.index(index, id=<entity_id>)`` overwrites in place
(/root/reference/src/es_connector.py:37-49; point re-sync
/root/reference/src/routes/ticket_routes.py:75-96). On an append-only lake
the equivalent is MERGE: base ∪ updates, newest version per key wins.

Spark-first shape: ``unionByName`` + the same latest-per-key ranking
window used everywhere else — one shuffle on the merge key. With a
transactional table format this would be ``MERGE INTO``; the operator
here is the format-agnostic core and is what a ``foreachBatch``
incremental sink calls per micro-batch.

Scale notes:
  * Never rewrites the base table to apply a point update — the merge is
    a *read-side view* (or a partition-scoped rewrite when compacting).
    At 100 TB you compact merged partitions, you don't rewrite the lake.
  * ``version_col`` must be monotonically increasing per key
    (``updatedAt``, commit LSN, batch id). ``source_rank`` breaks exact
    ties in favor of updates (updates win over base at equal version).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest_wins(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """MERGE: one row per key — the highest (version, is_update) wins."""
    b = base.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    unioned = b.unionByName(u, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
