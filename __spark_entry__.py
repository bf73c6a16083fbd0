"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship denormalized-document query at
sf0.001. ``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions); ``oracle_sql()``
holds the DuckDB-equivalent SQL for the differential correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sql_database_to_elastic_datalake_spark.session import ensure_session_conf
from sql_database_to_elastic_datalake_spark import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ensure_session_conf(spark)
    return registry.QUERIES["denormalized_orders"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in
    driver-check priority order."""
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for non-SQL-expressible
    operators — the driver then records a rows-only check)."""
    return dict(registry.ORACLES)
