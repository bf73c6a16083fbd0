"""sql_database_to_elastic_datalake_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL system ``Lorenzuou/sql-database-to-elastic-datalake``
("simplelake"): relational sync pipelines (scan → filter → denormalize →
window-dedup → nest → write), a search/query surface (ES-DSL → Column
compiler, multi-match), incremental upsert semantics, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing).

Design principles (see SURVEY.md §7):
  * Everything is a pure ``DataFrame -> DataFrame`` transform — declarative
    plans that Catalyst can optimize (predicate pushdown, column pruning,
    broadcast joins, AQE).
  * No row loops, no ``collect()`` in any operator hot path.
  * Python UDFs only where built-ins genuinely cannot express the
    semantics, and then always Arrow-vectorized (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from sql_database_to_elastic_datalake_spark.session import get_spark  # noqa: F401
