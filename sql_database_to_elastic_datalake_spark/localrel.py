"""Arrow-backed local relations for driver-side envelope results.

Many operators finish ES-shaped work on the driver (aggregation
envelopes, bounded samples, probe tables) and re-enter Spark as a small
DataFrame. ``spark.createDataFrame(list_of_rows, schema)`` builds that
relation as a *Python-RDD scan* (``applySchemaToPythonRDD``): every
action on any plan containing it round-trips through a Python worker to
re-pickle the same local rows — measured ~0.4 s per action on local[32]
for a 10-row relation, billed again on every downstream job
(spark_optimization_guide §4: eliminate the JVM↔Python boundary).

Routing the same rows through pandas produces a ``LocalTableScan``
(Arrow-converted once at creation, ~0.04 s per action, no Python worker
in any later job) with the same schema and values. ``local_frame`` is
the one place that conversion lives; use it wherever driver-local rows
become a DataFrame.

Fidelity notes:

* Every column is built as an ``object``-dtype pandas Series so pandas
  cannot coerce (``None`` in an int column must stay a null int, not
  become NaN-float); Spark's Arrow path then converts straight to the
  declared Spark type.
* Naive datetimes are interpreted in the SESSION timezone (pinned UTC,
  session.py) — on this engine's UTC-pinned sessions that is identical
  to the legacy pickle path, which used the process timezone.
* Values Arrow cannot convert fall back to the legacy pickle path
  (``spark.sql.execution.arrow.pyspark.fallback.enabled`` default) —
  semantics preserved, only the speedup is lost.
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def local_frame(
    spark: SparkSession,
    rows: Iterable[Sequence[Any]],
    schema: StructType | str,
) -> DataFrame:
    """Driver-local rows -> Arrow-backed DataFrame (LocalTableScan).

    ``rows``: sequence of positionally indexed rows (tuples / lists /
    Rows). ``schema``: DDL string or StructType — required, because the
    whole point is that no type inference happens on the way in.
    """
    import pandas as pd

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    rows = list(rows)
    data = {
        f.name: pd.Series([r[i] for r in rows], dtype=object)
        for i, f in enumerate(schema.fields)
    }
    pdf = pd.DataFrame(data, columns=schema.names)
    return spark.createDataFrame(pdf, schema)
