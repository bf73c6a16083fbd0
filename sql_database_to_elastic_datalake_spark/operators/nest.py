"""Nesting / namespacing operators: group-to-array and column prefixing.

Reference semantics covered (SURVEY.md §2):
  * A3 group-to-array — labels grouped per ticket into ``[{id,name,color}]``
    (/root/reference/src/document_utils.py:78-99) and statuses/labels/
    datasources grouped per module (/root/reference/src/data_sync.py:436-461).
    Spark-first this is ``groupBy(key).agg(collect_list(struct(...)))``.
  * P4 column namespacing — prefix every column ``<table>_<col>`` and add a
    ``table`` provenance column (/root/reference/data_lake_sync.py:152-164).

Scale notes:
  * ``collect_list`` shuffles once on the group key; element order after a
    shuffle is nondeterministic, so every nesting API here sorts the
    array (``array_sort`` / ``sort_array``) to make output deterministic —
    required for differential testing and for content-hash idempotency.
  * Arrays-per-key are assumed small (labels per ticket ≈ 0–3 in the
    reference fixtures). For keys with unbounded fan-in, nest a capped
    ``slice`` or pre-aggregate; an array that does not fit in one task's
    memory means the data model, not the operator, is wrong.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_to_array(
    df: DataFrame,
    keys: Sequence[str],
    struct_cols: Sequence[str],
    out_col: str,
) -> DataFrame:
    """Group rows per key into a deterministic sorted array of structs.

    ``array_sort`` on structs compares fields left-to-right, so put the
    natural sort field first in ``struct_cols``.
    """
    arr = F.array_sort(F.collect_list(F.struct(*[F.col(c) for c in struct_cols])))
    return df.groupBy(*keys).agg(arr.alias(out_col))


def group_to_sorted_string(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str,
    sep: str = ",",
    distinct: bool = True,
) -> DataFrame:
    """Group values per key into one sorted, delimiter-joined string.

    A serialization-stable sibling of :func:`group_to_array` for
    hash-matched outputs and content-addressed ids.
    """
    collect = F.collect_set(value_col) if distinct else F.collect_list(value_col)
    return df.groupBy(*keys).agg(
        F.concat_ws(sep, F.sort_array(collect)).alias(out_col)
    )


def namespace_columns(
    df: DataFrame,
    table_name: str,
    exclude: Sequence[str] = (),
    provenance_col: str = "table",
) -> DataFrame:
    """Prefix columns ``<table>_<col>`` and add a provenance column.

    Reference: /root/reference/data_lake_sync.py:152-164 (the legacy
    generic sync namespaces every column except ``data`` and stamps the
    source table name on each row).
    """
    cols = [
        F.col(c) if c in exclude else F.col(c).alias(f"{table_name}_{c}")
        for c in df.columns
    ]
    return df.select(*cols).withColumn(provenance_col, F.lit(table_name))
