"""Elasticsearch bulk-API wire-format export.

The reference's physical sink is the ES ``_bulk`` endpoint: every batch
becomes a list of ``{"_index": ..., "_id": ..., "_source": doc}``
actions handed to ``elasticsearch.helpers.bulk``
(/root/reference/src/es_connector.py:51-68, action construction
/root/reference/src/data_sync.py:124-130). On the wire each action
serializes to two NDJSON lines::

    {"index": {"_index": "<index>", "_id": "<id>"}}
    {... source document ...}

This module emits exactly that format from Spark, distributed: every
row becomes its action+source line pair via ``to_json`` (JVM-side,
whole-stage codegen — no Python in the path), and the text writer
shards the output so that EACH FILE IS ONE VALID BULK REQUEST BODY.
A reference user migrating to the lake can still load any table into a
live cluster with plain ``curl -XPOST _bulk --data-binary @part-*.txt``
— the batch-size knob of the reference's sync loop
(/root/reference/src/config.py:28) maps to ``actions_per_file``.

Scale notes:
  * One narrow projection per row; no shuffle — the write parallelism
    is the upstream partitioning. ``actions_per_file`` bounds request
    sizes exactly like ``maxRecordsPerFile`` bounds parquet files.
  * JSON string values escape embedded newlines (``\\n`` → ``\\\\n``),
    so the two-lines-per-action framing is safe for arbitrary text.
  * NULL fields are OMITTED from ``_source`` (``ignoreNullFields``),
    matching ES's treatment of absent vs null fields and the
    reference's sanitizer dropping unserializable values.

The index-creation half of the reference sink
(/root/reference/src/es_connector.py:21-35, per-entity mappings
/root/reference/src/data_sync.py:22-54) becomes a driver-side sidecar:
``create_index_body`` renders the ``PUT /<index>`` payload from the
DataFrame schema via :func:`schemas.lake_mapping`.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.schemas import lake_mapping


def bulk_action_lines(
    df: DataFrame, index_name: str, id_col: str
) -> DataFrame:
    """One ``value: string`` row per document holding its two bulk
    lines (action header + source), ready for ``.write.text``.

    A NULL id fails the job loudly (``raise_error``): silently emitting
    an action without ``_id`` would make ES auto-generate one, so the
    document loses its identity and every re-export duplicates it —
    and whether the NULL is dropped or serialized as ``"_id": null``
    would otherwise depend on the session's
    ``spark.sql.jsonGenerator.ignoreNullFields``.
    """
    id_str = F.col(id_col).cast("string")
    checked_id = F.when(id_str.isNotNull(), id_str).otherwise(
        F.raise_error(
            F.lit(f"bulk export: NULL {id_col} cannot be a document _id")
        )
    )
    action = F.to_json(
        F.struct(
            F.struct(
                F.lit(index_name).alias("_index"),
                checked_id.alias("_id"),
            ).alias("index")
        )
    )
    source = F.to_json(
        F.struct(*[F.col(c) for c in df.columns]),
        {"ignoreNullFields": "true"},
    )
    return df.select(F.concat_ws("\n", action, source).alias("value"))


def write_bulk_ndjson(
    df: DataFrame,
    path: str,
    index_name: str,
    id_col: str,
    actions_per_file: int = 1000,
    compression: str | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as ES bulk request bodies under ``path``.

    Each emitted file holds at most ``actions_per_file`` actions (the
    reference's ``batch_size``) and is a complete, valid ``_bulk``
    payload (trailing newline included by the text writer). ``mode``
    follows the DataFrameWriter contract and defaults to
    ``error`` — destroying an existing export requires an explicit
    ``mode="overwrite"``, same as :func:`sinks.writer.write_lake`'s
    caller-chosen modes.
    """
    writer = (
        bulk_action_lines(df, index_name, id_col)
        .write.mode(mode)
        .option("maxRecordsPerFile", actions_per_file)
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)


def create_index_body(df: DataFrame, text_cols: tuple[str, ...] = ()) -> str:
    """The ``PUT /<index>`` JSON body for ``df``'s schema.

    Columns in ``text_cols`` map to analyzed ``text``; everything else
    follows the :func:`schemas.lake_mapping` ladder (the reference's
    per-entity mapping dicts, /root/reference/src/data_sync.py:22-54,
    derived from the schema instead of hand-written).
    """
    props = {
        name: {"type": "text" if name in text_cols else t}
        for name, t in lake_mapping(df.schema).items()
    }
    return json.dumps({"mappings": {"properties": props}}, sort_keys=True)
