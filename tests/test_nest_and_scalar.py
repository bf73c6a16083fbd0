from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import (
    content_hash,
    document_id,
    json_get,
)
from sql_database_to_elastic_datalake_spark.operators.nest import (
    group_to_array,
    group_to_sorted_string,
    namespace_columns,
)


def test_group_to_array_sorted(spark):
    df = spark.createDataFrame(
        [Row(k=1, name="z", color="red"), Row(k=1, name="a", color=None),
         Row(k=2, name="m", color="blue")]
    )
    out = group_to_array(df, ["k"], ["name", "color"], "labels").collect()
    got = {r["k"]: [(x["name"], x["color"]) for x in r["labels"]] for r in out}
    assert got[1] == [("a", None), ("z", "red")]
    assert got[2] == [("m", "blue")]


def test_group_to_sorted_string_distinct(spark):
    df = spark.createDataFrame([Row(k=1, v="b"), Row(k=1, v="a"), Row(k=1, v="b")])
    out = group_to_sorted_string(df, ["k"], "v", "s").collect()
    assert out[0]["s"] == "a,b"


def test_namespace_columns(spark):
    df = spark.createDataFrame([Row(id=1, name="x")])
    out = namespace_columns(df, "nation")
    assert out.columns == ["nation_id", "nation_name", "table"]
    assert out.collect()[0]["table"] == "nation"


def test_content_hash_null_distinct_from_empty(spark):
    df = spark.createDataFrame([Row(a="x", b=None), Row(a="x", b="")])
    out = df.select(content_hash(["a", "b"]).alias("h")).collect()
    # NULL and '' must hash differently (NUL sentinel), and same content
    # must hash identically (idempotency).
    assert out[0]["h"] != out[1]["h"]
    assert len(out[0]["h"]) == 32
    again = df.select(content_hash(["a", "b"]).alias("h")).collect()
    assert [r["h"] for r in again] == [r["h"] for r in out]


def test_document_id_and_json_get(spark):
    df = spark.createDataFrame([Row(id=7, ts="2026-01-01", props='{"k": 5}')])
    out = df.select(
        document_id("id", "ts").alias("d"),
        json_get("props", "$.k").cast("int").alias("k"),
    ).collect()[0]
    assert out["d"] == "7_2026-01-01"
    assert out["k"] == 5
