"""JSONL/CSV file ingestion: quarantine split, type strictness, headers.

Contract under test (sources/text_files.py): one text scan per drop;
every line parses into the declared schema or lands in quarantine with
its raw payload — a type-mismatched field rejects the WHOLE line
instead of silently nulling one column, while valid-but-empty rows
pass through for downstream required-field policy.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sql_database_to_elastic_datalake_spark.sources.text_files import (
    RAW_COL,
    REASON_COL,
    read_csv_lines,
    read_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_jsonl_split(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "lang": "en", "score": 0.5}',
                "",  # blank: dropped, not quarantined
                "not json at all",
                '{"doc_id": "oops", "lang": "de", "score": 1.0}',  # type fail
                '{}',  # valid-but-empty: accepted
                '{"doc_id": 2, "lang": null, "score": null}',
            ]
        )
        + "\n"
    )
    good, bad = read_jsonl(spark, str(p), SCHEMA)
    assert good.columns == ["doc_id", "lang", "score"]
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, None}
    assert rows[1]["score"] == 0.5 and rows[2]["lang"] is None
    quarantined = bad.collect()
    assert sorted(r[RAW_COL] for r in quarantined) == [
        "not json at all",
        '{"doc_id": "oops", "lang": "de", "score": 1.0}',
    ]
    assert all(r[REASON_COL] == "malformed json" for r in quarantined)


def test_csv_split_and_header(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "\n".join(
            [
                "doc_id,lang,score",
                "1,en,0.5",
                "zz,de,1.0",  # type fail → whole line quarantined
                "doc_id,lang,score",  # repeated header (concatenated files)
                "2,,",
            ]
        )
        + "\n"
    )
    good, bad = read_csv_lines(spark, str(p), SCHEMA, header=True)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["lang"] is None
    assert [r[RAW_COL] for r in bad.collect()] == ["zz,de,1.0"]


def test_corrupt_name_collision_rejected(spark, tmp_path):
    clash = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError):
        read_jsonl(spark, str(tmp_path), clash)


def test_single_scan_plan(spark, tmp_path):
    """Both outputs come from one text scan — no json re-read, no cache."""
    p = tmp_path / "d.jsonl"
    p.write_text('{"doc_id": 1, "lang": "en", "score": 0.1}\n')
    good, bad = read_jsonl(spark, str(p), SCHEMA)
    for df in (good, bad):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan text") == 1
        assert "InMemoryTableScan" not in plan
