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
    assert [(r[RAW_COL], r[REASON_COL]) for r in bad.collect()] == [
        ("zz,de,1.0", "malformed csv")
    ]


def test_csv_embedded_newline_fragments_quarantined(spark, tmp_path):
    """An RFC-4180 record with a quoted embedded newline splits into
    two physical lines; BOTH must quarantine (odd quote count), never
    land in the good frame with a silently truncated field. Escaped
    ("" doubled) quotes stay even-counted and parse fine."""
    p = tmp_path / "nl.csv"
    p.write_text('1,"hello\nworld",0.5\n2,"ok ""quoted"" value",1.0\n')
    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    good, bad = read_csv_lines(spark, str(p), sch, header=False)
    assert [tuple(r) for r in good.collect()] == [(2, 'ok "quoted" value', 1.0)]
    assert sorted((r[RAW_COL], r[REASON_COL]) for r in bad.collect()) == [
        ('1,"hello', "unbalanced quotes"),
        ('world",0.5', "unbalanced quotes"),
    ]


def test_csv_quoted_field_names(spark, tmp_path):
    """Field names needing DDL quoting work in the CSV reader too
    (schema goes through toDDL, not lossy simpleString)."""
    p = tmp_path / "q.csv"
    p.write_text("1,x\n")
    sch = T.StructType(
        [
            T.StructField("doc id", T.LongType()),
            T.StructField("lang:tag", T.StringType()),
        ]
    )
    good, bad = read_csv_lines(spark, str(p), sch, header=False)
    assert [tuple(r) for r in good.collect()] == [(1, "x")]
    assert bad.count() == 0


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
