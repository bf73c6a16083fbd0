"""ES bulk wire-format export: framing, round-trip, sharding, mapping.

The format contract under test is the reference sink's wire shape
(/root/reference/src/es_connector.py:51-68 via helpers.bulk): pairs of
NDJSON lines — an ``{"index": {"_index", "_id"}}`` action header, then
the source document — where every output file is a complete valid
``_bulk`` request body.
"""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
    bulk_action_lines,
    create_index_body,
    write_bulk_ndjson,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="plain text", score=1.5),
            # embedded newline + quote: framing must survive both
            Row(doc_id=2, lang="de", text='line one\nline "two"', score=None),
            Row(doc_id=3, lang=None, text=None, score=0.0),
        ]
    )


def _parse_pairs(lines: list[str]) -> list[tuple[dict, dict]]:
    assert len(lines) % 2 == 0, "bulk bodies are action+source pairs"
    return [
        (json.loads(lines[i]), json.loads(lines[i + 1]))
        for i in range(0, len(lines), 2)
    ]


def test_action_lines_round_trip(docs):
    rows = bulk_action_lines(docs, "lake_docs", "doc_id").collect()
    # each row's value is exactly two physical lines, newline-safe
    pairs = []
    for r in rows:
        lines = r["value"].split("\n")
        assert len(lines) == 2
        pairs.append((json.loads(lines[0]), json.loads(lines[1])))
    by_id = {p[0]["index"]["_id"]: p for p in pairs}
    assert set(by_id) == {"1", "2", "3"}
    assert all(p[0]["index"]["_index"] == "lake_docs" for p in pairs)
    # source survives newline/quote escaping byte-for-byte
    assert by_id["2"][1]["text"] == 'line one\nline "two"'
    # NULL fields are omitted, not null-valued (ES absent-field shape)
    assert "score" not in by_id["2"][1]
    assert by_id["3"][1] == {"doc_id": 3, "score": 0.0}


def test_write_shards_are_valid_bulk_bodies(docs, spark, tmp_path):
    out = str(tmp_path / "bulk")
    write_bulk_ndjson(docs, out, "lake_docs", "doc_id", actions_per_file=1)
    files = sorted(glob.glob(os.path.join(out, "part-*")))
    assert files, "no bulk files written"
    seen = []
    for f in files:
        body = open(f).read()
        if not body:
            continue  # empty-partition shard
        assert body.endswith("\n"), "_bulk requires a trailing newline"
        pairs = _parse_pairs(body.rstrip("\n").split("\n"))
        # actions_per_file=1 → at most one action pair per request body
        assert len(pairs) == 1
        seen.extend(p[0]["index"]["_id"] for p in pairs)
    assert sorted(seen) == ["1", "2", "3"]


def test_framing_survives_adversarial_text(spark):
    """Framing depends on to_json escaping every newline-ish byte; feed
    it the worst strings a corpus can contain and re-parse the body."""
    nasty = [
        "\n\n\n",
        "\r\nwindows\r\n",
        'quote " backslash \\ slash /',
        "tab\tnull-ish\x00ctrl\x1b",
        "unicode:     séparateur émoji 🙂",
        '{"fake": "json"}\n{"index": {"_index": "evil"}}',
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(nasty)]
    )
    body = "\n".join(
        r["value"] for r in bulk_action_lines(df, "x", "doc_id").collect()
    )
    pairs = _parse_pairs(body.split("\n"))
    assert len(pairs) == len(nasty)
    got = {int(p[0]["index"]["_id"]): p[1].get("text") for p in pairs}
    for i, t in enumerate(nasty):
        assert got[i] == t


def test_null_id_fails_loudly(spark):
    """A NULL _id must fail the job, not emit an id-less action that ES
    would auto-id (identity loss + duplicate docs on re-export)."""
    df = spark.createDataFrame([(None, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        bulk_action_lines(df, "x", "doc_id").collect()


def test_write_mode_defaults_to_error(docs, tmp_path):
    out = str(tmp_path / "bulk_once")
    write_bulk_ndjson(docs, out, "lake_docs", "doc_id")
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY_EXISTS"):
        write_bulk_ndjson(docs, out, "lake_docs", "doc_id")
    # explicit opt-in replaces
    write_bulk_ndjson(docs, out, "lake_docs", "doc_id", mode="overwrite")


def test_create_index_body(docs):
    body = json.loads(create_index_body(docs, text_cols=("text",)))
    props = body["mappings"]["properties"]
    assert props["text"] == {"type": "text"}
    assert props["lang"] == {"type": "keyword"}
    assert props["doc_id"]["type"] == "long"
    assert props["score"]["type"] == "double"
