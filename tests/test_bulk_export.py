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


# ---------------------------------------------------------------------------
# ES-grammar-strict consumer (r4): the sandbox-maximum substitute for a
# live cluster. _strict_bulk_parse applies the _bulk endpoint's actual
# framing rules — anything it accepts, ES's request parser accepts.
# ---------------------------------------------------------------------------

ACTIONS_WITH_SOURCE = {"index", "create", "update"}
ACTIONS = ACTIONS_WITH_SOURCE | {"delete"}
META_KEYS = {
    "_index", "_id", "_type", "routing", "if_seq_no", "if_primary_term",
    "version", "version_type", "require_alias", "retry_on_conflict",
    "pipeline", "dynamic_templates",
}


def _strict_bulk_parse(body: bytes) -> list[tuple[str, dict, dict | None]]:
    """Parse a ``_bulk`` request body under ES's framing grammar.

    Enforces: UTF-8 payload; final newline; no blank lines; every
    action line is an object with EXACTLY one key from the action
    vocabulary; metadata keys come from the documented set; index/
    create/update are followed by exactly one source line (an object);
    delete is not. Returns (op, meta, source) triples or raises
    ValueError — the strictness IS the test.
    """
    text = body.decode("utf-8", errors="strict")
    if not text.endswith("\n"):
        raise ValueError("bulk body must end with a newline")
    lines = text[:-1].split("\n")
    out: list[tuple[str, dict, dict | None]] = []
    i = 0
    while i < len(lines):
        raw = lines[i]
        if raw == "":
            raise ValueError(f"blank line at {i}")
        action = json.loads(raw)
        if not isinstance(action, dict) or len(action) != 1:
            raise ValueError(f"action line {i} must be a one-key object")
        (op, meta), = action.items()
        if op not in ACTIONS:
            raise ValueError(f"unknown action {op!r} at line {i}")
        if not isinstance(meta, dict):
            raise ValueError(f"action metadata at line {i} must be an object")
        bad = set(meta) - META_KEYS
        if bad:
            raise ValueError(f"unknown metadata keys {sorted(bad)} at line {i}")
        if op in ACTIONS_WITH_SOURCE:
            if i + 1 >= len(lines):
                raise ValueError(f"action at line {i} missing its source line")
            src = json.loads(lines[i + 1])
            if not isinstance(src, dict):
                raise ValueError(f"source at line {i + 1} must be an object")
            out.append((op, meta, src))
            i += 2
        else:
            out.append((op, meta, None))
            i += 1
    return out


def test_strict_consumer_round_trips_full_corpus_export(spark, tmp_path):
    """Export the ENTIRE sf0.01 documents table through the sink, then
    consume every emitted file with the strict parser: each file a valid
    request body, every doc_id echoed exactly once with its text intact."""
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    docs01 = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = str(tmp_path / "bulk_full")
    write_bulk_ndjson(docs01, out, "lake_documents", "doc_id",
                      actions_per_file=128)
    ids, texts = [], {}
    for f in sorted(glob.glob(os.path.join(out, "part-*"))):
        body = open(f, "rb").read()
        if not body:
            continue
        for op, meta, src in _strict_bulk_parse(body):
            assert op == "index" and meta["_index"] == "lake_documents"
            assert meta["_id"] == str(src["doc_id"])
            ids.append(meta["_id"])
            texts[meta["_id"]] = src.get("text")
    want = {
        str(r["doc_id"]): r["text"]
        for r in docs01.select("doc_id", "text").collect()
    }
    assert sorted(ids) == sorted(want)          # exactly once each
    assert len(ids) == len(set(ids))
    assert texts == want                        # byte-identical text echo


def test_strict_consumer_rejects_adversarial_bodies():
    """Each payload violates one _bulk grammar rule; the parser must
    refuse all of them (a consumer that accepts any of these would also
    mask a framing bug in the exporter)."""
    good_action = b'{"index": {"_index": "i", "_id": "1"}}'
    bad_bodies = [
        b"",                                            # empty, no newline
        good_action + b'\n{"a": 1}',                    # missing final \n
        good_action + b"\n",                            # action without source
        good_action + b'\n\n{"a": 1}\n',                # blank line between
        b'{"index": {"_index": "i"}, "extra": {}}\n{"a": 1}\n',  # two keys
        b'{"upsert": {"_index": "i"}}\n{"a": 1}\n',     # unknown action
        b'{"index": {"_bogus": "x"}}\n{"a": 1}\n',      # unknown meta key
        b'{"index": {"_index": "i"}}\n[1, 2]\n',        # non-object source
        # source line after delete: parsed as the next action, whose
        # key "a" is no bulk op -> rejected
        b'{"delete": {"_index": "i", "_id": "1"}}\n{"a": 1}\n'
        + good_action + b"\n",
        b'{"index": "not-an-object"}\n{"a": 1}\n',      # meta not an object
        '{"index": {"_index": "i", "_id": "1"}}\n{"a": "é"}\n'.encode(
            "latin-1"
        ),                                              # invalid UTF-8
        b'not json at all\n',                           # unparseable
    ]
    for body in bad_bodies:
        with pytest.raises((ValueError, json.JSONDecodeError)):
            _strict_bulk_parse(body)


def test_strict_consumer_accepts_delete_and_mixed_ops():
    """The grammar itself: delete has no source; mixed op streams parse."""
    body = (
        b'{"index": {"_index": "i", "_id": "1"}}\n{"a": 1}\n'
        b'{"delete": {"_index": "i", "_id": "2"}}\n'
        b'{"create": {"_index": "i", "_id": "3"}}\n{"b": 2}\n'
    )
    ops = _strict_bulk_parse(body)
    assert [o[0] for o in ops] == ["index", "delete", "create"]
    assert ops[1][2] is None and ops[2][2] == {"b": 2}
