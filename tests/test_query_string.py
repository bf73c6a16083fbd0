"""query_string / simple_query_string: parser trees, Spark end-to-end
matching, unsupported-feature rejections, and simple's leniency."""

from __future__ import annotations

import pytest

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    DslError,
    compile_dsl,
)
from sql_database_to_elastic_datalake_spark.plans.query_string import (
    parse_query_string,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark engine fast", "infra", "en"),
        (2, "pandas loop slow", "infra", "en"),
        (3, "spark merge join", "query", "de"),
        (4, "elastic search cluster", "search", "en"),
        (5, None, "null-text", "fr"),
        (6, "spark pandas bridge", "interop", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, title string, lang string"
    )


def ids(docs, dsl):
    return sorted(
        r.doc_id for r in
        docs.filter(compile_dsl(dsl, schema_fields=docs.columns))
        .select("doc_id").collect()
    )


# -- parser trees ----------------------------------------------------------

def test_bare_terms_default_or():
    tree = parse_query_string({"query": "spark fast",
                               "default_field": "text"})
    assert tree == {"bool": {
        "should": [{"match": {"text": "spark"}},
                   {"match": {"text": "fast"}}],
        "minimum_should_match": 1,
    }}


def test_field_term_phrase_group():
    t = parse_query_string({"query": 'title:infra'}, ["text", "title"])
    assert t == {"match": {"title": "infra"}}
    t = parse_query_string({"query": 'text:"merge join"'}, ["text"])
    assert t == {"match_phrase": {"text": "merge join"}}
    t = parse_query_string({"query": "title:(infra query)"}, ["text"])
    assert t == {"bool": {
        "should": [{"match": {"title": "infra"}},
                   {"match": {"title": "query"}}],
        "minimum_should_match": 1,
    }}


def test_plus_minus_lucene_levels():
    # +a b -c = must:[a], must_not:[c], should:[b] msm 0 (a is required)
    t = parse_query_string({"query": "+spark pandas -slow",
                            "default_field": "text"})
    assert t == {"bool": {
        "must": [{"match": {"text": "spark"}}],
        "must_not": [{"match": {"text": "slow"}}],
        "should": [{"match": {"text": "pandas"}}],
        "minimum_should_match": 0,
    }}
    # a -b with nothing required: the optional clause IS required
    t = parse_query_string({"query": "spark -slow",
                            "default_field": "text"})
    assert t["bool"]["minimum_should_match"] == 1


def test_boolean_operators_and_precedence():
    # AND binds tighter than OR
    t = parse_query_string({"query": "a AND b OR c",
                            "default_field": "text"})
    assert t == {"bool": {"should": [
        {"bool": {"must": [{"match": {"text": "a"}},
                           {"match": {"text": "b"}}]}},
        {"match": {"text": "c"}},
    ], "minimum_should_match": 1}}
    # && / || / ! spellings; NOT folds into the conjunction
    t = parse_query_string({"query": "a && !b", "default_field": "text"})
    assert t == {"bool": {"must": [
        {"match": {"text": "a"}},
        {"bool": {"must_not": [{"match": {"text": "b"}}]}},
    ]}}


def test_multi_field_and_wildcards():
    t = parse_query_string({"query": "spark", "fields": ["text", "title"]})
    assert t == {"bool": {"should": [{"match": {"text": "spark"}},
                                     {"match": {"title": "spark"}}],
                 "minimum_should_match": 1}}
    # wildcard TERM -> wildcard leaf; field PATTERN expands vs schema
    t = parse_query_string({"query": "spa*", "fields": ["t*"]},
                           schema_fields=["text", "title", "doc_id"])
    assert t == {"bool": {"should": [{"wildcard": {"text": "spa*"}},
                                     {"wildcard": {"title": "spa*"}}],
                 "minimum_should_match": 1}}
    # ^boost suffixes RETAINED (r12): field weight x term boost rides
    # the generated leaf so the scored paths honor it; membership
    # (compile_dsl) still ignores it
    t = parse_query_string({"query": "spark^2", "fields": ["text^3"]})
    assert t == {"match": {"text": {"query": "spark", "boost": 6.0}}}
    # a malformed boost suffix is a named 400, like ES
    with pytest.raises(DslError, match="boost"):
        parse_query_string({"query": "spark^x", "fields": ["text"]})


def test_default_operator_and():
    t = parse_query_string({"query": "spark fast", "fields": ["text"],
                            "default_operator": "AND"})
    assert t == {"bool": {"must": [{"match": {"text": "spark"}},
                                   {"match": {"text": "fast"}}]}}


def test_exists_and_range_shorthand():
    t = parse_query_string({"query": "_exists_:lang", "fields": ["text"]})
    assert t == {"exists": {"field": "lang"}}
    t = parse_query_string({"query": "n_chars:>100", "fields": ["text"]})
    assert t == {"range": {"n_chars": {"gt": 100}}}
    t = parse_query_string({"query": "n_chars:>=1.5", "fields": ["text"]})
    assert t == {"range": {"n_chars": {"gte": 1.5}}}
    # non-numeric bounds stay strings (dates)
    t = parse_query_string({"query": "ts:<=2024-01-01", "fields": ["x"]})
    assert t == {"range": {"ts": {"lte": "2024-01-01"}}}
    # composes with boolean structure
    t = parse_query_string(
        {"query": "+n_chars:>100 -_exists_:lang", "fields": ["text"]})
    assert t == {"bool": {
        "must": [{"range": {"n_chars": {"gt": 100}}}],
        "must_not": [{"exists": {"field": "lang"}}],
    }}
    with pytest.raises(DslError, match="bound"):
        parse_query_string({"query": "n:>", "fields": ["x"]})
    with pytest.raises(DslError, match="field name"):
        parse_query_string({"query": "_exists_:", "fields": ["x"]})


def test_range_shorthand_end_to_end(docs):
    assert ids(docs, {"query_string": {
        "query": "doc_id:>=4 -_exists_:lang",
    }}) == [6]


def test_bracket_ranges(docs):
    """r7: Lucene ``[a TO b]`` / ``{a TO b}`` ranges — the most common
    still-rejected Kibana search-bar idiom — compile to the structured
    range leaf (inclusive/exclusive per bracket, * = open end)."""
    t = parse_query_string({"query": "doc_id:[2 TO 4]"}, ["doc_id"])
    assert t == {"range": {"doc_id": {"gte": 2, "lte": 4}}}
    t = parse_query_string({"query": "doc_id:{2 TO 4}"}, ["doc_id"])
    assert t == {"range": {"doc_id": {"gt": 2, "lt": 4}}}
    t = parse_query_string({"query": "doc_id:[2 TO *]"}, ["doc_id"])
    assert t == {"range": {"doc_id": {"gte": 2}}}
    # [* TO *] is Lucene's exists idiom
    t = parse_query_string({"query": "lang:[* TO *]"}, ["lang"])
    assert t == {"exists": {"field": "lang"}}
    # quoted bounds and date-looking strings stay strings
    t = parse_query_string({"query": 'lang:["de" TO en}'}, ["lang"])
    assert t == {"range": {"lang": {"gte": "de", "lt": "en"}}}
    # end-to-end (mixed brackets + a term)
    assert ids(docs, {"query_string": {
        "query": "doc_id:[3 TO 6} AND text:spark"}}) == [3]
    # field-less range applies per default field
    t = parse_query_string({"query": "[1 TO 2]", "fields": ["doc_id"]})
    assert t == {"range": {"doc_id": {"gte": 1, "lte": 2}}}
    # malformed forms are the client's error, by name
    for q, frag in [("doc_id:[1 TO", "unterminated"),
                    ("doc_id:[1 2]", "malformed range"),
                    ("TO", "stray TO")]:
        with pytest.raises(DslError, match=frag):
            parse_query_string({"query": q, "default_field": "text"})
    # ES's SIMPLE dialect has no range syntax: brackets stay literal
    t = parse_query_string({"query": "[1 TO 2]", "fields": ["text"]},
                           simple=True)
    assert t == {"bool": {"should": [
        {"match": {"text": "[1"}}, {"match": {"text": "TO"}},
        {"match": {"text": "2]"}}], "minimum_should_match": 1}}


def test_unsupported_features_named_400():
    # fuzzy ~ and /regex/ are LIVE since r7 (see
    # test_fuzzy_slop_regex_operators); malformed uses still reject
    with pytest.raises(DslError, match="fuzzy"):
        parse_query_string({"query": "~2", "default_field": "text"})
    with pytest.raises(DslError, match="unsupported query_string"):
        parse_query_string({"query": "x", "fields": ["text"],
                            "fuzziness": 2})
    with pytest.raises(DslError, match="unbalanced"):
        parse_query_string({"query": "(a b", "default_field": "text"})


def test_simple_dialect():
    # + is AND, | is OR, - negates; no field:value syntax
    t = parse_query_string({"query": "spark +fast", "fields": ["text"]},
                           simple=True)
    assert t == {"bool": {"must": [{"match": {"text": "spark"}},
                                   {"match": {"text": "fast"}}]}}
    t = parse_query_string({"query": "spark | pandas", "fields": ["text"]},
                           simple=True)
    assert t["bool"]["minimum_should_match"] == 1
    # a colon is literal text in simple_query_string
    t = parse_query_string({"query": "a:b", "fields": ["text"]},
                           simple=True)
    assert t == {"match": {"text": "a:b"}}
    # malformed syntax degrades to bare terms (ES's lenient posture)
    t = parse_query_string({"query": 'spark "unterminated',
                            "fields": ["text"]}, simple=True)
    assert t == {"bool": {"should": [{"match": {"text": "spark"}},
                                     {"match": {"text": "unterminated"}}],
                 "minimum_should_match": 1}}
    # fuzzy ~N is live in the simple dialect too (ES supports it);
    # a malformed bare ~ still rejects, never silently drops
    t = parse_query_string({"query": "spark~1", "fields": ["text"]},
                           simple=True)
    assert t == {"match": {"text": {"query": "spark", "fuzziness": 1}}}
    with pytest.raises(DslError, match="fuzzy"):
        parse_query_string({"query": "~1", "fields": ["text"]},
                           simple=True)


# -- Spark end-to-end ------------------------------------------------------

def test_query_string_end_to_end(docs):
    assert ids(docs, {"query_string": {
        "query": "spark AND (merge OR engine)", "default_field": "text",
    }}) == [1, 3]
    assert ids(docs, {"query_string": {
        "query": "+spark -pandas", "default_field": "text",
    }}) == [1, 3]
    assert ids(docs, {"query_string": {
        "query": 'text:"merge join" OR title:search',
    }}) == [3, 4]
    # fieldless default expands to * (every column, null-safe)
    assert ids(docs, {"query_string": {"query": "infra"}}) == [1, 2]
    # wildcard terms (the engine's whole-field wildcard-leaf semantics)
    assert ids(docs, {"query_string": {
        "query": "ela*r", "fields": ["text"],
    }}) == [4]
    # empty query matches nothing
    assert ids(docs, {"query_string": {"query": "   "}}) == []


def test_simple_query_string_end_to_end(docs):
    assert ids(docs, {"simple_query_string": {
        "query": "spark +pandas", "fields": ["text"],
    }}) == [6]
    assert ids(docs, {"simple_query_string": {
        "query": '"pandas loop" | cluster', "fields": ["text"],
    }}) == [2, 4]
    assert ids(docs, {"simple_query_string": {
        "query": "spark -merge", "fields": ["text"],
    }}) == [1, 6]


def test_query_string_via_advanced_search_route(spark, tmp_path):
    import json

    flask = pytest.importorskip("flask")  # noqa: F841
    from sql_database_to_elastic_datalake_spark.api import (
        LakeService,
        create_app,
    )

    service = LakeService(spark, str(tmp_path))
    service.ingest("label", [{"name": "spark engine"},
                             {"name": "pandas loop"},
                             {"name": "spark pandas bridge"}])
    app = create_app(service)
    app.testing = True
    c = app.test_client()
    r = c.post("/search/advanced", data=json.dumps({
        "table": "data_lake_label",
        "query": {"query_string": {"query": "name:(+spark -engine)"}},
    }), content_type="application/json")
    assert r.status_code == 200
    hits = r.get_json()["hits"]
    assert [h["_source"]["name"] for h in hits["hits"]] \
        == ["spark pandas bridge"]
    # a feature this engine cannot honor is a named 400
    r = c.post("/search/advanced", data=json.dumps({
        "table": "data_lake_label",
        "query": {"query_string": {"query": "~2"}},
    }), content_type="application/json")
    assert r.status_code == 400 and "fuzzy" in r.get_json()["error"]


def test_fuzzy_slop_regex_operators(docs):
    """r7: ~ fuzzy, "phrase"~N slop, and /regex/ now map onto the
    implemented leaves instead of 400ing."""
    # term~1: "spark" within 1 edit of "spork"
    t = parse_query_string({"query": "text:spork~1"}, ["text"])
    assert t == {"match": {"text": {"query": "spork",
                                    "fuzziness": 1}}}
    assert ids(docs, {"query_string": {"query": "text:spork~1"}}) \
        == [1, 3, 6]
    # bare ~ defaults to AUTO
    t = parse_query_string({"query": "spork~", "default_field": "text"})
    assert t == {"match": {"text": {"query": "spork",
                                    "fuzziness": "AUTO"}}}
    # "phrase"~N → match_phrase slop (doc 3: "spark merge join" —
    # "spark join" needs one intervening token)
    assert ids(docs, {"query_string": {
        "query": 'text:"spark join"~1'}}) == [3]
    assert ids(docs, {"query_string": {
        "query": 'text:"spark join"~0 OR text:"spark join"'}}) == []
    # /regex/ → the anchored regexp leaf
    t = parse_query_string({"query": "title:/inf.a/"}, ["title"])
    assert t == {"regexp": {"title": "inf.a"}}
    assert ids(docs, {"query_string": {
        "query": "title:/(infra|search)/"}}) == [1, 2, 4]
    # malformed forms stay the client's error
    with pytest.raises(DslError, match="fuzzy"):
        parse_query_string({"query": "text:~2"}, ["text"])
    with pytest.raises(DslError, match="unterminated regex"):
        parse_query_string({"query": "title:/inf"}, ["title"])
    # simple dialect: fuzzy works, regex stays literal text
    t = parse_query_string({"query": "spork~1", "fields": ["text"]},
                           simple=True)
    assert t == {"match": {"text": {"query": "spork", "fuzziness": 1}}}
