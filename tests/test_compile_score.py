"""Relevance ``boost`` (r12): compile_score ordering parity vs pinned
ES semantics.

The r11 verdict's #1 missing item: ``title^2`` / ``{"boost": 2}`` were
parsed-and-ignored, so any boosted saved query got ES-divergent hit
ordering. These tests pin the ES ordering contracts that survive the
engine's deterministic-tf divergence: a boost multiplies its clause's
score, bool sums matching scoring clauses, dis_max takes the best plus
tie_breaker times the rest, constant_score scores its boost,
best_fields vs most_fields shape multi_match, and function_score's
base is the inner query's real score with the top-level boost
multiplying the result. Each scenario is constructed so ES's BM25
would order identically (same-text docs, boost-dominated gaps) — the
ordering, not the absolute score, is the parity claim.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    DslError,
    compile_dsl,
    compile_score,
    split_field_boost,
    tf_score,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "spark spark spark", "apache", "en"),
         (2, "spark merge", "spark", "en"),
         (3, "merge merge", "merge", "de"),
         (4, "nothing", None, "fr")],
        "id long, txt string, title string, lang string",
    )


def ranked(df, dsl, schema=None):
    p = compile_dsl(dsl, schema_fields=schema or df.columns)
    s = compile_score(dsl, schema_fields=schema or df.columns)
    rows = (df.filter(p).withColumn("_s", s)
            .orderBy(F.col("_s").desc(), F.col("id")).collect())
    return [(r["id"], r["_s"]) for r in rows]


def test_field_boost_flips_best_fields_order(docs):
    # unboosted: doc1 wins on txt tf (3 spark). title^10 makes doc2's
    # title match dominate — ES's ^boost contract: the boosted field's
    # score scales, flipping the order
    dsl = {"multi_match": {"query": "spark", "fields": ["txt", "title"]}}
    assert [i for i, _ in ranked(docs, dsl)] == [1, 2]
    dsl = {"multi_match": {"query": "spark",
                           "fields": ["txt", "title^10"]}}
    assert [i for i, _ in ranked(docs, dsl)] == [2, 1]


def test_multi_match_types_and_tie_breaker(docs):
    # doc2 matches "spark" in BOTH fields (tf 1 each); doc1 only in
    # txt (tf 3). best_fields (default): doc1 3 > doc2 1. most_fields
    # sums: doc2 2 < 3 still, but tie_breaker 1.0 == most_fields
    base = {"query": "spark", "fields": ["txt", "title"]}
    bf = ranked(docs, {"multi_match": base})
    assert bf[0] == (1, 3.0) and bf[1] == (2, 1.0)
    mf = ranked(docs, {"multi_match": {**base, "type": "most_fields"}})
    assert mf[0] == (1, 3.0) and mf[1] == (2, 2.0)
    tb = ranked(docs, {"multi_match": {**base, "tie_breaker": 1.0}})
    assert tb == mf


def test_bool_should_sums_matching_boosted_clauses(docs):
    # ES: a bool's score is the sum of its matching scoring clauses,
    # each times its boost; non-matching should clauses contribute 0
    dsl = {"bool": {"should": [
        {"term": {"lang": {"value": "de", "boost": 10.0}}},
        {"match": {"txt": "merge"}},
    ]}}
    out = ranked(docs, dsl)
    # doc3: 10 (de) + 2 (merge tf) = 12; doc2: 0 + 1 = 1
    assert out == [(3, 12.0), (2, 1.0)]
    # must clauses also contribute score; filter does not
    dsl = {"bool": {
        "must": [{"match": {"txt": "merge"}}],
        "filter": [{"term": {"lang": "de"}}],
    }}
    assert ranked(docs, dsl) == [(3, 2.0)]
    # a filter-only bool scores 0.0 — exactly ES
    assert ranked(docs, {"bool": {"filter": [
        {"term": {"lang": "en"}}]}}) == [(1, 0.0), (2, 0.0)]


def test_dis_max_tie_breaker_and_constant_score(docs):
    dsl = {"dis_max": {"queries": [
        {"match": {"txt": "spark"}},
        {"constant_score": {"filter": {"term": {"lang": "en"}},
                            "boost": 2.5}},
    ], "tie_breaker": 0.4}}
    out = dict(ranked(docs, dsl))
    # doc1: best max(3, 2.5)=3 + 0.4*2.5 = 4.0; doc2: max(1,2.5)=2.5
    # + 0.4*1 = 2.9
    assert out[1] == pytest.approx(4.0) and out[2] == pytest.approx(2.9)


def test_boosting_demotes_negative_matches(docs):
    dsl = {"boosting": {
        "positive": {"match": {"txt": "merge"}},
        "negative": {"term": {"lang": "de"}},
        "negative_boost": 0.1,
    }}
    # doc3 has the higher raw tf (2) but is demoted to 0.2 below
    # doc2's 1.0 — ES's boosting contract
    assert ranked(docs, dsl) == [(2, 1.0), (3, pytest.approx(0.2))]
    with pytest.raises(DslError, match="negative_boost"):
        compile_score({"boosting": {
            "positive": {"match_all": {}},
            "negative": {"match_all": {}}}})


def test_query_string_boosts_flow_through_parse(docs):
    # Lucene term^boost: merge^10 outranks doc1's triple spark
    dsl = {"query_string": {"query": "spark OR merge^10",
                            "fields": ["txt"]}}
    out = ranked(docs, dsl)
    assert [i for i, _ in out] == [3, 2, 1]
    assert dict(out)[3] == 20.0 and dict(out)[1] == 3.0
    # field weight multiplies term boost; top-level boost scales all
    dsl = {"query_string": {"query": "spark^2", "fields": ["txt^3"],
                            "boost": 0.5}}
    assert dict(ranked(docs, dsl))[1] == pytest.approx(9.0)


def test_phrase_scoring_counts_whole_phrase(docs):
    # match_phrase scores occurrences of the PHRASE, not its tokens:
    # doc3 repeats "merge merge"? no — "merge merge" contains the
    # 2-gram "merge merge" once; doc2's "spark merge" zero times
    out = ranked(docs, {"match_phrase": {"txt": "merge merge"}})
    assert out == [(3, 1.0)]


def test_boost_validation_named_400s(docs):
    with pytest.raises(DslError, match="non-negative"):
        compile_score({"match": {"txt": {"query": "x", "boost": -1}}})
    with pytest.raises(DslError, match="malformed"):
        split_field_boost("txt^x")
    with pytest.raises(DslError, match="weights must match"):
        tf_score(["txt"], "x", weights=[1.0, 2.0])
    with pytest.raises(DslError, match="not supported"):
        compile_score({"function_score": {"query": {"match_all": {}}}})


def test_function_score_base_is_query_score(docs):
    from sql_database_to_elastic_datalake_spark.plans.score_dsl import (
        function_score_columns,
        script_score_columns,
    )

    pred, score, _ = function_score_columns(
        {"query": {"match": {"txt": {"query": "spark", "boost": 2.0}}},
         "functions": [{"filter": {"term": {"lang": "en"}},
                        "weight": 3.0}],
         "boost": 0.5},
        F.col, docs.columns, date_fields=set())
    rows = {r["id"]: r["_s"] for r in docs.filter(pred)
            .withColumn("_s", score).collect()}
    # doc1: base 3*2=6, fn 3.0, multiply, x boost 0.5 → 9.0
    assert rows[1] == pytest.approx(9.0)
    assert rows[2] == pytest.approx(3.0)
    # script_score: _score binds to the inner query's REAL score and
    # the top-level boost multiplies the script result
    pred, score, _ = script_score_columns(
        {"query": {"match": {"txt": "spark"}},
         "script": {"source": "_score * 10.0"}, "boost": 2.0},
        F.col, docs.columns)
    rows = {r["id"]: r["_s"] for r in docs.filter(pred)
            .withColumn("_s", score).collect()}
    assert rows[1] == pytest.approx(60.0) and rows[2] == pytest.approx(20.0)


def test_api_text_query_ranks_by_score(spark, tmp_path):
    """Top-level multi_match/query_string on /search/advanced rank by
    the computed _score (ES's default order) when nothing forces the
    membership page; feature combinations the ranked page doesn't
    carry fall back to the pre-r12 membership behavior."""
    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(1, "spark", "b"), (2, "spark spark spark", "a"),
         (3, "other", "c")],
        "id long, txt string, grp string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_rank"))
    out = svc.advanced_search(
        "data_lake_rank",
        {"multi_match": {"query": "spark", "fields": ["txt"]}}, k=5)
    hits = out["hits"]["hits"]
    assert [h["_source"]["id"] for h in hits] == [2, 1]
    assert hits[0]["_score"] == 3.0 and hits[1]["_score"] == 1.0
    # an explicit sort wins (membership page, no _score ranking)
    out = svc.advanced_search(
        "data_lake_rank",
        {"multi_match": {"query": "spark", "fields": ["txt"]}},
        k=5, sort=[{"id": "desc"}])
    assert [h["_source"]["id"]
            for h in out["hits"]["hits"]] == [2, 1]
    # collapse forces the membership page instead of a 400
    out = svc.advanced_search(
        "data_lake_rank",
        {"multi_match": {"query": "spark", "fields": ["txt"]}},
        k=5, sort=[{"id": "asc"}], collapse={"field": "grp"})
    assert len(out["hits"]["hits"]) == 2
    # query_string with term boosts ranks boosted-first
    out = svc.advanced_search(
        "data_lake_rank",
        {"query_string": {"query": "other^100 OR spark",
                          "fields": ["txt"]}}, k=5)
    assert [h["_source"]["id"]
            for h in out["hits"]["hits"]] == [3, 2, 1]
    # bare match and dis_max rank too (r12 widened routing)
    out = svc.advanced_search(
        "data_lake_rank", {"match": {"txt": "spark"}}, k=5)
    assert [h["_source"]["id"] for h in out["hits"]["hits"]] == [2, 1]
    assert out["hits"]["max_score"] == 3.0
    out = svc.advanced_search("data_lake_rank", {"dis_max": {
        "queries": [{"match": {"txt": "spark"}},
                    {"match": {"txt": "other"}}]}}, k=5)
    assert out["hits"]["hits"][0]["_source"]["id"] == 2


def test_highlight_rides_the_ranked_page(spark, tmp_path):
    """r12: highlight works on the ranked pages — the canonical search
    UI request (multi_match + highlight, no sort) gets score-ordered
    hits WITH highlight, and function_score + highlight no longer
    400s."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(1, "spark once"), (2, "spark spark twice")],
        "id long, txt string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_hr"))
    out = svc.advanced_search(
        "data_lake_hr",
        {"multi_match": {"query": "spark", "fields": ["txt"]}},
        k=5, highlight={"fields": {"txt": {}}})
    hits = out["hits"]["hits"]
    assert [h["_source"]["id"] for h in hits] == [2, 1]  # ranked
    assert hits[0]["highlight"]["txt"] == \
        ["<em>spark</em> <em>spark</em> twice"]
    assert hits[1]["highlight"]["txt"] == ["<em>spark</em> once"]
    out = svc.advanced_search(
        "data_lake_hr",
        {"function_score": {
            "query": {"match": {"txt": "spark"}},
            "functions": [{"filter": {"term": {"id": 1}},
                           "weight": 100.0}]}},
        k=5, highlight={"fields": {"txt": {}}})
    hits = out["hits"]["hits"]
    assert hits[0]["_source"]["id"] == 1  # weight flips the order
    assert "highlight" in hits[0]


def test_search_route_honors_field_boosts(spark, tmp_path):
    """The reference-shaped /search route (fields list): ^boost
    weights each field's tf contribution — title^5 outranks a
    body-only repeat match."""
    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(1, "spark spark spark", "x"), (2, "spark", "spark")],
        "id long, body string, title string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_w"))
    out = svc.search("spark", ["data_lake_w"], k=5,
                     fields=["body", "title^5"])
    ids = [__import__("json").loads(h["_source"])["id"]
           if isinstance(h.get("_source"), str) else h["_source"]["id"]
           for h in out["hits"]["hits"]]
    assert ids == [2, 1]  # 1 + 5*1 = 6 beats 3


def test_random_score_seeded_deterministic(spark, tmp_path):
    """r12: random_score with seed+field is the deterministic variant
    ES documents — same seed = same order across sessions; different
    seeds reshuffle; unseeded / partial forms stay named 400s."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(i, "x") for i in range(20)], "id long, t string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_rs"))

    def order(seed):
        out = svc.advanced_search("data_lake_rs", {"function_score": {
            "functions": [{"random_score": {"seed": seed,
                                            "field": "id"}}],
            "boost_mode": "replace"}}, k=20)
        return [h["_source"]["id"] for h in out["hits"]["hits"]]

    a, b, c = order(1), order(1), order(2)
    assert a == b and a != c and sorted(a) == list(range(20))
    # scores are uniform [0,1)
    out = svc.advanced_search("data_lake_rs", {"function_score": {
        "functions": [{"random_score": {"seed": 1, "field": "id"}}],
        "boost_mode": "replace"}}, k=20)
    assert all(0.0 <= h["_score"] < 1.0 for h in out["hits"]["hits"])
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    with pytest.raises(DslError, match="seed and field"):
        svc.advanced_search("data_lake_rs", {"function_score": {
            "functions": [{"random_score": {"seed": 1}}]}}, k=1)
    with pytest.raises(DslError, match="random_score keys"):
        svc.advanced_search("data_lake_rs", {"function_score": {
            "functions": [{"random_score": {"seed": 1, "field": "id",
                                            "salt": 2}}]}}, k=1)


def test_collapse_rides_the_ranked_page(spark, tmp_path):
    """r12: collapse under the default _score order (ES's contract —
    no explicit sort needed): one best hit per field value, collapse
    key under `fields`, totals count PRE-collapse matches; collapse
    inner_hits still need the sorted membership page (named 400
    guidance preserved via fallback)."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(1, "spark", "a"), (2, "spark spark", "a"),
         (3, "spark spark spark", "b"), (4, "none", "c")],
        "id long, txt string, grp string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_cr"))
    out = svc.advanced_search(
        "data_lake_cr", {"match": {"txt": "spark"}}, k=5,
        collapse={"field": "grp"})
    hits = out["hits"]["hits"]
    # one hit per group, best-by-score first: b's triple, then a's pair
    assert [(h["_source"]["id"], h["fields"]["grp"]) for h in hits] \
        == [(3, ["b"]), (2, ["a"])]
    # totals count pre-collapse MATCHES (3), not groups (2)
    assert out["hits"]["total"] == {"value": 3, "relation": "eq"}
    # function_score + collapse also rides the ranked page now
    out = svc.advanced_search(
        "data_lake_cr",
        {"function_score": {"query": {"match": {"txt": "spark"}}}},
        k=5, collapse={"field": "grp"})
    assert len(out["hits"]["hits"]) == 2


def test_indices_boost_and_rescore_on_ranked_page(spark, tmp_path):
    """r12: indices_boost multiplies per-table scores on pattern
    searches (first matching pattern wins) and rescore's two-phase
    ranking rides the ranked page; both are named 400s on pages with
    no scores (never silently dropped)."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame([(1, "spark spark")], "id long, txt string") \
        .write.parquet(os.path.join(svc.lake_dir, "data_lake_iba"))
    spark.createDataFrame([(2, "spark")], "id long, txt string") \
        .write.parquet(os.path.join(svc.lake_dir, "data_lake_ibb"))
    q = {"multi_match": {"query": "spark", "fields": ["txt"]}}
    out = svc.advanced_search("data_lake_ib*", q, k=5)
    assert [h["_source"]["id"] for h in out["hits"]["hits"]] == [1, 2]
    out = svc.advanced_search(
        "data_lake_ib*", q, k=5,
        indices_boost=[{"data_lake_ibb": 10.0}])
    hits = out["hits"]["hits"]
    assert [h["_source"]["id"] for h in hits] == [2, 1]
    assert hits[0]["_score"] == 10.0 and hits[1]["_score"] == 2.0
    # rescore: the window re-ranks by combined score
    spark.createDataFrame(
        [(1, "spark spark spark", "x"), (2, "spark", "loop loop")],
        "id long, txt string, extra string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_rr"))
    out = svc.advanced_search(
        "data_lake_rr", {"match": {"txt": "spark"}}, k=5,
        rescore={"window_size": 5, "query": {
            "rescore_query": {"match": {"extra": "loop"}},
            "rescore_query_weight": 10.0}})
    hits = out["hits"]["hits"]
    # doc2: 1 + 10*2 = 21 beats doc1's 3 + 0
    assert [h["_source"]["id"] for h in hits] == [2, 1]
    assert hits[0]["_score"] == 21.0
    assert out["hits"]["max_score"] == 21.0
    # scoring-only keys on a sorted (membership) page: named 400s
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    with pytest.raises(DslError, match="indices_boost needs"):
        svc.advanced_search("data_lake_rr", {"match": {"txt": "spark"}},
                            k=5, sort=[{"id": "asc"}],
                            indices_boost=[{"a": 2.0}])
    with pytest.raises(DslError, match="rescore needs"):
        svc.advanced_search("data_lake_rr", {"term": {"id": 1}},
                            k=5, rescore={"query": {
                                "rescore_query": {"match": {"txt": "x"}}}})
    with pytest.raises(DslError, match="factor"):
        svc.advanced_search("data_lake_rr", {"match": {"txt": "spark"}},
                            k=5, indices_boost=[{"a": -1}])


def test_min_score_on_advanced_ranked_page(spark, tmp_path):
    """r12: the advanced body's min_score floors the ranked page —
    hits below it drop from page AND totals (ES's contract); on a
    page with no scores it is a named 400, not a silent drop."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    svc = LakeService(spark, str(tmp_path))
    spark.createDataFrame(
        [(1, "spark"), (2, "spark spark spark")],
        "id long, txt string",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_ms"))
    out = svc.advanced_search(
        "data_lake_ms", {"match": {"txt": "spark"}}, k=5,
        min_score=2.0)
    assert [h["_source"]["id"] for h in out["hits"]["hits"]] == [2]
    assert out["hits"]["total"] == {"value": 1, "relation": "eq"}
    with pytest.raises(DslError, match="min_score needs"):
        svc.advanced_search("data_lake_ms", {"term": {"id": 1}},
                            k=5, min_score=1.0)
    with pytest.raises(DslError, match="must be a number"):
        svc.advanced_search("data_lake_ms", {"match": {"txt": "spark"}},
                            k=5, min_score="high")


def test_compile_score_cache_keys(spark):
    """r15 (r14 verdict #6): compile_score shares the bounded compile
    cache — same (dsl, schema) with the default resolver returns the
    SAME unresolved Column handle; a different schema is a distinct
    entry; a custom resolver bypasses the cache; and the score
    namespace never collides with compile_dsl's entries for the same
    dsl."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        _COMPILE_CACHE,
        compile_dsl,
        compile_score,
    )

    _COMPILE_CACHE.clear()
    dsl = {"match": {"txt": "spark rdd"}}
    s1 = ["id", "txt"]
    s2 = ["id", "txt", "extra"]
    a = compile_score(dsl, schema_fields=s1)
    b = compile_score(dsl, schema_fields=s1)
    assert a is b                       # cache hit: same handle
    c = compile_score(dsl, schema_fields=s2)
    assert c is not a                   # schema is part of the key
    d = compile_dsl(dsl, schema_fields=s1)
    assert d is not a                   # namespaces never collide
    # a custom resolver must bypass the cache entirely
    n0 = len(_COMPILE_CACHE)
    e = compile_score(dsl, field_resolver=lambda f: F.col(f),
                      schema_fields=s1)
    assert e is not a and len(_COMPILE_CACHE) == n0
    # and the cached handle still evaluates correctly on a frame
    df = spark.createDataFrame(
        [(1, "spark spark rdd"), (2, "none")], "id long, txt string")
    got = {r["id"]: r["s"] for r in
           df.select("id", compile_score(dsl, schema_fields=s1)
                     .alias("s")).collect()}
    assert got[1] > got[2]
