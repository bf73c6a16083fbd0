from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    DslError,
    compile_dsl,
    tf_score,
    tokenize,
)
from sql_database_to_elastic_datalake_spark.plans.search import (
    hits_envelope,
    multi_match_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(id=1, kind="a", n=5, txt="Spark merges fast", tags=[Row(name="x", w=1)]),
            Row(id=2, kind="b", n=15, txt="slow pandas loop", tags=[Row(name="y", w=9)]),
            Row(id=3, kind="a", n=25, txt=None, tags=[]),
            Row(id=4, kind=None, n=None, txt="spark spark spark", tags=None),
        ]
    )


def run(docs, dsl):
    return sorted(r["id"] for r in docs.filter(compile_dsl(dsl)).collect())


def test_term_terms_ids(docs):
    assert run(docs, {"term": {"kind": "a"}}) == [1, 3]
    assert run(docs, {"term": {"kind": {"value": "b"}}}) == [2]
    assert run(docs, {"terms": {"n": [5, 25]}}) == [1, 3]
    assert run(docs, {"ids": {"field": "id", "values": [1, 4]}}) == [1, 4]


def test_range_exists(docs):
    assert run(docs, {"range": {"n": {"gte": 5, "lt": 25}}}) == [1, 2]
    assert run(docs, {"exists": {"field": "txt"}}) == [1, 2, 4]


def test_match_family(docs):
    # OR tokens by default
    assert run(docs, {"match": {"txt": "spark pandas"}}) == [1, 2, 4]
    # AND operator
    assert run(docs, {"match": {"txt": {"query": "spark merges", "operator": "and"}}}) == [1]
    assert run(docs, {"match_phrase": {"txt": "pandas loop"}}) == [2]
    assert run(docs, {"prefix": {"txt": "Spark"}}) == [1]
    assert run(docs, {"wildcard": {"txt": "s*loop"}}) == [2]
    assert run(docs, {"multi_match": {"query": "b", "fields": ["kind", "txt"]}}) == [2]


def test_regexp_fuzzy(docs):
    # regexp anchors to the whole value (Lucene semantics), so a bare
    # fragment must NOT match mid-string without explicit .*
    assert run(docs, {"regexp": {"kind": "a|b"}}) == [1, 2, 3]
    assert run(docs, {"regexp": {"txt": "spark.*"}}) == [4]
    assert run(docs, {"regexp": {"txt": "spark"}}) == []
    # r11: Lucene-subset translation — @ is Lucene's any-string
    # (previously a Java literal → silently matched nothing)...
    assert run(docs, {"regexp": {"txt": "spark@"}}) == [4]
    # ...and the automaton operators are named 400s, not Java literals
    with pytest.raises(DslError, match="Lucene regexp operator"):
        run(docs, {"regexp": {"txt": "spark~1"}})
    with pytest.raises(DslError, match="Lucene regexp operator"):
        run(docs, {"regexp": {"txt": "a&b"}})
    # escaped forms stay literals; in-class chars stay literals
    assert run(docs, {"regexp": {"txt": "spark[&~]?.*"}}) == [4]
    # fuzzy: AUTO fuzziness for a 5-char term allows 1 edit
    assert run(docs, {"fuzzy": {"kind": "a"}}) == [1, 3]  # 0 edits (len<=2)
    assert run(
        docs, {"fuzzy": {"txt": {"value": "slow pandas losp", "fuzziness": 2}}}
    ) == [2]
    # documented AUTO:low,high form: plain AUTO gives a 1-char term 0
    # edits ([2] only), AUTO:1,20 gives it 1 edit so "a" matches too
    assert run(docs, {"fuzzy": {"kind": {"value": "b", "fuzziness": "AUTO"}}}) == [2]
    assert run(
        docs, {"fuzzy": {"kind": {"value": "b", "fuzziness": "AUTO:1,20"}}}
    ) == [1, 2, 3]
    # malformed fuzziness must surface as DslError (the module's
    # reject-bad-user-query contract), not a raw ValueError
    with pytest.raises(DslError):
        compile_dsl({"fuzzy": {"kind": {"value": "a", "fuzziness": "AUTO:x"}}})
    with pytest.raises(DslError):
        compile_dsl({"fuzzy": {"kind": {"value": "a", "fuzziness": "two"}}})


def test_bool_nesting(docs):
    dsl = {
        "bool": {
            "must": [{"range": {"n": {"gte": 5}}}],
            "must_not": [{"term": {"kind": "b"}}],
            "should": [{"term": {"id": 1}}, {"term": {"id": 3}}],
        }
    }
    # shoulds don't filter when musts exist (msm defaults 0)
    assert run(docs, dsl) == [1, 3]
    dsl["bool"]["minimum_should_match"] = 1
    assert run(docs, dsl) == [1, 3]
    dsl["bool"]["should"].append({"term": {"kind": "a"}})
    dsl["bool"]["minimum_should_match"] = 2
    assert run(docs, dsl) == [1, 3]
    assert run(docs, {"bool": {}}) == [1, 2, 3, 4]


def test_minimum_should_match_spec_grammar(docs):
    """The full ES msm grammar: percentages, negatives, conditionals."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        resolve_minimum_should_match as msm,
    )

    assert msm(2, 4) == 2
    assert msm(-1, 4) == 3           # one may be missing
    assert msm("75%", 4) == 3
    assert msm("75%", 5) == 3        # rounded DOWN (Lucene spec)
    assert msm("-25%", 5) == 4       # floor(25% of 5)=1 may be missing
    assert msm("100%", 3) == 3
    assert msm("3<90%", 3) == 3      # n <= test: all required
    assert msm("3<90%", 10) == 9     # n > test: spec applies
    assert msm("2<-25% 9<-3", 5) == 4   # middle bracket: -25% of 5
    assert msm("2<-25% 9<-3", 12) == 9  # top bracket: 12-3
    assert msm("2<-25% 9<-3", 2) == 2   # below all brackets
    for bad in ("", "abc", "x%", "3<", "1.5", None, 1.5, True):
        with pytest.raises(DslError):
            msm(bad, 4)

    # end-to-end through a bool: 3 shoulds, "67%" of 3 → 2 required
    base = [{"term": {"kind": "a"}},       # rows 1,3
            {"range": {"n": {"gte": 15}}},  # rows 2,3
            {"term": {"id": 3}}]            # row 3
    dsl = {"bool": {"should": list(base), "minimum_should_match": "67%"}}
    assert run(docs, dsl) == [3]
    # 0% with no required clauses: Lucene still demands one optional hit
    dsl = {"bool": {"should": list(base), "minimum_should_match": "0%"}}
    assert run(docs, dsl) == [1, 2, 3]
    # computed minimum above the clause count matches nothing
    dsl = {"bool": {"should": list(base[:2]), "minimum_should_match": 3}}
    assert run(docs, dsl) == []
    # negative form: -1 of 3 shoulds → 2 required, same rows as 67%
    dsl = {"bool": {"should": list(base), "minimum_should_match": -1}}
    assert run(docs, dsl) == [3]


def test_boost_accepted_and_ignored(docs):
    """boost never changes the match set (documented divergence: it
    only ever affected scores, and ranking here comes from tf_score)."""
    plain = run(docs, {"term": {"kind": "a"}})
    assert run(docs, {"term": {"kind": {"value": "a", "boost": 4.0}}}) == plain
    assert run(docs, {"bool": {"must": [{"term": {"kind": "a"}}],
                               "boost": 0.1}}) == plain
    with_suffix = {"multi_match": {"query": "b", "fields": ["kind^3", "txt^0.2"]}}
    without = {"multi_match": {"query": "b", "fields": ["kind", "txt"]}}
    assert run(docs, with_suffix) == run(docs, without) == [2]


def test_multi_match_wildcard_fields(docs):
    """Wildcard field patterns expand against the passed schema, like
    ES expands them from the index mapping."""
    cols = docs.columns  # id, kind, n, txt, tags

    def run_s(dsl):
        return sorted(
            r["id"] for r in
            docs.filter(compile_dsl(dsl, schema_fields=cols)).collect()
        )

    # "t*t" → txt only (tags doesn't match the pattern)
    assert run_s({"multi_match": {"query": "pandas", "fields": ["t?t"]}}) == [2]
    # pattern + boost suffix compose
    assert run_s({"multi_match": {"query": "b", "fields": ["k*^2"]}}) == [2]
    # a pattern resolving to no columns matches no documents
    assert run_s({"multi_match": {"query": "spark", "fields": ["zz*"]}}) == []
    # duplicate expansion is deduped, not double-counted
    assert run_s(
        {"multi_match": {"query": "spark", "fields": ["txt", "t?t"]}}
    ) == [1, 4]
    # without a schema, wildcard patterns are a clean DslError
    with pytest.raises(DslError, match="schema"):
        compile_dsl({"multi_match": {"query": "x", "fields": ["*_name"]}})
    # inside a bool, schema_fields reaches the nested multi_match
    dsl = {"bool": {"must": [
        {"multi_match": {"query": "loop", "fields": ["tx*"]}}]}}
    assert run_s(dsl) == [2]


def test_constant_score_phrase_prefix_terms_set(docs, spark):
    # constant_score: transparent filter wrapper, boost ignored
    assert run(docs, {"constant_score": {
        "filter": {"term": {"kind": "a"}}, "boost": 1.2,
    }}) == [1, 3]
    with pytest.raises(DslError, match="filter"):
        compile_dsl({"constant_score": {"boost": 1.2}})
    # match_phrase_prefix: last term may be a word prefix
    assert run(docs, {"match_phrase_prefix": {"txt": {"query": "pandas lo"}}}) == [2]
    assert run(docs, {"match_phrase_prefix": {"txt": "Spark mer"}}) == [1]

    # terms_set over an array column with a per-doc required count
    arr = spark.createDataFrame(
        [Row(id=1, tags=["a", "b", "c"], need=2),
         Row(id=2, tags=["a"], need=2),
         Row(id=3, tags=["b", "c"], need=1),
         Row(id=4, tags=None, need=1),
         Row(id=5, tags=["a", "b"], need=None)],
    )

    def run_a(dsl):
        return sorted(r["id"] for r in arr.filter(compile_dsl(dsl)).collect())

    assert run_a({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match_field": "need",
    }}}) == [1, 3]  # 2-of-2, 1-of-2; null tags/need never match
    # fixed minimum_should_match, including the spec grammar
    assert run_a({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": 2,
    }}}) == [1, 5]
    assert run_a({"terms_set": {"tags": {
        "terms": ["a", "b"], "minimum_should_match": "50%",
    }}}) == [1, 2, 3, 5]  # floor(50% of 2) = 1 required
    for bad in ({"terms_set": {"tags": {"terms": ["a"]}}},
                {"terms_set": {"tags": ["a"]}},
                {"terms_set": {"tags": {"terms": ["a"],
                                        "minimum_should_match_script": {}}}}):
        with pytest.raises(DslError):
            compile_dsl(bad)


def test_nested_query(docs):
    dsl = {
        "nested": {
            "path": "tags",
            "query": {
                "bool": {
                    "must": [
                        {"term": {"tags.name": "y"}},
                        {"range": {"tags.w": {"gt": 5}}},
                    ]
                }
            },
        }
    }
    assert run(docs, dsl) == [2]


def test_errors(docs):
    with pytest.raises(DslError):
        compile_dsl({"unknown_kind": {}})
    with pytest.raises(DslError):
        compile_dsl({"range": {"a": {"between": [1, 2]}}})
    with pytest.raises(DslError):
        compile_dsl({"term": {"a": 1, "b": 2}})


def test_tokenize_and_tf_score(docs, spark):
    assert tokenize("Hello, World-2!") == ["hello", "world", "2"]
    scored = docs.filter(F.col("txt").isNotNull()).select(
        "id", tf_score(["txt"], "spark").alias("s")
    )
    got = {r["id"]: r["s"] for r in scored.collect()}
    assert got[4] == 3.0 and got[1] == 1.0 and got[2] == 0.0


def test_multi_match_table_and_envelope(docs):
    out = multi_match_table(docs, "spark")
    assert sorted(r["id"] for r in out.collect()) == [1, 4]
    env = hits_envelope(out, k=1, order_by=["id"]).collect()
    assert len(env) == 1 and env[0]["total"] == 2


def test_bm25_rank_shape(spark):
    """BM25 invariants: rare terms outrank common ones at equal tf, and
    longer documents are damped at equal tf."""
    from pyspark.sql import Row

    from sql_database_to_elastic_datalake_spark.plans.search import bm25_rank

    corpus = spark.createDataFrame(
        [
            Row(id=1, txt="alpha beta"),            # short, has rare 'alpha'
            Row(id=2, txt="beta beta beta beta beta beta beta beta alpha"),
            Row(id=3, txt="beta gamma"),
            Row(id=4, txt="beta delta"),
            Row(id=5, txt="beta epsilon"),
        ]
    )
    scored = {r["id"]: r for r in bm25_rank(corpus, "txt", "alpha beta").collect()}
    assert set(scored) == {1, 2, 3, 4, 5}  # all contain a query term
    # doc 1 and doc 2 both contain alpha once; doc 2 is much longer → damped
    assert scored[1]["bm25"] > scored[2]["bm25"]
    # doc 1 has rare alpha + common beta; doc 3 only common beta → lower
    assert scored[1]["bm25"] > scored[3]["bm25"]
    # helper columns are dropped from the output
    assert set(scored[1].asDict()) == {"id", "txt", "bm25"}


def test_leaf_options_implemented_or_named_400(docs):
    """r6: leaf spec options follow the no-silent-wrong-results
    posture — case_insensitive / zero_terms_query / multi_match
    operator are IMPLEMENTED; options with match-set semantics we
    don't honor (fuzziness-in-match, slop, …) are named 400s; boost
    and scoring-only keys stay accepted-and-ignored."""
    # case_insensitive on term/prefix/wildcard/regexp
    assert run(docs, {"term": {"txt": {
        "value": "SPARK MERGES FAST", "case_insensitive": True}}}) == [1]
    assert run(docs, {"term": {"txt": {
        "value": "SPARK MERGES FAST"}}}) == []
    assert run(docs, {"prefix": {"txt": {
        "value": "SPA", "case_insensitive": True}}}) == [1, 4]
    assert run(docs, {"prefix": {"txt": "SPA"}}) == []
    assert run(docs, {"wildcard": {"txt": {
        "value": "*PANDAS*", "case_insensitive": True}}}) == [2]
    assert run(docs, {"regexp": {"txt": {
        "value": "SPARK.*", "case_insensitive": True}}}) == [1, 4]
    # match zero_terms_query: an empty-analyzing query matches all/none
    assert run(docs, {"match": {"txt": {
        "query": "!!!", "zero_terms_query": "all"}}}) == [1, 2, 3, 4]
    assert run(docs, {"match": {"txt": {"query": "!!!"}}}) == []
    # multi_match operator=and requires every token in SOME field
    assert run(docs, {"multi_match": {
        "query": "spark fast", "fields": ["txt"], "operator": "and",
    }}) == [1]
    assert run(docs, {"multi_match": {
        "query": "spark fast", "fields": ["txt"],
    }}) == [1, 4]
    # scoring-only keys pass (type/tie_breaker/boost)
    assert run(docs, {"multi_match": {
        "query": "spark", "fields": ["txt"], "type": "best_fields",
        "tie_breaker": 0.3,
    }}) == [1, 4]
    # match/multi_match fuzziness and match_phrase slop are LIVE since
    # r7 (see test_match_fuzziness / test_match_phrase_slop); the rest
    # of the unimplemented match-set options stay named, never dropped
    assert run(docs, {"multi_match": {"query": "spork",
                                      "fields": ["txt"],
                                      "fuzziness": 1}}) == [1, 4]
    with pytest.raises(DslError, match="analyzer"):
        compile_dsl({"multi_match": {"query": "x", "fields": ["txt"],
                                     "analyzer": "std"}})
    with pytest.raises(DslError, match="transpositions"):
        compile_dsl({"fuzzy": {"txt": {"value": "x",
                                       "transpositions": False}}})
    # malformed slop is still the client's error
    with pytest.raises(DslError, match="slop"):
        compile_dsl({"match_phrase": {"txt": {"query": "x y",
                                              "slop": -1}}})


def test_match_phrase_slop(docs):
    """r7: sloppy phrases — in-order positional token match with at
    most `slop` extra positions between first and last (documented
    divergence: no reordered matches)."""
    # docs[1] txt: "Spark merges fast" — "spark fast" has one
    # intervening token: slop 1 matches, slop 0 keeps substring
    # semantics (no match)
    assert run(docs, {"match_phrase": {"txt": {
        "query": "spark fast", "slop": 1}}}) == [1]
    assert run(docs, {"match_phrase": {"txt": {
        "query": "spark fast", "slop": 0}}}) == []
    # adjacent tokens match at any slop; reversed order does not
    assert run(docs, {"match_phrase": {"txt": {
        "query": "spark merges", "slop": 3}}}) == [1]
    assert run(docs, {"match_phrase": {"txt": {
        "query": "merges spark", "slop": 1}}}) == []
    # single-token phrase degrades to a plain match
    assert run(docs, {"match_phrase": {"txt": {
        "query": "pandas", "slop": 2}}}) == [2]
    # phrase-length honesty cap is a named error
    with pytest.raises(DslError, match="at most"):
        compile_dsl({"match_phrase": {"txt": {
            "query": "a b c d e f g h i", "slop": 1}}})


def test_match_fuzziness(docs):
    """r7: fuzziness inside match — each query token matches any
    DOCUMENT token within its edit budget (AUTO ladder like ES)."""
    # "spork" ≤1 edit from "spark" (docs 1 and 4)
    assert run(docs, {"match": {"txt": {
        "query": "spork", "fuzziness": 1}}}) == [1, 4]
    assert run(docs, {"match": {"txt": {
        "query": "spork", "fuzziness": 0}}}) == []
    # AUTO: 5-char token allows 1 edit
    assert run(docs, {"match": {"txt": {
        "query": "spork", "fuzziness": "AUTO"}}}) == [1, 4]
    # operator=and requires every token fuzzily present
    # ("merge" is 1 edit from doc 1's "merges")
    assert run(docs, {"match": {"txt": {
        "query": "spork merge", "fuzziness": 1,
        "operator": "and"}}}) == [1]
    # terms' sibling boost key is accepted-and-ignored like ES allows
    assert run(docs, {"terms": {"n": [5, 25], "boost": 2.0}}) == [1, 3]


def test_r7_compound_leaves(docs):
    """r7: dis_max (union membership), boosting (positive-only
    membership, negative still validated), match_bool_prefix,
    combined_fields (term-centric), wrapper (base64 passthrough),
    pinned (ids ∪ organic)."""
    import base64
    import json

    assert run(docs, {"dis_max": {"queries": [
        {"term": {"kind": "b"}}, {"match": {"txt": "merges"}},
    ], "tie_breaker": 0.7}}) == [1, 2]
    assert run(docs, {"boosting": {
        "positive": {"range": {"n": {"lte": 15}}},
        "negative": {"term": {"kind": "a"}},
        "negative_boost": 0.2,
    }}) == [1, 2]
    # the negative clause still compiles — malformed trees error
    with pytest.raises(DslError, match="unsupported query kind"):
        run(docs, {"boosting": {"positive": {"match_all": {}},
                                "negative": {"nope": {}}}})
    with pytest.raises(DslError, match="positive"):
        run(docs, {"boosting": {"negative": {"match_all": {}}}})
    # match_bool_prefix: trailing fragment is a prefix ("me" → merges)
    assert run(docs, {"match_bool_prefix": {"txt": {
        "query": "spark me", "operator": "and"}}}) == [1]
    assert run(docs, {"match_bool_prefix": {"txt": "zzz sp"}}) == [1, 4]
    # combined_fields is TERM-centric: each term may match a
    # different field ("b" matches kind, "pandas" matches txt)
    assert run(docs, {"combined_fields": {
        "query": "b pandas", "fields": ["kind", "txt"],
        "operator": "and"}}) == [2]
    assert run(docs, {"combined_fields": {
        "query": "b merges", "fields": ["kind", "txt"]}}) == [1, 2]
    # multi_match (field-centric best_fields) differs on the same
    # body: no single field carries both terms
    assert run(docs, {"multi_match": {
        "query": "b pandas", "fields": ["kind", "txt"],
        "operator": "and"}}) == []
    w = base64.b64encode(
        json.dumps({"term": {"kind": "a"}}).encode()).decode()
    assert run(docs, {"wrapper": {"query": w}}) == [1, 3]
    with pytest.raises(DslError, match="base64"):
        run(docs, {"wrapper": {"query": "!!not-base64-json!!"}})
    assert run(docs, {"pinned": {
        "ids": [3], "field": "id",
        "organic": {"term": {"kind": "b"}}}}) == [2, 3]
    with pytest.raises(DslError, match="queries"):
        run(docs, {"dis_max": {"queries": []}})


def test_token_spans_shared_analyzer():
    """r9: one shared TOKEN_RE drives tokenize(), the corpus split
    pattern and the suggest envelope's offset scan. token_spans scans
    the ORIGINAL text (offsets index the request as sent) and a
    non-token codepoint is a break — never an entry — so the suggest
    job and envelope agree by construction."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        TOKEN_SPLIT_RE,
        token_spans,
        tokenize,
    )

    assert token_spans("Spak tabel") == [("spak", 0, 4),
                                         ("tabel", 5, 5)]
    # 'İ' is outside the token class: a break in the original text,
    # though lower-first tokenize() still folds it to an 'i' token
    # (the match analyzer mirrors the Spark-side lower-then-split)
    assert token_spans("İstanbul") == [("stanbul", 1, 7)]
    assert tokenize("İstanbul") == ["i", "stanbul"]
    # the split pattern is the complement of the match pattern
    import re

    assert re.compile(TOKEN_SPLIT_RE).split("a-b c") == ["a", "b", "c"]


def test_more_like_this_term_selection_and_msm(spark):
    """r9: more_like_this — like-text tf term selection
    (min_term_freq, min_word_length, stop_words, max_query_terms with
    the alphabetical tie-break) and the minimum_should_match count."""
    import pytest

    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
        compile_dsl,
    )

    df = spark.createDataFrame(
        [(1, "spark merge table"), (2, "spark table"), (3, "spark"),
         (4, "pandas loop"), (5, None)],
        "id long, txt string")
    # like text: spark x3, table x2, merge x1 (below min_term_freq),
    # the x2 (stopword) → selected terms {spark, table}; msm 2 needs
    # both
    pred = compile_dsl({"more_like_this": {
        "fields": ["txt"],
        "like": "the spark table, the spark table... spark merge",
        "min_term_freq": 2, "stop_words": ["the"],
        "minimum_should_match": 2,
    }}, schema_fields=df.columns)
    assert sorted(r["id"] for r in df.filter(pred).collect()) == [1, 2]
    # msm "30%" of 2 terms floors to 0 → Lucene's at-least-one rule
    pred = compile_dsl({"more_like_this": {
        "fields": ["txt"],
        "like": "the spark table the spark table spark",
        "min_term_freq": 2, "stop_words": ["the"],
    }}, schema_fields=df.columns)
    assert sorted(r["id"] for r in df.filter(pred).collect()) == \
        [1, 2, 3]
    # max_query_terms keeps the top-tf terms, alphabetical tie-break:
    # tf2 {merge, spark, table} → top-2 = {merge, spark}
    pred = compile_dsl({"more_like_this": {
        "fields": ["txt"], "like": "spark spark table table merge merge",
        "min_term_freq": 2, "max_query_terms": 2,
        "minimum_should_match": 2,
    }}, schema_fields=df.columns)
    assert sorted(r["id"] for r in df.filter(pred).collect()) == [1]
    # no term survives selection → matches nothing (ES's empty query)
    pred = compile_dsl({"more_like_this": {
        "fields": ["txt"], "like": "every word once only here",
    }}, schema_fields=df.columns)
    assert df.filter(pred).count() == 0
    with pytest.raises(DslError, match="fields list"):
        compile_dsl({"more_like_this": {"like": "x x"}})
    with pytest.raises(DslError, match="resolved by the API layer"):
        compile_dsl({"more_like_this": {
            "fields": ["txt"], "like": [{"_id": 7}]}})
    with pytest.raises(DslError, match="unsupported more_like_this"):
        compile_dsl({"more_like_this": {
            "fields": ["txt"], "like": "x", "unlike": "y"}})


# ---------------------------------------------------------------------------
# span queries (r9) — positional membership over the token array
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_docs(spark):
    return spark.createDataFrame(
        [
            Row(id=1, txt="alpha beta; gamma beta"),
            Row(id=2, txt="beta gamma alpha"),
            Row(id=3, txt=None),
            Row(id=4, txt="alphabet soup gamma delta gamma"),
        ]
    )


def test_span_term_or_first(span_docs):
    assert run(span_docs, {"span_term": {"txt": "beta"}}) == [1, 2]
    assert run(span_docs, {"span_term": {"txt": {"value": "Beta"}}}) == [1, 2]
    assert run(span_docs, {"span_or": {"clauses": [
        {"span_term": {"txt": "soup"}},
        {"span_term": {"txt": "beta"}}]}}) == [1, 2, 4]
    # span_first: end is the exclusive span end — position < end
    assert run(span_docs, {"span_first": {
        "match": {"span_term": {"txt": "beta"}}, "end": 1}}) == [2]
    assert run(span_docs, {"span_first": {
        "match": {"span_term": {"txt": "beta"}}, "end": 2}}) == [1, 2]


def test_span_near_ordered(span_docs):
    q = lambda slop: {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "gamma"}}],
        "slop": slop, "in_order": True}}
    # doc1: alpha@0 gamma@2 (1 intervening); doc2 has gamma BEFORE alpha
    assert run(span_docs, q(0)) == []
    assert run(span_docs, q(1)) == [1]
    # unordered matches doc2 too (adjacent, 0 intervening)
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "gamma"}}],
        "slop": 0, "in_order": False}}) == [2]
    # span_or as a span_near clause
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "soup"}},
        {"span_or": {"clauses": [
            {"span_term": {"txt": "delta"}},
            {"span_term": {"txt": "beta"}}]}}],
        "slop": 1, "in_order": True}}) == [4]
    # single clause degenerates to membership
    assert run(span_docs, {"span_near": {
        "clauses": [{"span_term": {"txt": "soup"}}]}}) == [4]


def test_span_near_default_in_order(span_docs):
    """r10 ADVICE fix: ES defaults in_order to TRUE
    (SpanNearQueryBuilder.DEFAULT_IN_ORDER) — a body without an
    explicit in_order must take the ordered chain, and 3+ clauses
    with slop must NOT hit the unordered-2-clause 400."""
    q = lambda slop: {"span_near": {"clauses": [  # noqa: E731
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "gamma"}}],
        "slop": slop}}
    # doc2 has gamma BEFORE alpha: matched only by in_order: false
    assert run(span_docs, q(0)) == []
    assert run(span_docs, q(1)) == [1]
    # 3 clauses + slop + no in_order: valid ES body — ordered chain,
    # no spurious unordered-2-clause 400
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "alphabet"}},
        {"span_term": {"txt": "gamma"}},
        {"span_term": {"txt": "delta"}}],
        "slop": 1}}) == [4]


def test_span_not_and_multi(span_docs):
    # gamma positions not in the first 3 positions
    assert run(span_docs, {"span_not": {
        "include": {"span_term": {"txt": "gamma"}},
        "exclude": {"span_first": {
            "match": {"span_term": {"txt": "gamma"}}, "end": 3}},
    }}) == [4]
    assert run(span_docs, {"span_multi": {"match": {
        "prefix": {"txt": {"value": "alph"}}}}}) == [1, 2, 4]
    assert run(span_docs, {"span_multi": {"match": {
        "wildcard": {"txt": "*lph*"}}}}) == [1, 2, 4]
    assert run(span_docs, {"span_multi": {"match": {
        "regexp": {"txt": "gamm."}}}}) == [1, 2, 4]
    assert run(span_docs, {"span_multi": {"match": {
        "fuzzy": {"txt": {"value": "bata", "fuzziness": 1}}}}}) == [1, 2]
    # span_multi inside span_near
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_multi": {"match": {"prefix": {"txt": {"value": "alphab"}}}}},
        {"span_term": {"txt": "gamma"}}],
        "slop": 1, "in_order": True}}) == [4]


def test_span_near_nested_and_unordered_k(span_docs):
    """r10: the span algebra carries real (start, end) spans — a
    NESTED ordered span_near is an ordinary clause, and unordered
    span_near takes any clause count with exact Lucene window
    semantics (max_e − min_s − Σlen ≤ slop; overlap permitted)."""
    # nested ordered chain: (alpha→beta) then gamma, adjacent
    inner = {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "beta"}}], "slop": 0}}
    assert run(span_docs, {"span_near": {"clauses": [
        inner, {"span_term": {"txt": "gamma"}}], "slop": 0}}) == [1]
    # slop counts GAPS, not clause widths: the 2-token inner span ends
    # at 2; delta@3 is gap 1 in doc4 ("alphabet soup gamma delta …")
    inner2 = {"span_near": {"clauses": [
        {"span_term": {"txt": "alphabet"}},
        {"span_term": {"txt": "soup"}}], "slop": 0}}
    q = lambda slop: {"span_near": {"clauses": [  # noqa: E731
        inner2, {"span_term": {"txt": "delta"}}], "slop": slop}}
    assert run(span_docs, q(0)) == []
    assert run(span_docs, q(1)) == [4]
    # unordered with 3 clauses: minimum window over alpha/beta/gamma
    # is tight (3 tokens in 3 positions) in docs 1 and 2
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "beta"}},
        {"span_term": {"txt": "gamma"}}],
        "slop": 0, "in_order": False}}) == [1, 2]
    # ordered keeps doc1 (alpha@0→beta@1→gamma@2) but rejects doc2
    # ("beta gamma alpha" — wrong order at any slop)
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "beta"}},
        {"span_term": {"txt": "gamma"}}],
        "slop": 3, "in_order": True}}) == [1]
    # r11: unordered spans may OVERLAP — Lucene's
    # NearSpansUnordered.atMatch checks only the window condition
    # (max_e − min_s − Σlen ≤ slop), so two clauses matching the SAME
    # single token pair up (window −1 ≤ slop); doc4 has "soup"
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "soup"}},
        {"span_multi": {"match": {"prefix": {"txt": {
            "value": "sou"}}}}}],
        "slop": 9, "in_order": False}}) == [4]
    # …and even at slop 0 (the overlap window is negative)
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "soup"}},
        {"span_multi": {"match": {"prefix": {"txt": {
            "value": "sou"}}}}}],
        "slop": 0, "in_order": False}}) == [4]
    # r10-late: a nested UNORDERED span_near produces spans via the
    # permutation enumeration — (gamma,beta unordered adjacent) is
    # [1,3) in doc1 ("alpha beta; gamma beta": beta@1 gamma@2... no:
    # gamma@2,beta@3 → [2,4) and beta@1,gamma@2 → [1,3)), then alpha
    # immediately before one of them
    inner_u = {"span_near": {"clauses": [
        {"span_term": {"txt": "gamma"}},
        {"span_term": {"txt": "beta"}}],
        "slop": 0, "in_order": False}}
    assert run(span_docs, {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}}, inner_u],
        "slop": 0, "in_order": True}}) == [1]
    # doc2 "beta gamma alpha": the unordered pair spans [0,2); alpha
    # follows it, so the reversed outer chain matches doc2 only
    assert run(span_docs, {"span_near": {"clauses": [
        inner_u, {"span_term": {"txt": "alpha"}}],
        "slop": 0, "in_order": True}}) == [2]


def test_span_containing_within_and_not_windows(span_docs):
    """r10: span_containing / span_within on real spans, and
    span_not's pre/post/dist exclusion windows."""
    near = {"span_near": {"clauses": [
        {"span_term": {"txt": "alpha"}},
        {"span_term": {"txt": "gamma"}}], "slop": 1}}
    # big spans enclosing a beta match: doc1's [0,3) contains beta@1
    assert run(span_docs, {"span_containing": {
        "big": near, "little": {"span_term": {"txt": "beta"}}}}) == [1]
    assert run(span_docs, {"span_within": {
        "big": near, "little": {"span_term": {"txt": "beta"}}}}) == [1]
    # no enclosure: soup is outside every alpha..gamma envelope
    assert run(span_docs, {"span_containing": {
        "big": near, "little": {"span_term": {"txt": "soup"}}}}) == []
    # span_not windows: plain non-overlap keeps every gamma, pre=1
    # also kills gammas IMMEDIATELY AFTER a beta (docs 1 and 2)
    q = lambda **kw: {"span_not": {  # noqa: E731
        "include": {"span_term": {"txt": "gamma"}},
        "exclude": {"span_term": {"txt": "beta"}}, **kw}}
    assert run(span_docs, q()) == [1, 2, 4]
    assert run(span_docs, q(pre=1)) == [4]
    # post=1 kills gammas immediately BEFORE a beta (doc1's gamma@2
    # precedes beta@3); dist sets both windows
    assert run(span_docs, q(post=1)) == [2, 4]
    assert run(span_docs, q(dist=1)) == [4]
    with pytest.raises(DslError, match="span_not pre"):
        compile_dsl(q(pre=-1))
    with pytest.raises(DslError, match="requires a big"):
        compile_dsl({"span_within": {
            "little": {"span_term": {"txt": "beta"}}}})


def test_span_named_400s(span_docs):
    with pytest.raises(DslError, match="one token"):
        compile_dsl({"span_term": {"txt": "two words"}})
    with pytest.raises(DslError, match="one field"):
        compile_dsl({"span_near": {"clauses": [
            {"span_term": {"txt": "a"}},
            {"span_term": {"other": "b"}}], "slop": 0}})
    # r10-late: the unordered nested form enumerates permutations —
    # only past 4 clauses does the k! honesty cap 400
    with pytest.raises(DslError, match="at most 4"):
        compile_dsl({"span_near": {"clauses": [
            {"span_term": {"txt": "a"}},
            {"span_near": {"clauses": [
                {"span_term": {"txt": f"t{i}"}} for i in range(5)],
                "slop": 0, "in_order": False}}], "slop": 0}})
    with pytest.raises(DslError, match="at most 8"):
        compile_dsl({"span_near": {"clauses": [
            {"span_term": {"txt": f"t{i}"}} for i in range(9)],
            "slop": 0}})
    # r10: pre/post/dist are implemented; stray keys still 400
    with pytest.raises(DslError, match="unsupported span_not keys"):
        compile_dsl({"span_not": {
            "include": {"span_term": {"txt": "a"}},
            "exclude": {"span_term": {"txt": "b"}}, "window": 2}})
    with pytest.raises(DslError, match="span_multi supports"):
        compile_dsl({"span_multi": {"match": {"term": {"txt": "a"}}}})
    with pytest.raises(DslError, match="positive integer end"):
        compile_dsl({"span_first": {
            "match": {"span_term": {"txt": "a"}}, "end": 0}})


# ---------------------------------------------------------------------------
# filter-context script query (r9) — painless-subset booleans
# ---------------------------------------------------------------------------


def test_script_query(docs):
    assert run(docs, {"script": {"script": {
        "source": "doc['n'].value > params.t", "params": {"t": 10},
    }}}) == [2, 3]
    # && / || / ternary / ! ; null doc value (id 4) never matches
    assert run(docs, {"script": {"script": {
        "source": "doc['n'].value >= 5 && doc['n'].value % 2 == 1",
    }}}) == [1, 2, 3]
    assert run(docs, {"script": {"script": {
        "source": "doc['n'].value == 5 || doc['n'].value == 25",
    }}}) == [1, 3]
    assert run(docs, {"script": {"script": {
        "source": "(doc['n'].value > 10 ? 1 : 0) * doc['id'].value == 2",
    }}}) == [2]
    assert run(docs, {"script": {"script": {
        "source": "!(doc['n'].value > 10)",
    }}}) == [1]
    # Kleene: null && false is false — doc 4 (null n) must not match,
    # and a definite false keeps it out deterministically
    assert run(docs, {"script": {"script": {
        "source": "doc['n'].value > 10 && doc['id'].value > 99",
    }}}) == []


def test_script_query_named_400s(docs):
    with pytest.raises(DslError, match="_score is not available"):
        compile_dsl({"script": {"script": {"source": "_score * 2"}}})
    with pytest.raises(DslError, match="requires a script"):
        compile_dsl({"script": {}})
    with pytest.raises(DslError, match="unsupported script query keys"):
        compile_dsl({"script": {"script": {"source": "1"}, "cache": True}})
    with pytest.raises(DslError, match="params"):
        compile_dsl({"script": {"script": {"source": "params.missing"}}})
    with pytest.raises(DslError, match="malformed script"):
        compile_dsl({"script": {"script": {"source": "doc['n'].value++"}}})
    with pytest.raises(DslError, match="unsupported script syntax"):
        compile_dsl({"script": {"script": {"source": "doc['n'].value & 2"}}})


def test_rank_and_distance_feature_membership(docs):
    # bool-tree context compiles membership only (score-free filter
    # context; the ranked math lives in plans/score_dsl.py)
    assert run(docs, {"rank_feature": {
        "field": "n", "saturation": {"pivot": 10}}}) == [1, 2, 3]
    assert run(docs, {"bool": {"must": [
        {"rank_feature": {"field": "n", "linear": {}}},
        {"term": {"kind": "a"}}]}}) == [1, 3]
    assert run(docs, {"distance_feature": {
        "field": "n", "origin": 5, "pivot": 10}}) == [1, 2, 3]
    with pytest.raises(DslError, match="requires a field"):
        compile_dsl({"rank_feature": {"saturation": {"pivot": 1}}})
    with pytest.raises(DslError, match="origin and pivot"):
        compile_dsl({"distance_feature": {"field": "n", "origin": 1}})


# ---------------------------------------------------------------------------
# intervals query (r9) — the modern proximity surface
# ---------------------------------------------------------------------------


def test_intervals_match(span_docs):
    # multi-token ordered with gaps
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "alpha gamma", "ordered": True,
        "max_gaps": 1}}}}) == [1]
    # unordered bounded-gap pair picks up the reversed doc too
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "alpha gamma", "max_gaps": 0}}}}) == [2]
    # unlimited gaps, unordered: plain conjunction
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "gamma alpha"}}}}) == [1, 2]
    # ordered, unlimited gaps: subsequence
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "alpha beta gamma", "ordered": True}}}}) == [1]
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "zzz"}}}}) == []


def test_intervals_leaves_and_composition(span_docs):
    assert run(span_docs, {"intervals": {"txt": {
        "prefix": {"prefix": "alph"}}}}) == [1, 2, 4]
    assert run(span_docs, {"intervals": {"txt": {
        "wildcard": {"pattern": "*oup"}}}}) == [4]
    assert run(span_docs, {"intervals": {"txt": {
        "fuzzy": {"term": "bata", "fuzziness": 1}}}}) == [1, 2]
    assert run(span_docs, {"intervals": {"txt": {
        "regexp": {"pattern": "gamm."}}}}) == [1, 2, 4]
    # any_of of leaves
    assert run(span_docs, {"intervals": {"txt": {"any_of": {
        "intervals": [{"match": {"query": "soup"}},
                      {"match": {"query": "beta"}}]}}}}) == [1, 2, 4]
    # all_of ordered with gaps over single-token rules (a prefix leaf
    # rides the positional chain)
    assert run(span_docs, {"intervals": {"txt": {"all_of": {
        "intervals": [{"prefix": {"prefix": "alphab"}},
                      {"match": {"query": "gamma"}}],
        "ordered": True, "max_gaps": 1}}}}) == [4]
    # unconstrained all_of keeps sub-rule internal constraints
    assert run(span_docs, {"intervals": {"txt": {"all_of": {
        "intervals": [
            {"match": {"query": "beta gamma", "ordered": True,
                       "max_gaps": 0}},
            {"match": {"query": "alpha"}}]}}}}) == [1, 2]


def test_intervals_nested_and_filters(span_docs):
    """r10: the span producer lifts the r9 caps — multi-token ordered
    matches nest under constraints, unordered takes any clause count,
    and the ``filter`` relations work on real spans."""
    # multi-token ordered match nested under a constrained all_of:
    # "alpha beta" (span [0,2) in doc1) then gamma at gap 0
    assert run(span_docs, {"intervals": {"txt": {"all_of": {
        "intervals": [
            {"match": {"query": "alpha beta", "ordered": True,
                       "max_gaps": 0}},
            {"match": {"query": "gamma"}}],
        "ordered": True, "max_gaps": 0}}}}) == [1]
    # unordered match with 3 tokens and a gap budget (the r9 2-clause
    # cap is gone); intervals' unordered allows overlap, so the same
    # token twice matches at one position
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "gamma beta alpha", "max_gaps": 0}}}}) == [1, 2]
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "soup soup", "max_gaps": 0}}}}) == [4]
    # filter relations: gamma NOT before delta → doc4's gamma@4
    # survives not_overlapping but gamma-before-delta keeps only
    # docs with gamma@2 < delta@3
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "gamma",
        "filter": {"before": {"match": {"query": "delta"}}}}}}}) \
        == [4]
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "gamma",
        "filter": {"after": {"match": {"query": "delta"}}}}}}}) \
        == [4]
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "beta",
        "filter": {"not_overlapping": {
            "match": {"query": "beta gamma", "ordered": True,
                      "max_gaps": 0}}}}}}}) == [1]
    # contained_by / containing over a produced envelope
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "soup",
        "filter": {"contained_by": {"match": {
            "query": "alphabet gamma", "ordered": True,
            "max_gaps": 1}}}}}}}) == [4]
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "alphabet gamma", "ordered": True, "max_gaps": 1,
        "filter": {"containing": {"match": {"query": "soup"}}}}}}}) \
        == [4]


def test_intervals_script_filter(span_docs):
    """r11: the painless interval-filter script — per-span position
    predicates via the shared painless compiler; end is ES's
    INCLUSIVE last-token position; gaps / doc refs are named 400s."""
    # doc1 "alpha beta; gamma beta": beta @1 and @3 (0-based). Keep
    # only betas at position >= 2 → doc1 still matches via beta@3;
    # doc2 "beta gamma alpha" has beta@0 only → filtered out.
    q = lambda src: {"intervals": {"txt": {"match": {  # noqa: E731
        "query": "beta", "filter": {"script": {"source": src}}}}}}
    assert run(span_docs, q("interval.start >= 2")) == [1]
    assert run(span_docs, q("interval.start >= 0")) == [1, 2]
    assert run(span_docs, q("interval.start >= 9")) == []
    # a single-token span has end == start (inclusive-end contract)
    assert run(span_docs, q("interval.end == interval.start")) == [1, 2]
    # multi-token chain spans: "alpha beta" in doc1 spans [0, 2) →
    # start 0, end 1; width predicate sees the real span
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "alpha beta", "ordered": True, "max_gaps": 0,
        "filter": {"script": {
            "source": "interval.end - interval.start == 1"}}}}}}) == [1]
    # params flow through the shared compiler
    assert run(span_docs, {"intervals": {"txt": {"match": {
        "query": "beta",
        "filter": {"script": {
            "source": "interval.start >= params.lo",
            "params": {"lo": 2}}}}}}}) == [1]
    with pytest.raises(DslError, match="interval.gaps"):
        compile_dsl(q("interval.gaps == 0"))
    with pytest.raises(DslError, match="only the interval object"):
        compile_dsl(q("doc['txt'].value > 0"))
    with pytest.raises(DslError, match="source string"):
        compile_dsl({"intervals": {"txt": {"match": {
            "query": "beta", "filter": {"script": {}}}}}})


def test_intervals_named_400s(span_docs):
    # unordered producers stay honest 400s under constraints/filters
    with pytest.raises(DslError, match="unordered multi-token"):
        compile_dsl({"intervals": {"txt": {"all_of": {
            "intervals": [{"match": {"query": "two words"}},
                          {"match": {"query": "x"}}],
            "ordered": True}}}})
    with pytest.raises(DslError, match="unordered all_of"):
        compile_dsl({"intervals": {"txt": {"all_of": {
            "intervals": [{"all_of": {"intervals": [
                {"match": {"query": "a"}},
                {"match": {"query": "b"}}]}},
                {"match": {"query": "x"}}],
            "ordered": True}}}})
    with pytest.raises(DslError, match="not a rule"):
        compile_dsl({"intervals": {"txt": {"filter": {
            "containing": {"match": {"query": "x"}}}}}})
    with pytest.raises(DslError, match="filter relation"):
        compile_dsl({"intervals": {"txt": {"match": {
            "query": "x", "filter": {"nearby": {
                "match": {"query": "y"}}}}}}})
    with pytest.raises(DslError, match="unsupported intervals match"):
        compile_dsl({"intervals": {"txt": {"match": {
            "query": "x", "use_field": "other"}}}})
    with pytest.raises(DslError, match="one field"):
        compile_dsl({"intervals": {"a": {}, "b": {}}})


def test_empty_leaf_bodies_are_named_400s(docs):
    """r11 hardening: an empty/fieldless leaf body is the caller's
    named DslError, never a raw StopIteration/KeyError (a wire 500).
    Swept over every leaf kind the compiler accepts."""
    for bad in (
        {"term": {}}, {"terms": {}}, {"range": {}}, {"match": {}},
        {"match_phrase": {}}, {"prefix": {}}, {"wildcard": {}},
        {"regexp": {}}, {"fuzzy": {}}, {"exists": {}}, {"ids": {}},
        {"exists": {"field": None}}, {"span_term": {}},
        {"span_multi": {"match": {"prefix": {}}}},
        {"match_bool_prefix": {}}, {"intervals": {}},
        {"bool": {"must": [{"term": {}}]}},
    ):
        with pytest.raises(DslError):
            compile_dsl(bad, schema_fields=["txt"])


def test_percolate_batching_is_plan_shape_only(spark):
    """r14 (r13 verdict #6): the stored-set batch splits the compiled
    array into ceil(N/batch) per-batch scans — results are IDENTICAL
    to the one-scan plan (no silent cap: every stored query always
    evaluates), and the batched plan holds one scan per batch."""
    from sql_database_to_elastic_datalake_spark.plans.percolate import (
        DEFAULT_BATCH_SIZE,
        percolate_corpus,
    )

    df = spark.createDataFrame(
        [(i, float(i * 10)) for i in range(50)], "id long, v double")
    queries = {f"q{i:03d}": {"range": {"v": {"gte": i * 7,
                                             "lt": i * 7 + 40}}}
               for i in range(30)}
    one = percolate_corpus(df, queries, id_cols=["id"],
                           batch_size=None)
    batched = percolate_corpus(df, queries, id_cols=["id"],
                               batch_size=7)
    a = sorted((r["id"], r["query_id"]) for r in one.collect())
    b = sorted((r["id"], r["query_id"]) for r in batched.collect())
    assert a == b and len(a) > 0
    # the default batch bound exists and is documented-positive
    assert DEFAULT_BATCH_SIZE >= 1
    # batched plan: ceil(30/7)=5 per-batch branches unioned;
    # one-scan: no union at all
    from sql_database_to_elastic_datalake_spark.plans.audit import (
        plan_string,
    )

    assert "Union" in plan_string(batched)
    assert "Union" not in plan_string(one)
