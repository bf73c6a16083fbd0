"""variable_width_histogram + categorize_text (r11 late).

Semantics pins on hand-built frames, the named 400s, and the envelope
shapes run_aggs assembles. The cross-engine differential lives in the
registry oracles (search_aggs_variable_width /
search_aggs_categorize_text); the plan bound lives here because the
registry entries rebuild their result driver-side (local relation), so
the frame is the surface worth auditing.
"""

from __future__ import annotations

import pytest

from sql_database_to_elastic_datalake_spark.plans.audit import audit
from sql_database_to_elastic_datalake_spark.plans.es_aggs import (
    categorize_text_frame,
    run_aggs,
    variable_width_histogram_frame,
)
from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError


# ---------------------------------------------------------------------------
# variable_width_histogram
# ---------------------------------------------------------------------------

def test_vwh_splits_at_largest_gaps(spark):
    df = spark.createDataFrame(
        [(v,) for v in [1, 2, 3, 10, 11, 100, 100]], "x long")
    rows = variable_width_histogram_frame(
        df, {"field": "x", "buckets": 3}).collect()
    assert [(r["min"], r["max"], r["doc_count"]) for r in rows] == [
        (1.0, 3.0, 3), (10.0, 11.0, 2), (100.0, 100.0, 2)]
    assert rows[0]["key"] == pytest.approx(2.0)
    assert rows[2]["key"] == pytest.approx(100.0)


def test_vwh_fewer_distinct_than_buckets(spark):
    df = spark.createDataFrame([(1,), (1,), (5,)], "x long")
    rows = variable_width_histogram_frame(
        df, {"field": "x", "buckets": 10}).collect()
    # 2 distinct values -> 2 buckets; the null first gap never splits
    assert [(r["min"], r["doc_count"]) for r in rows] == [
        (1.0, 2), (5.0, 1)]


def test_vwh_gap_ties_break_leftmost(spark):
    # gaps 4 and 4 tie: with buckets=2 only ONE boundary is taken and
    # it must be the leftmost (between 1 and 5), deterministically
    df = spark.createDataFrame([(1,), (5,), (9,)], "x long")
    rows = variable_width_histogram_frame(
        df, {"field": "x", "buckets": 2}).collect()
    assert [(r["min"], r["max"]) for r in rows] == [(1.0, 1.0), (5.0, 9.0)]


def test_vwh_named_400s(spark):
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    with pytest.raises(DslError, match="requires a field"):
        variable_width_histogram_frame(df, {"buckets": 3})
    with pytest.raises(DslError, match="positive integer"):
        variable_width_histogram_frame(df, {"field": "x", "buckets": 0})
    with pytest.raises(DslError, match="not numeric"):
        variable_width_histogram_frame(df, {"field": "s", "buckets": 3})
    with pytest.raises(DslError, match="unknown field"):
        variable_width_histogram_frame(df, {"field": "zz", "buckets": 3})
    with pytest.raises(DslError, match="unsupported .* options"):
        variable_width_histogram_frame(
            df, {"field": "x", "keyed": True})
    # approximation-tuning knobs are accepted-and-ignored
    rows = variable_width_histogram_frame(
        df, {"field": "x", "buckets": 2, "initial_buffer": 500,
             "shard_size": 100}).collect()
    assert len(rows) == 1


def test_vwh_envelope_and_sub_agg_rejection(spark):
    df = spark.createDataFrame([(1,), (2,), (50,)], "x long")
    out = run_aggs(df, {"w": {
        "variable_width_histogram": {"field": "x", "buckets": 2}}})
    assert out["w"]["buckets"] == [
        {"min": 1.0, "key": 1.5, "max": 2.0, "doc_count": 2},
        {"min": 50.0, "key": 50.0, "max": 50.0, "doc_count": 1},
    ]
    with pytest.raises(DslError, match="sub-aggregations under "
                                       "variable_width_histogram"):
        run_aggs(df, {"w": {
            "variable_width_histogram": {"field": "x"},
            "aggs": {"m": {"avg": {"field": "x"}}}}})


def test_vwh_plan_bounded(spark, sf_dir):
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = audit(variable_width_histogram_frame(
        docs, {"field": "n_chars", "buckets": 8}))
    assert a["cartesian"] == 0
    # distinct-collapse groupBy + the single-task window sort + final
    # bucket groupBy + output order: the doc-count never rides a window
    assert a["shuffles"] <= 5
    [scan] = a["scans"]
    assert scan["table"] == "documents" and scan["n_cols"] == 1


# ---------------------------------------------------------------------------
# categorize_text
# ---------------------------------------------------------------------------

def _msgs(spark, rows):
    return spark.createDataFrame([(m,) for m in rows], "message string")


def test_categorize_groups_by_digit_free_template(spark):
    df = _msgs(spark, [
        "Node 5 started", "Node 17 started", "node 9 STARTED",
        "shutting down", "2024 1094"])
    rows = categorize_text_frame(df, {"field": "message"}).collect()
    # all-numeric line is uncategorizable and skipped, like ES
    assert [(r["key"], r["doc_count"], r["max_matching_length"])
            for r in rows] == [
        ("node started", 3, 15), ("shutting down", 1, 13)]


def test_categorize_filters_strip_before_tokenizing(spark):
    df = _msgs(spark, ["ERROR at module alpha", "ERROR at module beta"])
    rows = categorize_text_frame(df, {
        "field": "message",
        "categorization_filters": ["module \\w+"]}).collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [("error at", 2)]


def test_categorize_min_doc_count_and_size(spark):
    df = _msgs(spark, ["aa bb", "aa bb", "cc dd"])
    rows = categorize_text_frame(
        df, {"field": "message", "min_doc_count": 2}).collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [("aa bb", 2)]
    rows = categorize_text_frame(
        df, {"field": "message", "size": 1}).collect()
    assert len(rows) == 1 and rows[0]["key"] == "aa bb"


def test_categorize_named_400s(spark):
    df = _msgs(spark, ["x"])
    with pytest.raises(DslError, match="requires a field"):
        categorize_text_frame(df, {})
    with pytest.raises(DslError, match="similarity_threshold"):
        categorize_text_frame(
            df, {"field": "message", "similarity_threshold": 70})
    with pytest.raises(DslError, match="categorization_filters"):
        categorize_text_frame(
            df, {"field": "message", "categorization_filters": "x"})
    with pytest.raises(DslError, match="unsupported .* options"):
        categorize_text_frame(
            df, {"field": "message", "max_unique_tokens": 5})
    # threshold 100 IS the implemented tier
    assert categorize_text_frame(
        df, {"field": "message", "similarity_threshold": 100}).count() == 1


def test_categorize_envelope_regex(spark):
    df = _msgs(spark, ["job 12 done", "job 99 done"])
    out = run_aggs(df, {"c": {"categorize_text": {"field": "message"}}})
    [b] = out["c"]["buckets"]
    assert b["key"] == "job done"
    assert b["regex"] == ".*?job.*?done.*?"
    assert b["doc_count"] == 2
    with pytest.raises(DslError, match="sub-aggregations under "
                                       "categorize_text"):
        run_aggs(df, {"c": {"categorize_text": {"field": "message"},
                            "aggs": {"m": {"value_count":
                                           {"field": "message"}}}}})


def test_categorize_plan_one_shuffle_then_order(spark, sf_dir):
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = audit(categorize_text_frame(docs, {"field": "text"}))
    assert a["cartesian"] == 0
    # template groupBy + TakeOrdered: no second corpus pass
    assert a["shuffles"] <= 2
    [scan] = a["scans"]
    assert scan["table"] == "documents" and scan["n_cols"] == 1


# ---------------------------------------------------------------------------
# frequent_item_sets
# ---------------------------------------------------------------------------

def _fis(spark, rows, schema, body):
    from sql_database_to_elastic_datalake_spark.plans.es_aggs import (
        frequent_item_sets_result,
    )

    return frequent_item_sets_result(
        spark.createDataFrame(rows, schema), body)


def test_fis_mines_closed_sets_only(spark):
    # {a=1, b=x} appears in exactly the same 3 docs as {a=1}: the
    # singleton is NOT closed and must not return even at set size 1
    rows = [(1, "x"), (1, "x"), (1, "x"), (2, "y")]
    out = _fis(spark, rows, "a long, b string",
               {"fields": [{"field": "a"}, {"field": "b"}],
                "minimum_support": 0.5, "minimum_set_size": 1})
    assert out == [{
        "key": {"a": ["1"], "b": ["x"]}, "doc_count": 3,
        "support": 0.75,
    }]


def test_fis_support_and_set_size_filters(spark):
    rows = [(1, "x"), (1, "y"), (2, "x")]
    out = _fis(spark, rows, "a long, b string",
               {"fields": [{"field": "a"}, {"field": "b"}],
                "minimum_support": 0.6, "minimum_set_size": 1})
    # only {a=1} (2/3) and {b=x} (2/3) pass 0.6 support; both are
    # closed (their supersets have count 1)
    assert [(b["key"], b["doc_count"]) for b in out] == [
        ({"a": ["1"]}, 2), ({"b": ["x"]}, 2)]
    out2 = _fis(spark, rows, "a long, b string",
                {"fields": [{"field": "a"}, {"field": "b"}],
                 "minimum_support": 0.6, "minimum_set_size": 2})
    assert out2 == []


def test_fis_array_fields_contribute_elements(spark):
    rows = [(["p", "q"],), (["p"],), (["p", "q"],)]
    out = _fis(spark, rows, "tags array<string>",
               {"fields": [{"field": "tags"}],
                "minimum_support": 0.5, "minimum_set_size": 2})
    assert out == [{
        "key": {"tags": ["p", "q"]}, "doc_count": 2,
        "support": pytest.approx(2 / 3),
    }]


def test_fis_null_array_field_keeps_other_items(spark):
    """r12 ADVICE regression: a NULL array value must contribute no
    items — not null the whole basket. flatten() returns NULL when any
    nested array is NULL, which used to drop the row entirely, losing
    the items from its other non-null fields ({b=x}:3 went missing)."""
    rows = [(["p"], "x"), (["p"], "x"), (None, "x")]
    out = _fis(spark, rows, "tags array<string>, b string",
               {"fields": [{"field": "tags"}, {"field": "b"}],
                "minimum_support": 0.5, "minimum_set_size": 1})
    got = {(tuple(sorted((k, tuple(v)) for k, v in b["key"].items())),
            b["doc_count"]) for b in out}
    assert ((("b", ("x",)),), 3) in got          # the NULL row counts
    assert ((("b", ("x",)), ("tags", ("p",))), 2) in got
    # the singleton {tags=p}:2 is not closed (equal-count superset)
    assert ((("tags", ("p",)),), 2) not in got


def test_fis_named_400s(spark):
    df_rows = [(1, "x")]
    with pytest.raises(DslError, match="requires fields"):
        _fis(spark, df_rows, "a long, b string", {"fields": []})
    with pytest.raises(DslError, match="minimum_support"):
        _fis(spark, df_rows, "a long, b string",
             {"fields": [{"field": "a"}], "minimum_support": 0})
    with pytest.raises(DslError, match="minimum_set_size"):
        _fis(spark, df_rows, "a long, b string",
             {"fields": [{"field": "a"}], "minimum_set_size": 0})
    with pytest.raises(DslError, match="unknown field"):
        _fis(spark, df_rows, "a long, b string",
             {"fields": [{"field": "zz"}]})
    with pytest.raises(DslError, match="field options"):
        _fis(spark, df_rows, "a long, b string",
             {"fields": [{"field": "a", "filter": {}}]})
    with pytest.raises(DslError, match="more than 12 distinct items"):
        _fis(spark, [(list("abcdefghijklmn"),)], "tags array<string>",
             {"fields": [{"field": "tags"}], "minimum_support": 0.1})


def test_fis_envelope_and_sub_agg_rejection(spark):
    df = spark.createDataFrame([(1, "x")], "a long, b string")
    out = run_aggs(df, {"s": {"frequent_item_sets": {
        "fields": [{"field": "a"}, {"field": "b"}],
        "minimum_set_size": 2, "minimum_support": 0.5}}})
    assert out["s"]["buckets"][0]["key"] == {"a": ["1"], "b": ["x"]}
    with pytest.raises(DslError, match="sub-aggregations under "
                                       "frequent_item_sets"):
        run_aggs(df, {"s": {
            "frequent_item_sets": {"fields": [{"field": "a"}]},
            "aggs": {"m": {"avg": {"field": "a"}}}}})


def test_fis_plan_single_corpus_groupby(spark, sf_dir):
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )
    # the candidate plan (pre-collect) is scan -> generator -> ONE
    # groupBy; audited indirectly: the result call runs end-to-end on
    # real data without error and honors determinism across calls
    li = load_table(spark, sf_dir, "lineitem")
    body = {"fields": [{"field": "l_returnflag"},
                       {"field": "l_linestatus"}],
            "minimum_set_size": 2, "minimum_support": 0.05}
    from sql_database_to_elastic_datalake_spark.plans.es_aggs import (
        frequent_item_sets_result,
    )

    a = frequent_item_sets_result(li, body)
    b = frequent_item_sets_result(li.repartition(5), body)
    assert a == b and len(a) >= 1
