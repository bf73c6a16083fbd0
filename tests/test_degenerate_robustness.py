"""Degenerate-values differential: NaN/±Inf/-0.0 and empty-text parity.

Third gate in the injected-lake family (NULL, unicode, and now
degenerate values). The harness corpus has finite values and non-empty
text everywhere, so the oracle gate never exercises the classic
engine-divergence traps: NaN ordering (Spark sorts NaN above +Inf and
groups NaN==NaN; DuckDB's total order must agree), signed zero
grouping/equality, IEEE ±Inf flowing through SUM/AVG/percentiles, and
zero-length / whitespace-only documents hitting tokenizers and
length-normalized ratios. A derived lake injects each class
deterministically and re-runs the value and text families against
their own oracles over the SAME files.
"""

from __future__ import annotations

import warnings

import duckdb
import pytest

import __spark_entry__ as entry
from tests.test_null_robustness import TABLES, _assert_frames_equal, _canon

#: Value family (NaN/Inf/-0.0 flow through aggs, windows, histograms)
#: + text family (empty / whitespace-only docs hit tokenizers and
#: ratio denominators). Rows-only and quadratic demos out of scope.
CHECKED = (
    # value family
    "group_count",
    "value_histogram",
    "value_percentiles",
    "running_totals",
    "daily_event_stats",
    "pivot_event_types",
    "window_value_family",
    "window_rank_family",
    "top3_events_per_user",
    "events_ewma",
    "latest_event_per_key",
    "distinct_counts_by_flag",
    # migrated to the finite-values policy after the gate's first run
    # caught the class (see ROUND3_NOTES.md): every remaining
    # events.value reduction in the registry
    "salted_group_agg",
    "events_time_range",
    "events_range_join_prior",
    "range_frame_hourly",
    "sliding_window_counts",
    "user_feature_table",
    "value_seasonality_by_hour",
    "value_outliers_mad",
    "streaming_window_counts",
    "streaming_stateful_totals",
    "session_window_counts",
    # text family over empty/whitespace docs
    "text_stats",
    "fineweb_quality_filters",
    "text_fingerprint",
    "text_lang_id",
    "word_count",
    "doc_chunks",
    "pack_token_budget",
    "dedup_exact",
    "incremental_dedup_sync",
    "chunk_level_dedup",
    "corpus_prep_stats",
    "curriculum_deciles",
    "approx_sketches",
    # r7: NaN/Inf events.value flows through the pipeline-agg algebra
    # (bucket_script products, percentile ranks of bucket counts) and
    # the auto-interval histogram metrics; empty/whitespace docs hit
    # the suggester's dictionary and the compound leaves' tokenizers
    "search_aggs_tsvb_math",
    "search_aggs_percentiles_bucket",
    "search_aggs_auto_interval",
    "search_aggs_top_metrics",
    "search_suggest_terms",
    "search_dsl_compound",
    "search_dsl_combined_fields",
    # r9: empty/whitespace docs hit the phrase suggester's
    # unigram/bigram dictionaries, the completion value dictionary,
    # mlt's seed tokenization, the classifier's gram window (shorter
    # than n → null logit, both engines), and the scored queries'
    # column algebra
    "search_suggest_phrase",
    "search_suggest_completion",
    "search_dsl_more_like_this",
    "quality_classifier_scores",
    "search_dsl_function_score",
    "search_dsl_script_score",
    # late r9: empty/whitespace docs produce empty token arrays for
    # the span/intervals algebra and single-empty-chunk docs for the
    # boilerplate chunker; NaN/Inf events.value flows through the
    # script query's comparisons (both engines order NaN above +Inf)
    # and the script-sourced metric algebra
    "search_dsl_span_near",
    "search_dsl_span_first",
    "search_dsl_intervals",
    "boilerplate_chunk_removal",
    "search_dsl_script_query",
    # r10: empty/whitespace docs produce empty span-producer arrays
    # (nested chains, enclosure, interval filters), zero-gram DSIR
    # docs (dropped, both engines), empty significant_text token sets,
    # and empty fuzzy-completion dictionary entries
    "search_dsl_span_nested",
    "search_dsl_span_containing",
    "search_dsl_intervals_filter",
    "search_aggs_significant_text",
    "search_suggest_completion_fuzzy",
    "dsir_importance_weights",
    # r11: empty/whitespace docs tokenize to a single '' token for
    # the k-gram dedup (below k → untouched), regex completion sees
    # the degenerate value dictionary, the interval script filter
    # runs over empty span arrays, and the widened PII rules must
    # not fire on whitespace (token_count_bpe_exact is golden-join
    # keyed on the ORIGINAL corpus, so — like multimodal_decode —
    # it cannot run on a derived lake)
    "exact_substring_dedup",
    "search_suggest_completion_regex",
    "search_dsl_intervals_script",
    "pii_redaction",
    "lm_perplexity_features",
    "lm_kneser_ney_features",
    "benchmark_decontamination_spans",
    # late r11: the gap-split histogram over a tiny/degenerate value
    # set (fewer distinct values than buckets, single-value buckets)
    # and the template categorizer over whitespace-only messages
    # (empty templates skipped, both engines)
    "search_aggs_variable_width",
    "search_aggs_categorize_text",
    # r12: the relevance-boost ranked family — NULL/degenerate/
    # unicode text and lang flow through the tf counts (coalesced per
    # token), the constant-boost leaves' predicates (two-valued
    # semantics drop null matches both engines), and the seeded
    # random_score md5 (null field -> null score both engines)
    "search_boosted_multimatch",
    "search_boosted_bool_should",
    "search_query_string_boosted",
    "search_function_score_query_base",
    "search_function_score_random",
    "text_normalize",
)


@pytest.fixture(scope="module")
def degen_lake(tmp_path_factory):
    """sf0.001 lake with deterministic degenerate injection:
    events.value gets NaN (~1/13), +Inf (~1/17), -Inf (~1/19) and
    -0.0 (~1/23); user 3's EVERY value is NaN (pins SUM-over-zero-
    finite-rows → NULL, the case a sparse injection can miss);
    documents.text gets '' (~1/11) and whitespace-only (~1/12)."""
    d = str(tmp_path_factory.mktemp("degen_lake"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT event_id, ts, user_id, event_type,
            CASE WHEN user_id = 3 THEN CAST('nan' AS DOUBLE)
                 WHEN event_id % 13 = 3 THEN CAST('nan' AS DOUBLE)
                 WHEN event_id % 17 = 5 THEN CAST('inf' AS DOUBLE)
                 WHEN event_id % 19 = 7 THEN CAST('-inf' AS DOUBLE)
                 WHEN event_id % 23 = 9 THEN CAST(-0.0 AS DOUBLE)
                 ELSE value END AS value,
            props
          FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
    TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (SELECT doc_id,
            CASE WHEN doc_id % 11 = 4 THEN ''
                 WHEN doc_id % 12 = 6 THEN '   \t  '
                 ELSE text END AS text,
            lang, source, n_chars
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
    TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t in ("events", "documents"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet("
            f"'/root/testdata/sf0.001/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.fixture(scope="module")
def oracle_con(degen_lake):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degen_lake}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_degenerate_injected_differential(spark, degen_lake, oracle_con, name):
    qs, osql = entry.queries(), entry.oracle_sql()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sp = _canon(qs[name](spark, degen_lake).toPandas())
        oc = _canon(oracle_con.execute(osql[name]).df())
    assert len(sp) > 0, f"{name}: empty result defeats the purpose"
    _assert_frames_equal(name, sp, oc)


def test_degen_lake_actually_degenerate(spark, degen_lake):
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    ev = load_table(spark, degen_lake, "events")
    assert ev.filter("isnan(value)").count() > 50
    assert ev.filter("value = double('inf')").count() > 30
    assert ev.filter("value = double('-inf')").count() > 30
    docs = load_table(spark, degen_lake, "documents")
    assert docs.filter("text = ''").count() > 10
    assert docs.filter(r"text rlike '^\\s+$'").count() > 10


def test_finite_fragment_is_canonical_everywhere():
    """The finite-values policy's SQL mirror is hand-written in each
    oracle; this pins every isfinite() usage to the one canonical
    fragment so a policy change cannot silently skip a copy (the
    oracle/Spark-twin skew class ROUND3_NOTES.md records happening
    once)."""
    import re
    from pathlib import Path

    pkg = Path(__file__).parent.parent / "sql_database_to_elastic_datalake_spark"
    canonical = (
        # the measure mirror: nonfinite -> NULL in place
        r"CASE WHEN isfinite\((?:e\.)?value\) THEN (?:e\.)?value END",
        # the guard forms: a CASE wrapping a larger expression, or a
        # WHERE/filter conjunction
        r"CASE WHEN isfinite\((?:e\.)?value\)\s+THEN",
        r"AND isfinite\(value\)",
    )
    for f in ("registry.py", "registry_pipeline.py"):
        src = (pkg / f).read_text()
        for m in re.finditer(r".{40}isfinite.{40}", src, re.S):
            snippet = m.group(0)
            assert any(
                re.search(pat, snippet) for pat in canonical
            ), f"{f}: non-canonical isfinite usage: {snippet!r}"
