"""NULL-injection differential: engine parity beyond the harness corpus.

The driver's testdata contains zero NULLs, so the oracle gate never
exercises NULL semantics — but a 100 TB lake will (nullable sources,
failed upstream extracts, optional fields). This module derives a
NULL-injected copy of the lake and re-runs a representative slice of
registered queries against their own DuckDB oracles over the SAME
derived files: any engine-divergent NULL behavior (Spark vs DuckDB
function semantics, e.g. DuckDB ``concat`` skipping NULL args where
Spark propagates) shows up as a value mismatch here long before a real
corpus finds it.
"""

from __future__ import annotations

import os
import warnings

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: Queries re-checked over the NULL-injected lake. Chosen to cover the
#: text family (NULL text/lang), the events family (NULL value/props),
#: and the hashing/sampling operators whose determinism story must
#: survive NULL keys. Quadratic pair-verifiers and streaming queries are
#: exercised elsewhere; this gate is about scalar NULL semantics.
CHECKED = (
    "text_stats",
    "fineweb_quality_filters",
    "text_fingerprint",
    "text_lang_id",
    "dedup_exact",
    "incremental_dedup_sync",
    "word_count",
    "group_count",
    "value_histogram",
    "conditional_agg_returns",
    "lang_id_confusion",
    "corpus_composition",
    "text_repetition",
    "chunk_level_dedup",
    "json_extract",
    "map_functions_events",
    "doc_chunks",
    "pii_redaction",
    "stratified_sample_langs",
    "corpus_prep_stats",
    "mixture_rebalance_rates",
    # NULL-ordering / NULL-recurrence classes (each found divergent by
    # this gate in round 3 and fixed: explicit NULLS FIRST, length-0
    # rule for NULL text, observed-values EWMA)
    "window_rank_family",
    "curriculum_deciles",
    "events_ewma",
    "window_value_family",
    "top3_events_per_user",
    "value_percentiles",
    "running_totals",
    "pivot_event_types",
    "daily_event_stats",
    "approx_sketches",
    # r5 DSL additions: NULL lang exercises the compiler's two-valued
    # semantics (coalesced should-counting) against the oracle's
    # COALESCE sums; NULL text exercises terms_set's null-array rule
    "search_dsl_msm_wildcard",
    "search_dsl_terms_set",
    # r6 search surface: NULL text/lang through the query_string
    # parser's compiled leaves (must_not over NULL matches), the
    # offset page's stable ordering with NULL-bearing rows, collapse's
    # null-group handling, terms order/missing over NULL keys, and
    # the _source projection over a NULL-injected scan
    "search_dsl_query_string",
    "search_dsl_simple_qs",
    "search_from_size_page",
    "search_collapse_field",
    "search_aggs_terms_order",
    "search_source_filtering",
    # the injected lake's NULL langs give the terms `missing` bucket
    # REAL members (the clean corpus has none), and NULL text flows
    # through the decontamination shingle pipeline
    "search_aggs_histogram_gaps",
    "benchmark_decontamination",
    # r9: NULL text through the suggester dictionaries, mlt's corpus
    # contains-count, the classifier's gram window (NULL → null
    # logit), and NULL lang/n_chars through the scored queries'
    # filters and decay algebra
    "search_suggest_phrase",
    "search_suggest_completion",
    "search_dsl_more_like_this",
    "quality_classifier_scores",
    "search_dsl_function_score",
    "search_dsl_script_score",
    # late r9: NULL text through the span/intervals token-array
    # positional algebra and the boilerplate chunker (NULL → absent
    # doc, both engines); NULL source through string_stats lengths
    # and the char explode; NULL value/user_id through the script
    # query's Kleene logic and the script-sourced metrics
    "search_dsl_span_near",
    "search_dsl_span_first",
    "search_dsl_intervals",
    "boilerplate_chunk_removal",
    "search_aggs_string_stats",
    "search_dsl_script_query",
    "search_aggs_metric_script",
    "search_dsl_rank_feature",
    "search_dsl_distance_feature",
    # r10: NULL text through the span-producer trees (nested chains,
    # enclosure, interval filters — NULL → absent doc both engines),
    # NULL lang through the significant_text foreground flag and the
    # DSIR target predicate (null-safe eq), NULL doc_id through the
    # sampler's md5 rank and the terms partition hash, NULL text
    # through the fuzzy-completion dictionary
    "search_dsl_span_nested",
    "search_dsl_span_containing",
    "search_dsl_intervals_filter",
    "search_aggs_significant_text",
    "search_aggs_significant_bgfilter",
    "search_aggs_sampler_significant",
    "search_aggs_terms_partition",
    "search_suggest_completion_fuzzy",
    "dsir_importance_weights",
    "search_pit_page",
    # r11: NULL text through the k-gram dedup (NULL → absent doc,
    # both engines), the regex-completion value dictionary, the
    # interval script filter's span algebra, and the widened PII
    # rule set (NULL propagates through every count and the Luhn
    # fold; the golden-join token_count_bpe_exact is excluded — it
    # keys on the original corpus, like multimodal_decode)
    "exact_substring_dedup",
    "search_suggest_completion_regex",
    "search_dsl_intervals_script",
    "lm_perplexity_features",
    "benchmark_decontamination_spans",
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
def null_lake(tmp_path_factory):
    """sf0.001 lake with deterministic NULL injection: ~9% NULL text,
    ~8% NULL lang, ~14% NULL value, ~6% NULL props."""
    d = str(tmp_path_factory.mktemp("null_lake"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT doc_id,
            CASE WHEN doc_id % 11 = 3 THEN NULL ELSE text END AS text,
            CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang,
            source, n_chars
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
    TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (SELECT event_id, ts, user_id, event_type,
            CASE WHEN event_id % 7 = 2 THEN NULL ELSE value END AS value,
            CASE WHEN event_id % 17 = 4 THEN NULL ELSE props END AS props
          FROM read_parquet('/root/testdata/sf0.001/events.parquet'))
    TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t in ("documents", "events"):
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet("
            f"'/root/testdata/sf0.001/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.fixture(scope="module")
def oracle_con(null_lake):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{null_lake}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(
            lambda v: v is None or hasattr(v, "toordinal"), na_action=None
        ).all() and df[c].notna().any():
            # Spark DATE columns arrive as datetime.date objects while
            # DuckDB's arrive as datetime64 — normalize both
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _assert_frames_equal(name: str, sp: pd.DataFrame, oc: pd.DataFrame):
    assert list(sp.columns) == list(oc.columns), (
        f"{name}: columns {list(sp.columns)} vs {list(oc.columns)}"
    )
    assert len(sp) == len(oc), f"{name}: rows {len(sp)} vs {len(oc)}"
    for c in sp.columns:
        a, b = sp[c], oc[c]
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(
            np.asarray(b).dtype, np.floating
        ):
            a2 = pd.to_numeric(a, errors="coerce").to_numpy(float)
            b2 = pd.to_numeric(b, errors="coerce").to_numpy(float)
            same = (a2 == b2) | (np.isnan(a2) & np.isnan(b2))
        else:
            sa = a.astype(object).where(a.notna(), "\0")
            sb = b.astype(object).where(b.notna(), "\0")
            same = sa.eq(sb).to_numpy()
        if not same.all():
            i = int(np.argmin(same))
            raise AssertionError(
                f"{name}.{c} row {i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
            )


@pytest.mark.parametrize("name", CHECKED)
def test_null_injected_differential(spark, null_lake, oracle_con, name):
    qs, osql = entry.queries(), entry.oracle_sql()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sp = _canon(qs[name](spark, null_lake).toPandas())
        oc = _canon(oracle_con.execute(osql[name]).df())
    assert len(sp) > 0, f"{name}: empty result defeats the purpose"
    _assert_frames_equal(name, sp, oc)


def test_null_lake_actually_has_nulls(spark, null_lake):
    """Guard the fixture: if the injection rates drift to zero the whole
    module silently tests nothing."""
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    docs = load_table(spark, null_lake, "documents")
    ev = load_table(spark, null_lake, "events")
    assert docs.filter("text IS NULL").count() > 10
    assert docs.filter("lang IS NULL").count() > 10
    assert ev.filter("value IS NULL").count() > 100
    assert ev.filter("props IS NULL").count() > 50
