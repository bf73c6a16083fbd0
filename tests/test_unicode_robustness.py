"""Unicode-injection differential: engine parity beyond ASCII.

Sibling of the NULL-injection gate (`test_null_robustness.py`): the
harness corpus is essentially ASCII, so the oracle gate never
exercises the places where Spark's JVM string/regex semantics could
diverge from DuckDB's (utf8proc/RE2): case mapping of İ/ß, code-point
counting for supplementary-plane emoji, tokenization around NBSP and
zero-width joiners, combining marks, RTL text. This module derives a
unicode-decorated copy of the lake (every decoration deterministic in
``doc_id``) and re-runs the whole text/search family against its own
DuckDB oracles over the SAME derived files — any divergence in
``lower``/``length``/``split``/``regexp_*``/hashing surfaces as a
value mismatch here long before a multilingual corpus finds it.
"""

from __future__ import annotations

import warnings

import duckdb
import pytest

import __spark_entry__ as entry
from tests.test_null_robustness import TABLES, _assert_frames_equal, _canon

#: Queries re-checked over the unicode lake: everything that reads
#: documents.text (tokenizers, case-folders, regex, hashes, profiles)
#: plus the search family over entity tables. Quadratic pair-verifiers,
#: embedding-only and streaming queries are out of scope.
CHECKED = (
    "text_stats",
    "text_fingerprint",
    "text_lang_id",
    "lang_id_confusion",
    "char_trigram_profile",
    "word_count",
    "zipf_profile",
    "top_words_per_doc",
    "doc_keywords",
    "text_repetition",
    "dedup_exact",
    "chunk_level_dedup",
    "doc_chunks",
    "pack_token_budget",
    "pii_redaction",
    "regex_extract_docs",
    "corpus_clean",
    "corpus_composition",
    "corpus_prep_stats",
    "curriculum_deciles",
    "stratified_sample_langs",
    "weighted_sample_docs",
    "array_functions_docs",
    "search_bm25_scored",
    "rag_context_assembly",
    # r5: terms_set tokenizes text — ASCII term membership must be
    # indifferent to the İ/ß/emoji folding traps in the decorated lake
    "search_dsl_terms_set",
    # r6: the query_string parser's compiled match/phrase leaves lower
    # decorated text (the İ-fold class the oracles replace for), and
    # the offset page's TakeOrdered runs over decorated rows
    "search_dsl_query_string",
    "search_dsl_simple_qs",
    "search_from_size_page",
    # r7: the compound leaves and the ranked-path additions lower
    # decorated text through contains/levenshtein; the suggester
    # builds its dictionary from the decorated corpus with the same
    # ASCII token class both engines must agree on
    "search_dsl_compound",
    "search_dsl_combined_fields",
    "search_min_score",
    "search_rescore_window",
    "search_suggest_terms",
    "search_dsl_phrase_slop",
    "search_dsl_qs_fuzzy",
    # r9: the phrase/completion dictionaries and mlt's seed
    # tokenization lower decorated text (the İ/ß/emoji folding
    # traps); the classifier's md5 grams hash the decorated bytes
    # identically in both engines
    "search_suggest_phrase",
    "search_suggest_completion",
    "search_dsl_more_like_this",
    "quality_classifier_scores",
    # late r9: decorated text through the span/intervals token
    # algebra (the [0-9a-z]+ analyzer must split identically around
    # CJK/emoji/combining marks in both engines), the boilerplate
    # chunker's \s+ split, and string_stats' per-codepoint explode
    "search_dsl_span_near",
    "search_dsl_span_first",
    "search_dsl_intervals",
    "boilerplate_chunk_removal",
    "search_aggs_string_stats",
    # r10: decorated text through the span-producer trees and the
    # interval filters (the analyzer must split identically around
    # CJK/emoji/combining marks), the significant_text doc-frequency
    # tokenize, the DSIR md5 bucket hash over decorated tokens, and
    # the fuzzy completion's levenshtein over decorated values
    "search_dsl_span_nested",
    "search_dsl_span_containing",
    "search_dsl_intervals_filter",
    "search_aggs_significant_text",
    "search_suggest_completion_fuzzy",
    "dsir_importance_weights",
    # r11: decorated text through the k-gram dedup's \s+ split +
    # md5 gram hashes, the regex-completion dictionary (anchored
    # RLIKE over decorated values), the interval script filter's
    # token algebra, the widened PII rules (unicode-adjacent digits —
    # the reason the patterns carry no \b), and the LM bigram hash
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

# Decorations keyed by doc_id % 9 — each is a known engine-divergence
# trap: supplementary-plane emoji (code-unit vs code-point counting),
# CJK (no word boundaries), Turkish İ + German ß (one-to-many case
# maps), ZWJ families (grapheme clusters), NBSP (non-\s whitespace
# lookalike), combining acute (NFC/NFD), RTL with diacritics.
_DECORATE = """
CASE doc_id % 9
  WHEN 0 THEN text || ' 🙂🚀'
  WHEN 1 THEN '中文测试词 ' || text
  WHEN 2 THEN replace(text, 'a', 'á')
  WHEN 3 THEN text || ' نصٌّ عربيٌّ'
  WHEN 4 THEN 'İstanbul STRASSE ß ' || text
  WHEN 5 THEN text || ' ' || chr(128105) || chr(8205) || chr(128103)
  WHEN 6 THEN replace(text, ' ', chr(160))
  WHEN 7 THEN 'e' || chr(769) || ' ' || text
  ELSE text
END
"""


@pytest.fixture(scope="module")
def uni_lake(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("uni_lake"))
    con = duckdb.connect()
    con.execute(f"""
    COPY (SELECT doc_id, {_DECORATE} AS text, lang, source, n_chars
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet'))
    TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    for t in TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet("
            f"'/root/testdata/sf0.001/{t}.parquet')) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return d


@pytest.fixture(scope="module")
def oracle_con(uni_lake):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{uni_lake}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", CHECKED)
def test_unicode_injected_differential(spark, uni_lake, oracle_con, name):
    qs, osql = entry.queries(), entry.oracle_sql()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        sp = _canon(qs[name](spark, uni_lake).toPandas())
        oc = _canon(oracle_con.execute(osql[name]).df())
    assert len(sp) > 0, f"{name}: empty result defeats the purpose"
    _assert_frames_equal(name, sp, oc)


def test_uni_lake_actually_decorated(spark, uni_lake):
    """Guard the fixture: every decoration class must be present."""
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    docs = load_table(spark, uni_lake, "documents")
    for marker in ("🙂", "中文", "á", "عرب", "İstanbul", "‍", " ", "é"):
        n = docs.filter(f"contains(text, '{marker}')").count()
        assert n > 0, f"decoration {marker!r} missing"
