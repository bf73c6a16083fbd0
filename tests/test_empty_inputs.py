"""Zero-row inputs must flow through every operator family without
errors — the first empty micro-batch, a fully-filtered partition, or a
new tenant's empty table are routine at scale, not edge cases."""

from __future__ import annotations

import os

import pytest

from sql_database_to_elastic_datalake_spark.operators import chunking, dedup, text
from sql_database_to_elastic_datalake_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    """Schema-identical but empty mirrors of the lake tables."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in ("documents", "events", "embeddings"):
        df = load_table(spark, "/root/testdata/sf0.001", t)
        df.limit(0).write.parquet(os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def test_corpus_ops_on_empty_documents(spark, empty_sf):
    docs = load_table(spark, empty_sf, "documents")
    assert chunking.chunk_documents(docs, "doc_id", "text").count() == 0
    assert chunking.redact_pii(docs, "text").count() == 0
    sh = dedup.word_shingles(docs, "doc_id", "text")
    assert dedup.jaccard_pairs(sh, "doc_id", 0.5).count() == 0
    assert dedup.minhash_lsh_neardup(docs, "doc_id", "text", 0.9).count() == 0
    clusters = dedup.dedup_clusters(docs, dedup.jaccard_pairs(sh, "doc_id", 0.5), "doc_id")
    assert clusters.count() == 0
    assert text.repetition_stats(docs, "doc_id", "text").count() == 0


def test_registry_queries_on_empty_tables(spark, empty_sf):
    """Representative registered queries run (not necessarily non-empty)
    against an all-empty lake."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in (
        "dedup_exact",
        "doc_chunks",
        "pack_token_budget",
        "stratified_sample_langs",
        "text_stats",
        "embed_quantize_int8",
        "batch_sessionization",
        "funnel_conversion",
    ):
        out = qs[name](spark, empty_sf)
        n = out.count()
        assert n in (0, 1), (name, n)  # global aggs may emit one row


def test_corpus_prep_stats_empty_quality_reports_zeros(
        spark, tmp_path_factory):
    """r12 ADVICE regression: when NO doc passes the quality gate,
    branch B aggregates over an empty frame and sum(when(...)) is NULL
    — the funnel counters must still report 0 (the DuckDB oracle's
    scalar COUNT subqueries do)."""
    import __spark_entry__ as e

    d = tmp_path_factory.mktemp("noquality_sf")
    # docs exist (n_raw > 0) but none are English with >= 20 tokens
    spark.createDataFrame(
        [(1, "bonjour le monde", "fr", "web", 16),
         (2, "short en text", "en", "web", 13)],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.parquet(os.path.join(str(d), "documents.parquet"))
    [row] = e.queries()["corpus_prep_stats"](spark, str(d)).collect()
    assert row["n_raw"] == 2 and row["n_quality"] == 0
    for c in ("n_exact_unique", "n_clean", "n_train", "n_val", "n_test"):
        assert row[c] == 0, (c, row[c])
