"""DSIR-style importance weights for corpus selection.

Data Selection via Importance Resampling (arXiv:2302.03169): score
every raw-pool document by how target-like its hashed-token profile
is, then resample the raw pool proportionally to exp(score). The
standard pretraining-data stage between language-ID and dedup when a
high-quality target corpus (Wikipedia/books) defines "what good data
looks like".

Engine shape (all native column algebra, zero UDFs):

1. :func:`dsir_bucket_model` — ONE tokenize pass over the corpus with
   conditional counting builds the two hashed-unigram bag models
   (target vs raw) in a single ``n_buckets``-bounded groupBy. Token →
   bucket uses the engine's cross-engine-stable md5 hash (the
   quality-classifier convention — xxhash64 seeds differ between
   engines). Laplace-smoothed probabilities are single divisions of
   exact integer counts, so the model frame replays bit-identically
   in a differential oracle.
2. :func:`dsir_doc_features` — per-document bucket counts (one
   shuffle keyed on (doc, bucket)), broadcast-join the B-row model,
   then one doc-level groupBy producing exact integer cross-moments
   (``target_hits`` / ``raw_hits``) and the served ``log_weight`` =
   Σ n_b·(ln p_target(b) − ln p_raw(b)).

100-TB notes: the model is B rows however big the corpus — always a
broadcast; both shuffles are bounded by the token stream a tokenizer
pass already pays; nothing is quadratic and nothing collects. The
``log_weight`` column stays OUT of differential oracles (libm ln is
not bit-portable across engines — measured ~1% last-ulp divergence);
the exact integer moments it derives from are what oracles pin.

Reference parity note: the reference pipeline has no data-selection
stage (it syncs operational tables); this operator belongs to the
training-data extension surface (SURVEY.md §6 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    TOKEN_SPLIT_LOWER_RE,
)

#: default feature-space size — DSIR's paper setting is 10k hashed
#: buckets; 4096 keeps the model broadcast-tiny while leaving hash
#: collisions rare at testdata vocabulary sizes
DEFAULT_BUCKETS = 4096


def _token_bucket(tok, n_buckets: int):
    """Cross-engine-stable token hash: first 8 hex digits of md5,
    mod the bucket count (Spark ``conv(substring(md5,1,8),16,10)`` ==
    DuckDB ``CAST('0x'||substr(md5,1,8) AS UBIGINT)``)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10) \
        .cast("bigint") % F.lit(int(n_buckets))


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col).cast("string")),
                TOKEN_SPLIT_LOWER_RE),
        lambda t: t != "",
    )


def dsir_bucket_model(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The two hashed-unigram bag models in one pass.

    ``target_pred`` is a boolean Column selecting the target pool
    (e.g. ``F.col("lang") == "en"``); the raw pool is the WHOLE
    corpus (DSIR contrasts the target distribution against the full
    crawl). Returns one row per non-empty bucket::

        bucket, c_target, c_raw, p_target, p_raw

    with Laplace-smoothed probabilities p = (c+1)/(N+B) — single
    divisions of exact integer counts (bit-portable). Plan: tokenize
    → explode → ONE groupBy(bucket) with a conditional target sum;
    the totals ride an unpartitioned window over the B-row counts
    frame (one exchange of ≤ n_buckets rows — bounded however big the
    corpus), never a second corpus pass: the whole model lineage is
    exactly one corpus scan, so a consumer that references the model
    twice pays two scans, not four."""
    from pyspark.sql.window import Window

    toks = (
        docs.select(target_pred.alias("__is_t"),
                    F.explode(_tokens(text_col)).alias("__tok"))
        .select("__is_t",
                _token_bucket(F.col("__tok"), n_buckets)
                .alias("bucket"))
    )
    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_t"), F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint").alias("c_target"),
        F.count(F.lit(1)).cast("bigint").alias("c_raw"),
    )
    w = Window.partitionBy()  # B rows total: a bounded single partition
    bl = F.lit(float(n_buckets))
    return counts.select(
        "bucket", "c_target", "c_raw",
        ((F.col("c_target").cast("double") + F.lit(1.0))
         / (F.sum("c_target").over(w).cast("double") + bl))
        .alias("p_target"),
        ((F.col("c_raw").cast("double") + F.lit(1.0))
         / (F.sum("c_raw").over(w).cast("double") + bl))
        .alias("p_raw"),
    )


def dsir_doc_features(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document DSIR features against a bucket model::

        doc_id, n_tokens, target_hits, raw_hits, log_weight

    ``target_hits``/``raw_hits`` are the EXACT integer cross-moments
    Σ n_b·c_target(b) / Σ n_b·c_raw(b) (the oracle-pinned surface);
    ``log_weight`` is the served importance score
    Σ n_b·(ln p_target(b) − ln p_raw(b)) — resample raw docs with
    probability ∝ exp(log_weight) (ln portability note: module
    docstring). Docs with no tokens are dropped (no features to
    score — the quarantine tier, like the quality classifier's null
    logit).

    Plan: explode → groupBy(doc, bucket) → broadcast join the B-row
    model → ONE groupBy(doc). A bucket the model never saw (possible
    when scoring NEW docs against a frozen model) contributes the
    Laplace floor c = 0, p = 1/(N+B) — reconstructed INSIDE the same
    doc-level aggregate from the doc's own seen buckets (p/(c+1) =
    1/(N+B) on EVERY model row, so min() over any non-empty subset is
    the exact floor), never a second model pass. The one unservable
    corner — a doc whose every bucket is unseen — has no floor
    witness in its group and scores a null log_weight (the quarantine
    tier; its integer moments are all-zero anyway)."""
    per_bucket = (
        docs.select(F.col(id_col).alias("__doc"),
                    F.explode(_tokens(text_col)).alias("__tok"))
        .select("__doc",
                _token_bucket(F.col("__tok"), n_buckets)
                .alias("bucket"))
        .groupBy("__doc", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    j = per_bucket.join(F.broadcast(model), "bucket", "left")
    c_t = F.coalesce(F.col("c_target"), F.lit(0).cast("bigint"))
    c_r = F.coalesce(F.col("c_raw"), F.lit(0).cast("bigint"))
    p_t = F.col("p_target")
    p_r = F.col("p_raw")
    lw = F.col("__n").cast("double") * (F.log(p_t) - F.log(p_r))
    # Laplace floor for unseen buckets: p(c=0) = p(c)·1/(c+1) since
    # p = (c+1)/(N+B) — pure algebra on the joined rows, exact
    # (integer ratio times one division), constant across model rows
    floor_t = F.min(
        p_t / (F.col("c_target").cast("double") + F.lit(1.0)))
    floor_r = F.min(
        p_r / (F.col("c_raw").cast("double") + F.lit(1.0)))
    return (
        j.groupBy("__doc")
        .agg(
            F.sum("__n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("__n") * c_t).cast("bigint")
            .alias("target_hits"),
            F.sum(F.col("__n") * c_r).cast("bigint").alias("raw_hits"),
            F.sum(F.when(p_t.isNotNull(), lw)).alias("__lw_seen"),
            F.sum(F.when(p_t.isNull(), F.col("__n").cast("double")))
            .alias("__n_unseen"),
            floor_t.alias("__ft"),
            floor_r.alias("__fr"),
        )
        .select(
            F.col("__doc").alias(id_col),
            "n_tokens", "target_hits", "raw_hits",
            (F.coalesce(F.col("__lw_seen"), F.lit(0.0))
             + F.when(F.col("__n_unseen").isNull(), F.lit(0.0))
             .otherwise(
                 F.col("__n_unseen")
                 * (F.log(F.col("__ft")) - F.log(F.col("__fr")))))
            .alias("log_weight"),
        )
    )
