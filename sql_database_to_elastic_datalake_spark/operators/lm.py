"""CCNet-style language-model perplexity scoring for corpus quality.

CCNet (arXiv:1911.00359 §4.3) scores every crawled document with a
language model trained on a high-quality target corpus (Wikipedia) and
splits each language into head/middle/tail perplexity terciles — the
standard "how Wikipedia-like is this text" quality signal between
language-ID and dedup in public pretraining pipelines.

Engine shape (all native column algebra, zero UDFs) — the DSIR
conventions (:mod:`.dsir`) applied to a BIGRAM model:

1. :func:`lm_bigram_model` — adjacent-token bigrams over the TARGET
   pool only, each side hashed to ``n_buckets`` md5 buckets (the
   cross-engine-stable hash every hashed model here uses). ONE
   tokenize pass: the bigram stream is ``zip_with`` over the token
   array BEFORE the explode, so positions never shuffle. The model is
   ≤ ``n_buckets²`` rows HOWEVER big the corpus (hash saturation) —
   the broadcastability argument; the default 1024 caps it at ~1M
   rows. A real deployment swaps in a KenLM — this is the hashed
   approximation that keeps the scoring distributed and
   differentially testable.
2. :func:`lm_doc_features` — per-document pair counts (one shuffle
   keyed on (doc, pair)), broadcast-join the pair model AND the
   B-row context model (an unseen pair still needs its context count
   for the Laplace term), then one doc-level groupBy producing exact
   integer cross-moments (``model_hits`` / ``context_hits`` — the
   oracle-pinned surface) and the served ``log_prob`` =
   Σ n·ln((c₁₂+1)/(c₁+B)); ``perplexity`` = exp(−log_prob/n).
3. :func:`perplexity_tiers` — CCNet's head/middle/tail terciles per
   language (ntile window over the scored frame).

The ``log_prob``/``perplexity`` columns stay OUT of differential
oracles (libm ln/exp are not bit-portable across engines — the DSIR
measurement); the integer moments they derive from are what oracles
pin, and the log tier is pytest-checked against a plain-python
replica.

Reference parity note: the reference pipeline has no quality-scoring
stage; this operator belongs to the training-data extension surface
(SURVEY.md §6 LLM-pipeline family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.dsir import (
    _token_bucket,
    _tokens,
)

#: bigram bucket base — 1024² caps the observed-pair model at ~1M
#: rows (broadcast-sized at saturation, i.e. at ANY corpus size)
DEFAULT_BUCKETS = 1024


def _bigram_stream(
    docs: DataFrame,
    text_col: str,
    n_buckets: int,
    keep: dict[str, Column] | None = None,
) -> DataFrame:
    """One ``(keep..., b1, b2)`` row per adjacent-token pair — built
    from the token array BEFORE any explode (``zip_with`` over the
    bucket array against its own tail), so the pair stream costs what
    the tokenizer pass already pays.

    r14 (guide §1.2 per-task work): each token is bucketed ONCE — the
    md5+conv bucket runs in a ``transform`` materialized in its own
    projection, and the zip pairs two slices of that materialized
    array. The previous shape bucketed inside the zip lambda over two
    slices of the RAW token array, so every token paid the md5 twice
    (as the right side of pair i−1 and the left side of pair i).
    Bucket values are unchanged — same hash, same order.
    """
    keep = keep or {}
    bks = F.transform(
        _tokens(text_col), lambda t: _token_bucket(t, n_buckets))
    base = docs.select(
        *[c.alias(n) for n, c in keep.items()], bks.alias("__bks"))
    m = F.greatest(F.size(F.col("__bks")) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("__bks"), 1, m),
        F.slice(F.col("__bks"), 2, m),
        lambda a, b: F.struct(a.alias("b1"), b.alias("b2")),
    )
    return (
        base.select(*keep, F.explode(pairs).alias("__p"))
        .select(*keep, F.col("__p.b1").alias("b1"),
                F.col("__p.b2").alias("b2"))
    )


def lm_bigram_model(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """The hashed-bigram model over the target pool::

        b1, b2, c12, c1

    ``c12`` = exact pair count, ``c1`` = the context total Σ_b2 c12 —
    computed with a window over the model frame itself (≤ B² rows, one
    bounded exchange), never a second corpus pass."""
    from pyspark.sql.window import Window

    pairs = _bigram_stream(docs.filter(target_pred), text_col,
                           n_buckets)
    counts = pairs.groupBy("b1", "b2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12"))
    w = Window.partitionBy("b1")
    return counts.withColumn(
        "c1", F.sum("c12").over(w).cast("bigint"))


def lm_doc_features(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document LM features against a bigram model::

        doc_id, n_bigrams, model_hits, context_hits, log_prob,
        perplexity

    ``model_hits``/``context_hits`` are the EXACT integer
    cross-moments Σ n·c12 / Σ n·c1 (the oracle-pinned surface);
    ``log_prob`` = Σ n·ln((c12+1)/(c1+B)) with the Laplace floor for
    unseen pairs (c12 = 0; the CONTEXT count comes from a second
    broadcast join on b1, so a novel continuation of a known context
    is priced differently from a wholly novel context — KenLM's
    backoff intuition in one smoothing step); ``perplexity`` =
    exp(−log_prob / n_bigrams). Docs with < 2 tokens have no bigrams
    and are absent (nothing to score — the quarantine tier).

    Plan: pair explode → groupBy(doc, pair) → TWO broadcast joins
    (pair model, B-row context margin) → ONE groupBy(doc). Nothing
    quadratic, nothing collected; both models are saturation-bounded
    broadcasts at any corpus size."""
    contexts = (
        model.groupBy("b1")
        .agg(F.max("c1").cast("bigint").alias("__c1m"))
    )
    per_pair = (
        _bigram_stream(docs, text_col, n_buckets,
                       keep={"__doc": F.col(id_col)})
        .groupBy("__doc", "b1", "b2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    j = (
        per_pair
        .join(F.broadcast(model.select("b1", "b2", "c12")),
              ["b1", "b2"], "left")
        .join(F.broadcast(contexts), "b1", "left")
    )
    c12 = F.coalesce(F.col("c12"), F.lit(0).cast("bigint"))
    c1 = F.coalesce(F.col("__c1m"), F.lit(0).cast("bigint"))
    bl = F.lit(float(n_buckets))
    term = (F.col("__n").cast("double")
            * F.log((c12.cast("double") + F.lit(1.0))
                    / (c1.cast("double") + bl)))
    out = j.groupBy("__doc").agg(
        F.sum("__n").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("__n") * c12).cast("bigint").alias("model_hits"),
        F.sum(F.col("__n") * c1).cast("bigint").alias("context_hits"),
        F.sum(term).alias("log_prob"),
    )
    return out.select(
        F.col("__doc").alias(id_col),
        "n_bigrams", "model_hits", "context_hits", "log_prob",
        F.exp(-F.col("log_prob") / F.col("n_bigrams").cast("double"))
        .alias("perplexity"),
    )


#: fixed absolute discount — Chen & Goodman's recommended constant
#: range for interpolated KN; the count-of-counts estimate
#: n1/(n1+2n2) is a knob a deployment can tune
KN_DISCOUNT = 0.75


def lm_kn_doc_features(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    discount: float = KN_DISCOUNT,
) -> DataFrame:
    """Interpolated Kneser–Ney scoring against the SAME hashed-bigram
    model — the smoothing KenLM (and therefore CCNet's reference
    pipeline) actually uses, next to the Laplace tier of
    :func:`lm_doc_features`::

        P(b2|b1) = max(c12 − D, 0)/c1 + (D·N1+(b1,·)/c1) · P_cont(b2)
        P_cont(b2) = (N1+(·,b2) + 1) / (T + B)

    where N1+(b1,·)/N1+(·,b2) are distinct-continuation /
    distinct-predecessor type counts, T = total distinct pair types,
    and the +1/+B Laplace floor on the continuation distribution
    keeps unseen events strictly positive (textbook KN leaves
    P_cont = 0 for a token type the model never saw — a documented
    simplification, positivity is what a pipeline score needs). A
    wholly unseen context (c1 = 0) backs off entirely to P_cont.

    Output: ``doc_id, n_bigrams, model_hits, context_hits, fw_types,
    bw_types, log_prob, perplexity`` — the five integer columns are
    exact cross-moments (the oracle-pinned surface; fw/bw are
    Σ n·N1+(b1,·) / Σ n·N1+(·,b2)); the log tier is pytest-pinned to
    a python replica, never oracled (libm portability, the DSIR
    measurement).

    Plan: identical to the Laplace tier plus ONE more broadcast
    margin (the backward type counts) — pair explode →
    groupBy(doc, pair) → THREE broadcast joins (pair model, forward
    margin, backward margin) → ONE doc groupBy. T is one bounded
    count over the ≤ B² model frame."""
    fw = model.groupBy("b1").agg(
        F.max("c1").cast("bigint").alias("__c1m"),
        F.count(F.lit(1)).cast("bigint").alias("__n1f"),
    )
    bw = model.groupBy("b2").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n1b"))
    # r14 (guide §5 driver): T used to be a driver-side
    # ``model.count()`` at query-construction time — a blocking job
    # that re-executed the whole model lineage (corpus scan → pair
    # groupBy) once per build, invisible in the plan. As a 1-row
    # broadcast cross-join the count shares the model subtree's
    # exchange with the other margins (ReuseExchange) and the build
    # does no Spark work. (T + B) as a double is bit-identical to the
    # old ``float(total_types + n_buckets)`` literal for any count
    # below 2^53.
    tt = model.agg(F.count(F.lit(1)).cast("bigint").alias("__T"))
    per_pair = (
        _bigram_stream(docs, text_col, n_buckets,
                       keep={"__doc": F.col(id_col)})
        .groupBy("__doc", "b1", "b2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    j = (
        per_pair
        .join(F.broadcast(model.select("b1", "b2", "c12")),
              ["b1", "b2"], "left")
        .join(F.broadcast(fw), "b1", "left")
        .join(F.broadcast(bw), "b2", "left")
        .crossJoin(F.broadcast(tt))
    )
    c12 = F.coalesce(F.col("c12"), F.lit(0).cast("bigint")).cast("double")
    c1 = F.coalesce(F.col("__c1m"), F.lit(0).cast("bigint")).cast("double")
    n1f = F.coalesce(F.col("__n1f"), F.lit(0).cast("bigint")).cast("double")
    n1b = F.coalesce(F.col("__n1b"), F.lit(0).cast("bigint")).cast("double")
    d = F.lit(float(discount))
    p_cont = (n1b + F.lit(1.0)) / (
        F.col("__T") + F.lit(int(n_buckets))).cast("double")
    p_seen = (F.greatest(c12 - d, F.lit(0.0)) / c1
              + (d * n1f / c1) * p_cont)
    p = F.when(c1 > 0, p_seen).otherwise(p_cont)
    term = F.col("__n").cast("double") * F.log(p)
    out = j.groupBy("__doc").agg(
        F.sum("__n").cast("bigint").alias("n_bigrams"),
        F.sum(F.col("__n") * F.col("c12")).cast("bigint")
        .alias("model_hits"),
        F.sum(F.col("__n") * F.col("__c1m")).cast("bigint")
        .alias("context_hits"),
        F.sum(F.col("__n") * F.col("__n1f")).cast("bigint")
        .alias("fw_types"),
        F.sum(F.col("__n") * F.col("__n1b")).cast("bigint")
        .alias("bw_types"),
        F.sum(term).alias("log_prob"),
    )
    zero = F.lit(0).cast("bigint")
    return out.select(
        F.col("__doc").alias(id_col),
        "n_bigrams",
        F.coalesce(F.col("model_hits"), zero).alias("model_hits"),
        F.coalesce(F.col("context_hits"), zero).alias("context_hits"),
        F.coalesce(F.col("fw_types"), zero).alias("fw_types"),
        F.coalesce(F.col("bw_types"), zero).alias("bw_types"),
        "log_prob",
        F.exp(-F.col("log_prob") / F.col("n_bigrams").cast("double"))
        .alias("perplexity"),
    )


def perplexity_tiers(
    scored: DataFrame,
    lang_col: str = "lang",
    perp_col: str = "perplexity",
) -> DataFrame:
    """CCNet's head/middle/tail split: perplexity terciles PER
    LANGUAGE (ntile(3) over each language partition — CCNet cuts each
    language's distribution independently so no language is starved).
    Ties break on the ntile window's deterministic order (perplexity,
    then the remaining columns are irrelevant: ntile only needs the
    order)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.col(lang_col)).orderBy(
        F.col(perp_col).asc_nulls_last())
    tier = F.element_at(
        F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
        F.ntile(3).over(w))
    return scored.withColumn("tier", tier)
