"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over a
``documents(doc_id, text, ...)`` table.

Everything here is native Column expressions — no Python in the hot
path, whole-stage codegen end-to-end, and all of it embarrassingly
parallel (per-row, no shuffle). At 100 TB these run at scan speed.

Portability note: token/bit arithmetic uses only functions with exact
DuckDB equivalents (md5, ascii, length/replace, regexp) so every
operator is differentially testable; a production deployment would swap
md5 for ``xxhash64`` (cheaper, JVM-intrinsic) via ``hash_mode``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language marker lists for the n-gram/stopword heuristic.
#: Deliberately small and hand-picked: high-frequency closed-class words
#: that rarely collide across these languages.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}

#: BPE-ish pre-tokenizer: letter runs | single digits | single
#: non-alphanumeric-non-space marks (GPT-2-style digit splitting).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

STOPWORDS = LANG_MARKERS["en"]


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count via the pre-tokenizer regex — a cheap,
    deterministic proxy for LLM token budgeting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def _count_in_list(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(col)
    return (_count_in_list(toks, stopwords) / F.size(toks)).cast("double")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    stripped = F.regexp_replace(c, r"[^A-Za-z0-9\s]", "")
    return ((F.length(c) - F.length(stripped)) / F.length(c)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    0.5·min(1, tokens/64) + 0.3·(1 − punct_ratio) + 0.2·min(1, 10·stop_ratio)
    — longer, low-punctuation, natural-language-looking docs score high.
    The exact weights are a policy choice; the operator is the shape.
    """
    ntok = token_count_ws(col).cast("double")
    return (
        F.lit(0.5) * F.least(F.lit(1.0), ntok / F.lit(64.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(col))
        + F.lit(0.2) * F.least(F.lit(1.0), F.lit(10.0) * stopword_ratio(col))
    ).cast("double")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts."""
    toks = tokens(col)
    return {lang: _count_in_list(toks, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Predicted language: argmax marker count, alphabetical tie-break,
    'und' (undetermined) when every score is below ``min_hits``."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(min_hits - 1)
    # alphabetical iteration + strict '>' ⇒ the alphabetically-first
    # language wins ties (later candidates must strictly beat it).
    for lang in sorted(scores):
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace runs, trim."""
    c = (F.col(col) if isinstance(col, str) else col).cast("string")
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 over the normalized text — robust to
    case/punctuation/whitespace noise, the document-level analog of the
    reference's row content ids (/root/reference/data_lake_sync.py:72-82)."""
    return F.md5(normalize_text(col))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document.

    Output: ``id_col, n_tokens, n_distinct, distinct_ratio,
    top_token_share, mean_word_len`` — the classic corpus-quality
    filters (low distinct ratio / one token dominating ⇒ boilerplate or
    spam; word-length band ⇒ natural prose). Shape: explode tokens,
    count per (doc, token), reduce per doc — two partial-aggregated
    shuffles, both keyed on the doc id family, no joins. Ratios divide
    exact integer counts cast to double once, so differential oracles
    match bit-for-bit.
    """
    toks = F.explode(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    ).alias("w")
    freq = (
        df.select(F.col(id_col), toks)
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("c"))
    )
    stats = freq.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_count"),
        F.sum(F.col("c") * F.length(F.col("w"))).cast("bigint").alias("n_chars"),
    )
    nt = F.col("n_tokens").cast("double")
    return stats.select(
        F.col(id_col),
        "n_tokens",
        "n_distinct",
        (F.col("n_distinct").cast("double") / nt).alias("distinct_ratio"),
        (F.col("top_count").cast("double") / nt).alias("top_token_share"),
        (F.col("n_chars").cast("double") / nt).alias("mean_word_len"),
    )
