"""LLM-corpus preparation operators: chunking, packing, PII redaction,
stratified sampling.

These are the steps between "cleaned corpus" (:mod:`.dedup`, :mod:`.text`)
and "training batches":

  * :func:`chunk_documents` — fixed-size overlapping token windows, the
    standard context-window split. Pure column algebra (split → sequence
    → explode → slice), no shuffle: chunks are emitted where the
    document partition lives.
  * :func:`pack_by_token_budget` — assign documents to contiguous
    training batches by cumulative token budget. One window over the
    ordering key; deterministic. (This is boundary-agnostic packing:
    floor(running/budget) — a doc straddling a boundary starts the next
    batch; true first-fit bin packing is sequential by definition and
    would not distribute.)
  * :func:`redact_pii` — regex scrubbing of emails/phones with
    redaction accounting. Patterns are restricted to syntax shared by
    java.util.regex and RE2 so differential oracles replicate them.
  * :func:`stratified_sample` — per-stratum deterministic rate sampling
    on a content hash: membership is a pure function of the row (stable
    under re-partitioning, retries, and engine choice), unlike
    ``df.sample``/TABLESAMPLE whose draw depends on partition layout.

Reference scope note: the reference ships no corpus-prep operators (it
is a row-loop ETL); these extend the engine for the 100 TB training-data
use case the survey targets (SURVEY.md §2.10 extensions).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Redaction patterns — the subset of regex syntax identical in
#: java.util.regex (Spark) and RE2 (DuckDB/Go), so oracles can mirror:
#: explicit [0-9] classes (never \d — Unicode semantics differ),
#: non-capturing groups, no backreferences or lookaround (RE2 has
#: neither), and NO \b — Java's word boundary counts Unicode digits
#: (e.g. ٣) as word chars while RE2's is ASCII, so boundary-anchored
#: patterns diverge on unicode-adjacent digits (r11, measured). The
#: cost is mid-digit-run submatches (the r2 phone rule already
#: accepted that trade).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
#: r11 (verdict #6) — the wider public CCNet/Dolma-style rule set.
SSN_RE = r"[0-9]{3}[- ][0-9]{2}[- ][0-9]{4}"
IPV4_RE = (r"(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
           r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])")
#: ≥3 hextet-colon groups so "12:30:45" timestamps don't match;
#: ::-compressed short forms are missed (documented imprecision —
#: RE2 has no lookaround to do better portably).
IPV6_RE = r"(?:[0-9A-Fa-f]{1,4}:){3,7}[0-9A-Fa-f]{1,4}"
#: credit-card CANDIDATES (Luhn-validated before redaction): the
#: 4-4-4-4 grouped form and bare 13-19 digit runs.
CC_GROUPED_RE = r"(?:[0-9]{4}[ -]){3}[0-9]{4}"
CC_BARE_RE = r"[0-9]{13,19}"


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: ``id_col, chunk_idx, chunk, n_tokens`` — window *i* covers
    tokens ``[i·stride, i·stride + chunk_size)``; the last window may be
    short. ``ceil((n − chunk_size)/stride) + 1`` windows per doc (min 1),
    so every token belongs to ≥1 chunk.

    No shuffle: chunks materialize in the scanning task. At 100 TB the
    output is ~``chunk_size/stride``× the corpus — keep stride ≥ size/2
    unless duplication is intended.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_size)) / F.lit(float(stride))) + F.lit(1),
        F.lit(1),
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        # NULL text -> ZERO chunks (explode drops the NULL sequence):
        # unguarded, greatest() skips the NULL count and the doc emitted
        # one phantom chunk billed at n_tokens=chunk_size
        F.explode(
            F.when(n.isNotNull(), F.sequence(F.lit(0), n_chunks - 1))
        ).alias("chunk_idx"),
    )
    start = out["chunk_idx"] * stride
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("__toks"), start + 1, chunk_size), " "
        ).alias("chunk"),
        F.least(F.lit(chunk_size), F.col("__n") - start)
        .cast("bigint")
        .alias("n_tokens"),
    )


def pack_by_token_budget(
    df: DataFrame,
    id_col: str,
    token_count_col: Column | str,
    budget: int,
) -> DataFrame:
    """Assign each document a training-batch id by cumulative token count.

    ``batch_id = floor((running_total − n_tokens) / budget)`` — i.e. a
    document joins the batch its *starting* offset falls in. One global
    window over ``id_col``; at scale, pack within a partition key (date,
    shard) instead of globally — compose with ``partitionBy`` upstream.
    """
    from pyspark.sql import Window

    tc = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    ).cast("bigint")
    w = (
        Window.orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(tc).over(w)
    return df.select(
        F.col(id_col),
        tc.alias("n_tokens"),
        F.floor((running - tc) / F.lit(budget)).cast("bigint").alias("batch_id"),
    )


def luhn_valid(cand: Column) -> Column:
    """Luhn checksum over a candidate card number (separators
    stripped) — pure column algebra, SQL-expressible so the oracle
    replays it: from the RIGHTMOST digit, double every second, fold
    digits > 9 back (2v−9), sum ≡ 0 (mod 10)."""
    d = F.regexp_replace(cand, "[ -]", "")
    n = F.length(d)

    def term(i: Column) -> Column:
        v = F.substring(d, i, 1).cast("int")
        doubled = ((n - i) % 2) == 1
        dv = v * 2
        return F.when(doubled,
                      F.when(dv > 9, dv - 9).otherwise(dv)).otherwise(v)

    total = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0), lambda acc, i: acc + term(i))
    return (total % 10) == 0


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "clean_text"
) -> DataFrame:
    """Scrub emails, phone numbers, SSN-shaped ids, IPv4/IPv6
    addresses and Luhn-valid credit-card numbers; count what was
    removed per type (r11 widened the r2 email+phone pair to the
    public CCNet/Dolma-style rule set).

    Adds ``out_col`` (redacted text) and the accounting columns
    ``n_emails, n_phones, n_ssns, n_ipv4s, n_ipv6s, n_credit_cards``.
    Counting via split: a text with k matches splits into k+1 parts —
    avoids a second regex API (regexp_count) that RE2 oracles may
    lack. Credit cards are the exception: candidates are EXTRACTED
    (grouped 4-4-4-4 + bare 13-19 digit runs), Luhn-filtered, and
    each valid candidate is literal-replaced via one fold — a pure
    regex cannot checksum, and redacting non-card digit runs would
    destroy data (the Luhn-invalid control stays untouched).

    Every rule needs a CHARACTER its pattern cannot match without
    ('@', a digit, ':'), so each regex pass hides behind that cheap
    substring gate — a corpus row with no digits pays three byte
    scans, not twelve regex executions (measured 2.6× on the bench
    after the r11 rule widening; output is bit-identical, so the
    oracles are untouched). NULL text propagates NULL through every
    column, as before."""
    c = F.col(text_col)
    has_at = c.contains("@")
    # rlike early-exits at the first digit; a translate-and-compare
    # byte scan measured SLOWER (full-string scan + allocation, and
    # the gate expression is inlined per consumer)
    has_digit = c.rlike("[0-9]")
    has_colon = c.contains(":")

    def gated_count(pat: str, gate: Column) -> Column:
        return (
            F.when(c.isNull(), F.lit(None).cast("bigint"))
            .when(gate, (F.size(F.split(c, pat, -1)) - 1).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
        )

    def gated_replace(src: Column, pat: str, tag: str,
                      gate: Column) -> Column:
        return F.when(gate, F.regexp_replace(src, pat, tag)) \
            .otherwise(src)

    clean = c
    for pat, tag, gate in (
            (EMAIL_RE, "<EMAIL>", has_at),
            (PHONE_RE, "<PHONE>", has_digit),
            (SSN_RE, "<SSN>", has_digit),
            (IPV4_RE, "<IP>", has_digit),
            (IPV6_RE, "<IP>", has_colon)):
        clean = gated_replace(clean, pat, tag, gate)
    # credit cards: candidates from the ORIGINAL text (none of the
    # other patterns can intersect a candidate), Luhn-gated, folded
    # as literal replacements over the running text
    cands = F.concat(
        F.regexp_extract_all(c, F.lit(CC_GROUPED_RE), F.lit(0)),
        F.regexp_extract_all(c, F.lit(CC_BARE_RE), F.lit(0)),
    )
    valid = (
        F.when(c.isNull(), F.lit(None).cast("array<string>"))
        .when(has_digit, F.filter(cands, luhn_valid))
        .otherwise(F.array().cast("array<string>"))
    )
    clean = F.aggregate(
        valid, clean,
        lambda acc, x: F.replace(acc, x, F.lit("<CREDIT_CARD>")))
    return df.withColumns({
        out_col: clean,
        "n_emails": gated_count(EMAIL_RE, has_at),
        "n_phones": gated_count(PHONE_RE, has_digit),
        "n_ssns": gated_count(SSN_RE, has_digit),
        "n_ipv4s": gated_count(IPV4_RE, has_digit),
        "n_ipv6s": gated_count(IPV6_RE, has_colon),
        "n_credit_cards": F.size(valid).cast("bigint"),
    })


def _hex_threshold(rate: float) -> str:
    """Rate ∈ [0,1] → 4-hex-digit cutoff; lowercase hex sorts
    lexicographically like its numeric value, so ``md5_prefix < cutoff``
    keeps ~rate of rows ('g' sorts above 'f'…'f' = keep everything)."""
    if rate >= 1.0:
        return "g"
    return format(max(int(rate * 65536), 0), "04x")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff the first 4 hex
    digits of ``md5(id)`` sort below the stratum's rate cutoff.

    Membership is a pure function of (id, stratum rate): stable across
    engines, partitionings and reruns. The cutoff compare is plain
    string ordering on lowercase hex — replicable in any engine with
    md5() and no bit-fiddling.
    """
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    thr: Column = F.lit(_hex_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(_hex_threshold(rate))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def resample_to_mixture(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: Mapping[str, float],
) -> DataFrame:
    """Materialize a target domain mixture by deterministic up/down
    resampling — the step after :func:`mixture weights are chosen
    <stratified_sample>` in a DoReMi/Pile-style pipeline (public refs:
    arXiv:2305.10429 DoReMi; The Pile's per-set epoch counts,
    arXiv:2101.00027 Table 1, which upsamples small high-quality sets
    by repeating them a fractional number of epochs).

    Each listed domain is resampled to ``round(w_d / Σw · N_total)``
    rows (unlisted domains drop — weight 0); a domain's copies spread
    as evenly as possible: every doc gets ``target ÷ n`` copies and
    the first ``target mod n`` docs in md5-of-id order get one more,
    so per-doc copy counts differ by at most 1 and membership is a
    pure function of (id, domain counts) — stable across engines,
    partitionings and reruns, like every sampling draw in this module.
    Downsampling is the ``{0,1}``-copy special case of the same rule.

    Output: one row per (input row × copy), ``copy`` = 0..n_copies−1
    (training loaders shuffle downstream; the copy index keeps the
    output row-identifiable for accounting and oracles).

    Plan: one tiny per-domain count aggregate (broadcast back), one
    rank window partitioned BY DOMAIN (parallel across domains — never
    a global sort), and a generator explode for the copies. The
    domain-count lookup is rows=|domains|, broadcast however big the
    corpus.
    """
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    spark = df.sparkSession
    from sql_database_to_elastic_datalake_spark.localrel import local_frame

    wdf = local_frame(
        spark, [(k, float(v)) for k, v in sorted(weights.items())],
        f"`{domain_col}` string, __wt double",
    )
    counts = df.groupBy(domain_col).agg(
        F.count("*").cast("bigint").alias("__n")
    )
    # N_total spans the WHOLE corpus (summed before the weight join),
    # so the resampled output keeps the original corpus size even when
    # unlisted domains drop out
    n_total = Window.partitionBy()
    targets = (
        counts.withColumn(
            "__total", F.sum("__n").over(n_total).cast("double")
        )
        .join(F.broadcast(wdf), domain_col)
        .select(
            domain_col,
            "__n",
            F.round(
                F.col("__wt") / F.lit(total_w) * F.col("__total")
            ).cast("bigint").alias("__target"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    copies = (
        df.join(F.broadcast(targets), domain_col)
        .withColumn("__rn", rn)
        .withColumn(
            "__copies",
            # integral DIV, not float division-and-truncate: a
            # correctly-rounded double quotient can land exactly ON an
            # integer the true ratio sits just below
            F.expr("__target DIV __n").cast("bigint")
            + F.when(
                F.col("__rn") <= F.col("__target") % F.col("__n"), 1
            ).otherwise(0),
        )
    )
    return (
        copies.select(
            *df.columns,
            F.explode(
                F.when(
                    F.col("__copies") > 0,
                    F.sequence(F.lit(0), (F.col("__copies") - 1).cast("int")),
                ).otherwise(F.array())
            ).alias("copy"),
        )
        # a generator cannot nest inside expressions — cast after
        .withColumn("copy", F.col("copy").cast("bigint"))
    )


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str,
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates.

    Splitting by document hash leaks: two near-identical documents can
    land in train and test, inflating eval. Assign by the *cluster* id
    from :func:`~..dedup.dedup_clusters` instead — every member of a
    near-dup cluster shares its canonical id, hence its split. The draw
    is the same engine-portable md5-prefix ordering used by
    :func:`stratified_sample`, so membership is deterministic and
    layout-independent. One broadcast-friendly join on the id.
    """
    t_thr = _hex_threshold(train)
    v_thr = _hex_threshold(train + val)
    bucket = F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < t_thr, F.lit("train"))
        .when(bucket < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.join(clusters, id_col).select(
        F.col(id_col), F.col("cluster_id"), split.alias("split")
    )


def flag_contamination(
    df: DataFrame,
    id_col: str,
    text_col: str,
    probes: DataFrame,
    probe_text_col: str,
    n: int = 8,
    ids_unique: bool = False,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    lowercase word ``n``-gram with a probe (benchmark/eval) document
    set — the standard pre-training hygiene pass (GPT-3 filtered on
    13-grams; 8 is the common middle ground). Output: ``id_col,
    n_hits (distinct contaminated n-grams), contaminated``; every
    corpus doc appears, hit or not.

    Scale shape: probe n-grams are SMALL (benchmarks are megabytes
    against a 100 TB corpus) — they build once and BROADCAST; the
    corpus is touched in one pass (shingle explode → broadcast hash
    join → per-doc count), so the only corpus-sized shuffle is the
    per-id count aggregation. Normalization (lowercase, whitespace
    split, distinct shingles) is shared with the dedup family
    (:func:`~.dedup.word_shingles`), so "contaminated" and "near-dup
    of a probe" agree on tokenization.

    r15 (guide §2.3 + §3.2; r14 verdict #7): the join key is the
    two-seed xxhash64 pair over the shingle, not the shingle STRING —
    the broadcast set shrinks to 16 bytes/gram (what keeps a
    lake-scale probe set broadcastable) and the corpus-side probe is
    a 16-byte struct compare. Grouping/membership is identical absent
    a 128-bit-class collision (the exact_substring_dedup collision
    note: ~1e-13 at 1e13 grams). ``ids_unique`` (same contract as
    ``word_shingles(distinct=False)``): a caller whose input ids are
    unique by construction skips the corpus-wide (id, shingle)
    distinct — a full exchange of the exploded corpus stream that
    only ever guarded against duplicate input ids; within-doc
    duplicate grams are already collapsed per doc.
    """
    from sql_database_to_elastic_datalake_spark.operators.dedup import (
        word_shingles,
    )

    def gram_key(col: Column) -> Column:
        return F.struct(F.xxhash64(col).alias("a"),
                        F.xxhash64(col, F.lit(1)).alias("b"))

    probe_keys = (
        word_shingles(
            probes.select(F.col(probe_text_col).alias("__t"))
            .withColumn("__pid", F.monotonically_increasing_id()),
            "__pid", "__t", n=n, distinct=False,
        )
        .select(gram_key(F.col("shingle")).alias("__h"))
        .distinct()
    )
    corpus_sh = word_shingles(df, id_col, text_col, n=n,
                              distinct=not ids_unique)
    hits = (
        corpus_sh.select(F.col(id_col), gram_key(F.col("shingle")).alias("__h"))
        .join(F.broadcast(probe_keys), "__h")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(F.col(id_col), n_hits.alias("n_hits"),
                (n_hits > 0).alias("contaminated"))
    )


def boilerplate_chunk_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Passage-level boilerplate removal — the corpus-filtering stage
    between doc-level dedup and chunking in CCNet/RefinedWeb-style
    pipelines (headers, footers, license blocks survive document
    dedup; they repeat ACROSS documents).

    Semantics: split each doc into NON-overlapping ``chunk_size``-token
    windows (stride = size, so the doc is exactly the concatenation of
    its chunks), count the *distinct documents* each chunk text occurs
    in corpus-wide, and drop every chunk seen in ≥ ``min_docs`` docs.
    Output per surviving doc: ``id_col, clean_text`` (kept chunks
    rejoined in order; '' when everything was boilerplate) and the
    accounting columns ``n_chunks, chunks_removed, chars_removed``.
    NULL text yields zero chunks, so those docs are absent — the same
    contract as :func:`chunk_documents`.

    Scale: three key-partitioned shuffles — the chunk-frequency
    groupBy (map-side partial aggregation on the chunk hash), the
    frequency join back (same key, no broadcast: the distinct-chunk
    table is corpus-sized), and the per-doc regroup. No UDF, no
    driver-side state; per-doc chunk lists are bounded by doc length.
    Counting distinct DOCS (not occurrences) means a doc repeating its
    own refrain is never self-flagged.
    """
    chunks = chunk_documents(df, id_col, text_col,
                             chunk_size=chunk_size, stride=chunk_size)
    # two-seed xxhash64 pair, not md5 (r14, guide §2.2): a streaming
    # hash instead of a cryptographic one, and a 16-byte struct key
    # through the frequency groupBy + join-back instead of a 32-char
    # string; 128-bit-class grouping, so chunk-identity semantics are
    # unchanged (collision note at the exact_substring_dedup site)
    h = F.struct(F.xxhash64(F.col("chunk")).alias("a"),
                 F.xxhash64(F.col("chunk"), F.lit(1)).alias("b"))
    counts = (
        chunks.groupBy(h.alias("__h"))
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
    )
    flagged = (
        chunks.withColumn("__h", h)
        .join(counts, "__h")
        .withColumn("__boil", F.col("__df") >= F.lit(int(min_docs)))
    )
    kept = F.when(
        ~F.col("__boil"),
        F.struct(F.col("chunk_idx"), F.col("chunk")),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)),
                        lambda s: s["chunk"]),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("__boil"), 1).otherwise(0))
        .cast("bigint").alias("chunks_removed"),
        F.sum(F.when(F.col("__boil"), F.length("chunk")).otherwise(0))
        .cast("bigint").alias("chars_removed"),
    )


def exact_substring_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 25,
    min_occurrences: int = 2,
) -> DataFrame:
    """ExactSubstr-style VARIABLE-SPAN duplicate-run removal — the
    public training-data dedup standard (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"):
    every token inside a verbatim duplicated run of ≥ ``k`` tokens is
    removed, whatever the run's length.

    Exactness argument: a token is removed iff it lies inside SOME
    length-``k`` window whose text occurs at ≥ ``min_occurrences``
    sites (a site = a (doc, position) pair, so WITHIN-doc repeats
    count — Lee et al.'s "appears more than once in the corpus",
    unlike :func:`boilerplate_chunk_removal`'s distinct-doc rule). A
    duplicated run of length L ≥ k has all of its k-windows duplicated
    (each occurs wherever the run does), so the window cover equals
    the union of all duplicated spans of length ≥ k — the suffix-array
    result, computed with sorted k-gram GROUPING instead of a suffix
    array (the shuffle IS the sort, distributed).

    Plan shape (no UDF, no driver state): tokenize once → k-gram
    hash explode (one corpus-sized explode, stride 1 — the cost Lee
    et al. pay in suffix construction) → k-gram-frequency groupBy
    (map-side partial agg on the hash) → frequency join back (same
    key) → per-doc duplicated-start list (groupBy id, bounded by doc
    length) → one join back to the docs → pure column algebra:
    duplicated starts are merged into maximal covered intervals
    (consecutive starts ≤ k apart chain into one run), tokens are
    kept iff no interval covers their index, the doc is rebuilt in
    order. Four key-partitioned shuffles at scale.

    Output per doc (``text_col`` NULL docs are absent, the
    :func:`chunk_documents` contract): ``id_col, clean_text`` (kept
    tokens rejoined; '' when the whole doc was duplicated runs) and
    accounting ``n_tokens, tokens_removed, n_spans_removed``.
    """
    if int(k) < 2:
        raise ValueError("exact_substring_dedup needs k >= 2 "
                         "(k=1 removes every repeated token)")
    if int(min_occurrences) < 2:
        raise ValueError("min_occurrences >= 2 (1 would cover "
                         "every position)")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size(F.col("__toks")))
    )
    # r14 (guide §2.2 shuffle fewer bytes + §1.2 per-task work): the
    # gram key was md5(array_join(slice)) — every token copied into k
    # gram STRINGS and MD5'd k times, and a 32-char key shuffled into
    # the window. Now each token is xxhash64'd ONCE (materialized
    # array), and each gram key is a two-seed xxhash64 pair over the
    # hashed-long slice: no string materialization, a cryptographic
    # hash replaced by a streaming one, and a 16-byte struct key on
    # the wire instead of ~32+ bytes. Grouping is identical absent
    # hash collisions: a false duplicate window needs a 128-bit gram
    # collision (or an aligned 64-bit token collision) — ~1e-13 at
    # 1e13 grams, versus md5's 2^-128 class. Measured sf0.1: first
    # run 6.6 -> 1.6 s, steady 1.75 -> 1.63 s, shuffle bytes halved.
    grams = (
        base.filter(F.col("__n") >= k)
        .withColumn("__htoks", F.transform(F.col("__toks"),
                                           lambda t: F.xxhash64(t)))
        .select(
            F.col(id_col),
            F.explode(
                _hashed_gram_structs(F.col("__htoks"), int(k))
            ).alias("__g"),
        )
        .select(F.col(id_col), F.col("__g.s").alias("__s"),
                F.col("__g.h").alias("__h"))
    )
    # site counts via a window over the gram hash, NOT a
    # groupBy + self-join back: the k-gram explode is the dominant
    # cost and a join would recompute it (two more corpus scans).
    # Skew note: a pathologically frequent k-gram puts all its sites
    # in one window partition — Spark's window spills, and such grams
    # are exactly the ones being removed anyway.
    from pyspark.sql import Window

    occ = F.count("*").over(Window.partitionBy("__h"))
    starts = (
        grams.withColumn("__occ", occ)
        .filter(F.col("__occ") >= F.lit(int(min_occurrences)))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__s")).alias("__starts"))
    )
    return _rebuild_minus_covered(base.join(starts, id_col, "left"),
                                  id_col, k)


def _hashed_gram_structs(htoks_col: Column, k: int) -> Column:
    """``(s, h)`` structs for every k-window of a PRE-HASHED (long)
    token array: ``h`` is a two-seed xxhash64 pair over the window's
    hashed-long slice — a 128-bit-class grouping key with no gram
    string ever materialized (see the collision note at the
    exact_substring_dedup call site). NULL when the array is shorter
    than ``k`` (explode of NULL emits nothing)."""
    n = F.size(htoks_col)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("s"),
                F.struct(
                    F.xxhash64(F.slice(htoks_col, i + 1, k)).alias("a"),
                    F.xxhash64(F.slice(htoks_col, i + 1, k),
                               F.lit(1)).alias("b"),
                ).alias("h"),
            ),
        ),
    )


def _rebuild_minus_covered(out: DataFrame, id_col: str,
                           k: int) -> DataFrame:
    """Shared span-removal rebuild: expects ``__toks`` (tokens to
    rebuild from), ``__n`` and a per-doc sorted ``__starts`` array of
    covered k-window start positions (NULL = nothing covered).
    Merges starts into maximal intervals, drops covered tokens,
    rejoins in order with accounting — the back half of
    :func:`exact_substring_dedup`, shared with
    :func:`remove_probe_spans`."""
    st = F.col("__starts")
    nst = F.size(st)
    idx = F.sequence(F.lit(0), nst - 1)
    # merged covered intervals: consecutive duplicated starts ≤ k
    # apart chain into one run (their [s, s+k) windows touch); a gap
    # > k splits. i==0 / i==last short-circuit the NULL neighbor
    # lookups (TRUE OR NULL = TRUE).
    heads = F.filter(
        idx, lambda i: (i == 0) | (F.get(st, i) - F.get(st, i - 1) > k))
    tails = F.filter(
        idx, lambda i: (i == nst - 1) | (F.get(st, i + 1) - F.get(st, i) > k))
    ivs = F.when(st.isNotNull(), F.zip_with(
        heads, tails,
        lambda h, t: F.struct(
            F.get(st, h).alias("lo"), (F.get(st, t) + k).alias("hi")),
    )).otherwise(F.array().cast("array<struct<lo:int,hi:int>>"))
    out = out.withColumn("__ivs", ivs)
    kept = F.filter(
        F.transform(F.col("__toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("__ivs"),
            lambda iv: (s["i"] >= iv["lo"]) & (s["i"] < iv["hi"])),
    )
    return out.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ")
        .alias("clean_text"),
        F.col("__n").cast("bigint").alias("n_tokens"),
        (F.col("__n") - F.size(kept)).cast("bigint")
        .alias("tokens_removed"),
        F.size(F.col("__ivs")).cast("bigint").alias("n_spans_removed"),
    )


def remove_probe_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    probes: DataFrame,
    probe_text_col: str,
    k: int = 8,
) -> DataFrame:
    """SURGICAL benchmark decontamination (r11): remove every token
    inside a span of ≥ ``k`` tokens that appears verbatim in a probe
    (benchmark/eval) document — the span-removal counterpart of
    :func:`flag_contamination` (which only FLAGS whole docs; dropping
    a whole document for one leaked question wastes the rest of it,
    the Lee et al. 2021 argument applied to decontamination).

    Matching is case-folded (lowercase with the İ parity fold) on
    WHITESPACE tokens, so fold-equal spans in different case are
    caught — but the doc is rebuilt from its ORIGINAL tokens (folding
    preserves token count, so positions line up). Note the analyzer
    difference from :func:`flag_contamination`: that stage splits on
    the search analyzer's token class; this one must keep positions
    faithful to the rebuild, so it splits on whitespace.

    Scale shape: probe k-grams build once and BROADCAST (benchmarks
    are megabytes against a 100 TB corpus); the corpus pays ONE
    k-gram explode + the per-doc regroup + the rebuild join — no
    corpus-sized groupBy at all (cheaper than exact_substring_dedup:
    the duplicate set is given, not discovered). Same cover-exactness
    argument: a probe-shared span of length L ≥ k has all its
    k-windows in the probe set.

    Output: the :func:`exact_substring_dedup` shape — every non-NULL
    ``text_col`` doc with ``clean_text, n_tokens, tokens_removed,
    n_spans_removed``.
    """
    if int(k) < 1:
        raise ValueError("remove_probe_spans needs k >= 1")

    def fold(tok):
        return F.lower(F.regexp_replace(tok, "İ", "i̇"))

    def hashed(toks_col):
        # fold once, hash once, per token — materialized in its own
        # projection so neither runs per window (r14, guide §1.2; the
        # fold used to pay the İ regexp k times per token, and the
        # md5 gram key built a string per window — see the collision
        # note at the exact_substring_dedup call site for why the
        # two-seed xxhash64 pair is an equivalent grouping key)
        return F.transform(toks_col, lambda t: F.xxhash64(fold(t)))

    ptoks = F.split(F.trim(F.col(probe_text_col)), r"\s+")
    probe_grams = (
        probes.filter(F.col(probe_text_col).isNotNull())
        .select(hashed(ptoks).alias("__htoks"))
        .select(F.explode(
            _hashed_gram_structs(F.col("__htoks"), int(k))).alias("__g"))
        .select(F.col("__g.h").alias("__h"))
        .distinct()
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__n", F.size(F.col("__toks")))
    )
    hits = (
        base.select(F.col(id_col),
                    hashed(F.col("__toks")).alias("__htoks"))
        .select(F.col(id_col),
                F.explode(
                    _hashed_gram_structs(F.col("__htoks"), int(k)))
                .alias("__g"))
        .select(F.col(id_col), F.col("__g.s").alias("__s"),
                F.col("__g.h").alias("__h"))
        .join(F.broadcast(probe_grams), "__h")
    )
    starts = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_list("__s")).alias("__starts"))
    return _rebuild_minus_covered(base.join(starts, id_col, "left"),
                                  id_col, k)
