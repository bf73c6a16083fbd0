"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story (the whole point at 100 TB):
  * Exact dedup is a hash-groupBy — one shuffle on the content hash.
  * Naive pairwise Jaccard is O(n²) and exists here as the *verifier*
    and the small-scale oracle target; it joins docs through shared
    shingles, so disjoint docs never meet (still quadratic in the worst
    case of a shared-vocabulary corpus).
  * MinHash+LSH is the scale path: per-doc signatures (one shuffle),
    banding, and a join only on band-bucket collisions — candidate
    generation is ~linear for realistic similarity distributions. False
    positives are removed by exact Jaccard on candidates only; false
    negatives are the documented probabilistic trade
    (P[miss] = (1-j^r)^b).
  * SimHash for near-dup at hamming distance ≤ d uses the pigeonhole
    band trick: split the b-bit hash into d+1 chunks; any pair within
    distance d collides on ≥1 chunk — again join-on-bucket, not O(n²).

Portability: hashes are md5-derived (hex-string order for MinHash,
first-16-bits integer for SimHash) so DuckDB can replicate every step
bit-for-bit for differential testing. Production swaps in xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import content_hash

DEFAULT_SEEDS = tuple(f"s{i}" for i in range(12))


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Keep the lowest-id row per identical content; adds ``group_size``.

    One shuffle on the content hash; ``min`` aggregations get map-side
    partial aggregation for free.
    """
    h = content_hash(content_cols).alias("content_id")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_id")
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("group_size"),
        )
    )


# ---------------------------------------------------------------------------
# shingling + exact jaccard (verifier / small-scale path)
# ---------------------------------------------------------------------------

def word_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 1,
    distinct: bool = True,
) -> DataFrame:
    """Distinct lowercase word n-gram shingles per document, exploded to
    (id, shingle) rows.

    The token array is MATERIALIZED in its own projection before the
    sliding window runs: referencing the raw ``split(...)`` expression
    from inside the window lambda makes every ``element_at`` re-split
    the document — O(len²) tokenizations per row (measured: 13 s vs
    <2 s for 5k docs at sf0.1).

    ``distinct=False`` (r14, guide §2.4): ``array_distinct`` already
    dedupes WITHIN each document, so the trailing ``.distinct()`` —
    a full exchange of the exploded corpus-sized stream — only guards
    against duplicate input ids. A caller whose input id is unique by
    construction (a primary-key scan, an :func:`exact_representatives`
    output, a semi-join of either) opts out and produces the identical
    row set one exchange cheaper.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks"))
    if n == 1:
        sh = F.col("__toks")
    else:
        t = F.col("__toks")
        # sliding window of n consecutive tokens; explicit emptiness
        # guard because sequence(1, 0) counts DOWN in Spark
        sh = F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    out = base.select(
        F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle")
    )
    return out.distinct() if distinct else out


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard over docs that share ≥1 shingle; pairs (a < b).

    Output: a, b, jaccard. Quadratic in the size of shingle-sharing
    cliques — use :func:`minhash_lsh_neardup` at scale.

    The per-doc shingle-set SIZE rides the exploded stream so the
    size-ratio cut (``min/max ≥ t``, sound since J ≤ min/max) prunes
    shared-shingle row pairs BEFORE the (a, b) aggregation shuffle —
    the expensive stage, since one shared shingle between two
    different-length docs otherwise ships every co-occurrence row.
    Measured at sf1 (50k docs, threshold 0.9): 2.2× faster with a
    bit-identical pair set (225,357 pairs both ways). Carrying na/nb
    through the groupBy keys also retires the two post-agg size joins.

    The size join BROADCASTS the sizes side explicitly (r12): left to
    AQE's runtime stats, roughly half of all sessions instead
    broadcast the (id, shingle) relation — the BIG side — and the
    single-threaded hashed-relation build added ~50% wall time
    (measured at sf1: 19.1–21.6 s flapped mode vs 13.9 s pinned; this
    was the sf1 bench's "bimodality for unchanged code", r11 verdict
    #2). ``sizes`` is one row per doc — broadcast-safe at this
    operator's scale tier (exact-jaccard is the pair VERIFIER; the
    corpus-scale path is :func:`minhash_lsh_neardup`).
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("sz"))
    sized = shingles.join(F.broadcast(sizes), id_col)
    left = sized.select(F.col(id_col).alias("a"), "shingle",
                        F.col("sz").alias("na"))
    right = sized.select(F.col(id_col).alias("b"), "shingle",
                         F.col("sz").alias("nb"))
    inter = (
        # the shingle self-join is pinned to a SHUFFLED hash join
        # (r12): its inputs are the FULL shingle relation on both
        # sides — AQE's runtime stats sometimes chose to broadcast it
        # (compressed shuffle bytes sit near the adaptive threshold),
        # and the single-threaded multi-million-row hashed-relation
        # build was the sf1 variance's second mode; at corpus scale
        # that broadcast is an OOM, so the shuffle is also the only
        # plan that survives 100x. Equi-join on shingle + AQE skew
        # splitting still apply.
        left.hint("shuffle_hash").join(right, "shingle")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.least("na", "nb")
               >= F.lit(threshold) * F.greatest("na", "nb"))
        )
        .groupBy("a", "b", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.withColumn(
            "jaccard",
            (F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (scale path)
# ---------------------------------------------------------------------------

def minhash_signatures(
    shingles: DataFrame,
    id_col: str,
    seeds: tuple[str, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Per-doc MinHash signature: for each seed, the min md5 hex digest
    of ``seed|shingle`` — hex-string order is a uniform permutation, so
    P[minhash_a = minhash_b] = Jaccard(a, b)."""
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(s), F.col("shingle")))).alias(f"mh_{i}")
        for i, s in enumerate(seeds)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    bucket_cap: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Band the signature and emit distinct (a < b) bucket-collision pairs.

    Each band key is the md5 of its row concatenation. The bands are
    melted to long form (id, band_idx, band_key) so candidate generation
    is ONE self-join on (band_idx, band_key) — a per-band join loop
    would shuffle the signature table once per band; melting costs a
    single explode and a single shuffle regardless of band count.

    ``bucket_cap`` (r13, r12 verdict #2) bounds pair EMISSION under
    adversarial bucket density: a boilerplate-heavy corpus puts k
    near-identical docs in the same band bucket and the all-pairs join
    emits k(k-1)/2 rows per bucket — quadratic in clique size, the one
    super-linear stage the sf10 rehearsal measured. A bucket larger
    than the cap switches to STAR emission: every member pairs with the
    bucket's minimum id (the hub) only — k-1 rows, linear — instead of
    all pairs. Downstream cluster resolution (:func:`dedup_clusters`)
    recovers the full clique through the hub by transitive closure, so
    keep-one-per-cluster semantics are unchanged; what is lost is only
    the explicit non-hub pair rows (and, for false-positive bucket
    members whose hub pair fails verification, a possible member-member
    link — the documented recall trade at pathological density). The
    bucket-size pass is one groupBy + join on the SAME key the
    candidate self-join shuffles on, so the exchange is reused.

    ``metrics`` (filled via an Observation riding the bucket-stats
    materialization — no extra job) records the no-silent-caps
    accounting: ``capped_buckets`` (buckets that switched to star
    emission) and ``capped_bucket_docs`` (their total membership rows).
    Read it AFTER an action has materialized the result.
    """
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    melted = signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        F.col(id_col), F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_key").alias("band_key"),
    )
    if bucket_cap is None:
        left = melted.select(F.col(id_col).alias("a"), "band_idx", "band_key")
        right = melted.select(F.col(id_col).alias("b"), "band_idx", "band_key")
        return (
            left.join(right, ["band_idx", "band_key"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
    # bucket size + hub via ONE window pass over the bucket key the
    # candidate self-join shuffles on anyway — a groupBy+join-back
    # form re-plans the shingle→signature subtree once per consumer
    # (measured: 22 exchanges vs 6), while the windowed relation is
    # one exchange every branch reuses
    from pyspark.sql import Window

    w = Window.partitionBy("band_idx", "band_key")
    keyed = melted.withColumn("__bsz", F.count("*").over(w)) \
                  .withColumn("__hub", F.min(id_col).over(w))
    sparse = keyed.filter(F.col("__bsz") <= bucket_cap)
    left = sparse.select(F.col(id_col).alias("a"), "band_idx", "band_key")
    right = sparse.select(F.col(id_col).alias("b"), "band_idx", "band_key")
    all_pairs = (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    # dense buckets: hub = bucket min, so hub < member always holds
    star = (
        keyed.filter(F.col("__bsz") > bucket_cap)
        .filter(F.col(id_col) != F.col("__hub"))
        .select(F.col("__hub").alias("a"), F.col(id_col).alias("b"))
    )
    if metrics is not None:
        metrics["bucket_cap"] = bucket_cap
        metrics["__dense_stats"] = keyed.filter(
            (F.col("__bsz") > bucket_cap)
            & (F.col(id_col) == F.col("__hub"))
        ).select("__bsz")
    return all_pairs.unionByName(star).distinct()


class _CapAccounting:
    """Lazy mapping view of the bucket-cap accounting (the no-silent-
    caps numbers): resolving it runs ONE small aggregation over the
    dense-bucket stats relation, and only when something actually reads
    the metrics (the bench loop reads them OUTSIDE its timed region) —
    the hot path pays nothing."""

    _KEYS = ("bucket_cap", "capped_buckets", "capped_bucket_docs")

    def __init__(self, cap: int, dense_stats: DataFrame) -> None:
        self._cap, self._df, self._vals = cap, dense_stats, None

    def _resolve(self) -> dict:
        if self._vals is None:
            row = self._df.agg(
                F.count("*").alias("b"),
                F.coalesce(F.sum("__bsz"), F.lit(0)).alias("d"),
            ).first()
            self._vals = {"capped_buckets": int(row["b"]),
                          "capped_bucket_docs": int(row["d"])}
        return self._vals

    def keys(self):
        return self._KEYS

    def __getitem__(self, k):
        if k == "bucket_cap":
            return self._cap
        return self._resolve()[k]

    def __iter__(self):
        return iter(self._KEYS)

    def __len__(self) -> int:
        return len(self._KEYS)


def widen_narrow_input(out: DataFrame, probe: DataFrame) -> DataFrame:
    """Round-robin ``out`` to the session's default parallelism when the
    RAW input scan is narrower than the core count — else return it
    untouched.

    r14 (guide §2.5 input skew; SCALE.md r10 lesson 1): the shingle →
    per-shingle-hash stages downstream are CPU-dense per byte, and both
    the scan split count of a small/compacted table and AQE's
    byte-based partition coalescing serialize them onto 1-2 tasks
    (measured: the minhash signature+set pass at sf0.1 runs 2.7 s on
    the scan's 2 partitions vs 1.2 s widened to 32). ``probe`` must be
    the raw scan dataframe — its RDD partition count is the real split
    count; probing a post-shuffle frame would read the static
    shuffle-partition setting and say nothing about runtime AQE
    coalescing. At lake scale the scan has thousands of splits, the
    probe says "wide", and no extra exchange is added."""
    sc = out.sparkSession.sparkContext
    if probe.rdd.getNumPartitions() < sc.defaultParallelism:
        return out.repartition(sc.defaultParallelism)
    return out


def exact_representatives(
    df: DataFrame, id_col: str, content_cols: list[str]
) -> DataFrame:
    """Collapse exact-content duplicates to their min-id representative
    BEFORE near-dup detection (r12 verdict #2: standard practice — a
    clique of k byte-identical docs is the EXACT dedup stage's finding;
    letting it reach LSH banding re-derives its k(k-1)/2 pairs through
    the most expensive stage in the pipeline). One groupBy on the
    content hash + one semi-join back — both linear, and at boilerplate
    density they REPLACE quadratic pair emission.

    The collapsed output is widened to the session parallelism when the
    input scan is narrow (see :func:`widen_narrow_input`) — every
    caller feeds it straight into the CPU-dense shingle/hash stages."""
    reps = (
        df.select(F.col(id_col), content_hash(content_cols).alias("__h"))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return widen_narrow_input(df.join(reps, id_col, "left_semi"), df)


def minhash_lsh_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 1,
    seeds: tuple[str, ...] = DEFAULT_SEEDS,
    bands: int = 4,
    collapse_exact: bool = False,
    bucket_cap: int | None = None,
) -> DataFrame:
    """End-to-end near-dup detection: shingle → MinHash → LSH candidates
    → exact-Jaccard verification of candidates only.

    Output: a, b, jaccard (verified ≥ threshold).

    ``collapse_exact`` runs :func:`exact_representatives` first, so
    byte-identical duplicates never reach banding (their pairs belong
    to :func:`exact_dedup`); emitted pairs then reference representative
    ids only. ``bucket_cap`` bounds per-bucket pair emission via star
    edges (see :func:`lsh_candidate_pairs`); when set, the returned
    DataFrame carries a ``_dedup_metrics`` mapping with the capped-
    bucket accounting (readable after an action). Both default OFF here
    for drop-in compatibility; the registered corpus queries enable
    both — that pairing is what holds emission ~linear in docs on a
    boilerplate-heavy corpus (the 100-TB adversarial case).
    """
    if len(seeds) % bands:
        # a non-divisible split would silently DROP the trailing seeds
        # from every band key, changing the S-curve without any signal
        raise ValueError(
            f"{len(seeds)} seeds do not split into {bands} bands"
        )
    rows_per_band = len(seeds) // bands
    if collapse_exact:
        df = exact_representatives(df, id_col, [text_col])
    else:
        df = widen_narrow_input(df, df)
    # distinct=False: ids are unique here by contract (raw PK scan or
    # the collapsed representatives), and the two consumers below
    # (min per seed, collect_set) are duplicate-insensitive anyway —
    # the guard exchange bought nothing (r14, guide §2.4).
    sh = word_shingles(df, id_col, text_col, n=shingle_n, distinct=False)
    # ONE groupBy computes signatures AND shingle sets, checkpointed
    # once (r14; refines the r13 two-checkpoint shape): the signature
    # table feeds the melted band join's two sides plus the star/
    # metrics branches, and the set table feeds both verification
    # sides — without a checkpoint the whole scan→explode→groupBy
    # subtree replans per consumer (r13 measured: 22 exchanges vs 7).
    # Splitting sigs and sets into two groupBys additionally ran the
    # scan→shingle-explode subtree twice; fusing them into one
    # aggregation halves that (sf0.1 measured: 6.1 → 3.4 s, → 1.2 s
    # combined with the narrow-input widening above).
    per_doc = (
        sh.groupBy(id_col)
        .agg(*[F.min(F.md5(F.concat_ws("|", F.lit(s), F.col("shingle"))))
               .alias(f"mh_{i}") for i, s in enumerate(seeds)],
             F.collect_set("shingle").alias("shset"))
        .localCheckpoint()
    )
    if bucket_cap is not None:
        # r15 (guide §4 + §2.3, the r14 verdict's #2): sparse band
        # buckets are verified IN the bucket by one grouped map — see
        # :func:`_bucket_verified_pairs` for the equivalence argument
        # and the measured 1.57x at sf1.
        return _bucket_verified_pairs(
            per_doc, id_col, len(seeds), bands, rows_per_band,
            float(threshold), int(bucket_cap))
    sigs = per_doc.select(
        id_col, *[f"mh_{i}" for i in range(len(seeds))])
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    # Verify ONLY the LSH candidates: join each pair to its two per-doc
    # shingle sets (two hash joins keyed on doc id — linear in candidate
    # count) and compute |A∩B| / |A∪B| on the arrays. Running the
    # all-shared-shingle jaccard_pairs() here instead would be the O(n²)
    # cost LSH exists to avoid.
    return _verify_pairs_with_sets(
        cands, per_doc.select(id_col, "shset"), id_col, threshold)


def _verify_pairs_with_sets(
    cands: DataFrame, sets: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a, b) pairs by joining
    each side to its shingle set (two hash joins keyed on doc id) —
    linear in candidate count; each pair row carries both arrays.

    Size-ratio prefilter (r5 verdict #5): Jaccard is at most
    min(|A|,|B|)/max(|A|,|B|) (best case: the smaller set is a
    subset), so a candidate whose set sizes can't reach the
    threshold is dropped BEFORE the O(|A|+|B|) intersection runs —
    LSH banding collides on signature prefixes regardless of length,
    so short-vs-long false candidates are common and this cut is
    sound (never drops a true pair).
    """
    a_sets = sets.select(F.col(id_col).alias("a"), F.col("shset").alias("sa"))
    b_sets = sets.select(F.col(id_col).alias("b"), F.col("shset").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    sza, szb = F.size(F.col("sa")), F.size(F.col("sb"))
    ratio_ok = F.least(sza, szb) >= F.lit(threshold) * F.greatest(sza, szb)
    return (
        cands.join(a_sets, "a")
        .join(b_sets, "b")
        .filter(ratio_ok)
        .withColumn("i", inter)
        .withColumn(
            "jaccard",
            (
                F.col("i")
                / (F.size(F.col("sa")) + F.size(F.col("sb")) - F.col("i"))
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _bucket_verified_pairs(
    per_doc: DataFrame,
    id_col: str,
    n_seeds: int,
    bands: int,
    rows_per_band: int,
    threshold: float,
    bucket_cap: int,
) -> DataFrame:
    """Candidate generation + verification fused per band bucket (r15,
    guide §4 + §2.3; the r14 verdict's directive #2).

    The r14 shape shipped each doc's shingle set once per CANDIDATE
    PAIR SIDE (two per-pair hash joins: ~490k set copies at sf1 for
    244k candidates) and ran an interpreted ``array_intersect`` per
    pair row. Here the sets ride the ONE band-key exchange — at most
    ``bands`` copies per doc — and sparse buckets (2 ≤ size ≤ cap)
    form and verify their pairs INSIDE one Arrow grouped map: Python
    set intersection over the same distinct-shingle sets, the same
    size-ratio prefilter, the same ``i / (na + nb - i)`` IEEE double.
    Equivalence: pair identity is (a < b by id); Jaccard is a pure
    function of the two sets, so verifying a pair in every bucket it
    collides in and deduplicating after equals deduplicating first
    (measured at sf1: identical 222,306-pair output, 6.5 → 4.2 s
    min-of-3). Singleton buckets are dropped BEFORE the grouped map
    by the same window the cap accounting already runs — per-group
    Python overhead is paid only where a pair can exist.

    DENSE buckets (size > cap) keep the relational star path: the
    hub–member pairs are linear in bucket size but the bucket itself
    is unbounded, and verifying them inside one task would recreate
    the straggler the cap exists to bound — the distinct + set-join
    verification distributes them instead. Per-task work in the
    grouped map is bounded by cap²/2 intersections.

    The returned frame carries the ``_dedup_metrics`` cap accounting
    (lazy, reads run one small job) exactly like the r13/r14 shapes.
    """
    from pyspark.sql import Window

    band_structs = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    melted = per_doc.select(
        F.col(id_col), F.col("shset"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select(
        F.col(id_col), F.col("shset"),
        F.col("bk.band_idx").alias("band_idx"),
        F.col("bk.band_key").alias("band_key"),
    )
    w = Window.partitionBy("band_idx", "band_key")
    keyed = melted.withColumn("__bsz", F.count("*").over(w)) \
                  .withColumn("__hub", F.min(id_col).over(w))
    # column pruning keeps the star/metrics branches' exchanges
    # narrow: neither selects shset, so only the sparse branch's
    # exchange carries the sets
    dense_stats = keyed.filter(
        (F.col("__bsz") > bucket_cap) & (F.col(id_col) == F.col("__hub"))
    ).select("__bsz")
    star = (
        keyed.filter(F.col("__bsz") > bucket_cap)
        .filter(F.col(id_col) != F.col("__hub"))
        .select(F.col("__hub").alias("a"), F.col(id_col).alias("b"))
        .distinct()
    )
    star_verified = _verify_pairs_with_sets(
        star, per_doc.select(id_col, "shset"), id_col, threshold)

    cap = int(bucket_cap)
    thr = float(threshold)

    def verify_bucket(pdf):  # pragma: no cover - executor-side
        import pandas as pd

        ids = list(pdf[id_col])
        sets = [set(s) for s in pdf["shset"]]
        k = len(ids)
        oa, ob, oj = [], [], []
        for i in range(k):
            na, sa_ = len(sets[i]), sets[i]
            for j in range(i + 1, k):
                nb = len(sets[j])
                # same sound size-ratio cut as the relational tier
                if min(na, nb) < thr * max(na, nb):
                    continue
                inter = len(sa_ & sets[j])
                jac = inter / (na + nb - inter)
                if jac >= thr:
                    a, b = ids[i], ids[j]
                    if a > b:
                        a, b = b, a
                    oa.append(a)
                    ob.append(b)
                    oj.append(jac)
        return pd.DataFrame({"a": oa, "b": ob, "jaccard": oj})

    id_sql = per_doc.schema[id_col].dataType.simpleString()
    sparse_verified = (
        keyed.filter((F.col("__bsz") >= 2) & (F.col("__bsz") <= cap))
        .select("band_idx", "band_key", id_col, "shset")
        .groupBy("band_idx", "band_key")
        .applyInPandas(verify_bucket,
                       f"a {id_sql}, b {id_sql}, jaccard double")
    )
    out = sparse_verified.unionByName(star_verified).distinct()
    out._dedup_metrics = _CapAccounting(  # type: ignore[attr-defined]
        cap, dense_stats)
    return out


# ---------------------------------------------------------------------------
# SimHash (hamming-distance near-dup)
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    shingle_n: int = 3,
    distinct_shingles: bool = True,
) -> DataFrame:
    """``bits``-bit SimHash per document from md5-derived shingle values.

    Each distinct word ``shingle_n``-gram hashes to a ``bits``-bit value
    (the first bits/4 md5 hex chars); bit i of the SimHash is 1 iff the
    sum over shingles of (±1 per shingle's bit i) is positive.

    Defaults are the working tier, sized by measurement: at 16 bits a
    corpus of a few thousand docs saturates the hash space (every 4-bit
    pigeonhole chunk collides at rate 1/16 → candidate generation
    degenerates toward all-pairs), and over unigram bags a
    shared-vocabulary corpus gives unrelated docs similar bit sums —
    1.57M hamming≤3 "pairs" from 5k docs. 32 bits over 3-gram shingles
    keeps both the hash space and the feature space discriminative.

    ``distinct_shingles=False``: the bit sums are duplicate-SENSITIVE,
    so this is only sound when the input id is unique by construction
    (then ``array_distinct`` already made the rows unique and the
    ``.distinct()`` exchange is pure overhead — see
    :func:`word_shingles`).
    """
    assert bits % 4 == 0 and bits <= 60, "bits must be a hex multiple ≤60"
    sh = word_shingles(df, id_col, text_col, n=shingle_n,
                       distinct=distinct_shingles)
    tokval = sh.withColumn(
        "v",
        F.conv(
            F.substring(F.md5(F.col("shingle")), 1, bits // 4), 16, 10
        ).cast("long"),
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("v"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    sums = tokval.groupBy(id_col).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sums.select(F.col(id_col), sim.cast("long").alias("simhash"))


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit unigram SimHash (toy tier — see :func:`simhash` for why
    32 bits over 3-gram shingles is the working configuration)."""
    return simhash(df, id_col, text_col, bits=16, shingle_n=1)


def simhash_pairs(
    hashes: DataFrame, id_col: str, max_hamming: int, bits: int,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Pairs within hamming distance ≤ d via pigeonhole banding.

    ``bucket_cap`` (r13): same adversarial-density bound as
    :func:`lsh_candidate_pairs` — a chunk bucket holding more than the
    cap switches from all-pairs to STAR emission (every member pairs
    with the bucket's min id), bounding per-bucket pair emission at
    k-1 instead of k(k-1)/2; the true-hamming filter still verifies
    every emitted pair, and cluster resolution recovers full cliques
    through the hub. The returned DataFrame carries ``_dedup_metrics``
    (capped-bucket accounting, readable after an action) when capped.

    The ``bits``-bit hash splits into d+1 chunks; any pair within
    distance d agrees on at least one chunk — each chunk is a join
    bucket, unioned, then the true hamming distance filters false
    positives.

    ``bits`` is REQUIRED and must match the width the hashes were built
    with: chunking 16-bit hashes as 32-bit makes the two high chunks
    zero for every document, so every pair collides there and candidate
    generation silently degenerates to all-pairs — the exact quadratic
    blow-up this operator exists to avoid.
    """
    # localCheckpoint the hash relation (r13 late): one short row per
    # doc, but its lineage is the full shingle→60-conditional-sum
    # aggregation — the chunk join's two sides plus the star/stats
    # branches would each replan it (same 22-vs-7-exchange pathology
    # as minhash_lsh_neardup; measured there).
    hashes = hashes.localCheckpoint()
    chunks = max_hamming + 1
    width = bits // chunks
    parts = []
    for cidx in range(chunks):
        shift = cidx * width
        w = width + (bits - chunks * width if cidx == chunks - 1 else 0)
        mask = (1 << w) - 1
        chunk = F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit(mask))
        parts.append(F.struct(F.lit(cidx).alias("ck"), chunk.alias("cv")))
    # One explode instead of a (d+1)-way union: the union form re-plans
    # the upstream simhash aggregation once per chunk per join side —
    # 2(d+1) copies of the shingle→groupBy subtree — while the explode
    # keys every chunk off a single pass.
    keyed = hashes.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(F.array(*parts)).alias("__c"),
    ).select(id_col, "simhash", F.col("__c.ck").alias("ck"), F.col("__c.cv").alias("cv"))
    dense_stats = None
    if bucket_cap is not None:
        # one window pass on the chunk key (the join key) gives size
        # AND the hub's (id, hash) — min of the struct orders by id
        # first, so no hub-hash re-join is needed
        from pyspark.sql import Window

        w = Window.partitionBy("ck", "cv")
        keyed = (
            keyed.withColumn("__bsz", F.count("*").over(w))
            .withColumn(
                "__hubrow",
                F.min(F.struct(F.col(id_col), F.col("simhash"))).over(w),
            )
        )
        dense_stats = keyed.filter(
            (F.col("__bsz") > bucket_cap)
            & (F.col(id_col) == F.col("__hubrow")[id_col])
        ).select("__bsz")
    sparse = (keyed.filter(F.col("__bsz") <= bucket_cap)
              if bucket_cap is not None else keyed)
    left = sparse.select(
        F.col(id_col).alias("a"), F.col("simhash").alias("ha"), "ck", "cv"
    )
    right = sparse.select(
        F.col(id_col).alias("b"), F.col("simhash").alias("hb"), "ck", "cv"
    )
    cands = (
        left.join(right, ["ck", "cv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
    )
    if bucket_cap is not None:
        star = (
            keyed.filter(F.col("__bsz") > bucket_cap)
            .filter(F.col(id_col) != F.col("__hubrow")[id_col])
            .select(F.col("__hubrow")[id_col].alias("a"),
                    F.col("__hubrow")["simhash"].alias("ha"),
                    F.col(id_col).alias("b"),
                    F.col("simhash").alias("hb"))
        )
        cands = cands.unionByName(star)
    cands = cands.distinct()
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    out = (
        cands.withColumn("hamming", dist.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    if dense_stats is not None:
        out._dedup_metrics = _CapAccounting(  # type: ignore[attr-defined]
            bucket_cap, dense_stats)
    return out


# ---------------------------------------------------------------------------
# cluster resolution (transitive closure of near-dup pairs)
# ---------------------------------------------------------------------------

def dedup_clusters(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str,
    max_iter: int = 25,
    metrics: dict | None = None,
) -> DataFrame:
    """Resolve pairwise near-dup links into canonical clusters.

    Pairwise detectors (:func:`minhash_lsh_neardup`, :func:`simhash_pairs`)
    emit edges; keep-one-per-group needs the *transitive closure*: if
    a~b and b~c, then {a,b,c} is one cluster even though (a,c) was never
    emitted. Output: ``id_col, cluster_id`` for every node (singletons
    map to themselves); ``cluster_id`` is the component's minimum id, so
    "keep the canonical doc" is ``filter(id == cluster_id)``.

    Algorithm: min-label propagation to fixpoint — each round every node
    takes the min of its own and its neighbors' labels (one join + one
    groupBy shuffle per round), converging in O(component diameter)
    rounds. The driver loop only orchestrates rounds and checks one
    count per round (the standard Spark shape for iterative graph
    algorithms; lineage is truncated per round with localCheckpoint so
    plans stay O(1) deep). Near-dup graphs are dense cliques with tiny
    diameters, so rounds ≈ 3-5 in practice; for adversarial long-chain
    graphs swap in alternating star contraction (Kiveris et al.,
    "Connected Components in MapReduce"), same interface.

    ``metrics`` (optional dict, filled in place) records the two
    numbers that explain this operator's cost so a bench regression is
    attributable: ``candidate_pairs`` (edge count — observed on the
    edge materialization, no extra job) and ``propagation_rounds``
    (driver loop count). Pair density is data-bound (it grows with
    duplicate-clique mass); rounds are diameter-bound — if time moves
    but both metrics hold, the PLAN drifted (r5 verdict #5).
    """
    if int(max_iter) < 1:
        raise ValueError("dedup_clusters needs max_iter >= 1")
    ids = nodes.select(F.col(id_col).alias("id")).distinct()
    # Edge endpoints must carry the NODES' id dtype: a hard cast (e.g. to
    # long) would turn string ids into NULL edges that silently drop in
    # the propagation join, fragmenting every cluster into singletons.
    # NULL endpoints (a null pair id, or a cast that failed) are
    # dropped EXPLICITLY (r15, ADVICE): the pre-r14 per-round inner
    # join dropped them implicitly, but the fused tagged-min groupBy
    # treats NULL as a key — without this filter a null-id label row
    # would persist into the output (and duplicate the null singleton
    # from the final unionByName).
    id_type = ids.schema["id"].dataType
    edges = pairs.select(
        F.col("a").cast(id_type).alias("s"),
        F.col("b").cast(id_type).alias("d"),
    ).filter(F.col("s").isNotNull() & F.col("d").isNotNull())
    # The edge list is MATERIALIZED once (localCheckpoint): every round
    # joins against it, and without the checkpoint each round — plus
    # the singleton anti-join below — re-executes the entire upstream
    # pair-detection pipeline (shingling, banding, verification) from
    # scratch. One pipeline run, then rounds touch only the edge list.
    und = edges.union(
        edges.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    obs = None
    if metrics is not None:
        from pyspark.sql import Observation

        # rides the checkpoint's materialization — no extra job
        obs = Observation()
        und = und.observe(obs, F.count(F.lit(1)).alias("n"))
    und = und.localCheckpoint(eager=True)
    if obs is not None:
        metrics["candidate_pairs"] = int(obs.get["n"]) // 2
    # Propagate over the CONNECTED SUBGRAPH only: a node with no edges
    # can never change labels, so shuffling the whole corpus through
    # every round just re-materializes singletons. Near-dup graphs are
    # sparse — at 100 TB the edge-touched set is orders of magnitude
    # smaller than the corpus; singletons rejoin label=self at the end.
    #
    # r14 (guide §1.2 + §2.1): per round, the changed-count rides the
    # checkpoint materialization as an Observation, and the old label
    # rides the SAME groupBy as a tagged min — no second job and no
    # per-round label join. r15 (guide §2.4, r14 verdict #5): round 1
    # needs NO join at all — against identity labels, each message is
    # just the edge itself (id=d, label=s), and the own rows are
    # (d, d) straight off the edge list (duplicates per incident edge
    # are harmless under min). That also retires the separate
    # edge_ids checkpoint: every round's label frame carries exactly
    # the edge-touched id set, so the final singleton anti-join reads
    # the last labels frame instead (one distinct shuffle + one
    # checkpoint job fewer per resolution; measured sf1: edge_ids
    # 0.3-0.7 s + the round-1 join share).
    from pyspark.sql import Observation

    labels = None
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        if labels is None:
            stream = und.select(
                F.col("d").alias("id"), F.col("s").alias("label"),
                F.lit(False).alias("__own"),
            ).unionByName(und.select(
                F.col("d").alias("id"), F.col("d").alias("label"),
                F.lit(True).alias("__own")))
        else:
            msgs = und.join(
                labels.withColumnRenamed("id", "s"), "s"
            ).select(F.col("d").alias("id"), "label")
            stream = (
                labels.select("id", "label", F.lit(True).alias("__own"))
                .unionByName(msgs.select(
                    "id", "label", F.lit(False).alias("__own")))
            )
        robs = Observation()
        new = (
            stream
            .groupBy("id")
            .agg(
                F.min("label").alias("label"),
                F.min(F.when(F.col("__own"), F.col("label")))
                .alias("__old"),
            )
            .observe(robs, F.sum(
                (F.col("label") != F.col("__old")).cast("long")
            ).alias("chg"))
            .select("id", "label")
            .localCheckpoint(eager=True)
        )
        changed = int(robs.get["chg"] or 0)
        labels = new
        if changed == 0:
            break
    if metrics is not None:
        metrics["propagation_rounds"] = rounds
    singletons = ids.join(labels.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("label")
    )
    return labels.unionByName(singletons).select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )
