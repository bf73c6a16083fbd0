"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is actually deployed:
  * :func:`cosine_topk` — exact brute-force top-k. The baseline and the
    verifier. One broadcast of the (small) query set against a single
    scan of the candidate table; per-query top-k via ranking window on
    the query id. Linear in candidates — fine for reranking or modest
    corpora, the thing you *verify recall against* at scale.
  * :func:`ann_bucketed` — sign-random-projection LSH: the bucket key is
    the sign bit pattern of the first ``sign_dims`` components (a fixed,
    data-independent hyperplane set — deterministic and portable).
    Queries only meet candidates in their own bucket: the join is
    bucket-equality, turning O(n·q) into O(n·q/2^d) expected — the IVF
    coarse-quantizer pattern with a trivial quantizer. Recall is
    probabilistic; raising ``probe_flips`` (multi-probe: also search
    buckets differing in one sign bit) trades work for recall.

All arithmetic is sequential double accumulation (``aggregate`` over
``zip_with``) so results are bit-reproducible and differentially
testable against an oracle computing the same left-to-right sums.

Scale notes: norms are computed ONCE per row before any join (never
inside the pair combinator); the candidate scan never shuffles — only
the tiny per-query top-k does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import (
    lit_double_array,
)
from sql_database_to_elastic_datalake_spark.operators.dedup_window import (
    top_k_per_group,
)


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double dot product (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def with_sq_norm(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "sq_norm"
) -> DataFrame:
    """Precompute squared norms once per row — required before any
    pairwise stage so norms are never recomputed per pair."""
    return df.withColumn("_vec_d", _to_double(F.col(vec_col))).withColumn(
        out_col, sq_norm(F.col("_vec_d"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    Output: query_id, neighbor_id, cosine — k rows per query, ties on
    cosine broken by neighbor id (total order ⇒ reproducible).
    """
    base = with_sq_norm(embeddings, vec_col)
    queries = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_vec_d").alias("q_vec"),
            F.col("sq_norm").alias("q_sq"),
        )
    )
    cands = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec_d").alias("c_vec"),
        F.col("sq_norm").alias("c_sq"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("c_sq")))
            ).cast("double"),
        )
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "cosine"),
        keys=["query_id"],
        order_by=[F.col("cosine"), (-F.col("neighbor_id"))],
        k=k,
        descending=True,
    )


def hard_negatives(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k highest-cosine candidates carrying a DIFFERENT label — the
    negatives that actually move a contrastive loss (random negatives
    are trivially separable; public practice per DPR arXiv:2004.04906
    §5.2 / SimCSE arXiv:2104.08821).

    Same broadcast-queries × one-corpus-pass shape as
    :func:`cosine_topk`, with the label inequality pushed into the
    pair filter so same-label candidates drop before the top-k window.
    Rows with a NULL label are excluded from BOTH sides (a negative
    needs a known-different label; documented rather than silently
    treated as different). Output adds both labels for downstream
    accounting.
    """
    base = with_sq_norm(
        embeddings.filter(F.col(label_col).isNotNull()), vec_col)
    queries = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(label_col).alias("query_label"),
            F.col("_vec_d").alias("q_vec"),
            F.col("sq_norm").alias("q_sq"),
        )
    )
    cands = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col("_vec_d").alias("c_vec"),
        F.col("sq_norm").alias("c_sq"),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_label") != F.col("neighbor_label"))
        .withColumn(
            "cosine",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("c_sq")))
            ).cast("double"),
        )
    )
    return top_k_per_group(
        scored.select("query_id", "query_label", "neighbor_id",
                      "neighbor_label", "cosine"),
        keys=["query_id"],
        order_by=[F.col("cosine"), (-F.col("neighbor_id"))],
        k=k,
        descending=True,
    )


def sign_bucket(vec_col: Column, sign_dims: int) -> Column:
    """Deterministic coarse-quantizer bucket: concatenated sign bits of
    the first ``sign_dims`` components ('1' for ≥ 0, else '0')."""
    bits = [
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(sign_dims)
    ]
    return F.concat(*bits)


def ann_bucketed(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    sign_dims: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket. Same output shape as :func:`cosine_topk`; recall < 1 by
    design (the scale path — the bucket join replaces the cross join).
    """
    base = with_sq_norm(embeddings, vec_col).withColumn(
        "bucket", sign_bucket(F.col("_vec_d"), sign_dims)
    )
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec_d").alias("q_vec"),
        F.col("sq_norm").alias("q_sq"),
        "bucket",
    )
    cands = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec_d").alias("c_vec"),
        F.col("sq_norm").alias("c_sq"),
        "bucket",
    )
    scored = (
        F.broadcast(queries)
        .join(cands, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("c_sq")))
            ).cast("double"),
        )
    )
    return top_k_per_group(
        scored.select("query_id", "neighbor_id", "cosine"),
        keys=["query_id"],
        order_by=[F.col("cosine"), (-F.col("neighbor_id"))],
        k=k,
        descending=True,
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sign_dims: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b) with cosine ≥ threshold.

    ``sign_dims=None`` is the exact quadratic verifier; with
    ``sign_dims`` set, pairs are restricted to same-sign-bucket
    collisions (the scale path; high-cosine pairs nearly always share
    leading sign bits).

    r14 (guide §4 + §2.2): the bucketed tier is evaluated per bucket
    in ONE Arrow-batched grouped map (the SemDeDup per-cell pattern,
    ``operators/ivf.py``) instead of a bucket self-join: the join
    materialized every candidate pair row carrying BOTH 64-double
    vectors (~1 KB × pairs) and paid an interpreted higher-order fold
    per pair, where the grouped map ships each vector ONCE into the
    task and scores in vectorized numpy. The arithmetic is
    bit-identical by construction — per-dimension accumulation in
    index order reproduces the fold's left-to-right sum for every
    pair and norm, and the single division by the norm-sqrt product
    matches the plan expression exactly (measured at sf1: identical
    95,900-pair output by exact double comparison, 5.78 → 1.25 s
    min-of-3). Null vectors score NaN and drop at the threshold,
    exactly where the fold's NULL dropped. A bucket is processed in
    one task (quadratic within the bucket, like the join it replaces,
    but without AQE skew-splitting — raise ``sign_dims`` if a bucket
    outgrows a task); row-blocking bounds the score matrix at
    1024 × bucket_size doubles.

    Degenerate inputs (r15, ADVICE): ZERO-NORM vectors are excluded
    from BOTH tiers up front — cosine is undefined for them, and
    without the filter the tiers diverged (the SQL division raised
    DIVIDE_BY_ZERO under ANSI where the numpy path silently dropped a
    NaN). Duplicate ``id_col`` values likewise cannot form an
    ``a == b`` pair in either tier (the join's strict ``a < b`` and
    an explicit id-inequality mask in the grouped map). The
    equivalence claims above are exact for the remaining rows.
    """
    if sign_dims:
        return _bucketed_neardup_pairs(
            embeddings, float(threshold), id_col, vec_col, sign_dims)
    base = with_sq_norm(embeddings, vec_col).filter(F.col("sq_norm") > 0)
    a = base.select(
        F.col(id_col).alias("a"), F.col("_vec_d").alias("va"),
        F.col("sq_norm").alias("na"),
    )
    b = base.select(
        F.col(id_col).alias("b"), F.col("_vec_d").alias("vb"),
        F.col("sq_norm").alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            (
                dot(F.col("va"), F.col("vb"))
                / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
            ).cast("double"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def _bucketed_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    sign_dims: int,
    split_threshold: int = 8192,
    block_rows: int = 4096,
) -> DataFrame:
    """Per-bucket grouped-map scorer for :func:`cosine_neardup_pairs`
    (see its docstring for the equivalence argument). One shuffle
    (the bucket regroup), no join, vectors shipped once.

    r15 (guide §2.5; r14 verdict #4): a HOT bucket no longer becomes a
    single straggler task. Bucket sizes ride the same exchange as the
    regroup (a window count on the bucket key); buckets up to
    ``split_threshold`` keep the one-task path, and an oversized
    bucket splits into ``ceil(size / block_rows)`` deterministic
    hash-blocks (``pmod(xxhash64(id), nblk)`` — no sort, stable under
    retries). Every block pair (i ≤ j) becomes its own task: a member
    row is replicated once per block, so an n-row bucket costs
    n·nblk shipped rows and nblk(nblk+1)/2 bounded tasks instead of
    one quadratic task. Each unordered pair lands in exactly ONE
    block-pair group (blocks partition the bucket), and the scorer
    runs the identical per-dimension index-order accumulation, so the
    pair set and cosines are bit-identical to the unsplit path
    (pinned by test and by the skewed-bucket ledger entry in
    SCALE.md)."""
    id_sql = embeddings.schema[id_col].dataType.simpleString()

    def bucket_pairs(pdf):  # pragma: no cover - executor-side
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"a": pdf[id_col][:0], "b": pdf[id_col][:0],
                              "cosine": pd.Series([], dtype="float64")})
        vecs = pdf[vec_col].values
        keep = np.array([v is not None for v in vecs], dtype=bool)
        if keep.sum() < 2:
            return empty
        all_ids = pdf[id_col].values[keep]
        all_vecs = vecs[keep]
        # a pair of DIFFERENT lengths folds to a NULL cosine in the
        # join plan (zip_with pads with null) and is dropped at the
        # threshold — scoring each length class separately emits the
        # identical pair set and keeps the matrix rectangular
        lens = np.fromiter((len(v) for v in all_vecs), dtype=np.int64,
                           count=len(all_vecs))
        frames = [
            _score_length_class(np, pd,
                                all_ids[lens == length],
                                all_vecs[lens == length], threshold)
            for length in np.unique(lens)
        ]
        frames = [f for f in frames if f is not None]
        return pd.concat(frames) if frames else empty

    def _score_length_class(np, pd, ids, vec_objs, threshold):
        if len(ids) < 2:
            return None
        mat = np.vstack(list(vec_objs)).astype(np.float64)
        # norms first: sum of x*x in index order == the sq_norm fold
        nrm = np.zeros(mat.shape[0])
        for j in range(mat.shape[1]):
            c = mat[:, j]
            nrm = nrm + c * c
        # zero-norm vectors are excluded in both tiers (see the
        # cosine_neardup_pairs docstring): cosine is undefined, and
        # silently NaN-dropping here while the SQL tier raised
        # DIVIDE_BY_ZERO was a tier divergence
        ok = nrm > 0
        if ok.sum() < 2:
            return None
        ids, mat, nrm = ids[ok], mat[ok], nrm[ok]
        n, d = mat.shape
        root = np.sqrt(nrm)
        out_a, out_b, out_c = [], [], []
        for r0 in range(0, n, 1024):
            rows = slice(r0, min(r0 + 1024, n))
            # per-dimension accumulation in index order: each pair's
            # dot is the identical left-to-right fold
            dots = np.zeros((rows.stop - r0, n))
            for j in range(d):
                c = mat[:, j]
                dots = dots + c[rows, None] * c[None, :]
            cos = dots / (root[rows, None] * root[None, :])
            ri, ci = np.nonzero(cos >= threshold)
            up = (ri + r0) < ci  # each unordered pair once
            ri, ci = ri[up], ci[up]
            ai, bi = ids[ri + r0], ids[ci]
            # duplicate id values cannot form a pair (the join's
            # strict a < b dropped them; position-based dedup alone
            # would emit an a == b row)
            ne = ai != bi
            ri, ci, ai, bi = ri[ne], ci[ne], ai[ne], bi[ne]
            sw = ai > bi  # a < b by ID, not by row position
            out_a.append(np.where(sw, bi, ai))
            out_b.append(np.where(sw, ai, bi))
            out_c.append(cos[ri, ci])
        if not out_a:
            return None
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "cosine": np.concatenate(out_c)})

    def _norms_index_order(np, mat):
        nrm = np.zeros(mat.shape[0])
        for j in range(mat.shape[1]):
            c = mat[:, j]
            nrm = nrm + c * c
        return nrm

    def _clean_side(np, pdf, mask):
        """(ids, vec-objs, lengths) of one block side: null vectors
        dropped (same NULL-fold drop as the diagonal scorer)."""
        vecs = pdf[vec_col].values[mask]
        keep = np.array([v is not None for v in vecs], dtype=bool)
        ids = pdf[id_col].values[mask][keep]
        vecs = vecs[keep]
        lens = np.fromiter((len(v) for v in vecs), dtype=np.int64,
                           count=len(vecs))
        return ids, vecs, lens

    def cross_pairs(pdf):  # pragma: no cover - executor-side
        import numpy as np
        import pandas as pd

        if pdf["__lo"].iat[0] == pdf["__hi"].iat[0]:
            # diagonal block-pair: all pairs within the block — the
            # unsplit scorer, unchanged
            return bucket_pairs(pdf)
        empty = pd.DataFrame({"a": pdf[id_col][:0], "b": pdf[id_col][:0],
                              "cosine": pd.Series([], dtype="float64")})
        blk = pdf["__blk"].values
        lo = pdf["__lo"].iat[0]
        ids_a, vecs_a, lens_a = _clean_side(np, pdf, blk == lo)
        ids_b, vecs_b, lens_b = _clean_side(np, pdf, blk != lo)
        frames = []
        for length in np.intersect1d(np.unique(lens_a),
                                     np.unique(lens_b)):
            f = _score_cross_class(
                np, pd,
                ids_a[lens_a == length], vecs_a[lens_a == length],
                ids_b[lens_b == length], vecs_b[lens_b == length],
                threshold)
            if f is not None:
                frames.append(f)
        return pd.concat(frames) if frames else empty

    def _score_cross_class(np, pd, ids_a, va, ids_b, vb, threshold):
        if not len(ids_a) or not len(ids_b):
            return None
        ma = np.vstack(list(va)).astype(np.float64)
        mb = np.vstack(list(vb)).astype(np.float64)
        na, nb = _norms_index_order(np, ma), _norms_index_order(np, mb)
        # zero-norm exclusion: same rule as the diagonal scorer
        oa, ob = na > 0, nb > 0
        if not oa.any() or not ob.any():
            return None
        ids_a, ma, na = ids_a[oa], ma[oa], na[oa]
        ids_b, mb, nb = ids_b[ob], mb[ob], nb[ob]
        ra, rb = np.sqrt(na), np.sqrt(nb)
        n, d = ma.shape
        out_a, out_b, out_c = [], [], []
        for r0 in range(0, n, 1024):
            rows = slice(r0, min(r0 + 1024, n))
            # identical per-dimension index-order accumulation
            dots = np.zeros((rows.stop - r0, mb.shape[0]))
            for j in range(d):
                dots = dots + ma[rows, j][:, None] * mb[:, j][None, :]
            cos = dots / (ra[rows, None] * rb[None, :])
            ri, ci = np.nonzero(cos >= threshold)
            ai, bi = ids_a[ri + r0], ids_b[ci]
            ne = ai != bi  # duplicate id values never pair
            ri, ci, ai, bi = ri[ne], ci[ne], ai[ne], bi[ne]
            sw = ai > bi  # a < b by ID
            out_a.append(np.where(sw, bi, ai))
            out_b.append(np.where(sw, ai, bi))
            out_c.append(cos[ri, ci])
        if not out_a:
            return None
        return pd.DataFrame({
            "a": np.concatenate(out_a), "b": np.concatenate(out_b),
            "cosine": np.concatenate(out_c)})

    from pyspark.sql import Window

    keyed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(_to_double(F.col(vec_col)), sign_dims)
        .alias("bucket"),
    )
    schema = f"a {id_sql}, b {id_sql}, cosine double"
    # ONE pipeline, no branch: a branch (small-filter ∪ big-filter)
    # would replan the scan→window subtree per side — two full scans
    # and two full exchanges on the healthy path. Here a healthy
    # bucket has nblk = 1, so the explode emits exactly one row into
    # the (bucket, 0, 0) group and the diagonal scorer IS the r14
    # one-task path; only an oversized bucket pays the replication.
    sized = keyed.withColumn(
        "__bsz", F.count("*").over(Window.partitionBy("bucket")))
    nblk = F.when(
        F.col("__bsz") > split_threshold,
        F.ceil(F.col("__bsz") / F.lit(int(block_rows))).cast("int"),
    ).otherwise(F.lit(1))
    return (
        sized
        .withColumn("__blk",
                    F.pmod(F.xxhash64(F.col(id_col)), nblk).cast("int"))
        .withColumn("__j", F.explode(F.sequence(F.lit(0), nblk - 1)))
        .withColumn("__lo", F.least("__blk", "__j"))
        .withColumn("__hi", F.greatest("__blk", "__j"))
        .select(id_col, vec_col, "__blk", "bucket", "__lo", "__hi")
        .groupBy("bucket", "__lo", "__hi")
        .applyInPandas(cross_pairs, schema)
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q = floor(v·scale + ½)``
    with ``scale = 127 / max|v|``.

    Storage/bandwidth prep for ANN serving — 4× smaller vectors with a
    per-row ``scale`` to dequantize (``v ≈ q/scale``). Pure column
    algebra over the array (no shuffle, no UDF). The declared rounding
    POLICY is round-half-UP (``floor(x + 0.5)``: −2.5 → −2), chosen
    over SQL ``round``'s half-away or banker's half-even because floor
    is IEEE-identical across engines, which keeps the differential
    oracle exact; a ±1-LSB half-case skew is irrelevant to a lossy
    int8 code. All-zero
    vectors get ``scale = 1.0`` (and hence ``q8 = 0`` everywhere) —
    without the guard, ``127/0.0 = Inf`` makes every element
    ``floor(0·Inf + ½) = NaN → NULL``, an engine-divergent edge case.
    """
    embd = _to_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(embd, lambda x: F.abs(x)))
    with_scale = df.withColumn(
        "scale",
        F.coalesce(F.lit(127.0) / F.nullif(max_abs, F.lit(0.0)), F.lit(1.0)),
    )
    q8 = F.transform(
        _to_double(F.col(vec_col)),
        lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("int"),
    )
    return with_scale.withColumn("q8", q8)


def knn_search(
    df: DataFrame,
    vec_col: str,
    query_vector: list,
    k: int,
    pred: Column | None = None,
) -> DataFrame:
    """ES 8.x ``knn`` search over a literal query vector: exact top-k
    by cosine, scored with ES's cosine-similarity transform
    ``(1 + cos) / 2`` so a migrating client reads the same ``_score``
    scale.

    ``pred`` is the knn ``filter`` (pre-filter semantics, like ES):
    applied BEFORE scoring so the scan prunes first. Exact
    brute-force here is strictly better recall than ES's HNSW
    (``num_candidates`` is accepted-and-ignored upstream for that
    reason — documented divergence); the ANN tiers
    (:func:`ann_bucketed`, :func:`.ivf.ivf_search`) remain the scale
    path when the corpus outgrows one pass.

    Plan: one scan → dot/norm column algebra (zip_with fold, no UDF)
    → TakeOrdered(k) with a deterministic tie-break: an exact ``id``
    column leads if present (unique by construction in this data
    model), else the first ``*_id`` column — but a foreign-key
    ``*_id`` is NOT necessarily unique, so the remaining non-vector
    columns always follow as lower-priority sort keys. Comparisons
    short-circuit on the first key, so the narrow-key perf win is
    kept while exact-score ties stay deterministic even when the
    leading column repeats. Null/zero vectors score null and drop.
    """
    q = [float(x) for x in query_vector]
    qn = sum(x * x for x in q) ** 0.5
    if qn == 0:
        raise ValueError("knn query_vector must be non-zero")
    src = df.filter(pred) if pred is not None else df
    src = src.filter(F.col(vec_col).isNotNull())
    base = with_sq_norm(src, vec_col)
    qlit = lit_double_array(q)
    cos = (
        dot(F.col("_vec_d"), qlit)
        / (F.sqrt(F.col("sq_norm")) * F.lit(qn))
    ).cast("double")
    scored = (
        base.withColumn("_score", (F.lit(1.0) + cos) / F.lit(2.0))
        .filter(F.col("_score").isNotNull())
        .drop("_vec_d", "sq_norm")
    )
    order = [F.col("_score").desc()] + [
        F.col(c).asc_nulls_first()
        for c in tiebreak_columns(df, exclude=(vec_col,))
    ]
    return scored.orderBy(*order).limit(int(k))


def tiebreak_columns(df: DataFrame, exclude: tuple = ()) -> list[str]:
    """Deterministic tie-break key for a ranked page: an exact ``id``
    column leads if present (unique by construction in this data
    model), else the first ``*_id`` column — but a foreign-key is not
    necessarily unique, so the remaining orderable columns always
    follow. Comparisons short-circuit on the first key, keeping the
    narrow-lead perf win. Map columns are skipped (not orderable in
    Spark); arrays/structs are."""
    from pyspark.sql.types import MapType

    orderable = [
        f.name for f in df.schema.fields
        if f.name not in exclude and not isinstance(f.dataType, MapType)
    ]
    if "id" in orderable:
        lead = ["id"]
    else:
        suffixed = [c for c in orderable if c.endswith("_id")]
        lead = suffixed[:1]
    return [*lead, *[c for c in orderable if c not in lead]]
