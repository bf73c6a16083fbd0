"""IVF approximate nearest neighbor: learned coarse quantizer + probes.

The second ANN tier beside sign-LSH (:mod:`.similarity`): a KMeans
coarse quantizer (MLlib, seeded) partitions the corpus into ``nlist``
cells; a query probes its ``nprobe`` nearest centroids and scores only
those cells' vectors — the standard IVF-Flat design. Versus sign-LSH
buckets, learned centroids adapt to the data distribution, which is
what keeps recall usable on clustered real-world embeddings.

Scale notes:
  * Training samples the corpus (KMeans on 100 TB of vectors is
    unnecessary — centroids converge on a fraction); assignment is one
    broadcast of ``nlist`` centroids against a single scan.
  * The search join is cell-equality (candidate lists), never a cross
    join: cost ≈ q · nprobe/nlist · n.
  * Results are deterministic given the seed *and* the training sample;
    exposed as a rows-only query (no SQL oracle — KMeans is not
    expressible in the oracle engine). Recall is asserted against the
    exact brute-force verifier in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import (
    lit_double_array,
    lit_double_matrix,
)
from sql_database_to_elastic_datalake_spark.localrel import local_frame
from sql_database_to_elastic_datalake_spark.operators.dedup_window import (
    top_k_per_group,
)
from sql_database_to_elastic_datalake_spark.operators.similarity import (
    dot,
    with_sq_norm,
)


def train_ivf_centroids(
    embeddings: DataFrame,
    nlist: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 20,
    max_train: int = 100_000,
    id_col: str = "vec_id",
):
    """Fit the coarse quantizer on a deterministic sample; returns the model.

    KMeans iterates over its input ``max_iter`` times — on the full
    corpus that is ~20 extra 100 TB scans for centroids that converge
    on a fraction. The sample is capped at ``max_train`` vectors via the
    house md5-prefix draw on ``id_col`` (one cheap count + a
    content-keyed hash filter). Unlike a seeded ``df.sample`` —
    Bernoulli per *partition* stream, so reproducible only for a fixed
    partition layout — the hash draw picks the same ids regardless of
    layout, so downstream cell assignments are reproducible outright.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    n = embeddings.count()
    if n > max_train:
        # slight oversample so the floor of the hash draw stays ≥nlist.
        # 12 hex chars = 2^48 buckets: at 48 bits the integer threshold
        # rounds the fraction to within 2^-48 relative error, so the
        # draw neither floors to an EMPTY training set nor materially
        # undershoots max_train even at trillions of rows (a 4-hex /
        # 65536-bucket draw would floor to zero once 1.05*max_train/n
        # < 1/65536 — i.e. at the multi-billion-row scale this module
        # exists for).
        fraction = min(1.0, 1.05 * max_train / n)
        space = 1 << 48
        bucket = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
        ).cast("long")
        embeddings = embeddings.filter(bucket < max(1, round(fraction * space)))
    train = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    km = KMeans(k=nlist, seed=seed, maxIter=max_iter, initMode="k-means||")
    return km.fit(train)


def assign_cells(
    embeddings: DataFrame, model, vec_col: str = "embedding", out_col: str = "cell"
) -> DataFrame:
    """Attach each vector's coarse cell id (one broadcast transform)."""
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    assigned = (
        model.transform(feats.withColumnRenamed("_features", "features"))
        .withColumnRenamed("prediction", out_col)
        .drop("features")
    )
    return assigned


def ivf_search(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    nlist: int = 16,
    nprobe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat top-k cosine search.

    Output: query_id, neighbor_id, cosine (k rows per query, total-order
    tie-break). Queries probe their ``nprobe`` nearest cells.
    """
    import numpy as np

    model = train_ivf_centroids(
        embeddings, nlist=nlist, seed=seed, vec_col=vec_col, id_col=id_col
    )
    base = assign_cells(with_sq_norm(embeddings, vec_col), model, vec_col)

    # nprobe cell ids per query, computed on the driver against the tiny
    # centroid matrix (nlist × dim) — not a distributed op by design.
    centers = np.array(model.clusterCenters())
    q_rows = (
        base.filter(F.col(id_col).isin(query_ids))
        .select(id_col, "_vec_d", "sq_norm")
        .collect()
    )
    probe_pairs = []
    for r in q_rows:
        v = np.array(r["_vec_d"])
        d2 = ((centers - v) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:nprobe]:
            probe_pairs.append((r[id_col], int(cell)))
    spark = embeddings.sparkSession
    probes = local_frame(spark, probe_pairs,
                         "query_id bigint, cell int")

    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec_d").alias("q_vec"),
        F.col("sq_norm").alias("q_sq"),
    )
    cands = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec_d").alias("c_vec"),
        F.col("sq_norm").alias("c_sq"),
        "cell",
    )
    scored = (
        F.broadcast(probes.join(queries, "query_id"))
        .join(cands, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("c_sq")))
            ).cast("double"),
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()  # a neighbor can appear via multiple probed cells
    )
    return top_k_per_group(
        scored,
        keys=["query_id"],
        order_by=[F.col("cosine"), (-F.col("neighbor_id"))],
        k=k,
        descending=True,
    )


def fixed_grid_centroids(nlist: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic closed-form coarse centroids: component ``(j, d)``
    is ``(((j*37 + d*17) % 97) - 48) / 48.0`` — pure rational arithmetic
    both engines evaluate to the identical double, and 37 is invertible
    mod 97 so all ``nlist <= 97`` centroids are distinct.

    These exist for the ORACLE-VERIFIABLE IVF tier
    (:func:`ivf_search_fixed`): KMeans training is not expressible in a
    SQL oracle, but every other IVF-Flat stage — cell assignment, probe
    selection, candidate scoring, top-k — is, once the quantizer is a
    shared closed form. Production search keeps the trained quantizer
    (:func:`ivf_search`); recall for THAT tier is pytest-asserted
    against the brute-force verifier instead.
    """
    return [
        [(((j * 37 + d * 17) % 97) - 48) / 48.0 for d in range(dim)]
        for j in range(nlist)
    ]


def semdedup(
    embeddings: DataFrame,
    threshold: float,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    pairs: str = "matmul",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal by comparing embeddings WITHIN coarse
    clusters only — the pruning that makes embedding dedup feasible at
    corpus scale (pairwise work is per-cell, never corpus²).

    The fixed-grid cell assignment is a pure map (the same
    argmin-over-centroids expression as :func:`ivf_search_fixed` — no
    shuffle); the keep policy is the deterministic keep-minimum-id
    rule (a doc drops iff a lower-id doc in its cell has cosine ≥
    threshold with it). A trained KMeans quantizer slots in via
    :func:`train_ivf_centroids`/:func:`assign_cells` for production.

    ``pairs`` picks the within-cell pair engine:

    * ``"matmul"`` (default, the scale path): ONE
      ``applyInPandas`` over cells — each cell's similarity matrix is
      a BLAS ``N @ N.T`` (Arrow moves n ROWS, never n² pairs; sf1
      A/B in SCALE.md: 26 s → ~2 s). Summation order differs from the
      SQL oracle's sequential fold by ~1e-15 relative — safe whenever
      the threshold margin dwarfs it (measured ≥ 1e-5 on this corpus;
      the two tiers are pytest-pinned equal).
    * ``"join"`` (the oracle-arithmetic tier): cell-equality self-join
      with the house sequential-fold dot — bit-identical to the DuckDB
      replay by construction. Two hard-won plan notes: the pair stage
      is quadratic in cell size while its shuffle INPUT is tiny, so
      AQE's size-based coalescing would funnel the whole join onto ONE
      partition (measured 98 s single-core vs 27 s spread at sf1) — a
      user-specified ``repartition(n, cell)`` is exempt from
      coalescing; and the fold must NOT be unrolled into a 64-term
      sum (it falls out of whole-stage codegen inside the join filter
      — measured 1.6-4x slower).

    Scale: identical pair-generation shape to the paper's — within-
    cluster quadratic, bounded by the largest cell. More cells = less
    pairwise work and lower recall, the paper's own tradeoff knob.

    Returns the KEPT rows of ``embeddings`` (all original columns).
    """
    assigned = _with_fixed_cells(embeddings, nlist, dim, vec_col)
    if pairs == "matmul":
        dropped = _matmul_dropped(assigned, id_col, threshold)
    elif pairs == "join":
        parallelism = max(
            nlist,
            embeddings.sparkSession.sparkContext.defaultParallelism)
        a = assigned.select(
            F.col(id_col).alias("a"), F.col("_vec_d").alias("va"),
            F.col("sq_norm").alias("na"), "cell",
        ).repartition(parallelism, F.col("cell"))
        b = assigned.select(
            F.col(id_col).alias("b"), F.col("_vec_d").alias("vb"),
            F.col("sq_norm").alias("nb"), "cell",
        ).repartition(parallelism, F.col("cell"))
        dropped = (
            a.join(b, "cell")
            .filter(F.col("a") < F.col("b"))
            .filter(
                (dot(F.col("va"), F.col("vb"))
                 / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))))
                .cast("double") >= threshold
            )
            .select(F.col("b").alias(id_col))
            .distinct()
        )
    else:
        raise ValueError(f"unknown pairs engine {pairs!r}")
    return embeddings.join(dropped, id_col, "left_anti")


def _matmul_dropped(
    assigned: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Per-cell dropped ids via one Arrow-batched ``applyInPandas``:
    the cell's normalized matrix against itself (BLAS), upper-triangle
    threshold test, drop the higher id of each qualifying pair. The
    sanctioned Python tier — the work is genuinely matrix-shaped and
    the transfer is linear in rows."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField(id_col, LongType())])

    def drop_in_cell(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        v = np.array(pdf["_vec_d"].to_list(), dtype=np.float64)[order]
        norms = np.sqrt((v * v).sum(axis=1))
        ok = norms > 0  # zero vectors have no cosine (the join tier's
        ids = ids[ok]   # null comparison drops them the same way)
        v = v[ok]
        if len(ids) < 2:
            return pd.DataFrame({id_col: ids[:0]})
        n = v / norms[ok][:, None]
        s = n @ n.T
        iu = np.triu_indices(len(ids), k=1)
        hit = s[iu] >= threshold
        return pd.DataFrame(
            {id_col: ids[np.unique(iu[1][hit])].astype("int64")})

    return (
        assigned.select(id_col, "_vec_d", "cell")
        .groupBy("cell")
        .applyInPandas(drop_in_cell, schema)
    )


def _with_fixed_cells(
    embeddings: DataFrame, nlist: int, dim: int, vec_col: str
) -> DataFrame:
    """``embeddings`` + ``_vec_d``/``sq_norm``/``cell`` columns under
    the fixed-grid quantizer — assignment is a pure map (argmin over
    the centroid-distance array in the row; ties to the smallest cell
    id, the SQL oracle's (d2, j) total order)."""
    centroids = fixed_grid_centroids(nlist, dim)
    cent_lit = lit_double_matrix(centroids)
    base = with_sq_norm(embeddings, vec_col)
    d2s = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col("_vec_d"), c, lambda x, cc: (x - cc) * (x - cc)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return base.withColumn("_d2s", d2s).withColumn(
        "cell",
        (F.array_position(F.col("_d2s"), F.array_min(F.col("_d2s"))) - 1)
        .cast("int"),
    )


def ivf_search_fixed(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int,
    nlist: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """IVF-Flat top-k cosine search over the fixed-grid quantizer.

    Identical search plan to :func:`ivf_search` — cell-equality
    candidate join, never a cross join — but with
    :func:`fixed_grid_centroids` instead of a trained model, and the
    probe selection computed IN the plan (rank cells by squared
    distance, sequential-fold arithmetic mirrored by the SQL oracle)
    rather than driver-side numpy, whose pairwise summation would not
    be bit-reproducible in SQL.

    The vec × centroid distance stage materializes ``nlist`` rows per
    vector — cost ``n·nlist`` distance folds, the irreducible cost of
    coarse assignment in ANY IVF build (the trained path pays the same
    inside ``model.transform``).

    Output: query_id, neighbor_id, cosine (k rows per query,
    total-order tie-break).
    """
    from pyspark.sql import Window

    centroids = fixed_grid_centroids(nlist, dim)
    cent_lit = lit_double_matrix(centroids)
    base = with_sq_norm(embeddings, vec_col)

    # per-row array of nlist squared distances via the house sequential
    # left fold (dot()'s summation order, oracle-mirrored). Assignment
    # is argmin over that array IN the row — array_position returns the
    # FIRST index of the minimum, i.e. ties break to the smallest cell
    # id, the same total order the SQL oracle's (d2, j) window uses.
    # This keeps corpus-side assignment a pure map: no nlist-fold row
    # materialization and no row_number shuffle over nlist·n rows (the
    # first cut of this operator paid both; at 100 TB that shuffle IS
    # the job).
    d2s = F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col("_vec_d"), c, lambda x, cc: (x - cc) * (x - cc)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    with_d2s = base.withColumn("_d2s", d2s)
    assigned = with_d2s.withColumn(
        "cell",
        (F.array_position(F.col("_d2s"), F.array_min(F.col("_d2s"))) - 1)
        .cast("int"),
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_vec_d").alias("c_vec"),
        F.col("sq_norm").alias("c_sq"),
        "cell",
    )
    # probe selection needs the top-nprobe CELLS per query — explode and
    # rank only the |query_ids| rows, never the corpus
    q_exploded = (
        with_d2s.filter(F.col(id_col).isin(query_ids))
        .select(
            id_col, "_vec_d", "sq_norm",
            F.posexplode(F.col("_d2s")).alias("cell", "d2"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("d2").asc(), F.col("cell").asc())
    probes = (
        q_exploded.withColumn("_crn", F.row_number().over(w))
        .filter(F.col("_crn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("_vec_d").alias("q_vec"),
            F.col("sq_norm").alias("q_sq"),
            "cell",
        )
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            (
                dot(F.col("q_vec"), F.col("c_vec"))
                / (F.sqrt(F.col("q_sq")) * F.sqrt(F.col("c_sq")))
            ).cast("double"),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    return top_k_per_group(
        scored,
        keys=["query_id"],
        order_by=[F.col("cosine"), (-F.col("neighbor_id"))],
        k=k,
        descending=True,
    )


def ivf_knn_literal(
    df: DataFrame,
    vec_col: str,
    query_vector: list,
    k: int,
    nlist: int = 16,
    nprobe: int = 3,
    pred=None,
) -> DataFrame:
    """The ES ``knn`` body key's PROBED tier (r13, r12 verdict #3): IVF
    over a literal query vector — the ``num_candidates``-shaped path
    that stops ``knn`` being one full corpus scan per query.

    Same output contract as
    :func:`.similarity.knn_search` (all source columns + ``_score`` =
    ``(1+cos)/2``, identical tie-break), so the API route swaps tiers
    without touching the envelope; exact stays the default/verifier.

    Plan: the probe cells are chosen DRIVER-side against the tiny
    closed-form centroid grid (nlist distance folds over one vector —
    not a distributed op), then ONE corpus pass: pure-map cell
    assignment (:func:`_with_fixed_cells`) → ``cell IN probes`` filter
    → cosine column algebra → TakeOrdered(k). Zero shuffles, zero
    joins. The assignment fold costs ``nlist`` per row — at deployment
    the cell is precomputed as a partition column and this filter
    becomes a partition PRUNE (the scan never reads unprobed cells);
    here it skips the cosine/norm work for ~(1 - nprobe/nlist) of rows
    and, decisively, bounds the TakeOrdered's input the same way.
    Probe-cell distances use the same left-fold double arithmetic the
    SQL oracle evaluates, so the probed set is engine-reproducible.
    """
    q = [float(x) for x in query_vector]
    qn = sum(x * x for x in q) ** 0.5
    if qn == 0:
        raise ValueError("knn query_vector must be non-zero")
    dim = len(q)
    nprobe = max(1, min(int(nprobe), nlist))
    cents = fixed_grid_centroids(nlist, dim)
    d2s = []
    for j, c in enumerate(cents):
        acc = 0.0
        for x, cc in zip(q, c):
            acc += (x - cc) * (x - cc)
        d2s.append((acc, j))
    probe_cells = [j for _, j in sorted(d2s)[:nprobe]]

    from sql_database_to_elastic_datalake_spark.operators.similarity import (
        dot,
        tiebreak_columns,
    )

    src = df.filter(pred) if pred is not None else df
    src = src.filter(F.col(vec_col).isNotNull())
    assigned = _with_fixed_cells(src, nlist, dim, vec_col).filter(
        F.col("cell").isin(probe_cells)
    )
    qlit = lit_double_array(q)
    cos = (
        dot(F.col("_vec_d"), qlit)
        / (F.sqrt(F.col("sq_norm")) * F.lit(qn))
    ).cast("double")
    scored = (
        assigned.withColumn("_score", (F.lit(1.0) + cos) / F.lit(2.0))
        .filter(F.col("_score").isNotNull())
        .drop("_vec_d", "sq_norm", "_d2s", "cell")
    )
    order = [F.col("_score").desc()] + [
        F.col(c).asc_nulls_first()
        for c in tiebreak_columns(df, exclude=(vec_col,))
    ]
    return scored.orderBy(*order).limit(int(k))
