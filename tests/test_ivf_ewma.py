from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.operators.grouped_pandas import ewma_per_key
from sql_database_to_elastic_datalake_spark.operators.ivf import ivf_search
from sql_database_to_elastic_datalake_spark.operators.similarity import cosine_topk
from sql_database_to_elastic_datalake_spark.sources.parquet import load_table


def test_ewma_matches_pandas_reference(spark, sf_dir):
    out = (
        ewma_per_key(
            load_table(spark, sf_dir, "events").filter(F.col("user_id") == 3),
            "user_id", "ts", "value", alpha=0.3,
        )
        .orderBy("ts")
        .toPandas()
    )
    # independent recurrence: ewma_t = 0.3 x_t + 0.7 ewma_{t-1}
    e = None
    for _, row in out.iterrows():
        e = row["value"] if e is None else 0.3 * row["value"] + 0.7 * e
        assert row["ewma"] == pytest.approx(e, rel=1e-12)
    assert len(out) > 10


def test_ewma_deterministic_across_runs(spark, sf_dir):
    def run():
        return sorted(
            map(tuple, ewma_per_key(
                load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5),
                "user_id", "ts", "value",
            ).collect())
        )

    assert run() == run()


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=3).collect()
    }
    approx_rows = ivf_search(emb, qids, k=3, nlist=8, nprobe=4, seed=42).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    # k results per query, correct shape
    assert len(approx_rows) == len(qids) * 3
    # cosine scores of IVF results must equal the exact computation for
    # the same pairs (IVF restricts candidates; it never rescores)
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in cosine_topk(emb, qids, k=len(emb.collect())).collect()
    }
    for r in approx_rows:
        assert r["cosine"] == exact_scores[(r["query_id"], r["neighbor_id"])]
    # recall: with nprobe=half the cells on clustered data, expect to
    # recover a reasonable share of the true top-3
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.3, f"recall {recall}"


def test_ivf_training_samples_large_corpora(spark, sf_dir):
    """With max_train below the corpus size, training fits on the
    layout-independent md5-prefix sample (not the full scan) and still
    yields nlist usable centroids feeding a complete k-per-query search
    result."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    model = train_ivf_centroids(emb, nlist=4, seed=7, max_train=max(8, n // 4))
    assert len(model.clusterCenters()) == 4
    assert sum(model.summary.clusterSizes) < n  # trained on a strict subset
    rows = ivf_search(emb, [0, 1], k=2, nlist=4, nprobe=4, seed=7).collect()
    assert len(rows) == 4


def test_ivf_training_respects_custom_id_col(spark, sf_dir):
    """The md5-prefix sampling draws on the caller's id column — a
    hard-coded 'vec_id' reference would crash (UNRESOLVED_COLUMN) for
    any corpus keyed differently, but only once n > max_train triggers
    the sample, which small-corpus tests never hit."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumnRenamed(
        "vec_id", "doc_id"
    )
    n = emb.count()
    model = train_ivf_centroids(
        emb, nlist=4, seed=7, max_train=max(8, n // 4), id_col="doc_id"
    )
    assert len(model.clusterCenters()) == 4
    assert sum(model.summary.clusterSizes) < n
    rows = ivf_search(
        emb, [0, 1], k=2, nlist=4, nprobe=4, seed=7, id_col="doc_id"
    ).collect()
    assert len(rows) == 4


def test_ivf_fixed_full_probe_equals_exact_topk(spark, sf_dir):
    """With nprobe == nlist the fixed-grid IVF search scans every cell,
    so its top-k must equal brute-force cosine top-k exactly — the
    partition-into-cells machinery cannot lose or duplicate candidates."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        ivf_search_fixed,
    )
    from sql_database_to_elastic_datalake_spark.operators.similarity import (
        cosine_topk,
    )
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_search_fixed(emb, qids, k=3, nlist=8, nprobe=8).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, qids, k=3).collect()
    }
    assert got == want and len(got) == 9


def test_ivf_fixed_probes_bound_candidates(spark, sf_dir):
    """nprobe < nlist returns k rows per query from probed cells only,
    deterministically across runs."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        ivf_search_fixed,
    )
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = ivf_search_fixed(emb, [0, 5], k=3, nlist=16, nprobe=3).collect()
    b = ivf_search_fixed(emb, [0, 5], k=3, nlist=16, nprobe=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 6


def test_ivf_knn_literal_recall_and_api_num_candidates(spark, sf_dir, tmp_path):
    """r13 (r12 verdict #3): the knn num_candidates tier. The probed
    literal-vector search must (a) never rescore — scores equal the
    exact tier's for shared pairs, (b) recover a reasonable share of
    the exact top-k, (c) degrade to the exact result when every cell
    is probed, and (d) be what the API route runs when num_candidates
    is set."""
    import os
    import shutil

    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        fixed_grid_centroids,
        ivf_knn_literal,
    )
    from sql_database_to_elastic_datalake_spark.operators.similarity import (
        knn_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = fixed_grid_centroids(97, 64)[41]
    exact_rows = knn_search(emb, "embedding", q, k=10).collect()
    exact = {r["vec_id"]: r["_score"] for r in exact_rows}
    probed_rows = ivf_knn_literal(
        emb, "embedding", q, k=10, nlist=16, nprobe=3).collect()
    assert len(probed_rows) == 10
    hits = 0
    for r in probed_rows:
        if r["vec_id"] in exact:
            assert r["_score"] == exact[r["vec_id"]]  # no rescoring
            hits += 1
    assert hits / len(exact) >= 0.3, f"recall {hits / len(exact)}"
    # probing every cell IS the exact search
    all_rows = ivf_knn_literal(
        emb, "embedding", q, k=10, nlist=16, nprobe=16).collect()
    assert [r["vec_id"] for r in all_rows] == \
        [r["vec_id"] for r in exact_rows]

    # API tier switch: num_candidates >= corpus probes everything
    # (= exact page); a small num_candidates prunes but still pages
    from sql_database_to_elastic_datalake_spark.api import LakeService
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        DslError,
    )

    lake = tmp_path / "lake"
    src = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, lake / "data_lake_emb")
    else:  # single-file parquet lake (sf0.001)
        os.makedirs(lake / "data_lake_emb", exist_ok=True)
        shutil.copy(src, lake / "data_lake_emb" / "part-000.parquet")
    svc = LakeService(spark, str(lake))
    body = {"field": "embedding", "query_vector": q, "k": 5,
            "num_candidates": 10_000_000}
    out = svc.advanced_search("data_lake_emb", {"match_all": {}},
                              knn=body, k=5)
    assert [h["_source"]["vec_id"] for h in out["hits"]["hits"]] == \
        [r["vec_id"] for r in exact_rows[:5]]
    out = svc.advanced_search(
        "data_lake_emb", {"match_all": {}},
        knn={**body, "num_candidates": 5}, k=5)
    assert len(out["hits"]["hits"]) == 5
    with pytest.raises(DslError, match="num_candidates"):
        svc.advanced_search("data_lake_emb", {"match_all": {}},
                            knn={**body, "num_candidates": 2}, k=5)
    with pytest.raises(DslError, match="num_candidates"):
        svc.advanced_search("data_lake_emb", {"match_all": {}},
                            knn={**body, "num_candidates": "lots"},
                            k=5)
