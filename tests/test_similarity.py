

def test_semdedup_keep_minimum_id(spark):
    """SemDeDup: within-cell near-dups drop to the minimum id; cross-
    cell near-dups survive (the paper's recall/cost tradeoff)."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        _with_fixed_cells,
        semdedup,
    )

    base = [0.1] * 64
    near = [0.1] * 64
    near[0] = 0.11
    far = [(-1.0) ** i * (i + 1) / 64 for i in range(64)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, far)],
        "vec_id long, embedding array<float>")
    cells = {r["vec_id"]: r["cell"]
             for r in _with_fixed_cells(emb, 16, 64, "embedding")
             .select("vec_id", "cell").collect()}
    assert cells[1] == cells[2]  # the near pair shares a cell
    kept = sorted(r["vec_id"]
                  for r in semdedup(emb, threshold=0.99).collect())
    assert kept == [1, 3]  # 2 drops to its lower-id near-dup
    # a threshold nothing reaches keeps everything
    assert semdedup(emb, threshold=1.1).count() == 3


def test_semdedup_pair_tiers_agree(spark):
    """The matmul (BLAS) and join (oracle-arithmetic) pair engines
    produce the same kept set — the documented margin condition (the
    threshold gap dwarfs summation-order noise)."""
    from sql_database_to_elastic_datalake_spark.operators.ivf import (
        semdedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(r["vec_id"] for r in semdedup(
        emb, 0.4, nlist=64, pairs="join").select("vec_id").collect())
    b = sorted(r["vec_id"] for r in semdedup(
        emb, 0.4, nlist=64, pairs="matmul").select("vec_id").collect())
    assert a == b and len(a) > 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pairs engine"):
        semdedup(emb, 0.4, pairs="gpu")


def test_knn_tiebreak_prefers_exact_id_and_stays_total(spark):
    """r9 (r8 ADVICE): the knn tie-break must lead with an exact
    ``id`` column even when a ``*_id`` foreign key precedes it in the
    schema, and a non-unique lead key must fall through to the
    remaining columns so exact-score ties stay deterministic."""
    from sql_database_to_elastic_datalake_spark.operators.similarity import (
        knn_search,
    )

    # user_id precedes id in the schema and would win a first-match
    # scan; both rows tie at cosine 1.0, so the orders differ
    df = spark.createDataFrame(
        [(2, 1, [1.0, 0.0]), (1, 2, [2.0, 0.0])],
        "user_id long, id long, vec array<float>")
    got = [r["id"] for r in
           knn_search(df, "vec", [1.0, 0.0], k=2).collect()]
    assert got == [1, 2]
    # no exact id: the first *_id leads, but it is a NON-unique
    # foreign key — the remaining columns must break the tie
    df2 = spark.createDataFrame(
        [(7, "b", [1.0, 0.0]), (7, "a", [3.0, 0.0])],
        "user_id long, tag string, vec array<float>")
    for _ in range(3):
        got = [r["tag"] for r in
               knn_search(df2, "vec", [1.0, 0.0], k=2).collect()]
        assert got == ["a", "b"]
