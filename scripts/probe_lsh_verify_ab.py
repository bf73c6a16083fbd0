"""A/B probe (r15, guide §1): the LSH candidate VERIFICATION tier.

A = current shape: melted band self-join -> distinct (a,b) -> two
    set joins -> array_intersect per pair (sets ship once per pair
    side, ~2x candidate count).
B = in-bucket grouped map: sets ride the ONE band-key exchange
    (<= bands copies per doc), singleton buckets filtered by the same
    window the cap accounting already runs, pairs formed and verified
    inside the task (star cap reproduced in-task), distinct after.

Checks output equality exactly (count + full anti-join both ways) and
prints min-of-N times for the full member (construction + noop).

Usage: python scripts/probe_lsh_verify_ab.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD, BANDS, CAP = 0.9, 3, 32


def build_a(spark, sf_dir):
    from sql_database_to_elastic_datalake_spark.operators import dedup
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_neardup(
        docs, "doc_id", "text", threshold=THRESHOLD, shingle_n=3,
        bands=BANDS, collapse_exact=True, bucket_cap=CAP)


def build_b(spark, sf_dir):
    from pyspark.sql import functions as F, Window

    from sql_database_to_elastic_datalake_spark.operators import dedup
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )

    seeds = dedup.DEFAULT_SEEDS
    rows_per_band = len(seeds) // BANDS
    docs = load_table(spark, sf_dir, "documents")
    reps = dedup.exact_representatives(docs, "doc_id", ["text"])
    sh = dedup.word_shingles(reps, "doc_id", "text", n=3, distinct=False)
    per_doc = (
        sh.groupBy("doc_id")
        .agg(*[F.min(F.md5(F.concat_ws("|", F.lit(s), F.col("shingle"))))
               .alias(f"mh_{i}") for i, s in enumerate(seeds)],
             F.collect_set("shingle").alias("shset"))
        .localCheckpoint()
    )
    band_structs = []
    for b in range(BANDS):
        cols = [F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)]
        band_structs.append(F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(F.concat_ws("|", *cols)).alias("band_key")))
    melted = per_doc.select(
        F.col("doc_id"), F.col("shset"),
        F.explode(F.array(*band_structs)).alias("bk"),
    ).select("doc_id", "shset",
             F.col("bk.band_idx").alias("band_idx"),
             F.col("bk.band_key").alias("band_key"))
    w = Window.partitionBy("band_idx", "band_key")
    keyed = melted.withColumn("__bsz", F.count("*").over(w))
    nonsingle = keyed.filter(F.col("__bsz") >= 2) \
        .select("band_idx", "band_key", "doc_id", "shset")

    threshold, cap = THRESHOLD, CAP

    def verify_bucket(pdf):
        import pandas as pd

        ids = list(pdf["doc_id"])
        sets = [set(s) for s in pdf["shset"]]
        k = len(ids)
        if k > cap:
            hub = min(range(k), key=lambda i: ids[i])
            cand = [(hub, i) for i in range(k) if i != hub]
        else:
            cand = [(i, j) for i in range(k) for j in range(i + 1, k)]
        oa, ob, oj = [], [], []
        for i, j in cand:
            na, nb = len(sets[i]), len(sets[j])
            if min(na, nb) < threshold * max(na, nb):
                continue
            inter = len(sets[i] & sets[j])
            jac = inter / (na + nb - inter)
            if jac >= threshold:
                a, b = ids[i], ids[j]
                if a > b:
                    a, b = b, a
                oa.append(a)
                ob.append(b)
                oj.append(jac)
        return pd.DataFrame({"a": oa, "b": ob, "jaccard": oj})

    id_sql = docs.schema["doc_id"].dataType.simpleString()
    return (
        nonsingle.groupBy("band_idx", "band_key")
        .applyInPandas(verify_bucket,
                       f"a {id_sql}, b {id_sql}, jaccard double")
        .distinct()
    )


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])

    from sql_database_to_elastic_datalake_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    # equality check first (one build each)
    a = build_a(spark, sf_dir)
    b = build_b(spark, sf_dir)
    na, nb = a.count(), b.count()
    only_a = a.exceptAll(b).count()
    only_b = b.exceptAll(a).count()
    print(json.dumps({"rows_a": na, "rows_b": nb,
                      "only_a": only_a, "only_b": only_b}), flush=True)

    for label, builder in (("A_join", build_a), ("B_grouped", build_b)):
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"variant": label, "runs": ts,
                          "min": min(ts)}), flush=True)


if __name__ == "__main__":
    main()
