"""Stage-level probe of the minhash-LSH near-dup pipeline (r15, guide
§1): times, separately and with the noop sink, (1) the fused
shingle→signature+set groupBy checkpoint (the operator's *build* cost),
(2) candidate generation from the checkpointed signatures, and (3) the
full verified output — so the verification tier's share is measurable
before touching it.

Usage: python scripts/probe_lsh_stages.py [--sf DIR] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 3
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]
    if "--runs" in argv:
        runs = int(argv[argv.index("--runs") + 1])

    from pyspark.sql import functions as F

    from sql_database_to_elastic_datalake_spark.session import get_spark
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )
    from sql_database_to_elastic_datalake_spark.operators import dedup

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    seeds, bands, threshold, cap = dedup.DEFAULT_SEEDS, 3, 0.9, 32
    rows_per_band = len(seeds) // bands

    for r in range(runs):
        docs = load_table(spark, sf_dir, "documents")
        sc = spark.sparkContext

        sc.setJobDescription("probe: exact-collapse + fused groupBy ckpt")
        t0 = time.perf_counter()
        reps = dedup.exact_representatives(docs, "doc_id", ["text"])
        sh = dedup.word_shingles(reps, "doc_id", "text", n=3,
                                 distinct=False)
        per_doc = (
            sh.groupBy("doc_id")
            .agg(*[F.min(F.md5(F.concat_ws("|", F.lit(s),
                                           F.col("shingle"))))
                   .alias(f"mh_{i}") for i, s in enumerate(seeds)],
                 F.collect_set("shingle").alias("shset"))
            .localCheckpoint()
        )
        t_ckpt = time.perf_counter() - t0

        sigs = per_doc.select(
            "doc_id", *[f"mh_{i}" for i in range(len(seeds))])
        sc.setJobDescription("probe: candidate generation")
        cands = dedup.lsh_candidate_pairs(
            sigs, "doc_id", bands, rows_per_band, bucket_cap=cap,
            metrics={})
        t_cand = noop(cands)

        sc.setJobDescription("probe: verification tier")
        sets = per_doc.select("doc_id", "shset")
        a_sets = sets.select(F.col("doc_id").alias("a"),
                             F.col("shset").alias("sa"))
        b_sets = sets.select(F.col("doc_id").alias("b"),
                             F.col("shset").alias("sb"))
        inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
        sza, szb = F.size(F.col("sa")), F.size(F.col("sb"))
        ratio_ok = (F.least(sza, szb)
                    >= F.lit(threshold) * F.greatest(sza, szb))
        out = (
            cands.join(a_sets, "a").join(b_sets, "b")
            .filter(ratio_ok)
            .withColumn("i", inter)
            .withColumn("jaccard",
                        (F.col("i") / (sza + szb - F.col("i")))
                        .cast("double"))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )
        t_full = noop(out)

        n_cand = cands.count()
        n_out = out.count()
        sc.setJobDescription(None)
        print(json.dumps({
            "run": r, "ckpt_build": round(t_ckpt, 3),
            "cands_noop": round(t_cand, 3),
            "full_noop": round(t_full, 3),
            "n_cands": n_cand, "n_pairs": n_out,
        }), flush=True)


if __name__ == "__main__":
    main()
