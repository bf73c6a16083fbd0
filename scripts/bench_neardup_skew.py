"""Adversarial skewed-sign-bucket bench for the blocked grouped-map
scorer (r15, r14 verdict #4; SCALE.md ledger).

Generates N vectors that all land in ONE sign bucket (every component
positive), then times `_bucketed_neardup_pairs` with the salt-split ON
(default split_threshold/block_rows) vs OFF (threshold = inf), and
checks the two pair outputs are identical. The OFF path processes the
whole bucket in one task — the straggler the split exists to bound.

Usage: python scripts/bench_neardup_skew.py [N] (default 16384)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.995
    dims, sign_dims = 16, 6

    from sql_database_to_elastic_datalake_spark.session import get_spark
    from sql_database_to_elastic_datalake_spark.operators import similarity

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    random.seed(15)
    rows = [(i, [abs(random.gauss(0.0, 1.0)) + 0.01
                 for _ in range(dims)]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb = emb.repartition(int(cpus)).localCheckpoint()

    out = {"n": n, "dims": dims, "sign_dims": sign_dims,
           "threshold": threshold}
    for label, kw in (
        ("split", {}),                                # defaults: 8192/4096
        ("unsplit", {"split_threshold": 1 << 60}),    # one-task path
    ):
        runs = []
        cnt = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = similarity._bucketed_neardup_pairs(
                emb, threshold, "vec_id", "embedding", sign_dims, **kw)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        cnt = similarity._bucketed_neardup_pairs(
            emb, threshold, "vec_id", "embedding", sign_dims, **kw).count()
        out[label] = {"runs": runs, "min": min(runs), "pairs": cnt}
    a = similarity._bucketed_neardup_pairs(
        emb, threshold, "vec_id", "embedding", sign_dims)
    b = similarity._bucketed_neardup_pairs(
        emb, threshold, "vec_id", "embedding", sign_dims,
        split_threshold=1 << 60)
    out["identical"] = (a.exceptAll(b).count() == 0
                        and b.exceptAll(a).count() == 0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
