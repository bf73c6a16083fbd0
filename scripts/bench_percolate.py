"""Percolate stored-set scaling (r14, r13 verdict #6): measure where
the one-scan array-of-structs plan knees as the stored-query count
grows, to pick a documented batch size / cap.

The compiled plan's expression mass grows linearly with N stored
queries; the corpus scan is constant. Candidate failure modes at
large N: whole-stage codegen giving up (64KB JVM method limit →
interpreted expression evaluation) and plan-compile time. The
batched fallback (percolate_corpus batch_size) trades extra corpus
scans for staying inside codegen.

Usage: python scripts/bench_percolate.py [sf_dir] — prints one JSON
line per (n_queries, mode) with min-of-2 wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def synth_queries(n: int) -> dict[str, dict]:
    """n deterministic alerting-shaped rules over orders: rotating
    range bands + priority/status terms (mixed leaf kinds so the
    expression mass resembles a real stored set, not one foldable
    comparison)."""
    out: dict[str, dict] = {}
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"]
    for i in range(n):
        lo = (i * 937) % 500000
        out[f"q{i:05d}"] = {"bool": {"must": [
            {"range": {"o_totalprice": {"gte": lo, "lt": lo + 25000}}},
            {"term": {"o_orderpriority": prios[i % 5]}},
        ]}}
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from sql_database_to_elastic_datalake_spark.session import get_spark
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )
    from sql_database_to_elastic_datalake_spark.plans.percolate import (
        percolate_corpus,
    )

    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, sf_dir, "orders")
    spark.range(1000).selectExpr("sum(id)").collect()

    results = []
    for n in (10, 100, 500, 1000, 2000, 5000, 10000):
        queries = synth_queries(n)
        for batch in (None, 500):
            if batch is not None and n <= batch:
                continue
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                out = percolate_corpus(orders, queries,
                                       id_cols=["o_orderkey"],
                                       batch_size=batch)
                cnt = out.count()
                runs.append(time.perf_counter() - t0)
            rec = {"n_queries": n,
                   "mode": ("batched500" if batch else "one-scan"),
                   "wall_sec": round(min(runs), 3),
                   "runs": [round(r, 3) for r in runs],
                   "matches": cnt}
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus,
                      "results": results}))


if __name__ == "__main__":
    main()
