"""Fresh-JVM timing probe for corpus_prep_stats at sf1 (r11 verdict
directive #2: 6 s vs 16 s bimodality across sessions for unchanged
code). Each run is its own process/JVM (spawned by the shell loop in
the caller); this script does ONE timed run and prints a JSON line
with the wall time and plan fingerprints so the modes can be told
apart.

Usage: python scripts/probe_corpus_prep.py [sf_dir] [query_name]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1")
    name = sys.argv[2] if len(sys.argv) > 2 else "corpus_prep_stats"
    from sql_database_to_elastic_datalake_spark.session import get_spark

    # the SAME session shape bench.py measures under (16g driver,
    # engine conf) — a 1g-default JVM turns this probe into a GC
    # benchmark instead of a plan benchmark
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="probe", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    q = entry.queries()[name]
    # warm the session machinery once (session conf, catalog), like
    # bench.py's warmup, so the measured run isn't JVM-startup noise
    warm = entry.queries()["group_count"]
    warm(spark, sf_dir).collect()
    # time CONSTRUCTION + collect: iterative operators (dedup_clusters)
    # localCheckpoint eagerly inside the builder, so the heavy work
    # happens before collect — bench.py times the same full span
    t0 = time.monotonic()
    df = q(spark, sf_dir)
    rows = df.collect()
    wall = time.monotonic() - t0
    # the FINAL adaptive plan (AQE mutates in place during execution)
    plan = df._jdf.queryExecution().executedPlan().toString()

    def fp(p):
        return {
            "exchanges": p.count("Exchange"),
            "scans": p.count("Scan parquet"),
            "bnl": p.count("BroadcastNestedLoopJoin"),
            "bhj": p.count("BroadcastHashJoin"),
            "smj": p.count("SortMergeJoin"),
            "aqe_final": p.count("isFinalPlan=true"),
            "skew": p.count("skewed="),
            "coalesced": p.count("AQEShuffleRead"),
        }

    # executor-aggregate GC time vs run time (local mode: one executor)
    tracker = spark.sparkContext.statusTracker()
    gc_ms = run_ms = -1
    try:
        jids = tracker.getJobIdsForGroup()  # touch to init
        _ = jids
        metrics = (spark._jvm.org.apache.spark.SparkEnv.get()
                   .metricsSystem())
        _ = metrics
    except Exception:
        pass
    out = {"query": name, "wall_s": round(wall, 3), "rows": len(rows),
           "plan": fp(plan), "gc_ms": gc_ms, "run_ms": run_ms}
    print(json.dumps(out))
    dump = os.environ.get("PROBE_PLAN_DUMP")
    if dump:
        with open(dump, "w") as fh:
            fh.write(plan)


if __name__ == "__main__":
    main()
