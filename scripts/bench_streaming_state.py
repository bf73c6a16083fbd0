"""Measure the streaming family under both state-store providers.

r4 verdict directive #7: the RocksDB-vs-HDFS default should be decided
by measurement, not caution. This times every registered streaming
query (min-of-N wall) under the default HDFSBackedStateStoreProvider
and again under RocksDB (changelog checkpointing on), at an arbitrary
lake dir — run it at sf1 for the decision-grade numbers::

    python scripts/bench_streaming_state.py .scale/sf1 [runs]

Prints one JSON line per provider plus a per-query ratio table.
The provider conf is dynamic SQLConf read at stream START, so one
session serves both sides (flip, run, flip back).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING = (
    "streaming_window_counts",
    "session_window_counts",
    "streaming_dedup_keys",
    "streaming_click_attribution",
    "streaming_enriched_counts",
    "streaming_stateful_totals",
    "sliding_window_counts",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from sql_database_to_elastic_datalake_spark.session import (
        HDFS_STATE_STORE_CONF,
        ROCKSDB_STATE_STORE_CONF,
        get_spark,
    )
    import __spark_entry__ as e

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def run_family() -> dict[str, float]:
        out = {}
        for name in STREAMING:
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        return out

    results = {}
    for label, conf in (
        ("hdfs", HDFS_STATE_STORE_CONF),
        ("rocksdb", ROCKSDB_STATE_STORE_CONF),
    ):
        for k, v in conf.items():
            spark.conf.set(k, v)
        timings = run_family()
        results[label] = timings
        print(json.dumps({
            "provider": label, "sf_dir": sf_dir, "runs": runs,
            "total": round(sum(timings.values()), 3), "queries": timings,
        }))
    ratios = {
        q: round(results["rocksdb"][q] / results["hdfs"][q], 3)
        for q in STREAMING
    }
    print(json.dumps({"rocksdb_over_hdfs": ratios}))


if __name__ == "__main__":
    main()
