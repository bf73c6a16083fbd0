"""r14 optimization-round measurement harness (guide §1).

For each bench member this times, separately:

* ``build``  — python query construction (registry call), which includes
  driver-side JVM round-trips for scans and expression assembly;
* ``runs``   — three noop-sink materializations (guide §1.4); run 1 pays
  Catalyst analysis/optimization + codegen, runs 2-3 are steady state.

The build/run split matters because several members (IVF, geo, spans)
carry large literal expression trees whose cost is *driver-side
planning*, invisible in a plain wall total.

Usage::

    python scripts/measure_r14.py [--plans DIR] [--members a,b,c] [--sf DIR]

Writes one JSON line per member to stdout and (with ``--plans``) the
``explain('formatted')`` output to ``DIR/<member>.txt``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    plans_dir = None
    members = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--plans" in argv:
        plans_dir = argv[argv.index("--plans") + 1]
        os.makedirs(plans_dir, exist_ok=True)
    if "--members" in argv:
        members = argv[argv.index("--members") + 1].split(",")
    if "--sf" in argv:
        sf_dir = argv[argv.index("--sf") + 1]

    from sql_database_to_elastic_datalake_spark.session import get_spark
    import __spark_entry__ as entrymod
    import bench

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    if members is None:
        members = [q for q in bench.HEADLINE] + [
            q for q in bench.SF1_EXTRA if q not in bench.HEADLINE]

    # same engine warm-up as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F, Window
    from sql_database_to_elastic_datalake_spark.sources.parquet import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("r_regionkey").orderBy("n_name")))
        .groupBy("r_name")
        .agg(F.count("*"), F.collect_set("n_name"), F.max("rn"))
        .write.format("noop").mode("overwrite").save()
    )

    out_rows = []
    for name in members:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"measure:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        runs = []
        for i in range(3):
            if i > 0:
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                t_build = min(t_build, time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        row = {
            "name": name,
            "build": round(t_build, 3),
            "first": round(runs[0], 3),
            "steady": round(min(runs[1:]), 3),
            "runs": [round(r, 3) for r in runs],
        }
        out_rows.append(row)
        print(json.dumps(row), flush=True)
        if plans_dir:
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        spark.sparkContext.setJobDescription(None)
    total_steady = round(sum(r["steady"] for r in out_rows), 3)
    total_min = round(sum(min(r["runs"]) for r in out_rows), 3)
    print(json.dumps({"total_steady": total_steady,
                      "total_min_of_3": total_min,
                      "n": len(out_rows), "sf_dir": sf_dir,
                      "cpus": cpus}), flush=True)


if __name__ == "__main__":
    main()
