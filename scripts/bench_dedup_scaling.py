"""Dedup-family scale rehearsal: measure sf1 → sf10 scaling exponents
(r11 verdict stretch #9 — the 100-TB claims in SCALE.md were
extrapolated from sf1; this records one more decade of evidence).

For each dedup-family registry query, run min-of-2 at the sf1 and sf10
lakes (scripts/gen_sf1.py / gen_sf10.py) and report the empirical
scaling exponent ``log10(t_sf10 / t_sf1)`` — 1.0 = linear, 2.0 =
quadratic. The sf10 lake is documents-only, so only document-table
queries are eligible. Output: ONE JSON line per run, suitable for
committing as BENCH_dedup_scaling_r{N}.json.

Usage: python scripts/bench_dedup_scaling.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

#: document-only dedup-family members with a linear-or-banded scale
#: story (exact jaccard is the documented quadratic verifier tier —
#: not rehearsed at sf10, where 100-member cliques make the pair set
#: itself quadratic in clique size by construction)
MEMBERS = (
    "dedup_exact",
    "incremental_dedup_sync",
    "neardup_minhash_lsh",
    "simhash_hamming_pairs",
    "exact_substring_dedup",
    "chunk_level_dedup",
)


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, ".scale", "sf1")
    sf10 = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        root, ".scale", "sf10")
    for d in (sf1, sf10):
        if not os.path.isdir(d):
            sys.exit(f"lake missing at {d}; run scripts/gen_sf1.py / "
                     "gen_sf10.py first")
    from sql_database_to_elastic_datalake_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="dedup-scaling",
                      master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus),
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict = {"metric": "dedup_family_scaling", "unit": "sec",
                 "members": {}}
    for name in MEMBERS:
        if name not in qs:
            continue
        rec: dict = {}
        for label, d in (("sf1", sf1), ("sf10", sf10)):
            best, rows = None, None
            for _ in range(2):
                t0 = time.perf_counter()
                df = qs[name](spark, d)
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec[label] = round(best, 3)
        rec["exponent"] = round(
            math.log10(max(rec["sf10"], 1e-3) / max(rec["sf1"], 1e-3)),
            2)
        out["members"][name] = rec
        print(f"# {name}: sf1 {rec['sf1']} s, sf10 {rec['sf10']} s, "
              f"exponent {rec['exponent']}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
