"""Audit every registered query's output schema for driver-hostile
column types.

The driver canonicalizer sorts the result rows by every column before
hashing; array/map/struct cells crash that sort (pandas `unhashable
type: 'list'` — the `approx_sketches` r2 failure class). Registry
convention: checked queries emit scalar columns only (serialize arrays
with `array_join`, structs with explicit field projection).

Schema inspection is analysis-only for plain batch queries, but NOT for
every registered query: the streaming family materializes an
availableNow run to a memory sink at construction time, and the ML-tier
queries (IVF) fit their models — so a full audit runs real jobs and
takes a few minutes at sf0.001. Exit 1 if any query with an oracle — or
any query at all, with --strict — has a complex-typed output column.

Usage: python scripts/schema_audit.py [--strict] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, MapType, StructType


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    strict = "--strict" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("schema-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    bad: list[tuple[str, str, str]] = []
    errs: list[tuple[str, str]] = []
    for name, fn in queries.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001 — report, keep auditing
            errs.append((name, f"{type(e).__name__}: {e}"))
            continue
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad.append((name, field.name, field.dataType.simpleString()))

    failed = False
    for name, col, typ in bad:
        gated = name in oracles or strict
        tag = "FAIL" if gated else "warn (rows-only)"
        print(f"{tag}: {name}.{col} is {typ}")
        failed |= gated
    for name, err in errs:
        print(f"FAIL (build error): {name}: {err}")
        failed = True
    print(
        f"audited {len(queries)} queries: {len(bad)} complex-typed columns, "
        f"{len(errs)} build errors"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
