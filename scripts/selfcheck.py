"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names
and (column-name-sorted, row-sorted) values — the same contract the
driver's CORRECTNESS_r{N}.json check uses. Exit code 1 on any mismatch.

Usage: python scripts/selfcheck.py [--partitions N] [--no-aqe] [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Normalize for stable sorting/compare.
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None else v)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def _values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float)
            bv = bv.astype(float)
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                i = int(np.argmin(same))
                return False, (
                    f"col {c}: float mismatch at sorted row {i}: "
                    f"{av[i]!r} vs {bv[i]!r} (maxdiff "
                    f"{np.nanmax(np.abs(av - bv))})"
                )
        else:
            aa = pd.Series(av).astype(str).where(~pd.isna(pd.Series(av)), "<NULL>")
            bb = pd.Series(bv).astype(str).where(~pd.isna(pd.Series(bv)), "<NULL>")
            if not (aa == bb).all():
                i = int((aa != bb).to_numpy().argmax())
                return False, f"col {c}: mismatch at sorted row {i}: {aa[i]!r} vs {bb[i]!r}"
    return True, "ok"


def main() -> int:
    # robustness-matrix flags: results must be invariant to partition
    # count and adaptive re-planning; these make that a one-flag check.
    argv = list(sys.argv[1:])
    partitions = 16
    no_aqe = False
    if "--partitions" in argv:
        i = argv.index("--partitions")
        partitions = int(argv[i + 1])
        del argv[i : i + 2]
    if "--no-aqe" in argv:
        no_aqe = True
        argv.remove("--no-aqe")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as e
    from sql_database_to_elastic_datalake_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=partitions)
    spark.sparkContext.setLogLevel("ERROR")
    if no_aqe:
        # ensure_session_conf re-enables AQE per query call; wrap it so
        # the pin survives
        from sql_database_to_elastic_datalake_spark import registry, session

        orig = session.ensure_session_conf

        def pinned(sp):
            orig(sp)
            sp.conf.set("spark.sql.adaptive.enabled", "false")
            return sp

        registry.ensure_session_conf = pinned

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(sdf)} rows, no oracle)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        ok, msg = _values_equal(_canon(sdf), _canon(ddf))
        status = "pass" if ok else "FAIL"
        print(f"{status} {name}: {len(sdf)} rows — {msg}")
        if not ok:
            failed.append(name)
    checked = [n for n in qs if not only or n in only]
    print(f"\n{len(checked) - len(failed)}/{len(checked)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
