"""Synthesize an sf1 lake (~10x sf0.1) for the local scale rehearsal.

The driver provides testdata up to sf0.1; SCALE.md's claims about
super-linear behavior deserve measurements, so this script replicates
sf0.1 ten times with key remapping into ``.scale/sf1`` (gitignored —
~10 M lineitem rows, regenerate on demand):

* fact/entity keys get a per-replica offset (disjoint key spaces, so
  joins fan out 10x without colliding and group-by cardinality scales);
* dims ``region``/``nation`` stay single-copy (FK targets, like real
  reference data);
* ``documents.text`` is prefixed with a replica tag for replicas > 0 —
  replica clusters become NEAR-duplicates (the boilerplate-crawl
  scenario), which is exactly the hard case the near-dup family should
  be rehearsed on, while exact dedup still sees distinct texts;
* events keep their time range (10x the rows in the same window = 10x
  throughput density, the realistic stream-scaling direction).

Usage:  python scripts/gen_sf1.py  [out_dir]
Then:   SPARK_GRAFT_SF_DIR=$PWD/.scale/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
REPLICAS = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1",
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET, CODEC ZSTD)"
        )

    def rep(table: str, select: str) -> None:
        """Per-replica remapped selects, one parquet FILE per replica
        under a ``{table}.parquet/`` directory — the layout any real
        lake has. A single-file table cannot split below one Spark
        task whatever maxPartitionBytes says (these tables compress to
        <1 MB but are CPU-dense), so the old single-file layout
        serialized every text/embedding-heavy stage onto one core and
        distorted the sf1 rehearsal; multi-file restores the
        parallelism a 100 TB lake gets for free."""
        import shutil

        d = f"{out}/{table}.parquet"
        if os.path.isfile(d):
            os.remove(d)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        for r in range(REPLICAS):
            con.execute(
                f"COPY (SELECT {select.format(off=r * OFF, r=r)} "
                f"FROM read_parquet('{SRC}/{table}.parquet')) "
                f"TO '{d}/part-{r:02d}.parquet' "
                f"(FORMAT PARQUET, CODEC ZSTD, ROW_GROUP_SIZE 1000000)"
            )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({REPLICAS} files)")

    rep("customer",
        "c_custkey + {off} AS c_custkey, c_name, c_nationkey, c_acctbal, "
        "c_mktsegment")
    rep("supplier",
        "s_suppkey + {off} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    rep("part",
        "p_partkey + {off} AS p_partkey, p_name, p_brand, p_type, p_size, "
        "p_retailprice")
    rep("orders",
        "o_orderkey + {off} AS o_orderkey, o_custkey + {off} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    rep("lineitem",
        "l_orderkey + {off} AS l_orderkey, l_partkey + {off} AS l_partkey, "
        "l_suppkey + {off} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        "l_shipdate")
    rep("events",
        "event_id + {off} AS event_id, ts, user_id + {off} AS user_id, "
        "event_type, value, props")
    rep("documents",
        "doc_id + {off} AS doc_id, "
        "CASE WHEN {r} = 0 THEN text ELSE 'r{r} ' || text END AS text, "
        # n_chars must track the prefixed text, not the original —
        # an inconsistent derived column skews length-profiled stats
        "lang, source, "
        "CAST(length(CASE WHEN {r} = 0 THEN text ELSE 'r{r} ' || text END)"
        " AS BIGINT) AS n_chars")
    rep("embeddings",
        "vec_id + {off} AS vec_id, embedding, label")
    print(f"sf1 lake at {out}")


if __name__ == "__main__":
    main()
