"""Synthesize an sf10 DOCUMENTS-ONLY lake for the dedup-family scale
rehearsal (r11 verdict stretch #9: SCALE.md's 100-TB claims were
extrapolated from sf1 — measure one more decade).

Same construction as scripts/gen_sf1.py but 100 replicas of the sf0.1
documents table (~500k docs, ~50x the sf1 near-dup clique mass), one
parquet file per replica so Spark parallelizes the text-heavy stages.
Only ``documents`` is generated — the rehearsal targets exact dedup /
MinHash-LSH / cluster resolution / exact-substring, none of which read
the relational tables.

Usage:  python scripts/gen_sf10.py  [out_dir]
Then:   python scripts/bench_dedup_scaling.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
REPLICAS = 100


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf10",
    )
    import shutil

    d = f"{out}/documents.parquet"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    for r in range(REPLICAS):
        con.execute(
            f"COPY (SELECT doc_id + {r * OFF} AS doc_id, "
            # replica 0 keeps the original text; others get a replica
            # tag prefix, making each original doc the seed of a
            # 100-member NEAR-duplicate clique (boilerplate-crawl
            # shape) while exact dedup still sees distinct texts
            f"CASE WHEN {r} = 0 THEN text ELSE 'r{r} ' || text END AS text, "
            f"lang, source, "
            f"CAST(length(CASE WHEN {r} = 0 THEN text "
            f"ELSE 'r{r} ' || text END) AS BIGINT) AS n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')) "
            f"TO '{d}/part-{r:03d}.parquet' "
            f"(FORMAT PARQUET, CODEC ZSTD, ROW_GROUP_SIZE 1000000)"
        )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/*.parquet')"
    ).fetchone()[0]
    print(f"documents: {n} rows ({REPLICAS} files); sf10 lake at {out}")


if __name__ == "__main__":
    main()
