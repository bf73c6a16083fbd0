"""Operational CLI — the engine's answer to the reference's job scripts.

Reference entry points covered:
  * ``python sync_data.py``       → ``sync-entities`` (all entity pipelines)
  * ``python data_lake_sync.py``  → ``sync-generic`` (any-table sync)
  * the Flask server              → ``serve``
  * ad-hoc search                 → ``search``

Usage:
  python -m sql_database_to_elastic_datalake_spark.cli sync-generic \
      --input /data/nation.parquet --table nation --lake /lake --mode snapshot
  python -m sql_database_to_elastic_datalake_spark.cli sync-entities \
      --entities-dir /dumps --lake /lake --indexed-at 2026-01-01T00:00:00
  python -m sql_database_to_elastic_datalake_spark.cli search \
      --lake /lake --query "spark"
  python -m sql_database_to_elastic_datalake_spark.cli serve --lake /lake
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark():
    from sql_database_to_elastic_datalake_spark.session import get_spark

    spark = get_spark(app_name="sdel-cli")
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_sync_generic(args) -> int:
    from sql_database_to_elastic_datalake_spark.generic import sync_generic_table
    from sql_database_to_elastic_datalake_spark.sinks.writer import write_lake

    spark = _spark()
    df = spark.read.parquet(args.input)
    out = sync_generic_table(df, args.table)
    dest = os.path.join(args.lake, f"data_lake_{args.table.lower()}")
    write_lake(out, dest, mode=args.mode)
    print(json.dumps({"table": args.table, "rows": out.count(), "dest": dest}))
    return 0


def cmd_sync_entities(args) -> int:
    from sql_database_to_elastic_datalake_spark.sinks.writer import write_lake
    from sql_database_to_elastic_datalake_spark.sync import sync_all_tables

    spark = _spark()
    entities = {}
    for name in ("Ticket", "TicketStatus", "TicketLabel", "Status", "Label",
                 "Module", "User", "DataSource"):
        path = os.path.join(args.entities_dir, f"{name}.parquet")
        if os.path.exists(path):
            entities[name] = spark.read.parquet(path)
    outputs = sync_all_tables(entities, args.indexed_at)
    report = {}
    for table, df in outputs.items():
        dest = os.path.join(args.lake, f"data_lake_{table}")
        write_lake(df, dest, mode=args.mode)
        report[table] = df.count()
    print(json.dumps({"synced": report, "indexed_at": args.indexed_at}))
    return 0


def cmd_search(args) -> int:
    from sql_database_to_elastic_datalake_spark.api import LakeService

    service = LakeService(_spark(), args.lake)
    print(json.dumps(service.search(args.query, k=args.k), default=str))
    return 0


def cmd_sql(args) -> int:
    """Read-only SQL over the lake — the CLI twin of POST
    /search/sql (same parsed-plan gate, same budget, ES SQL wire
    columns), one JSON object per run."""
    from sql_database_to_elastic_datalake_spark.api import LakeService

    service = LakeService(_spark(), args.lake)
    cols, rows = service.sql_query(args.query)
    print(json.dumps({"columns": cols, "rows": rows}, default=str))
    return 0


def cmd_explain(args) -> int:
    from sql_database_to_elastic_datalake_spark import registry

    qs = registry.ordered_queries()
    if args.query not in qs:
        print(f"unknown query: {args.query}", file=sys.stderr)
        print("available:", ", ".join(sorted(qs)), file=sys.stderr)
        return 2
    df = qs[args.query](_spark(), args.sf_dir)
    df.explain(args.mode)
    return 0


def cmd_serve(args) -> int:
    from sql_database_to_elastic_datalake_spark.api import LakeService, create_app

    spark = _spark()
    service = LakeService(spark, args.lake)
    entities = None
    if args.entities_dir:
        entities = {}
        for name in ("Ticket", "TicketStatus", "TicketLabel", "Status", "Label",
                     "Module", "User", "DataSource"):
            path = os.path.join(args.entities_dir, f"{name}.parquet")
            if os.path.exists(path):
                entities[name] = spark.read.parquet(path)
    app = create_app(service, entities=entities)
    app.run(host=args.host, port=args.port)
    return 0


def cmd_load_es(args) -> int:
    """Load one lake table into a live Elasticsearch over HTTP: ensure
    the index (schema-derived mapping), then distributed ``_bulk``
    posting with per-item retry/quarantine — the reference's
    ``sync → helpers.bulk`` loop (es_connector.py:37-74) as one
    command against a real cluster URL."""
    from pyspark.sql import functions as F

    from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
        create_index_body,
    )
    from sql_database_to_elastic_datalake_spark.sinks.es_client import (
        EsBulkClient,
        bulk_load_distributed,
    )

    spark = _spark()
    df = spark.read.parquet(args.input)
    client = EsBulkClient(args.url, max_retries=args.max_retries)
    created = client.ensure_index(
        args.index, create_index_body(df, tuple(args.text_cols or ()))
    )
    summary = (
        bulk_load_distributed(
            df, args.url, args.index, args.id_col,
            actions_per_request=args.batch_size,
            max_retries=args.max_retries,
        )
        .agg(
            # F.sum over zero rows (empty/zero-partition input) is NULL,
            # which would print null counts yet exit 0; an empty load
            # must report ok=0/retried=0/rejected=0 explicitly
            F.coalesce(F.sum("partition_ok"), F.lit(0)).alias("ok"),
            F.coalesce(F.sum("partition_retried"), F.lit(0)).alias("retried"),
            F.coalesce(F.sum("partition_rejected"), F.lit(0)).alias("rejected"),
        )
        .collect()[0]
    )
    print(json.dumps({
        "index": args.index, "created": created, "ok": summary["ok"],
        "retried": summary["retried"], "rejected": summary["rejected"],
    }))
    return 0 if not summary["rejected"] else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sql_database_to_elastic_datalake_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("sync-generic", help="generic any-table sync")
    g.add_argument("--input", required=True)
    g.add_argument("--table", required=True)
    g.add_argument("--lake", required=True)
    g.add_argument("--mode", default="snapshot",
                   choices=["snapshot", "history", "ensure"])
    g.set_defaults(fn=cmd_sync_generic)

    e = sub.add_parser("sync-entities", help="full entity batch sync")
    e.add_argument("--entities-dir", required=True)
    e.add_argument("--lake", required=True)
    e.add_argument("--indexed-at", required=True)
    e.add_argument("--mode", default="snapshot",
                   choices=["snapshot", "history", "ensure"])
    e.set_defaults(fn=cmd_sync_entities)

    s = sub.add_parser("search", help="multi-match search across the lake")
    s.add_argument("--lake", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    q = sub.add_parser("sql", help="read-only SQL over the lake tables")
    q.add_argument("--lake", required=True)
    q.add_argument("--query", required=True)
    q.set_defaults(fn=cmd_sql)

    x = sub.add_parser("explain", help="print a registered query's physical plan")
    x.add_argument("--query", required=True)
    x.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    x.add_argument("--mode", default="formatted",
                   choices=["simple", "extended", "formatted", "cost"])
    x.set_defaults(fn=cmd_explain)

    le = sub.add_parser(
        "load-es", help="bulk-load a lake table into Elasticsearch over HTTP"
    )
    le.add_argument("--input", required=True, help="parquet table path")
    le.add_argument("--url", required=True, help="cluster base URL")
    le.add_argument("--index", required=True)
    le.add_argument("--id-col", required=True)
    le.add_argument("--batch-size", type=int, default=1000,
                    help="actions per _bulk request (reference batch_size)")
    le.add_argument("--max-retries", type=int, default=3)
    le.add_argument("--text-cols", nargs="*", default=None,
                    help="columns mapped as analyzed text")
    le.set_defaults(fn=cmd_load_es)

    v = sub.add_parser("serve", help="run the REST API server")
    v.add_argument("--lake", required=True)
    v.add_argument("--entities-dir", default=None,
                   help="source entity parquet dir; enables /<entity>/sync")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=5000)
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
