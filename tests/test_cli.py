from __future__ import annotations

import datetime as dt
import json
import os

from sql_database_to_elastic_datalake_spark.cli import main
from sql_database_to_elastic_datalake_spark.schemas import ENTITY_SCHEMAS


def test_cli_sync_generic_and_search(spark, tmp_path, capsys):
    src = os.path.join(str(tmp_path), "nation.parquet")
    spark.createDataFrame(
        [(1, "GERMANY"), (2, "FRANCE")], "id int, name string"
    ).write.parquet(src)
    lake = os.path.join(str(tmp_path), "lake")

    assert main(["sync-generic", "--input", src, "--table", "nation",
                 "--lake", lake]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 2

    out = spark.read.parquet(os.path.join(lake, "data_lake_nation"))
    assert "doc_id" in out.columns and out.count() == 2

    assert main(["search", "--lake", lake, "--query", "germany"]) == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hits["hits"]["total"]["value"] == 1


def test_cli_sync_entities(spark, tmp_path, capsys):
    ent_dir = os.path.join(str(tmp_path), "dumps")
    os.makedirs(ent_dir)
    T0 = dt.datetime(2024, 1, 1)

    def dump(entity, rows):
        sch = ENTITY_SCHEMAS[entity]
        names = [f.name for f in sch.fields]
        spark.createDataFrame(
            [tuple(r.get(n) for n in names) for r in rows], sch
        ).write.parquet(os.path.join(ent_dir, f"{entity}.parquet"))

    dump("User", [dict(id="u1", name="A", username="a", email="a@x",
                       password="p", createdAt=T0)])
    dump("Status", [dict(id="s1", name="Open", isFinalStatus=False,
                         createdAt=T0)])
    dump("Label", [dict(id="l1", name="Bug", isVisible=True, createdAt=T0)])
    dump("Module", [dict(id="m1", name="M", type="X", createdAt=T0)])
    dump("DataSource", [dict(id="d1", name="D", entityName="e",
                             gatewayType="API", moduleId="m1", statusId="s1",
                             createdAt=T0)])

    lake = os.path.join(str(tmp_path), "lake")
    assert main(["sync-entities", "--entities-dir", ent_dir, "--lake", lake,
                 "--indexed-at", "2026-01-01T00:00:00"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["synced"] == {"data_sources": 1, "users": 1, "modules": 1,
                            "statuses": 1, "labels": 1}
    users = spark.read.parquet(os.path.join(lake, "data_lake_users")).collect()
    assert users[0]["document_id"] == "u1_2026-01-01T00:00:00"


def test_cli_explain(capsys):
    from sql_database_to_elastic_datalake_spark.cli import main

    assert main(["explain", "--query", "pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
    assert main(["explain", "--query", "nope"]) == 2


def test_cli_load_es(spark, tmp_path, capsys):
    """load-es: ensure-index + distributed bulk against the mock
    cluster, JSON accounting on stdout, nonzero exit on rejects."""
    import json as _json

    from tests.test_es_client import MockEs
    import threading
    from http.server import HTTPServer

    server = HTTPServer(("127.0.0.1", 0), MockEs)
    server.behaviors = {}
    server.requests = []
    server.indices = set()
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        src = str(tmp_path / "docs")
        spark.createDataFrame(
            [(i, f"text {i}") for i in range(9)], "doc_id long, text string"
        ).write.parquet(src)
        url = f"http://127.0.0.1:{server.server_port}"
        rc = main([
            "load-es", "--input", src, "--url", url, "--index", "lake_docs",
            "--id-col", "doc_id", "--batch-size", "4",
            "--text-cols", "text",
        ])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert out == {"index": "lake_docs", "created": True, "ok": 9,
                       "retried": 0, "rejected": 0}
        assert "lake_docs" in server.indices

        # a permanent reject surfaces in the accounting and the exit code
        server.behaviors["5"] = [400]
        rc = main([
            "load-es", "--input", src, "--url", url, "--index", "lake_docs",
            "--id-col", "doc_id",
        ])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 1 and out["rejected"] == 1 and out["created"] is False

        # zero-row input: F.sum over no rows is NULL — the command must
        # report an explicit ok=0/retried=0/rejected=0 and exit 0, not
        # print nulls and claim success
        empty = str(tmp_path / "empty_docs")
        spark.createDataFrame([], "doc_id long, text string").write.parquet(empty)
        rc = main([
            "load-es", "--input", empty, "--url", url, "--index", "lake_docs",
            "--id-col", "doc_id",
        ])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0
        assert (out["ok"], out["retried"], out["rejected"]) == (0, 0, 0)
    finally:
        server.shutdown()


def test_cli_sql(spark, tmp_path, capsys):
    lake = os.path.join(str(tmp_path), "lake")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(os.path.join(lake, "data_lake_t"))
    assert main(["sql", "--lake", lake, "--query",
                 "SELECT count(*) AS n FROM data_lake_t"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["columns"] == [{"name": "n", "type": "long"}]
    assert out["rows"] == [[2]]
