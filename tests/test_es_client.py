"""EsBulkClient against an in-process mock Elasticsearch.

No live cluster exists in the sandbox, so the mock speaks the documented
``_bulk``/index-create response shapes (including the trap the client
exists for: HTTP 200 with per-item failures) and scripts per-document
behaviors — fail-once-with-429, always-400 — to prove the retry and
quarantine paths actually run.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from sql_database_to_elastic_datalake_spark.sinks.es_client import (
    BulkResult,
    EsBulkClient,
)


class MockEs(BaseHTTPRequestHandler):
    """Scriptable mock: server.behaviors maps _id -> list of statuses to
    emit on successive attempts (last one repeats); absent -> 201."""

    def log_message(self, *a):  # quiet
        pass

    def _send(self, status: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):
        name = self.path.lstrip("/")
        if name in self.server.indices:
            self._send(400, {"error": {
                "type": "resource_already_exists_exception"}})
            return
        self.server.indices.add(name)
        self._send(200, {"acknowledged": True, "index": name})

    def do_POST(self):
        if self.path.endswith("/_search"):
            self._do_search()
            return
        assert self.path == "/_bulk"
        assert self.headers["Content-Type"] == "application/x-ndjson"
        raw = self.rfile.read(int(self.headers["Content-Length"]))
        self.server.requests.append(raw)
        if getattr(self.server, "request_statuses", None):
            # request-level verdict: ES rejects a WHOLE _bulk with 429
            # when the write queue is full (no per-item list at all)
            status = self.server.request_statuses.pop(0)
            if status != 200:
                self._send(status, {"error": {
                    "type": "es_rejected_execution_exception",
                    "reason": "rejected execution (queue capacity)"}})
                return
        lines = raw.decode().rstrip("\n").split("\n")
        items, errors = [], False
        for i in range(0, len(lines), 2):
            action = json.loads(lines[i])
            doc_id = action["index"]["_id"]
            seq = self.server.behaviors.get(doc_id)
            if seq:
                status = seq.pop(0) if len(seq) > 1 else seq[0]
            else:
                status = 201
            item = {"index": {"_id": doc_id, "status": status}}
            if status >= 300:
                errors = True
                item["index"]["error"] = {
                    "type": "es_rejected_execution_exception"
                    if status == 429 else "mapper_parsing_exception"
                }
            else:
                # accepted documents become searchable (the mock's
                # "shard"): index -> _id -> parsed _source
                docs = getattr(self.server, "docs", None)
                if docs is not None:
                    docs.setdefault(action["index"]["_index"], {})[
                        doc_id] = json.loads(lines[i + 1])
            items.append(item)
        self._send(200, {"took": 1, "errors": errors, "items": items})

    def _do_search(self):
        """Minimal ``/{index}/_search``: evaluates the DSL with the
        test-suite's pure-Python reference evaluator (an implementation
        INDEPENDENT of the lake's compiler — that's what makes the
        envelope-parity test a differential), returns the documented
        hits envelope."""
        from tests.test_properties import eval_dsl

        index = self.path.lstrip("/").split("/")[0]
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])) or b"{}"
        )
        stored = getattr(self.server, "docs", {}).get(index, {})
        matched = [
            (doc_id, src) for doc_id, src in stored.items()
            if eval_dsl(_DefaultNone(src), body.get("query", {"match_all": {}}))
        ]
        size = body.get("size", 10)

        def src_filter(src: dict) -> dict:
            # independent _source include/exclude implementation (the
            # lake side lives in plans/search.resolve_source_columns)
            import fnmatch as _fn

            spec = body.get("_source")
            if spec is None or spec is True:
                return src
            if spec is False:
                return {}
            if isinstance(spec, str):
                spec = [spec]
            if isinstance(spec, list):
                spec = {"includes": spec}
            inc = spec.get("includes", ["*"])
            exc = spec.get("excludes", [])
            return {
                k: v for k, v in src.items()
                if any(_fn.fnmatchcase(k, p) for p in inc)
                and not any(_fn.fnmatchcase(k, p) for p in exc)
            }

        self._send(200, {
            "took": 1,
            "hits": {
                "total": {"value": len(matched), "relation": "eq"},
                "hits": [
                    {"_index": index, "_id": doc_id,
                     "_source": src_filter(src)}
                    for doc_id, src in matched[:size]
                ],
            },
        })


class _DefaultNone(dict):
    """ES sources omit null fields; the reference evaluator indexes
    row[field] directly, so absent keys must read as null (no match),
    exactly like a missing field in a live index."""

    def __missing__(self, key):
        return None


@pytest.fixture()
def mock_es():
    server = HTTPServer(("127.0.0.1", 0), MockEs)
    server.behaviors = {}
    server.requests = []
    server.request_statuses = []
    server.indices = set()
    server.docs = {}
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield server
    finally:
        server.shutdown()


def _client(server, **kw):
    kw.setdefault("initial_backoff", 0.0)
    return EsBulkClient(f"http://127.0.0.1:{server.server_port}", **kw)


def _body(*ids):
    return "".join(
        f'{{"index": {{"_index": "i", "_id": "{i}"}}}}\n{{"doc": {i}}}\n'
        for i in ids
    )


def test_all_ok_single_request(mock_es):
    res = _client(mock_es).bulk(_body(1, 2, 3))
    assert (res.ok, res.retried, res.rejected) == (3, 0, [])
    assert len(mock_es.requests) == 1


def test_retryable_items_resent_alone_and_succeed(mock_es):
    mock_es.behaviors["2"] = [429, 201]
    res = _client(mock_es).bulk(_body(1, 2, 3))
    assert res.ok == 3 and res.retried == 1 and not res.rejected
    # second request carries ONLY the failed item
    assert len(mock_es.requests) == 2
    retry_lines = mock_es.requests[1].decode().rstrip("\n").split("\n")
    assert json.loads(retry_lines[0])["index"]["_id"] == "2"
    assert json.loads(retry_lines[1]) == {"doc": 2}


def test_permanent_rejection_quarantined_not_retried(mock_es):
    mock_es.behaviors["9"] = [400]
    res = _client(mock_es).bulk(_body(8, 9))
    assert res.ok == 1 and res.retried == 0
    assert [r["_id"] for r in res.rejected] == ["9"]
    assert res.rejected[0]["error"]["type"] == "mapper_parsing_exception"
    assert len(mock_es.requests) == 1


def test_retry_budget_exhaustion_quarantines(mock_es):
    mock_es.behaviors["5"] = [429]  # retryable forever
    res = _client(mock_es, max_retries=2).bulk(_body(5))
    assert res.ok == 0 and res.retried == 2
    assert [r["_id"] for r in res.rejected] == ["5"]
    assert len(mock_es.requests) == 3  # initial + 2 retries


def test_request_level_429_backs_off_and_resends(mock_es):
    """A whole-request 429 (full write queue) is retried with backoff,
    not raised — raising would fail the Spark task inside
    bulk_load_distributed instead of riding out transient pressure."""
    mock_es.request_statuses[:] = [429, 503, 200]
    res = _client(mock_es, max_retries=3).bulk(_body(1, 2))
    assert res.ok == 2 and not res.rejected
    assert res.retried == 4  # 2 docs re-sent twice
    assert len(mock_es.requests) == 3


def test_request_level_429_exhaustion_raises(mock_es):
    mock_es.request_statuses[:] = [429, 429, 429, 429]
    with pytest.raises(RuntimeError, match="transport failed"):
        _client(mock_es, max_retries=2).bulk(_body(1))
    assert len(mock_es.requests) == 3  # initial + 2 retries


def test_ensure_index_idempotent(mock_es):
    c = _client(mock_es)
    assert c.ensure_index("lake_docs", '{"mappings": {}}') is True
    assert c.ensure_index("lake_docs") is False  # already exists -> ok


def test_load_export_dir_posts_every_shard(mock_es, spark, tmp_path):
    """End-to-end: Spark export -> strict files -> HTTP load; every doc
    acknowledged exactly once."""
    from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
        write_bulk_ndjson,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(7)], "doc_id long, text string"
    )
    out = str(tmp_path / "bulk")
    write_bulk_ndjson(df, out, "lake_docs", "doc_id", actions_per_file=2)
    res = _client(mock_es).load_export_dir(out)
    assert (res.ok, res.rejected) == (7, [])
    sent_ids = []
    for raw in mock_es.requests:
        lines = raw.decode().rstrip("\n").split("\n")
        sent_ids += [json.loads(lines[i])["index"]["_id"]
                     for i in range(0, len(lines), 2)]
    assert sorted(sent_ids, key=int) == [str(i) for i in range(7)]


def test_load_export_dir_handles_gzip_shards(mock_es, spark, tmp_path):
    from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
        write_bulk_ndjson,
    )

    df = spark.createDataFrame(
        [(i, f"z{i}") for i in range(5)], "doc_id long, text string"
    )
    out = str(tmp_path / "bulk_gz")
    write_bulk_ndjson(df, out, "lake_docs", "doc_id",
                      actions_per_file=2, compression="gzip")
    res = _client(mock_es).load_export_dir(out)
    assert (res.ok, res.rejected) == (5, [])


def test_search_envelope_parity_lake_vs_cluster(mock_es, spark, tmp_path):
    """The reference round-trips /search/advanced through ES
    (src/search_api.py:38-46). Prove the lake answers the same DSL
    identically to what the exporter+client shipped to a cluster: the
    mock's _search evaluates queries with the pure-Python reference
    evaluator (independent of the lake's compiler), so agreement is a
    three-way differential — compiler vs evaluator vs the wire format
    the export path produced."""
    import os

    from sql_database_to_elastic_datalake_spark.api import LakeService
    from sql_database_to_elastic_datalake_spark.sinks.bulk_export import (
        write_bulk_ndjson,
    )

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, "en", 120, "spark merges fast"),
         (2, "de", 480, "slow pandas loop"),
         (3, "en", 300, None),        # null text: omitted from _source
         (4, "fr", 80, "spark spark")],
        "doc_id long, lang string, n_chars long, text string",
    )
    df.write.parquet(os.path.join(lake, "data_lake_doc"))
    dsl = {"bool": {"must": [{"range": {"n_chars": {"gte": 100}}}],
                    "should": [{"term": {"lang": "en"}},
                               {"match": {"text": "loop"}}],
                    "minimum_should_match": 1}}

    lake_env = LakeService(spark, lake).advanced_search(
        "data_lake_doc", dsl, k=10)

    out = str(tmp_path / "export")
    write_bulk_ndjson(df, out, "data_lake_doc", "doc_id")
    client = _client(mock_es)
    assert client.load_export_dir(out).ok == 4
    es_env = client.search("data_lake_doc", {"query": dsl, "size": 10})

    assert (es_env["hits"]["total"]["value"]
            == lake_env["hits"]["total"]["value"] == 3)

    def canon(hits):
        # order-insensitive (filter context has no scores); the lake
        # side drops nulls because the exporter's documented contract
        # omits null fields from _source (bulk_export ignoreNullFields)
        return [
            json.dumps({k: v for k, v in h["_source"].items()
                        if v is not None}, sort_keys=True)
            for h in sorted(hits, key=lambda h: h["_source"]["doc_id"])
        ]

    assert canon(es_env["hits"]["hits"]) == canon(lake_env["hits"]["hits"])

    # _source filtering parity (r6): the lake applies it as a scan
    # projection, the mock cluster as response-side trimming — the two
    # independent implementations must agree on the wire shape
    spec = {"includes": ["doc_id", "l*"], "excludes": ["lang"]}
    lake_env = LakeService(spark, lake).advanced_search(
        "data_lake_doc", dsl, k=10, source=spec)
    es_env = client.search(
        "data_lake_doc", {"query": dsl, "size": 10, "_source": spec})
    assert canon(es_env["hits"]["hits"]) == canon(lake_env["hits"]["hits"])
    assert all(set(h["_source"]) == {"doc_id"}
               for h in lake_env["hits"]["hits"])


def test_odd_line_body_fails_loudly():
    with pytest.raises(ValueError, match="pairs"):
        EsBulkClient._split_pairs(b'{"index": {}}\n{"doc": 1}\n{"index": {}}\n')


def test_merge_accumulates():
    a, b = BulkResult(ok=2), BulkResult(ok=1, retried=1, rejected=[{"x": 1}])
    a.merge(b)
    assert (a.ok, a.retried, a.rejected) == (3, 1, [{"x": 1}])


def test_bulk_load_distributed_partition_accounting(mock_es, spark):
    """Executor-side loading: rendering stays JVM-side, each partition
    posts its own rows; the summary aggregates to exactly the corpus."""
    from sql_database_to_elastic_datalake_spark.sinks.es_client import (
        bulk_load_distributed,
    )

    mock_es.behaviors["3"] = [429, 201]   # one retryable blip
    mock_es.behaviors["7"] = [400]        # one permanent reject
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "doc_id long, text string"
    ).repartition(4)
    url = f"http://127.0.0.1:{mock_es.server_port}"
    summary = bulk_load_distributed(
        df, url, "lake_docs", "doc_id",
        actions_per_request=3, initial_backoff=0.0,
    ).collect()
    assert len(summary) == 4
    ok = sum(r["partition_ok"] for r in summary)
    retried = sum(r["partition_retried"] for r in summary)
    rejected = sum(r["partition_rejected"] for r in summary)
    assert (ok, retried, rejected) == (19, 1, 1)
    # every doc reached the wire exactly once (the retried one twice)
    sent = []
    for raw in mock_es.requests:
        lines = raw.decode().rstrip("\n").split("\n")
        sent += [json.loads(lines[i])["index"]["_id"]
                 for i in range(0, len(lines), 2)]
    assert sorted(sent, key=int) == sorted(
        [str(i) for i in range(20)] + ["3"], key=int)


def test_item_count_mismatch_fails_loudly(mock_es, monkeypatch):
    """A server answering with fewer item verdicts than actions is a
    broken proxy; truncating the zip would silently drop documents from
    the accounting — the client must raise instead."""
    orig = MockEs.do_POST

    def broken(self):
        raw = self.rfile.read(int(self.headers["Content-Length"]))
        self.server.requests.append(raw)
        self._send(200, {"took": 1, "errors": True,
                         "items": [{"index": {"_id": "1", "status": 429}}]})

    monkeypatch.setattr(MockEs, "do_POST", broken)
    try:
        with pytest.raises(RuntimeError, match="item verdicts"):
            _client(mock_es).bulk(_body(1, 2, 3))
    finally:
        monkeypatch.setattr(MockEs, "do_POST", orig)
