"""Join-field query family (r14, r13 verdict #3): has_child /
has_parent / parent_id rewritten into semi-join flag columns over the
lake's declared parent/child relation (plans/join_field.py).

Reference surface: the reference forwards search bodies verbatim to a
real ES 8.11 (/root/reference/src/search_api.py:38-46) whose join
field relates parent and child documents; this lake stores the
relation as the orders ↔ lineitem table pair.
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F  # noqa: F401

from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError


@pytest.fixture()
def service(spark, tmp_path):
    from sql_database_to_elastic_datalake_spark.api import LakeService

    svc = LakeService(spark, str(tmp_path))
    # a small orders/lineitem pair under the lake prefix — the
    # relation resolves by SUFFIX, so data_lake_orders ↔
    # data_lake_lineitem works like bare orders ↔ lineitem
    spark.createDataFrame(
        [(1, "1-URGENT", 100.0), (2, "2-HIGH", 900.0),
         (3, "1-URGENT", 900.0), (4, "5-LOW", 50.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_orders"))
    spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 60.0), (2, 1, 70.0), (2, 2, 80.0),
         (2, 3, 90.0), (3, 1, 5.0), (None, 9, 99.0)],
        "l_orderkey long, l_linenumber long, l_quantity double",
    ).write.parquet(os.path.join(svc.lake_dir, "data_lake_lineitem"))
    return svc


@pytest.fixture()
def client(service):
    flask = pytest.importorskip("flask")  # noqa: F841
    from sql_database_to_elastic_datalake_spark.api import create_app

    app = create_app(service)
    app.testing = True
    return app.test_client()


def _ids(out):
    return sorted(h["_source"]["o_orderkey"]
                  for h in out["hits"]["hits"])


def test_has_child_membership_and_bool_composition(service):
    # orders with any lineitem of quantity > 50: orders 1 (60) and 2
    out = service.advanced_search("data_lake_orders", {"has_child": {
        "type": "lineitem",
        "query": {"range": {"l_quantity": {"gt": 50}}}}})
    assert _ids(out) == [1, 2]
    # flags never leak into the response envelope
    assert all(not k.startswith("__jf")
               for h in out["hits"]["hits"] for k in h["_source"])
    # must_not = the anti-join: orders with NO such lineitem
    out = service.advanced_search("data_lake_orders", {"bool": {
        "must_not": [{"has_child": {
            "type": "lineitem",
            "query": {"range": {"l_quantity": {"gt": 50}}}}}]}})
    assert _ids(out) == [3, 4]
    # composing with an ordinary leaf in the same bool
    out = service.advanced_search("data_lake_orders", {"bool": {
        "must": [
            {"has_child": {"type": "lineitem",
                           "query": {"match_all": {}}}},
            {"term": {"o_orderpriority": "1-URGENT"}},
        ]}})
    assert _ids(out) == [1, 3]


def test_has_child_min_max_children(service):
    out = service.advanced_search("data_lake_orders", {"has_child": {
        "type": "lineitem", "query": {"match_all": {}},
        "min_children": 2}})
    assert _ids(out) == [1, 2]
    out = service.advanced_search("data_lake_orders", {"has_child": {
        "type": "lineitem", "query": {"match_all": {}},
        "min_children": 2, "max_children": 2}})
    assert _ids(out) == [1]
    with pytest.raises(DslError, match="min_children"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "lineitem", "query": {"match_all": {}},
            "min_children": -1}})


def test_has_parent_and_parent_id(service):
    out = service.advanced_search("data_lake_lineitem", {"has_parent": {
        "parent_type": "orders",
        "query": {"term": {"o_orderpriority": "1-URGENT"}}}})
    got = sorted((h["_source"]["l_orderkey"],
                  h["_source"]["l_linenumber"])
                 for h in out["hits"]["hits"])
    assert got == [(1, 1), (1, 2), (3, 1)]
    # parent_id: pure equality on the carried key — ES's string id
    # coerces onto the numeric key column
    out = service.advanced_search("data_lake_lineitem", {"parent_id": {
        "type": "lineitem", "id": "2"}})
    got = sorted(h["_source"]["l_linenumber"]
                 for h in out["hits"]["hits"])
    assert got == [1, 2, 3]


def test_named_400s(service):
    # unknown relation type
    with pytest.raises(DslError, match="no join-field relation"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "nosuch", "query": {"match_all": {}}}})
    # ignore_unmapped tolerates it (zero hits, no error)
    out = service.advanced_search("data_lake_orders", {"has_child": {
        "type": "nosuch", "query": {"match_all": {}},
        "ignore_unmapped": True}})
    assert out["hits"]["hits"] == []
    # has_child against the CHILD table (wrong side)
    with pytest.raises(DslError, match="no join-field relation"):
        service.advanced_search("data_lake_lineitem", {"has_child": {
            "type": "lineitem", "query": {"match_all": {}}}})
    # score shapes that need ES's scoring joins are named 400s
    with pytest.raises(DslError, match="score_mode"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "lineitem", "query": {"match_all": {}},
            "score_mode": "max"}})
    with pytest.raises(DslError, match="score"):
        service.advanced_search("data_lake_lineitem", {"has_parent": {
            "parent_type": "orders", "query": {"match_all": {}},
            "score": True}})
    with pytest.raises(DslError, match="inner_hits"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "lineitem", "query": {"match_all": {}},
            "inner_hits": {}}})
    with pytest.raises(DslError, match="requires a query"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "lineitem"}})
    with pytest.raises(DslError, match="unsupported has_child"):
        service.advanced_search("data_lake_orders", {"has_child": {
            "type": "lineitem", "query": {"match_all": {}},
            "bogus": 1}})


def test_non_search_entry_points_reject_by_name(service):
    """compile_dsl paths without the rewrite (delete_by_query etc.)
    name the gap instead of the generic unsupported-kind error."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        compile_dsl,
    )

    with pytest.raises(DslError, match="join-field"):
        compile_dsl({"has_child": {"type": "lineitem",
                                   "query": {"match_all": {}}}})
    with pytest.raises(DslError, match="join-field"):
        compile_dsl({"parent_id": {"type": "lineitem", "id": "1"}})


def test_rest_route_and_aggs_scope(client, service):
    r = client.post("/search/advanced", data=json.dumps({
        "table": "data_lake_orders",
        "query": {"has_child": {
            "type": "lineitem",
            "query": {"range": {"l_quantity": {"gt": 50}}}}},
        "aggs": {"by_prio": {"terms": {"field": "o_orderpriority"}}},
    }), content_type="application/json")
    assert r.status_code == 200, r.get_json()
    body = r.get_json()
    assert sorted(h["_source"]["o_orderkey"]
                  for h in body["hits"]["hits"]) == [1, 2]
    # aggs see the has_child-matched scope
    buckets = {b["key"]: b["doc_count"]
               for b in body["aggregations"]["by_prio"]["buckets"]}
    assert buckets == {"1-URGENT": 1, "2-HIGH": 1}
    # a leaf body that merely shares a join-field name walks through
    r = client.post("/search/advanced", data=json.dumps({
        "table": "data_lake_orders",
        "query": {"exists": {"field": "has_child"}}}),
        content_type="application/json")
    assert r.status_code == 200
    assert r.get_json()["hits"]["hits"] == []


def test_children_and_parent_aggs(service):
    """r14 (r13 verdict stretch #8): children/parent agg kinds —
    scope-switch across the declared relation, sub-aggs over the
    switched frame, named 400s without relation context."""
    out = service.advanced_search(
        "data_lake_orders",
        {"term": {"o_orderpriority": "1-URGENT"}}, k=0,
        aggs={"kids": {"children": {"type": "lineitem"},
                       "aggs": {"q": {"sum": {
                           "field": "l_quantity"}}}}})
    kids = out["aggregations"]["kids"]
    # orders 1 and 3 -> lineitems (1,1),(1,2),(3,1): 10+60+5
    assert kids["doc_count"] == 3
    assert kids["q"]["value"] == 75.0
    # parent agg: children matching quantity > 50 -> their orders
    out = service.advanced_search(
        "data_lake_lineitem",
        {"range": {"l_quantity": {"gt": 50}}}, k=0,
        aggs={"par": {"parent": {"type": "lineitem"},
                      "aggs": {"p": {"max": {
                          "field": "o_totalprice"}}}}})
    par = out["aggregations"]["par"]
    assert par["doc_count"] == 2  # orders 1 and 2, deduped
    assert par["p"]["value"] == 900.0
    # r15: metric-only sub-aggs ride ONE fused job with doc_count; a
    # BUCKET sub-agg must still take the recursive (unfused) path and
    # produce the same envelope shape
    out = service.advanced_search(
        "data_lake_orders",
        {"term": {"o_orderpriority": "1-URGENT"}}, k=0,
        aggs={"kids": {"children": {"type": "lineitem"},
                       "aggs": {"by_line": {"terms": {
                           "field": "l_linenumber"}}}}})
    kids = out["aggregations"]["kids"]
    assert kids["doc_count"] == 3
    got = {b["key"]: b["doc_count"]
           for b in kids["by_line"]["buckets"]}
    assert got == {1: 2, 2: 1}
    # named 400s
    from sql_database_to_elastic_datalake_spark.plans.es_aggs import (
        run_aggs,
    )

    with pytest.raises(DslError, match="table context"):
        run_aggs(service.spark.range(1), {"kids": {
            "children": {"type": "lineitem"}}})
    with pytest.raises(DslError, match="no join-field relation"):
        service.advanced_search(
            "data_lake_lineitem", {"match_all": {}}, k=0,
            aggs={"kids": {"children": {"type": "lineitem"}}})
    with pytest.raises(DslError, match="options"):
        service.advanced_search(
            "data_lake_orders", {"match_all": {}}, k=0,
            aggs={"kids": {"children": {"type": "lineitem",
                                        "x": 1}}})


def test_same_relation_leaves_share_one_join(spark):
    """r15 (guide §2.4): two join-field leaves on the same
    (sibling, src, dst) fold into ONE qualifying-key pass and ONE
    flag join — the physical plan must carry exactly one join for
    the two-leaf bool, and the flags stay TRUE-or-NULL so must_not
    composes unchanged."""
    import os

    from pyspark.sql import functions as F

    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        compile_dsl,
    )
    from sql_database_to_elastic_datalake_spark.plans.join_field import (
        rewrite_join_field,
    )
    from sql_database_to_elastic_datalake_spark.sources.parquet import (
        load_table,
    )

    sf = "/root/testdata/sf0.01"
    lineitem = load_table(spark, sf, "lineitem")
    dsl = {"bool": {
        "must": [{"has_parent": {
            "parent_type": "orders",
            "query": {"term": {"o_orderpriority": "1-URGENT"}}}}],
        "must_not": [{"has_parent": {
            "parent_type": "orders",
            "query": {"range": {"o_totalprice": {"gt": 250000}}}}}],
    }}
    df, rewritten, flags = rewrite_join_field(
        lineitem, dsl, "lineitem", lambda n: load_table(spark, sf, n))
    assert len(flags) == 2
    out = df.filter(compile_dsl(rewritten, schema_fields=df.schema))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ShuffledHashJoin") == 1
    # equivalence against the two-sided SQL the oracle uses
    got = {(r["l_orderkey"], r["l_linenumber"])
           for r in out.select("l_orderkey", "l_linenumber").collect()}
    orders = load_table(spark, sf, "orders")
    urgent = {r["o_orderkey"] for r in orders.filter(
        F.col("o_orderpriority") == "1-URGENT").collect()}
    big = {r["o_orderkey"] for r in orders.filter(
        F.col("o_totalprice") > 250000).collect()}
    want = {(r["l_orderkey"], r["l_linenumber"])
            for r in lineitem.select("l_orderkey", "l_linenumber")
            .collect()
            if r["l_orderkey"] in urgent and r["l_orderkey"] not in big}
    assert got == want
