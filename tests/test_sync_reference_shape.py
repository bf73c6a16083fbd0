"""Reference-parity tests for the sync pipelines, with fixture shapes
modeled on the reference's own unit fixtures
(/root/reference/tests/conftest.py:8-83: 2 tickets, labels attached to
ticket 1, 2-row dims) plus the hard cases the reference never tested:
soft-deleted rows everywhere, (ticketId, createdAt) ties, invalid JSON,
missing dims (left-join null side), and modules with/without parents.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from sql_database_to_elastic_datalake_spark import sync
from sql_database_to_elastic_datalake_spark.schemas import ENTITY_SCHEMAS


def _df(spark, entity, rows):
    schema = ENTITY_SCHEMAS[entity]
    names = [f.name for f in schema.fields]
    data = [tuple(r.get(n) for n in names) for r in rows]
    return spark.createDataFrame(data, schema)

TS = "2026-01-01T00:00:00"
T0 = dt.datetime(2024, 1, 1)


def _base(i, deleted=False):
    return dict(
        createdAt=T0,
        updatedAt=None,
        deletedAt=(T0 if deleted else None),
    )


@pytest.fixture(scope="module")
def entities(spark):
    tickets = _df(spark, "Ticket",
        [
            dict(id="t1", number=1001, scheduleDate=None, scheduleDateEnd=None,
                data='{"key": "value1"}', parentId=None, dataSourceId="d1",
                moduleId="m1", userId="u1", **_base(1)),
            dict(id="t2", number=1002, scheduleDate=None, scheduleDateEnd=None,
                data="not json", parentId=None, dataSourceId="d2",
                moduleId="m2", userId=None, **_base(2)),
            dict(id="t3", number=1003, scheduleDate=None, scheduleDateEnd=None,
                data=None, parentId=None, dataSourceId="d1", moduleId="m1",
                userId="u1", **_base(3, deleted=True)),
        ]
    )
    ticket_status = _df(spark, "TicketStatus",
        [
            dict(id="ts1", ticketId="t1", statusId="s1",
                createdAt=T0, updatedAt=None, deletedAt=None),
            # tie on createdAt with ts3 — id tie-break must pick ts3
            dict(id="ts2", ticketId="t1", statusId="s1",
                createdAt=T0 + dt.timedelta(hours=1), updatedAt=None, deletedAt=None),
            dict(id="ts3", ticketId="t1", statusId="s2",
                createdAt=T0 + dt.timedelta(hours=1), updatedAt=None, deletedAt=None),
            # newest status for t1 is soft-deleted → must be ignored
            dict(id="ts4", ticketId="t1", statusId="s1",
                createdAt=T0 + dt.timedelta(hours=2), updatedAt=None,
                deletedAt=T0),
        ]
    )
    status = _df(spark, "Status",
        [
            dict(id="s1", name="Open", isFinalStatus=False, description=None,
                moduleId="m1", isVisible=True, **_base(1)),
            dict(id="s2", name="Closed", isFinalStatus=True, description=None,
                moduleId="m1", isVisible=True, **_base(2)),
        ]
    )
    label = _df(spark, "Label",
        [
            dict(id="l1", name="Bug", description=None, moduleId="m1",
                color="red", icon=None, type="TEXT", isVisible=True, **_base(1)),
            dict(id="l2", name="Feature", description=None, moduleId="m1",
                color=None, icon=None, type="TEXT", isVisible=True, **_base(2)),
            dict(id="l3", name="Chore", description=None, moduleId=None,
                color="blue", icon=None, type="TEXT", isVisible=True, **_base(3)),
        ]
    )
    ticket_label = _df(spark, "TicketLabel",
        [
            dict(id="tl1", ticketId="t1", labelId="l2", **_base(1)),
            dict(id="tl2", ticketId="t1", labelId="l1", **_base(2)),
            dict(id="tl3", ticketId="t2", labelId="l3", **_base(3)),
            # soft-deleted attachment must not surface
            dict(id="tl4", ticketId="t2", labelId="l1", **_base(4, deleted=True)),
        ]
    )
    module = _df(spark, "Module",
        [
            dict(id="m1", name="Root", description=None, type="CORE",
                parentId=None, icon=None, logo=None, **_base(1)),
            dict(id="m2", name="Child", description=None, type="SUB",
                parentId="m1", icon=None, logo=None, **_base(2)),
            dict(id="m3", name="Orphan", description=None, type="SUB",
                parentId="missing", icon=None, logo=None, **_base(3)),
        ]
    )
    user = _df(spark, "User",
        [
            dict(id="u1", name="User One", username="one", email="one@x.io",
                password="p", preferences='{"theme": "dark"}', **_base(1)),
            dict(id="u2", name="Gone", username="gone", email="gone@x.io",
                password="p", preferences=None, **_base(2, deleted=True)),
        ]
    )
    data_source = _df(spark, "DataSource",
        [
            dict(id="d1", name="DS One", description=None, dataMap=None,
                entityName="e1", coverVisibleData=None, gatewayType="API",
                gatewayId=None, moduleId="m1", statusId="s1",
                voidStatusId=None, dailyLimit=10, wipEnabled=False,
                wipValue=None, **_base(1)),
            dict(id="d2", name="DS Two", description=None, dataMap='{"a":1}',
                entityName="e2", coverVisibleData=None, gatewayType="DB",
                gatewayId=None, moduleId="m2", statusId="s2",
                voidStatusId=None, dailyLimit=None, wipEnabled=True,
                wipValue=3, **_base(2)),
        ]
    )
    return dict(
        Ticket=tickets, TicketStatus=ticket_status, Status=status,
        Label=label, TicketLabel=ticket_label, Module=module, User=user,
        DataSource=data_source,
    )


def test_entity_syncs_shape_and_soft_delete(spark, entities):
    out = sync.sync_all_tables(entities, TS)
    users = out["users"].collect()
    assert {r["user_id"] for r in users} == {"u1"}  # u2 soft-deleted
    assert users[0]["document_id"] == f"u1_{TS}"
    assert users[0]["indexed_at"] == TS

    ds = {r["data_source_id"]: r for r in out["data_sources"].collect()}
    assert ds["d1"]["data_source_dailyLimit"] == 10
    assert ds["d2"]["data_source_dataMap"] == '{"a":1}'

    sts = {r["status_id"]: r for r in out["statuses"].collect()}
    assert sts["s2"]["status_isFinalStatus"] is True

    lbl = {r["label_id"]: r for r in out["labels"].collect()}
    assert lbl["l3"]["label_moduleId"] is None and lbl["l2"]["label_color"] is None


def test_module_nesting_and_parent(spark, entities):
    out = sync.sync_all_tables(entities, TS)
    mods = {r["module_id"]: r for r in out["modules"].collect()}
    assert [s["id"] for s in mods["m1"]["statuses"]] == ["s1", "s2"]
    assert [l["id"] for l in mods["m1"]["labels"]] == ["l1", "l2"]
    assert [d["id"] for d in mods["m1"]["data_sources"]] == ["d1"]
    assert mods["m2"]["statuses"] == []  # empty list, not null
    assert mods["m2"]["parent_module_id"] == "m1"
    assert mods["m2"]["parent_module_name"] == "Root"
    # parentId pointing nowhere → both parent fields null (reference only
    # sets them when the parent row exists)
    assert mods["m3"]["parent_module_id"] is None
    assert mods["m3"]["parent_module_name"] is None


def test_denormalized_tickets_full_semantics(spark, entities):
    out = sync.sync_all_tables(entities, TS)["denormalized_tickets"]
    rows = out.collect()
    # soft-deleted t3 excluded; ordered by ticket_number
    assert [r["ticket_id"] for r in rows] == ["t1", "t2"]
    t1, t2 = rows

    # latest ALIVE status wins; tie on createdAt broken by id desc → ts3
    assert t1["status_id"] == "s2" and t1["status_name"] == "Closed"
    assert t1["isFinalStatus"] is True

    # labels: id-sorted structs, soft-deleted attachment dropped
    assert [(l["id"], l["name"], l["color"]) for l in t1["labels"]] == [
        ("l1", "Bug", "red"), ("l2", "Feature", None),
    ]
    assert [(l["id"], l["name"]) for l in t2["labels"]] == [("l3", "Chore")]

    # dims + null left-join side
    assert t1["module_name"] == "Root" and t1["datasource_name"] == "DS One"
    assert t1["user_email"] == "one@x.io"
    assert t2["user_id"] is None and t2["user_name"] is None

    # raw JSON preserved (invalid JSON passes through untouched)
    assert t1["ticket_data"] == '{"key": "value1"}'
    assert t2["ticket_data"] == "not json"

    assert t1["document_id"] == f"t1_{TS}"


def test_point_resync_matches_full(spark, entities):
    full = sync.denormalize_tickets(
        entities["Ticket"], entities["TicketStatus"], entities["Status"],
        entities["Module"], entities["DataSource"], entities["User"],
        entities["TicketLabel"], entities["Label"], TS,
    ).filter("ticket_id = 't1'").collect()
    point = sync.denormalize_tickets(
        entities["Ticket"], entities["TicketStatus"], entities["Status"],
        entities["Module"], entities["DataSource"], entities["User"],
        entities["TicketLabel"], entities["Label"], TS, ticket_id="t1",
    ).collect()
    assert [tuple(r) for r in point] == [tuple(r) for r in full]


def test_flagship_sort_is_opt_in(spark, entities):
    """Scale default: no global range-partition sort of the wide output
    (the consumer is a lake write; cluster_by on write gives the same
    locality). ordered=True restores the reference's ORDER BY t.number
    and is what sync_all_tables pins for byte-parity."""
    args = (
        entities["Ticket"], entities["TicketStatus"], entities["Status"],
        entities["Module"], entities["DataSource"], entities["User"],
        entities["TicketLabel"], entities["Label"], TS,
    )
    plan_off = sync.denormalize_tickets(*args)._jdf.queryExecution().toString()
    assert "rangepartitioning(ticket_number" not in plan_off.lower()
    plan_on = sync.denormalize_tickets(
        *args, ordered=True
    )._jdf.queryExecution().toString()
    assert "rangepartitioning(ticket_number" in plan_on.lower()
    # same rows either way
    rows_off = sorted(
        map(tuple, sync.denormalize_tickets(*args).collect())
    )
    rows_on = sorted(
        map(tuple, sync.denormalize_tickets(*args, ordered=True).collect())
    )
    assert rows_off == rows_on


def test_output_matches_declared_schema(spark, entities):
    from sql_database_to_elastic_datalake_spark.schemas import (
        DENORMALIZED_TICKET_SCHEMA,
    )

    out = sync.sync_all_tables(entities, TS)["denormalized_tickets"]
    declared = [f.name for f in DENORMALIZED_TICKET_SCHEMA.fields]
    assert out.columns == declared
