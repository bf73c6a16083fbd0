"""Reference-shaped entity sync pipelines: the ``sync_all_tables`` surface.

Each function reproduces one entity sync of the reference
(/root/reference/src/data_sync.py) as a pure ``DataFrame -> DataFrame``
transform producing byte-compatible output columns:

  * data sources  — /root/reference/src/data_sync.py:93-115
  * users         — /root/reference/src/data_sync.py:259-272
  * modules       — /root/reference/src/data_sync.py:494-521 (nested
    statuses/labels/data_sources built at :436-461; parent lookup :509-514)
  * statuses      — /root/reference/src/data_sync.py:666-680
  * labels        — /root/reference/src/data_sync.py:827-843
  * denormalized tickets — /root/reference/src/ticket_sync.py:95-139 over
    the SQL at /root/reference/src/db_connector.py:261-300

What dissolves versus the reference: the per-row ``iterrows`` loops, the
UUID/NaT/NaN sanitize layer (~170 LoC — native SQL NULL + casts), the
batch clamp (min(batch,50)) and the double JSON serialization check —
all replaced by one declarative plan per entity. The soft-delete
contract (``deletedAt IS NULL`` on every read, including join branches:
/root/reference/src/db_connector.py:142,267,293,371) is applied here
explicitly.

Determinism: nested arrays are sorted by id; the latest-status window
orders by (createdAt, id) — the reference's Postgres ``DISTINCT ON``
leaves ties to plan order (SURVEY.md §7.3 #1), which we refuse to
reproduce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.functions.scalar import document_id
from sql_database_to_elastic_datalake_spark.operators.dedup_window import (
    latest_event_per_key,
)


def _alive(df: DataFrame) -> DataFrame:
    """Soft-delete filter (P1) — every reference read applies it."""
    return df.filter(F.col("deletedAt").isNull()) if "deletedAt" in df.columns else df


def _stamp(df: DataFrame, id_out: str, indexed_at: str) -> DataFrame:
    """History columns: per-run literal indexed_at + versioned doc id
    (/root/reference/src/data_sync.py:110-115)."""
    ts = F.lit(indexed_at)
    return df.withColumn("indexed_at", ts).withColumn(
        "document_id", document_id(F.col(id_out), ts)
    )


def _rename(mapping: dict[str, tuple[str, bool]]) -> list[Column]:
    """mapping: source col -> (output name, cast_to_string)."""
    cols = []
    for src, (out, stringify) in mapping.items():
        c = F.col(src)
        if stringify:
            c = c.cast("string")
        cols.append(c.alias(out))
    return cols


def sync_data_sources(data_sources: DataFrame, indexed_at: str) -> DataFrame:
    mapping = {
        "id": ("data_source_id", True),
        "name": ("data_source_name", False),
        "description": ("data_source_description", False),
        "dataMap": ("data_source_dataMap", False),
        "entityName": ("data_source_entityName", False),
        "coverVisibleData": ("data_source_coverVisibleData", False),
        "gatewayType": ("data_source_gatewayType", False),
        "gatewayId": ("data_source_gatewayId", False),
        "moduleId": ("data_source_moduleId", True),
        "statusId": ("data_source_statusId", True),
        "voidStatusId": ("data_source_voidStatusId", True),
        "dailyLimit": ("data_source_dailyLimit", False),
        "wipEnabled": ("data_source_wipEnabled", False),
        "wipValue": ("data_source_wipValue", False),
        "createdAt": ("data_source_createdAt", False),
        "updatedAt": ("data_source_updatedAt", False),
    }
    out = _alive(data_sources).select(*_rename(mapping))
    return _stamp(out, "data_source_id", indexed_at)


def sync_users(users: DataFrame, indexed_at: str) -> DataFrame:
    mapping = {
        "id": ("user_id", True),
        "name": ("user_name", False),
        "username": ("user_username", False),
        "email": ("user_email", False),
        "preferences": ("user_preferences", False),
        "createdAt": ("user_createdAt", False),
        "updatedAt": ("user_updatedAt", False),
    }
    out = _alive(users).select(*_rename(mapping))
    return _stamp(out, "user_id", indexed_at)


def sync_statuses(statuses: DataFrame, indexed_at: str) -> DataFrame:
    mapping = {
        "id": ("status_id", True),
        "name": ("status_name", False),
        "isFinalStatus": ("status_isFinalStatus", False),
        "description": ("status_description", False),
        "moduleId": ("status_moduleId", True),
        "isVisible": ("status_isVisible", False),
        "createdAt": ("status_createdAt", False),
        "updatedAt": ("status_updatedAt", False),
    }
    out = _alive(statuses).select(*_rename(mapping))
    return _stamp(out, "status_id", indexed_at)


def sync_labels(labels: DataFrame, indexed_at: str) -> DataFrame:
    mapping = {
        "id": ("label_id", True),
        "name": ("label_name", False),
        "description": ("label_description", False),
        "moduleId": ("label_moduleId", True),
        "color": ("label_color", False),
        "icon": ("label_icon", False),
        "type": ("label_type", False),
        "isVisible": ("label_isVisible", False),
        "createdAt": ("label_createdAt", False),
        "updatedAt": ("label_updatedAt", False),
    }
    out = _alive(labels).select(*_rename(mapping))
    return _stamp(out, "label_id", indexed_at)


def _group_children(child: DataFrame, cols: list[str]) -> DataFrame:
    """Children grouped per moduleId into an id-sorted array of structs
    (replaces the dict-grouping loops at
    /root/reference/src/data_sync.py:436-461)."""
    alive = _alive(child).filter(F.col("moduleId").isNotNull())
    return alive.groupBy("moduleId").agg(
        F.array_sort(
            F.collect_list(F.struct(*[F.col(c).cast("string").alias(c) if c == "id" else F.col(c) for c in cols]))
        ).alias("children")
    )


def sync_modules(
    modules: DataFrame,
    statuses: DataFrame | None,
    labels: DataFrame | None,
    data_sources: DataFrame | None,
    indexed_at: str,
) -> DataFrame:
    """Modules with nested children arrays and parent-module attributes."""
    alive = _alive(modules)
    out = alive.select(
        F.col("id").cast("string").alias("module_id"),
        F.col("name").alias("module_name"),
        F.col("description").alias("module_description"),
        F.col("type").alias("module_type"),
        F.col("icon").alias("module_icon"),
        F.col("logo").alias("module_logo"),
        F.col("createdAt").alias("module_createdAt"),
        F.col("updatedAt").alias("module_updatedAt"),
        F.col("parentId").cast("string").alias("_parentId"),
    )

    for child, out_col, cols in (
        (statuses, "statuses", ["id", "name", "isFinalStatus"]),
        (labels, "labels", ["id", "name", "color"]),
        (data_sources, "data_sources", ["id", "name", "entityName"]),
    ):
        if child is None:
            out = out.withColumn(out_col, F.array())
            continue
        grouped = _group_children(child, cols).select(
            F.col("moduleId").cast("string").alias("_cid"),
            F.col("children").alias(out_col),
        )
        out = out.join(
            F.broadcast(grouped), out["module_id"] == grouped["_cid"], "left"
        ).drop("_cid")
        # reference semantics: missing children -> empty list, not null
        out = out.withColumn(out_col, F.coalesce(F.col(out_col), F.array()))

    parents = alive.select(
        F.col("id").cast("string").alias("_pid"),
        F.col("name").alias("parent_module_name"),
    )
    out = (
        out.join(F.broadcast(parents), out["_parentId"] == parents["_pid"], "left")
        # existence-gated on the JOINED row (reference data_sync.py:
        # 509-514 checks 'if not parent_module.empty'): a parent that
        # exists with a NULL name keeps its id
        .withColumn(
            "parent_module_id",
            F.when(F.col("_pid").isNotNull(), F.col("_parentId")),
        )
        .drop("_pid", "_parentId")
    )
    return _stamp(out, "module_id", indexed_at)


def denormalize_tickets(
    tickets: DataFrame,
    ticket_status: DataFrame,
    status: DataFrame,
    module: DataFrame,
    data_source: DataFrame,
    user: DataFrame,
    ticket_label: DataFrame,
    label: DataFrame,
    indexed_at: str,
    ticket_id: str | None = None,
    ordered: bool = False,
) -> DataFrame:
    """The reference-shaped flagship: one Spark plan for
    /root/reference/src/db_connector.py:261-300 +
    /root/reference/src/ticket_sync.py:95-139.

    ``ticket_id`` narrows to one ticket (the point re-sync path, I1).

    ``ordered=True`` reproduces the reference's ``ORDER BY t.number``
    (db_connector.py:300) — which there only sequenced its write
    batches. Default is UNordered: a global range-partition sort of the
    wide output is the single most expensive no-op in the plan when the
    consumer is a lake write; ``sinks.writer.write_lake(...,
    cluster_by=("ticket_number",))`` gives the same at-rest locality
    without the extra exchange (same policy as ``denormalized_orders``).
    """
    t = _alive(tickets)
    if ticket_id is not None:
        t = t.filter(F.col("id") == F.lit(ticket_id))

    # CTE latest_status: Status joins INSIDE the DISTINCT ON (reference
    # db_connector.py:262-268) — candidates are only status rows that
    # RESOLVE, so a ticket whose newest TicketStatus references a
    # missing status falls back to its next-newest resolvable one
    # (joining after the latest-pick instead would NULL the whole
    # status). The reference filters ts.deletedAt only, not Status's —
    # mirrored (Status is a lookup there). id is the deterministic
    # tie-breaker (SURVEY §7.3 hard-part #1).
    ls = latest_event_per_key(
        _alive(ticket_status)
        .select("ticketId", "statusId", "createdAt", "id")
        .join(
            F.broadcast(
                status.select(
                    F.col("id").alias("_sid"),
                    F.col("name").alias("status_name"),
                    F.col("isFinalStatus"),
                )
            ),
            F.col("statusId") == F.col("_sid"),
            "inner",
        ),
        keys=["ticketId"],
        ts_col="createdAt",
        tie_breakers=["id"],
    ).select(
        F.col("ticketId").alias("_ls_ticketId"),
        F.col("statusId").cast("string").alias("status_id"),
        "status_name",
        "isFinalStatus",
    )

    # TicketLabel ⋈ Label grouped per ticket (id-sorted array of structs)
    tl = (
        _alive(ticket_label)
        .select("ticketId", "labelId")
        .join(
            # Label itself is unfiltered in the reference's labels query
            # (only tl.deletedAt, db_connector.py:367-371)
            F.broadcast(
                label.select(
                    F.col("id").alias("_lid"),
                    F.col("name").alias("name"),
                    F.col("color").alias("color"),
                )
            ),
            F.col("labelId") == F.col("_lid"),
            "inner",
        )
        .groupBy("ticketId")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("labelId").cast("string").alias("id"),
                        F.col("name"),
                        F.col("color"),
                    )
                )
            ).alias("labels")
        )
        .select(F.col("ticketId").alias("_lb_ticketId"), "labels")
    )

    # the reference's dim joins carry NO deletedAt filter (only the
    # Ticket WHERE does, db_connector.py:290-294) — lookup rows resolve
    # even when soft-deleted; mirrored for byte-parity
    m = module.select(
        F.col("id").alias("_mid"), F.col("name").alias("module_name")
    )
    ds = data_source.select(
        F.col("id").alias("_dsid"), F.col("name").alias("datasource_name")
    )
    u = user.select(
        F.col("id").alias("_uid"),
        F.col("name").alias("user_name"),
        F.col("email").alias("user_email"),
    )

    wide = (
        t.join(ls, t["id"] == ls["_ls_ticketId"], "left")
        .join(tl, t["id"] == tl["_lb_ticketId"], "left")
        .join(F.broadcast(m), t["moduleId"] == m["_mid"], "left")
        .join(F.broadcast(ds), t["dataSourceId"] == ds["_dsid"], "left")
        .join(F.broadcast(u), t["userId"] == u["_uid"], "left")
    )

    ts_lit = F.lit(indexed_at)
    out = (
        wide.select(
            F.col("id").cast("string").alias("ticket_id"),
            F.col("number").alias("ticket_number"),
            F.col("scheduleDate").alias("ticket_scheduleDate"),
            F.col("scheduleDateEnd").alias("ticket_scheduleDateEnd"),
            # raw JSON string kept; typed access goes through from_json
            # (the reference parses-or-warns per row,
            # /root/reference/src/ticket_sync.py:122-128)
            F.col("data").alias("ticket_data"),
            F.col("createdAt").alias("ticket_createdAt"),
            F.col("updatedAt").alias("ticket_updatedAt"),
            F.col("status_id"),
            F.col("status_name"),
            F.col("isFinalStatus"),
            # ids come from the joined dims (reference selects m.id /
            # ds.id / u.id): a dangling FK yields NULL id + NULL name,
            # never a non-NULL id the lake cannot resolve
            F.col("_mid").cast("string").alias("module_id"),
            F.col("module_name"),
            F.col("_dsid").cast("string").alias("datasource_id"),
            F.col("datasource_name"),
            F.col("_uid").cast("string").alias("user_id"),
            F.col("user_name"),
            F.col("user_email"),
            F.coalesce(F.col("labels"), F.array()).alias("labels"),
            ts_lit.alias("indexed_at"),
            document_id(F.col("id"), ts_lit).alias("document_id"),
        )
    )
    return out.orderBy("ticket_number") if ordered else out


def sync_all_tables(
    entities: dict[str, DataFrame], indexed_at: str
) -> dict[str, DataFrame]:
    """The full batch-sync surface (/root/reference/src/data_sync.py:923-934):
    every entity pipeline as one dict of output DataFrames, writable with
    :func:`..sinks.writer.write_lake` in snapshot or history mode."""
    # every per-entity pipeline is guarded the same way: a missing
    # source table skips its output (the previous mix of .get() for
    # modules' child lookups with hard ["Status"]/["Label"] indexing
    # two lines later crashed on exactly the partial-drop case the
    # .get() form was written to tolerate)
    out = {}
    if "DataSource" in entities:
        out["data_sources"] = sync_data_sources(entities["DataSource"], indexed_at)
    if "User" in entities:
        out["users"] = sync_users(entities["User"], indexed_at)
    if "Module" in entities:
        out["modules"] = sync_modules(
            entities["Module"],
            entities.get("Status"),
            entities.get("Label"),
            entities.get("DataSource"),
            indexed_at,
        )
    if "Status" in entities:
        out["statuses"] = sync_statuses(entities["Status"], indexed_at)
    if "Label" in entities:
        out["labels"] = sync_labels(entities["Label"], indexed_at)
    if "Ticket" in entities:
        out["denormalized_tickets"] = denormalize_tickets(
            entities["Ticket"],
            entities["TicketStatus"],
            entities["Status"],
            entities["Module"],
            entities["DataSource"],
            entities["User"],
            entities["TicketLabel"],
            entities["Label"],
            indexed_at,
            # the full batch-sync surface mirrors the reference byte-
            # for-byte, including its ORDER BY t.number write sequencing
            ordered=True,
        )
    return out
