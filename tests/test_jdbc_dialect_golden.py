"""Dialect golden tests for the JDBC extraction layer.

No live database exists in this harness, so the execution-grade evidence
for S1/S2/S3/F12 is string parity: the exact identifiers, dbtable
strings, remote queries, and partition predicates we generate for
PostgreSQL and MySQL, pinned against the reference's semantics
(/root/reference/src/db_connector.py:66-103 quoting, :135-223 per-entity
getters, :231-246 schema search path).
"""

from __future__ import annotations

import pytest

from sql_database_to_elastic_datalake_spark.sources.jdbc import (
    JdbcSource,
    TABLES_TO_SYNC,
    entity_query_sql,
    hash_partition_predicates,
    qualified_table,
    quote_identifier,
    range_partition_options,
    resolve_table_schema,
)


# -- F12: identifier quoting (db_connector.py:74-77,83-86) -----------------

def test_quote_identifier_golden():
    assert quote_identifier("Ticket", "postgresql") == '"Ticket"'
    assert quote_identifier("Ticket", "mysql") == "`Ticket`"
    # embedded quote chars are doubled, not stripped
    assert quote_identifier('we"ird', "postgresql") == '"we""ird"'
    assert quote_identifier("we`ird", "mysql") == "`we``ird`"
    with pytest.raises(ValueError):
        quote_identifier("t", "oracle")


# -- dbtable strings: copy schema vs default (db_connector.py:75,77,84,86) --

def test_qualified_table_golden():
    assert qualified_table("Ticket", "copy", "postgresql") == '"copy"."Ticket"'
    assert qualified_table("Ticket", "copy", "mysql") == "`copy`.`Ticket`"
    assert qualified_table("Ticket", None, "postgresql") == '"Ticket"'
    assert qualified_table("Ticket", None, "mysql") == "`Ticket`"


# -- S1: per-entity getter remote queries (db_connector.py:135-223) --------

def test_entity_query_postgresql_golden():
    for table in ("DataSource", "User", "Module", "Status", "Label"):
        assert entity_query_sql(table, "copy", "postgresql") == (
            f'SELECT * FROM "copy"."{table}" WHERE "deletedAt" IS NULL'
        )
    # default-schema fallback path
    assert entity_query_sql("User", None, "postgresql") == (
        'SELECT * FROM "User" WHERE "deletedAt" IS NULL'
    )
    # tables without soft delete scan clean
    assert entity_query_sql("TicketStatus", "copy", "postgresql",
                            soft_delete_col=None) == (
        'SELECT * FROM "copy"."TicketStatus"'
    )


def test_entity_query_mysql_golden():
    """Reference bug deliberately not reproduced: it interpolates a
    PostgreSQL-quoted "deletedAt" into MySQL SQL, where double quotes
    delimit strings under default sql_mode — 'deletedAt' IS NULL is then
    comparing a constant, never NULL, so deleted rows leak into the sync.
    We emit backtick quoting."""
    assert entity_query_sql("User", "copy", "mysql") == (
        "SELECT * FROM `copy`.`User` WHERE `deletedAt` IS NULL"
    )
    assert entity_query_sql("User", None, "mysql") == (
        "SELECT * FROM `User` WHERE `deletedAt` IS NULL"
    )


# -- S2: partitioned parallel extraction ------------------------------------

def test_range_partition_options_golden():
    assert range_partition_options("id", 1, 1_000_001, 16) == {
        "partitionColumn": "id",
        "lowerBound": "1",
        "upperBound": "1000001",
        "numPartitions": "16",
    }


def test_hash_partition_predicates_golden():
    pg = hash_partition_predicates('"id"::text', 4, "postgresql")
    assert pg == [
        '(hashtext("id"::text) & 2147483647) % 4 = 0',
        '(hashtext("id"::text) & 2147483647) % 4 = 1',
        '(hashtext("id"::text) & 2147483647) % 4 = 2',
        '(hashtext("id"::text) & 2147483647) % 4 = 3',
    ]
    my = hash_partition_predicates("`id`", 2, "mysql")
    assert my == ["crc32(`id`) % 2 = 0", "crc32(`id`) % 2 = 1"]
    with pytest.raises(ValueError):
        hash_partition_predicates("id", 2, "sqlite")


# -- S3 + search path: copy first, default fallback (231-246) ---------------

def test_resolve_table_schema_copy_then_default():
    available = {
        "copy": {"Ticket", "Status"},
        None: {"Ticket", "User"},
    }
    path = ("copy", None)
    assert resolve_table_schema(available, "Ticket", path) == "copy"
    assert resolve_table_schema(available, "User", path) is None
    with pytest.raises(LookupError):
        resolve_table_schema(available, "Label", path)


def test_catalog_tables_query_golden():
    from sql_database_to_elastic_datalake_spark.sources.jdbc import (
        catalog_tables_query,
    )

    want = ("SELECT table_schema AS table_schema, table_name AS table_name "
            "FROM information_schema.tables WHERE table_type = 'BASE TABLE'")
    assert catalog_tables_query("postgresql") == want
    assert catalog_tables_query("mysql") == want
    with pytest.raises(ValueError):
        catalog_tables_query("sqlite")


# -- reader options carry the dialect-correct dbtable ------------------------

def test_reader_options_dbtable_golden():
    src = JdbcSource(
        url="jdbc:postgresql://db:5432/app",
        user="u",
        password="p",
        dialect="postgresql",
    )
    opts = src.reader_options(qualified_table("Ticket", "copy", src.dialect))
    assert opts["dbtable"] == '"copy"."Ticket"'
    assert opts["url"] == "jdbc:postgresql://db:5432/app"
    assert opts["fetchsize"] == "10000"

    my = JdbcSource(
        url="jdbc:mysql://db:3306/app", user="u", password="p", dialect="mysql"
    )
    assert my.reader_options(
        qualified_table("Ticket", "copy", my.dialect)
    )["dbtable"] == "`copy`.`Ticket`"


def test_sync_allowlist_matches_reference():
    """db_connector.py:15-18 — the eight entities, exactly."""
    assert TABLES_TO_SYNC == (
        "Ticket", "TicketStatus", "TicketLabel", "Status",
        "Label", "Module", "User", "DataSource",
    )
