"""LIVE execution of the JDBC extraction layer against embedded Derby.

The golden tests (`test_jdbc_dialect_golden.py`) pin the exact SQL the
layer composes for PostgreSQL/MySQL; until round 4 nothing EXECUTED the
layer, because the sandbox has no database server. It does, however,
ship one in-process: Spark's own Derby jars (the Hive-metastore
dependency) include the embedded JDBC driver, so `spark.read.jdbc`
against ``jdbc:derby:<dir>`` is a real remote-query round trip inside
the JVM — real type mapping, real predicate pushdown into the remote
WHERE, real per-predicate partitioned scans.

What this buys vs the golden tests: the option plumbing
(`JdbcSource.reader_options`, driver class via extra_options), the
soft-delete pushdown, the stride and predicate partitioning, and the
JDBC type round trip are all exercised through a live driver. Dialect
strings (PG hashtext / MySQL crc32) stay golden-tested — Derby has
neither function, so the predicates here use portable MOD arithmetic,
which is the `read_entity(predicates=...)` contract anyway (any SQL
boolean the remote engine accepts).
"""

from __future__ import annotations

import datetime as dt
import decimal
import os

import pytest

from sql_database_to_elastic_datalake_spark.sources.jdbc import (
    JdbcSource,
    range_partition_options,
    read_entity,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """One embedded Derby database seeded with a reference-shaped
    ``Ticket`` table (camelCase quoted identifiers, soft-deletes, mixed
    JDBC types) written through Spark's JDBC writer."""
    db = os.path.join(str(tmp_path_factory.mktemp("derby")), "db")
    url = f"jdbc:derby:{db};create=true"
    rows = [
        (i,
         f"t-{i:03d}",
         decimal.Decimal(i * 10) / 4,
         float(i) * 1.5,
         dt.datetime(2024, 1, 1 + i % 27, 12, 30, 15),
         dt.datetime(2024, 2, 1) if i % 5 == 0 else None,
         i % 3 == 0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "id bigint, name string, amount decimal(10,2), score double, "
        "createdAt timestamp, deletedAt timestamp, flag boolean",
    )
    (df.write.format("jdbc")
       .option("url", url).option("driver", DRIVER)
       .option("dbtable", '"Ticket"')
       .mode("overwrite").save())
    # Derby resolves unqualified names in a schema named after the
    # connection user; the writer connected user-less (schema APP), so
    # the reader must identify as APP — the kind of real-driver
    # behavior only a live test surfaces.
    src = JdbcSource(
        url=url, user="APP", password="",
        schema_search_path=(None,),
        extra_options={"driver": DRIVER},
    )
    return src, {r[0]: r for r in rows}


def test_live_roundtrip_types_and_soft_delete(spark, derby):
    src, seed = derby
    got = read_entity(spark, src, "Ticket", schema=None)
    rows = {r["id"]: r for r in got.collect()}
    alive = {i for i in seed if seed[i][5] is None}
    assert set(rows) == alive and len(alive) == 32
    r7 = rows[7]
    # exact type round trip through the live driver
    assert r7["name"] == "t-007"
    assert r7["amount"] == decimal.Decimal("17.50")
    assert r7["score"] == 10.5
    assert r7["createdAt"] == dt.datetime(2024, 1, 8, 12, 30, 15)
    assert r7["flag"] is False and rows[6]["flag"] is True


def test_live_soft_delete_pushed_to_remote_where(spark, derby):
    src, _ = derby
    plan = read_entity(spark, src, "Ticket", schema=None) \
        ._jdf.queryExecution().toString()
    # the filter must reach the JDBC relation as a pushed filter, not
    # run Spark-side after a full-table fetch
    assert "PushedFilters" in plan and "IsNull(deletedAt)" in plan


def test_live_stride_partitioned_scan(spark, derby):
    src, _ = derby
    got = read_entity(
        spark, src, "Ticket", schema=None,
        partition_options=range_partition_options("id", 0, 40, 4),
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 32  # soft-deletes filtered in every stripe


def test_live_predicate_partitioned_scan(spark, derby):
    """read_entity(predicates=...): one remote scan per predicate; the
    partition count IS the predicate count and the union is exact
    (MOD spread — the portable analog of the PG/MySQL hash spreads)."""
    src, _ = derby
    # quoted: the writer created case-exact quoted columns, and Derby
    # folds unquoted identifiers to upper case
    preds = [f'MOD("id", 3) = {i}' for i in range(3)]
    got = read_entity(
        spark, src, "Ticket", schema=None, predicates=preds,
    )
    assert got.rdd.getNumPartitions() == 3
    ids = sorted(r["id"] for r in got.collect())
    assert len(ids) == 32 and len(set(ids)) == 32


def test_live_point_filter_pushdown(spark, derby):
    from pyspark.sql import functions as F

    src, _ = derby
    got = read_entity(spark, src, "Ticket", schema=None).filter(
        F.col("id") == 8
    )
    plan = got._jdf.queryExecution().toString()
    assert "EqualTo(id,8)" in plan
    assert [r["name"] for r in got.collect()] == ["t-008"]


def test_live_copy_schema_search_path(spark, derby):
    """End-to-end copy-then-default resolution against the live
    catalog (reference src/db_connector.py:231-246): a 'copy'-schema
    Ticket must shadow the default-schema one; tables absent from
    'copy' fall back to the default schema. Until round 5 this was
    unit-tested on hand-built dicts only."""
    from sql_database_to_elastic_datalake_spark.sources.jdbc import (
        discover_tables,
        resolve_table_schema,
    )

    src, seed = derby
    # Derby DDL goes through a raw embedded connection (Spark's JDBC
    # writer only creates tables); schema 'copy' is case-exact quoted,
    # like the reference's lowercase copy schema on PostgreSQL
    conn = spark._jvm.java.sql.DriverManager.getConnection(src.url)
    st = conn.createStatement()
    try:
        st.execute('CREATE SCHEMA "copy"')
    except Exception:
        pass  # already created by a previous test run in this session
    finally:
        st.close()
        conn.close()

    copy_df = spark.createDataFrame(
        [(900, "copy-shadow", None), (901, "copy-gone",
                                      dt.datetime(2024, 3, 1))],
        "id bigint, name string, deletedAt timestamp",
    )
    (copy_df.write.format("jdbc")
        .option("url", src.url).option("driver", DRIVER)
        .option("dbtable", '"copy"."Ticket"')
        .mode("overwrite").save())
    # a second table that exists ONLY in the default schema
    (spark.createDataFrame([(1, "open")], "id bigint, name string")
        .write.format("jdbc")
        .option("url", src.url).option("driver", DRIVER)
        .option("dbtable", '"Status"').mode("overwrite").save())

    derby_catalog = (
        "SELECT s.SCHEMANAME AS table_schema, t.TABLENAME AS table_name "
        "FROM SYS.SYSTABLES t JOIN SYS.SYSSCHEMAS s "
        "ON t.SCHEMAID = s.SCHEMAID WHERE t.TABLETYPE = 'T'"
    )
    available = discover_tables(
        spark, src, query=derby_catalog, default_schema="APP"
    )
    assert "Ticket" in available["copy"]
    assert "Ticket" in available[None] and "Status" in available[None]

    # first-hit: Ticket resolves to the copy schema and reads ITS rows
    resolved = resolve_table_schema(available, "Ticket", ("copy", None))
    assert resolved == "copy"
    got = read_entity(spark, src, "Ticket", schema=resolved)
    assert {r["name"] for r in got.collect()} == {"copy-shadow"}

    # fallback: Status is absent from copy -> default schema content
    assert resolve_table_schema(available, "Status", ("copy", None)) is None
    got = read_entity(spark, src, "Status", schema=None,
                      soft_delete_col=None)
    assert [r["name"] for r in got.collect()] == ["open"]

    # absence stays loud end-to-end
    with pytest.raises(LookupError):
        resolve_table_schema(available, "Nope", ("copy", None))
