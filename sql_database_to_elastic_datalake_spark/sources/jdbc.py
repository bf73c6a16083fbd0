"""JDBC source: partitioned relational extraction.

Replaces the reference's extraction layer (SURVEY.md §2.1):
  * per-entity ``SELECT *`` getters with soft-delete filtering
    (S1: /root/reference/src/db_connector.py:135-223),
  * the O(n²) LIMIT/OFFSET pagination loop
    (S2: /root/reference/data_lake_sync.py:127-189),
  * allow-list table discovery (S3: /root/reference/src/db_connector.py:41-53),
  * per-dialect identifier quoting (F12: /root/reference/src/db_connector.py:66-103),
  * schema-search-path resolution — schema ``copy`` first, default
    schema as fallback (/root/reference/src/db_connector.py:231-246).

Spark-first: one ``spark.read.jdbc`` per table with either
``partitionColumn/lowerBound/upperBound/numPartitions`` (range stride)
or explicit ``predicates`` (one partition per predicate) — N parallel
keyset scans instead of a serial offset walk. Soft-delete and point
filters are plain ``.filter`` calls that Spark pushes into the remote
query (``pushDownPredicate`` is on by default).

This module has no live database in the harness; everything except the
final ``load()`` is pure plan/option construction and unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The reference's sync allow-list (/root/reference/src/db_connector.py:15-18).
TABLES_TO_SYNC = (
    "Ticket",
    "TicketStatus",
    "TicketLabel",
    "Status",
    "Label",
    "Module",
    "User",
    "DataSource",
)


def quote_identifier(name: str, dialect: str = "postgresql") -> str:
    """Dialect-correct identifier quoting: ``"t"`` for PostgreSQL,
    `` `t` `` for MySQL (F12 parity)."""
    if dialect == "postgresql":
        return '"' + name.replace('"', '""') + '"'
    if dialect == "mysql":
        return "`" + name.replace("`", "``") + "`"
    raise ValueError(f"unsupported dialect: {dialect}")


def qualified_table(
    table: str, schema: str | None, dialect: str = "postgresql"
) -> str:
    q = quote_identifier(table, dialect)
    return f"{quote_identifier(schema, dialect)}.{q}" if schema else q


@dataclass
class JdbcSource:
    """Connection + parallelism config for one source database."""

    url: str  # jdbc:postgresql://host:5432/db
    user: str
    password: str
    dialect: str = "postgresql"
    #: schema search path — resolved first-hit (reference resolves in
    #: schema 'copy' first, then the default schema).
    schema_search_path: tuple[str | None, ...] = ("copy", None)
    num_partitions: int = 16
    fetch_size: int = 10_000
    extra_options: dict[str, str] = field(default_factory=dict)

    def reader_options(self, dbtable: str) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": dbtable,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetch_size),
            **self.extra_options,
        }


def range_partition_options(
    partition_column: str, lower: int, upper: int, num_partitions: int
) -> dict[str, str]:
    """Options for stride-partitioned parallel extraction — the scalable
    replacement for LIMIT/OFFSET pagination."""
    return {
        "partitionColumn": partition_column,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
    }


def hash_partition_predicates(
    key_expr: str, num_partitions: int, dialect: str = "postgresql"
) -> list[str]:
    """Explicit per-partition predicates for keys with no usable numeric
    range (UUIDs — the reference's entities key on uuid). Each predicate
    becomes one remote scan; hashing the key spreads rows evenly.

    PostgreSQL: hashtext(); MySQL: crc32(). One predicate per partition.
    """
    if dialect == "postgresql":
        # & INT_MAX, not abs(): hashtext returns int4 and
        # abs(-2147483648) raises 'integer out of range' in PostgreSQL
        h = f"(hashtext({key_expr}) & 2147483647)"
    elif dialect == "mysql":
        h = f"crc32({key_expr})"
    else:
        raise ValueError(f"unsupported dialect: {dialect}")
    return [
        f"{h} % {num_partitions} = {i}" for i in range(num_partitions)
    ]


def read_entity(
    spark: SparkSession,
    source: JdbcSource,
    table: str,
    schema: str | None = None,
    partition_options: dict[str, str] | None = None,
    predicates: list[str] | None = None,
    soft_delete_col: str | None = "deletedAt",
) -> DataFrame:
    """Build the partitioned JDBC scan for one entity table.

    The soft-delete filter is applied as a DataFrame filter — Catalyst
    pushes it into the remote WHERE clause, exactly matching the
    reference's hand-embedded ``"deletedAt" IS NULL``
    (/root/reference/src/db_connector.py:139-143) without string SQL.
    """
    dbtable = qualified_table(table, schema, source.dialect)
    reader = spark.read.format("jdbc")
    for k, v in source.reader_options(dbtable).items():
        reader = reader.option(k, v)
    if partition_options:
        for k, v in partition_options.items():
            reader = reader.option(k, v)
    if predicates:
        # DataFrameReader.jdbc(predicates=...) path. extra_options
        # (driver class, SSL, ...) must ride along here too — building
        # props from only user/password/fetchsize silently dropped them
        # on this path while the .load() path applied them.
        props = {
            "user": source.user,
            "password": source.password,
            "fetchsize": str(source.fetch_size),
            **{k: str(v) for k, v in source.extra_options.items()},
        }
        df = spark.read.jdbc(
            source.url, dbtable, predicates=predicates, properties=props
        )
    else:
        df = reader.load()
    if soft_delete_col and soft_delete_col in df.columns:
        df = df.filter(F.col(soft_delete_col).isNull())
    return df


def entity_query_sql(
    table: str,
    schema: str | None = "copy",
    dialect: str = "postgresql",
    soft_delete_col: str | None = "deletedAt",
) -> str:
    """The exact remote query a per-entity extraction issues — what
    Spark's JDBC pushdown composes from ``dbtable`` + the soft-delete
    filter (and what the reference hand-embeds per getter,
    /root/reference/src/db_connector.py:135-223).

    Golden-tested per dialect in ``tests/test_jdbc_dialect_golden.py``.
    One deliberate divergence: the reference interpolates a hard-coded
    ``"deletedAt"`` even for MySQL, where double quotes are *string*
    delimiters under default sql_mode (the predicate silently compares
    two strings and filters nothing); we quote the column per dialect.
    """
    dbtable = qualified_table(table, schema, dialect)
    if not soft_delete_col:
        return f"SELECT * FROM {dbtable}"
    col = quote_identifier(soft_delete_col, dialect)
    return f"SELECT * FROM {dbtable} WHERE {col} IS NULL"


def resolve_table_schema(
    available: dict[str | None, set[str]],
    table: str,
    search_path: tuple[str | None, ...],
) -> str | None:
    """First schema in the search path containing ``table`` (the
    reference's copy-then-default resolution). Raises if absent."""
    for schema in search_path:
        if table in available.get(schema, set()):
            return schema
    raise LookupError(f"table {table!r} not found in schemas {search_path}")


def catalog_tables_query(dialect: str = "postgresql") -> str:
    """Catalog query returning ``(table_schema, table_name)`` rows for
    :func:`discover_tables` — the live half of the reference's
    existence probe (src/db_connector.py:231-246, which asks
    information_schema per table). One query for the whole catalog
    instead of a round trip per table."""
    if dialect in ("postgresql", "mysql"):
        return (
            "SELECT table_schema AS table_schema, table_name AS table_name "
            "FROM information_schema.tables WHERE table_type = 'BASE TABLE'"
        )
    raise ValueError(f"unsupported dialect: {dialect}")


def discover_tables(
    spark: SparkSession,
    source: JdbcSource,
    query: str | None = None,
    default_schema: str | None = None,
) -> dict[str | None, set[str]]:
    """Load the remote catalog into :func:`resolve_table_schema`'s
    ``available`` shape via one JDBC subquery scan.

    ``default_schema`` names the schema that unqualified reads resolve
    to on this connection (``public`` for PostgreSQL, the user schema
    for Derby); its tables are ALSO registered under ``None`` so a
    search path like ``("copy", None)`` finds them. ``query`` overrides
    the dialect default for engines with nonstandard catalogs (the live
    Derby test passes a SYS.SYSTABLES query).
    """
    q = query or catalog_tables_query(source.dialect)
    reader = spark.read.format("jdbc")
    for k, v in source.reader_options(f"({q}) cat").items():
        reader = reader.option(k, v)
    cat = reader.load()
    # engines fold unquoted aliases differently (Derby -> TABLE_SCHEMA);
    # resolve the two columns case-insensitively
    by_lower = {c.lower(): c for c in cat.columns}
    try:
        sch_col, tbl_col = by_lower["table_schema"], by_lower["table_name"]
    except KeyError:
        raise ValueError(
            f"catalog query must return table_schema and table_name "
            f"columns, got {cat.columns}"
        ) from None
    available: dict[str | None, set[str]] = {}
    for row in cat.collect():
        schema, name = row[sch_col], row[tbl_col]
        available.setdefault(schema, set()).add(name)
        if default_schema is not None and schema == default_schema:
            available.setdefault(None, set()).add(name)
    return available
