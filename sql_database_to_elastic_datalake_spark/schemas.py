"""Schema registry: fixed entity StructTypes + the dynamic type ladder.

Dual-mode schema system mirroring the reference (SURVEY.md §1.3):
  * fixed, hand-declared schemas for the 8 synced entities (from
    /root/reference/schema.sql DDL; ES mappings at
    /root/reference/src/ticket_sync.py:29-62 and siblings);
  * a dynamic path mapping any Spark-inferred type to a lake-schema
    type string — the reference's string-matching ladder
    ``json→object, varchar→keyword, text→text, int→long, float→double,
    date→date, else text`` (/root/reference/data_lake_sync.py:94-117)
    becomes a dict on DataType classes.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _entity_base() -> list[T.StructField]:
    """Columns shared by every entity (soft-delete contract §1.3)."""
    return [
        T.StructField("id", T.StringType(), False),  # uuid
        T.StructField("createdAt", T.TimestampType(), False),
        T.StructField("updatedAt", T.TimestampType(), True),
        T.StructField("deletedAt", T.TimestampType(), True),
    ]


def _fields(*extra: T.StructField) -> T.StructType:
    return T.StructType(_entity_base() + list(extra))


#: Fixed schemas for the reference's 8 synced entities
#: (/root/reference/schema.sql; FIXTURES.md §1).
ENTITY_SCHEMAS: dict[str, T.StructType] = {
    "Ticket": _fields(
        T.StructField("number", T.LongType(), False),
        T.StructField("scheduleDate", T.TimestampType(), True),
        T.StructField("scheduleDateEnd", T.TimestampType(), True),
        T.StructField("data", T.StringType(), True),  # JSON as string
        T.StructField("parentId", T.StringType(), True),
        T.StructField("dataSourceId", T.StringType(), False),
        T.StructField("moduleId", T.StringType(), False),
        T.StructField("userId", T.StringType(), True),
    ),
    "TicketStatus": _fields(
        T.StructField("ticketId", T.StringType(), False),
        T.StructField("statusId", T.StringType(), False),
    ),
    "TicketLabel": _fields(
        T.StructField("ticketId", T.StringType(), False),
        T.StructField("labelId", T.StringType(), True),
    ),
    "Status": _fields(
        T.StructField("name", T.StringType(), False),
        T.StructField("isFinalStatus", T.BooleanType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("moduleId", T.StringType(), True),
        T.StructField("isVisible", T.BooleanType(), True),
    ),
    "Label": _fields(
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("moduleId", T.StringType(), True),
        T.StructField("color", T.StringType(), True),
        T.StructField("icon", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("isVisible", T.BooleanType(), False),
    ),
    "Module": _fields(
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("type", T.StringType(), False),
        T.StructField("parentId", T.StringType(), True),
        T.StructField("icon", T.StringType(), True),
        T.StructField("logo", T.StringType(), True),
    ),
    "User": _fields(
        T.StructField("name", T.StringType(), False),
        T.StructField("username", T.StringType(), False),
        T.StructField("email", T.StringType(), False),
        T.StructField("password", T.StringType(), False),
        T.StructField("preferences", T.StringType(), True),  # JSON string
    ),
    "DataSource": _fields(
        T.StructField("name", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("dataMap", T.StringType(), True),  # JSON string
        T.StructField("entityName", T.StringType(), False),
        T.StructField("coverVisibleData", T.StringType(), True),
        T.StructField("gatewayType", T.StringType(), False),
        T.StructField("gatewayId", T.StringType(), True),
        T.StructField("moduleId", T.StringType(), False),
        T.StructField("statusId", T.StringType(), False),
        T.StructField("voidStatusId", T.StringType(), True),
        T.StructField("dailyLimit", T.IntegerType(), True),
        T.StructField("wipEnabled", T.BooleanType(), True),
        T.StructField("wipValue", T.IntegerType(), True),
    ),
}

#: Denormalized wide-document schema (FIXTURES.md §2, the output of the
#: flagship pipeline in its reference-shaped form).
DENORMALIZED_TICKET_SCHEMA = T.StructType(
    [
        T.StructField("ticket_id", T.StringType(), False),
        T.StructField("ticket_number", T.LongType(), False),
        T.StructField("ticket_scheduleDate", T.TimestampType(), True),
        T.StructField("ticket_scheduleDateEnd", T.TimestampType(), True),
        T.StructField("ticket_data", T.StringType(), True),
        T.StructField("ticket_createdAt", T.TimestampType(), False),
        T.StructField("ticket_updatedAt", T.TimestampType(), True),
        T.StructField("status_id", T.StringType(), True),
        T.StructField("status_name", T.StringType(), True),
        T.StructField("isFinalStatus", T.BooleanType(), True),
        T.StructField("module_id", T.StringType(), True),
        T.StructField("module_name", T.StringType(), True),
        T.StructField("datasource_id", T.StringType(), True),
        T.StructField("datasource_name", T.StringType(), True),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("user_email", T.StringType(), True),
        T.StructField(
            "labels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("color", T.StringType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField("indexed_at", T.TimestampType(), False),
        T.StructField("document_id", T.StringType(), False),
    ]
)


def lake_type(dt: T.DataType) -> str:
    """Spark type → lake-schema type string (the dynamic ladder, F11).

    Matches the reference's mapping semantics: strings are 'keyword'
    (exact) by default — long text is a mapping-policy decision the
    fixed schemas make explicitly ('text'); ints widen to 'long'.
    """
    if isinstance(dt, (T.MapType, T.StructType)):
        return "object"
    if isinstance(dt, T.ArrayType):
        return "nested"
    if isinstance(dt, T.StringType):
        return "keyword"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "long"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return "text"


def lake_mapping(schema: T.StructType) -> dict[str, str]:
    """Whole-schema dynamic mapping (replaces
    /root/reference/data_lake_sync.py:94-117)."""
    return {f.name: lake_type(f.dataType) for f in schema.fields}
