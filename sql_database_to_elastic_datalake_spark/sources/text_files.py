"""JSONL / CSV corpus ingestion with single-scan quarantine.

The reference ingests rows from SQL databases and a REST endpoint; a
training-data lake also swallows file drops — JSON-lines and CSV are
the lingua franca of corpus distribution. This module is the
file-ingest twin of ``sources/ingest.py``'s validate-split semantics
(P5 / HTTP-207 accounting, same ``reject_reason`` column): every input
line either parses into the declared schema or lands in a quarantine
frame with its raw payload and a reason, never failing the job (the
reference's per-row try/except around document building,
/root/reference/src/data_sync.py:124-145, as a column expression
instead of a Python loop).

Design, deliberately NOT ``spark.read.json``/``.csv`` on the files:

  * Schema inference is an extra full scan — at 100 TB that is a
    second pass over the corpus before any work starts. The schema is
    a REQUIRED argument here (exploration can sample separately).
  * Reading as plain text and parsing with ``from_json``/``from_csv``
    keeps each output a single-scan plan. PERMISSIVE parsing never
    yields a NULL struct (malformed rows parse to all-NULL fields —
    indistinguishable from a legitimate ``{}``), so corruption is
    detected the way the parsers themselves report it: a
    ``_corrupt_record`` field appended to the parse schema, populated
    with the raw line iff ANY part of the row failed (fully malformed
    or a type-mismatched field that would otherwise silently NULL).
    Unlike the same column on the file readers, an expression-level
    corrupt field has no cache-before-filter caveat.
  * An empty-but-valid row (``{}``, bare separators) is ACCEPTED with
    NULL fields — required-field policy is downstream
    ``ingest.validate_split``'s job, same as REST ingest.
  * Text files split by line across tasks, so parallelism follows
    ``maxPartitionBytes`` exactly like parquet. Compression caveat
    (documented, not enforced): gzip is not splittable — one 100 GB
    .json.gz becomes one task; prefer zstd/bzip2 or many files.

Materialization note: each returned frame is ONE scan, but they are
independent plans — collecting/writing both runs two jobs over the
files, and a file landing between those jobs appears in only one
output. For an atomic one-pass split, write the union shape once
(raw + parsed + reason, e.g. partitioned by a reject flag) and derive
both views from that landed table.

CSV caveats (inherent to line-splittable CSV — Spark's own
``spark.read.csv`` without ``multiLine`` shares both):

  * RFC-4180 quoted fields may contain embedded newlines; a line-split
    scan fragments such records. Every fragment has an UNBALANCED
    (odd) double-quote count — balanced single-line records always
    have an even count, since quotes open/close in pairs and escaped
    quotes are doubled — so fragments are quarantined as
    ``unbalanced quotes`` rather than silently truncating a field.
    Corpora that legitimately embed newlines should ship JSONL (or be
    read via the non-splittable ``multiLine`` reader).
  * With ``header=True`` any line EQUAL to the header row is dropped
    wherever it appears (per-file head-stripping is not expressible
    once files split across tasks; this also de-duplicates headers
    under concatenated drops). Under an all-string schema a data row
    whose values equal the column names is therefore indistinguishable
    from a header and is dropped too — pass ``header=False`` and strip
    upstream when that distinction matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_COL = "_raw"
REASON_COL = "reject_reason"
_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema already has a {_CORRUPT} field")
    return T.StructType(
        [*schema.fields, T.StructField(_CORRUPT, T.StringType())]
    )


def _split_parsed(
    lines: DataFrame, parsed: F.Column, schema: T.StructType, reason: str
) -> tuple[DataFrame, DataFrame]:
    """Split text lines on parse success (one scan per consumed output)."""
    tagged = lines.select(F.col("value").alias(RAW_COL), parsed.alias("__p"))
    # getField (not the dotted f-string path): a field name containing a
    # dot would otherwise resolve as a nested path and fail
    ok = F.col("__p")[_CORRUPT].isNull()
    good = tagged.filter(ok).select(
        *[F.col("__p")[f.name].alias(f.name) for f in schema.fields]
    )
    bad = tagged.filter(~ok).select(
        RAW_COL, F.lit(reason).alias(REASON_COL)
    )
    return good, bad


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(parsed, quarantine) frames for a JSON-lines drop.

    A line quarantines iff it is not a JSON object or any field fails
    its declared type — a malformed value rejects the whole line
    rather than silently nulling one field. Blank lines are dropped,
    not quarantined.
    """
    lines = spark.read.text(path).filter(F.trim("value") != "")
    parsed = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"columnNameOfCorruptRecord": _CORRUPT},
    )
    return _split_parsed(lines, parsed, schema, "malformed json")


def read_csv_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(parsed, quarantine) frames for a CSV drop.

    See the module docstring for the two line-splitting caveats
    (embedded-newline fragments → ``unbalanced quotes`` quarantine;
    header-equality dropping). The schema is passed to ``from_csv`` as
    DDL via ``StructType.toDDL`` — names are backtick-quoted, so any
    field name :func:`read_jsonl` accepts works here too.
    """
    header_line = sep.join(f.name for f in schema.fields)
    quoted_header = sep.join(f'"{f.name}"' for f in schema.fields)
    lines = spark.read.text(path).filter(F.trim("value") != "")
    if header:
        # both writer conventions: bare and fully-quoted (quoteAll)
        lines = lines.filter(
            (F.col("value") != header_line) & (F.col("value") != quoted_header)
        )

    # fragments of a quoted-embedded-newline record always carry an odd
    # number of quotes; quarantine them instead of letting the leading
    # fragment "parse" with a silently truncated field
    balanced = (
        F.length(F.col("value"))
        - F.length(F.replace(F.col("value"), F.lit('"'), F.lit("")))
    ) % 2 == 0
    parsed = F.from_csv(
        F.col("value"),
        F.lit(_with_corrupt(schema).toDDL()),
        # escape='"' = RFC-4180 doubled-quote escaping (Spark's default
        # escape is backslash, which would leave "" quoted-literal)
        {"columnNameOfCorruptRecord": _CORRUPT, "sep": sep, "escape": '"'},
    )
    tagged = lines.select(
        F.col("value").alias(RAW_COL), parsed.alias("__p"), balanced.alias("__b")
    )
    ok = F.col("__b") & F.col("__p")[_CORRUPT].isNull()
    good = tagged.filter(ok).select(
        *[F.col("__p")[f.name].alias(f.name) for f in schema.fields]
    )
    bad = tagged.filter(~ok).select(
        RAW_COL,
        F.when(~F.col("__b"), F.lit("unbalanced quotes"))
        .otherwise(F.lit("malformed csv"))
        .alias(REASON_COL),
    )
    return good, bad
