"""Scalar column functions (SURVEY.md §2.7).

Every per-row Python transform in the reference dissolves into a native
Column expression here — JVM-side, codegen-friendly, no Python in the
hot path:

  * F1 JSON parse           -> ``json_get`` / ``from_json``
    (/root/reference/src/json_encoder.py:23-41)
  * F4 NaN/None normalize   -> native SQL NULL (no-op in Spark)
    (/root/reference/src/document_utils.py:22-52)
  * F6 MD5 content hash     -> ``content_hash``
    (/root/reference/data_lake_sync.py:72-82)
  * F7 versioned doc id     -> ``document_id``
    (/root/reference/src/ticket_sync.py:133-139)
  * F8/F9 uuid / now defaults -> ``with_defaults``
    (/root/reference/src/utils.py:98-111)
  * F2 ISO timestamp        -> ``iso_timestamp``
    (/root/reference/src/json_encoder.py:12-18)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _double_sql(v: float) -> str:
    """Exact SQL double literal for a finite/NaN/±Inf binary64 value.
    ``repr`` emits the shortest decimal that round-trips to the same
    bits, so the parsed JVM double is bit-identical to ``v``."""
    v = float(v)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(v) + "D"


def lit_double_array(values: Sequence[float]) -> Column:
    """``array<double>`` literal built through ONE parsed expression.

    r14 (guide §1.2 driver-side cost): ``F.array(*[F.lit(x) ...])``
    pays one py4j round-trip per element — a 64-dim query vector is 65
    driver→JVM calls, a 64×64 centroid grid 4,161 (measured 6-8 s of
    query-construction time on semdedup). One ``F.expr`` string is one
    round-trip and one parse; values are bit-identical via ``repr``
    round-tripping.
    """
    return F.expr(
        "array(" + ",".join(_double_sql(v) for v in values) + ")")


def lit_double_matrix(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal via one parsed expression — the
    nested sibling of :func:`lit_double_array` (centroid grids)."""
    return F.expr(
        "array(" + ",".join(
            "array(" + ",".join(_double_sql(v) for v in row) + ")"
            for row in rows) + ")")


def finite_or_null(col: str | Column) -> Column:
    """The value when it is an ordinary number, NULL for NaN/±Inf.

    Engine policy (found by the degenerate-values differential gate): a
    corrupted lake WILL contain nonfinite doubles, and Spark and DuckDB
    disagree on them everywhere it matters — Spark silently clamps
    ``cast(inf as bigint)`` where DuckDB errors, and NaN takes different
    positions in the two engines' percentile orderings. Numeric
    reductions in this repo are therefore defined over FINITE values:
    wrap the measure column in this helper (SQL mirror:
    ``CASE WHEN isfinite(value) THEN value END``) so nonfinite inputs
    drop out of sums/percentiles/buckets as NULLs instead of poisoning
    them engine-dependently. NULL-safe: NULL stays NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))), c)


def content_hash(cols: Sequence[str | Column], sep: str = "|") -> Column:
    """Deterministic MD5 content id over the given columns.

    The reference hashes the JSON-serialized full row
    (/root/reference/data_lake_sync.py:72-82) so that changed content ⇒
    new doc id and unchanged content ⇒ idempotent overwrite. We hash a
    delimiter-joined canonical string instead of JSON so the id does not
    depend on any serializer's formatting. NULLs are encoded as an
    explicit NUL-byte sentinel — ``concat_ws`` alone silently *drops*
    null arguments, which would collide ("a",NULL,"b") with ("a","b").
    """
    null_marker = F.lit("\x00")
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), null_marker)
        for c in cols
    ]
    return F.md5(F.concat_ws(sep, *parts))


def document_id(id_col: str | Column, indexed_at: str | Column) -> Column:
    """Versioned document id ``{entity_id}_{indexed_at}``.

    Reference: /root/reference/src/ticket_sync.py:138 and the five
    sibling call sites in /root/reference/src/data_sync.py.
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    ts = F.col(indexed_at) if isinstance(indexed_at, str) else indexed_at
    return F.concat_ws("_", idc.cast("string"), ts.cast("string"))


def iso_timestamp(col: str | Column) -> Column:
    """Timestamp → ISO-8601 string, only needed at the JSON export
    boundary (the lake keeps native TimestampType).
    Reference: /root/reference/src/document_utils.py:56-58."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def json_get(col: str | Column, path: str) -> Column:
    """Extract a field from a JSON-string column (``$.k`` style path).

    The reference parses stringified JSON per-row in Python
    (/root/reference/src/json_encoder.py:23-41); ``get_json_object`` keeps
    it JVM-side. For fully-typed access use ``from_json`` with a schema
    sampled via ``schema_of_json``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, path)


def with_defaults(
    df: DataFrame,
    id_col: str | None = "id",
    created_col: str | None = "createdAt",
    updated_col: str | None = "updatedAt",
) -> DataFrame:
    """Ingest-side field defaulting: uuid for missing ids, now() for
    missing timestamps. Reference: /root/reference/src/utils.py:98-111."""
    out = df
    if id_col and id_col in out.columns:
        out = out.withColumn(id_col, F.coalesce(F.col(id_col), F.expr("uuid()")))
    for c in (created_col, updated_col):
        if c and c in out.columns:
            out = out.withColumn(c, F.coalesce(F.col(c), F.current_timestamp()))
    return out
