"""Grouped-map pandas operators — the sanctioned Python extension point.

SURVEY.md §2.10: the engine exposes ``applyInPandas`` (Arrow-batched,
one pandas frame per group) for semantics the built-in operators
genuinely cannot express. The bar for using it is high — anything
expressible as Column algebra belongs JVM-side — so the example shipped
here is a *recursive sequential* computation, which SQL window frames
cannot produce: per-key exponentially-weighted moving statistics.

Scale notes: one shuffle on the group key; each group must fit in one
task's memory (events-per-user here, not the whole table). For groups
too large for that, the state-store streaming form
(:func:`..streaming.pipeline.running_user_totals_stateful`) or a
chunked scan-order ``mapInPandas`` is the fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma_per_key(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    id_col: str | None = None,
) -> DataFrame:
    """Per-key EWMA of ``value_col`` in ``ts_col`` order.

    ewma_t = alpha·x_t + (1-alpha)·ewma_{t-1} — a recurrence, not a
    window frame; each output row depends on the entire prefix.
    Output: key[, id], ts, value, ewma.

    ``id_col`` (recommended) breaks timestamp ties: without it, tied
    rows take partition arrival order and the result is
    nondeterministic. pandas ``ewm(adjust=False)`` computes exactly
    ``α·x + (1−α)·prev`` per step (one rounding per multiply/add), which
    a left fold replicates bit-for-bit — that is what makes the DuckDB
    ``list_reduce`` oracle for this operator exact, despite Python
    executing the recurrence.
    """
    import pandas as pd

    id_part = f"{id_col} bigint, " if id_col else ""
    schema = (
        f"{key_col} bigint, {id_part}{ts_col} timestamp, "
        f"{value_col} double, ewma double"
    )
    sort_cols = [ts_col, id_col] if id_col else [ts_col]
    out_cols = [key_col] + ([id_col] if id_col else []) + [ts_col, value_col, "ewma"]
    in_cols = [key_col] + ([id_col] if id_col else []) + [ts_col, value_col]

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf = pdf.assign(
            ewma=pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[out_cols]

    return (
        df.select(*in_cols)
        .groupBy(key_col)
        .applyInPandas(compute, schema=schema)
    )
