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
) -> DataFrame:
    """Per-key EWMA of ``value_col`` in ``ts_col`` order.

    ewma_t = alpha·x_t + (1-alpha)·ewma_{t-1} — a recurrence, not a
    window frame; each output row depends on the entire prefix.
    Output: key, ts, value, ewma.
    """
    import pandas as pd

    schema = f"{key_col} bigint, {ts_col} timestamp, {value_col} double, ewma double"

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        pdf = pdf.assign(
            ewma=pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf[[key_col, ts_col, value_col, "ewma"]]

    return (
        df.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(compute, schema=schema)
    )
