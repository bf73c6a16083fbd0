"""Physical-plan property extraction — the audit half of the plan layer.

Extracts the scale-critical properties of a compiled plan: which
filters reached the parquet scan (``PushedFilters``), how many columns
each scan reads (pruning), join strategy counts, shuffle (Exchange)
count, window-group-limit pushdown, and AQE presence. Used two ways:

* ``scripts/explain_audit.py`` renders PLANS.md from it (documentation);
* ``tests/test_plan_gates.py`` asserts on it (regression gates) — a
  plan regression fails the suite instead of silently drifting a doc
  (r4 verdict directive #2).

The properties mirror what ``.explain("formatted")`` shows; they are
extracted from the ExplainMode("formatted") string because Spark
exposes no structured public API for the physical plan.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """The formatted physical plan (initial plan, before AQE runtime
    re-optimization) as a string."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def summarize(plan: str) -> dict:
    """Extract the audit properties from a formatted plan string."""
    scans = []
    for m in re.finditer(
        r"Location: InMemoryFileIndex \[file:([^\]]+)\]\n"
        r"(?:PushedFilters: (\[[^\n]*\])\n)?ReadSchema: ([^\n]+)",
        plan,
    ):
        path, pushed, schema = m.groups()
        scans.append(
            {
                "table": os.path.basename(path).replace(".parquet", ""),
                "pushed": pushed or "[]",
                "n_cols": schema.count(":"),
            }
        )
    return {
        "scans": scans,
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffles": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "window_group_limit": plan.count("WindowGroupLimit"),
        # all-pairs joins: fine for a broadcast verifier tier, fatal
        # at corpus scale — gates pin 0 for the scale-path queries
        "cartesian": (plan.count("CartesianProduct")
                      + plan.count("BroadcastNestedLoopJoin")),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def audit(df: DataFrame) -> dict:
    return summarize(plan_string(df))
