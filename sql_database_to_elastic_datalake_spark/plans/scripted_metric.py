"""``scripted_metric`` aggregation — the deterministic painless
subset, compiled to ONE aggregate Column.

Reference surface: the reference forwards aggs bodies verbatim to a
real ES 8.11 (/root/reference/src/search_api.py:38-46), whose
scripted_metric runs user init/map/combine/reduce painless over each
shard. This engine re-expresses the DETERMINISTIC subset — the shapes
whose result cannot depend on sharding or document order — as pure
column algebra:

* ``init_script``: ``state.v = <literal>`` statements declare the
  accumulators.
* ``map_script``: each statement updates one accumulator with an
  ASSOCIATIVE, COMMUTATIVE operator — ``state.v += expr`` (sum),
  ``state.v = Math.max(state.v, expr)`` / ``Math.min(...)`` — where
  ``expr`` is the engine's existing painless subset
  (:func:`..score_dsl.script_column`: doc values, params, Math.*,
  arithmetic, comparisons, ``?:``).
* ``combine_script``: must be ``return state`` — per-shard combining
  is what Spark's partial aggregation already does, and the merge of
  each accumulator is DECLARED BY ITS MAP OPERATOR (+= merges by sum,
  Math.max by max, Math.min by min). That declaration is exactly what
  makes the result shard-count independent.
* ``reduce_script``: ``return <expr>`` over the merged accumulators
  (``state.v``; ``states.v`` is accepted as an alias since ES's
  reduce sees a per-shard list this engine has already merged).

The whole aggregation compiles to ONE Column — the reduce expression
applied over the merged aggregate sub-expressions — so it rides every
aggregation frame (top-level, terms/histogram buckets, filters) like
any other metric, inside whole-stage codegen, with no UDF and no
driver-side evaluation.

NAMED 400s for the shapes whose ES result depends on sharding or
order: a non-zero init on a summed accumulator (ES runs init once PER
SHARD, so the result would scale with shard count), plain ``=``
re-assignment in map (last-write-wins depends on document order),
loops / collections / strings, and a combine that does anything but
return the state.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError

_VAR = r"[A-Za-z_][A-Za-z0-9_]*"
_INIT_RE = re.compile(
    rf"^state\.({_VAR})\s*=\s*(-?\d+(?:\.\d+)?)$")
_SUM_RE = re.compile(rf"^state\.({_VAR})\s*\+=\s*(.+)$", re.S)
_MINMAX_RE = re.compile(
    rf"^state\.({_VAR})\s*=\s*Math\.(max|min)\(\s*state\.({_VAR})\s*,"
    r"(.+)\)$", re.S)
_RETURN_RE = re.compile(r"^return\s+(.+)$", re.S)
_STATE_REF = re.compile(rf"\bstates?\.({_VAR})")


def _statements(src: str, what: str) -> list[str]:
    if not isinstance(src, str):
        raise DslError(f"scripted_metric {what} must be a string "
                       "(or an object with a source string)")
    stmts = [s.strip() for s in src.split(";") if s.strip()]
    for s in stmts:
        if re.search(r"\b(for|while|if|else|def|new)\b", s) \
                or "{" in s or "}" in s or "[]" in s:
            raise DslError(
                f"scripted_metric {what} statement {s!r} is outside "
                "the deterministic subset (no loops, blocks or "
                "collections — the merge of each accumulator is "
                "declared by its map operator instead)")
    return stmts


def _script_parts(v, shared_params: dict, what: str):
    """A script entry (string or {source, params, lang}) →
    (source, merged params)."""
    if isinstance(v, str):
        return v, dict(shared_params)
    if isinstance(v, dict):
        unknown = sorted(set(v) - {"source", "params", "lang"})
        if unknown:
            raise DslError(
                f"unsupported scripted_metric {what} keys: {unknown}")
        if v.get("lang") not in (None, "painless"):
            raise DslError(
                f"unsupported script lang {v['lang']!r}")
        p = dict(shared_params)
        p.update(v.get("params") or {})
        return v.get("source"), p
    raise DslError(f"scripted_metric {what} must be a string or "
                   "script object")


def scripted_metric_column(body: dict, resolver=None) -> Column:
    """Compile a scripted_metric body into one aggregate Column (the
    reduce expression over the merged accumulators)."""
    from sql_database_to_elastic_datalake_spark.plans.score_dsl import (
        script_column,
    )

    if not isinstance(body, dict):
        raise DslError("scripted_metric must be an object")
    unknown = sorted(set(body) - {"init_script", "map_script",
                                  "combine_script", "reduce_script",
                                  "params"})
    if unknown:
        raise DslError(
            f"unsupported scripted_metric options: {unknown}")
    shared = body.get("params") or {}
    if not isinstance(shared, dict):
        raise DslError("scripted_metric params must be an object")
    for k in ("init_script", "map_script", "combine_script",
              "reduce_script"):
        if k not in body:
            raise DslError(f"scripted_metric requires {k} (ES does "
                           "too)")
    resolver = resolver or F.col

    init_src, init_params = _script_parts(
        body["init_script"], shared, "init_script")
    init: dict[str, float] = {}
    for s in _statements(init_src, "init_script"):
        m = _INIT_RE.match(s)
        if not m:
            raise DslError(
                f"scripted_metric init statement {s!r} must be "
                "'state.<name> = <numeric literal>'")
        init[m.group(1)] = float(m.group(2))

    map_src, map_params = _script_parts(
        body["map_script"], shared, "map_script")
    accum: dict[str, Column] = {}
    for s in _statements(map_src, "map_script"):
        m = _SUM_RE.match(s)
        if m:
            var, expr_src, op = m.group(1), m.group(2), "sum"
        else:
            m2 = _MINMAX_RE.match(s)
            if m2:
                if m2.group(1) != m2.group(3):
                    raise DslError(
                        f"scripted_metric map statement {s!r} must "
                        "fold the SAME accumulator "
                        "(state.v = Math.max(state.v, expr))")
                var, expr_src, op = m2.group(1), m2.group(4), m2.group(2)
            else:
                raise DslError(
                    f"scripted_metric map statement {s!r} is outside "
                    "the deterministic subset: use 'state.v += expr' "
                    "(merged by sum) or 'state.v = "
                    "Math.max/min(state.v, expr)' — plain "
                    "re-assignment is document-order dependent")
        if var not in init:
            raise DslError(
                f"scripted_metric map references state.{var} which "
                "init_script never initializes")
        if var in accum:
            raise DslError(
                f"scripted_metric updates state.{var} twice — one "
                "merge operator per accumulator")
        expr = script_column({"source": expr_src,
                              "params": map_params}, resolver, None)
        if op == "sum":
            if init[var] != 0.0:
                raise DslError(
                    f"scripted_metric sum accumulator state.{var} "
                    f"must init to 0 (ES runs init once PER SHARD, "
                    "so a non-zero init makes the sum depend on the "
                    "shard count — not deterministic)")
            accum[var] = F.coalesce(F.sum(expr), F.lit(0.0))
        elif op == "max":
            accum[var] = F.greatest(F.lit(init[var]), F.max(expr))
        else:
            accum[var] = F.least(F.lit(init[var]), F.min(expr))
    unused = sorted(set(init) - set(accum))
    if unused:
        # an accumulator map never touches still merges (its init) —
        # constant, deterministic
        for var in unused:
            accum[var] = F.lit(init[var])

    comb_src, _ = _script_parts(
        body["combine_script"], shared, "combine_script")
    comb = [s for s in _statements(comb_src, "combine_script")]
    if comb != ["return state"]:
        raise DslError(
            "scripted_metric combine_script must be 'return state' — "
            "per-shard combining IS Spark's partial aggregation here, "
            "and each accumulator's merge is declared by its map "
            "operator")

    red_src, red_params = _script_parts(
        body["reduce_script"], shared, "reduce_script")
    red = _statements(red_src, "reduce_script")
    if len(red) != 1 or not _RETURN_RE.match(red[0]):
        raise DslError(
            "scripted_metric reduce_script must be a single "
            "'return <expr>' over the merged state "
            "(state.<name> / states.<name>)")
    expr_src = _RETURN_RE.match(red[0]).group(1)
    # state.v refs become doc refs the shared grammar understands,
    # resolved to the merged aggregate sub-expressions
    rewritten = _STATE_REF.sub(
        lambda m: f"doc['__sm_{m.group(1)}'].value", expr_src)

    def red_resolve(f: str) -> Column:
        if f.startswith("__sm_") and f[len("__sm_"):] in accum:
            return accum[f[len("__sm_"):]]
        raise DslError(
            f"scripted_metric reduce references {f.replace('__sm_', 'state.')!r}, "
            f"which map/init never defined (defined: "
            f"{sorted('state.' + v for v in accum)})")

    return script_column({"source": rewritten, "params": red_params},
                         red_resolve, None)
