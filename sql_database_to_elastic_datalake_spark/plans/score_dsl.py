"""ES ``function_score`` / ``script_score`` compiled to Column algebra.

The reference forwards relevance-tuned saved queries verbatim to ES
(/root/reference/src/search_api.py:38-46); ``function_score`` bodies
(field-value-factor boosts, recency decay, weights) are the most common
nontrivial production shapes. This module compiles them into pure
Spark Column expressions — one scan, one TakeOrdered, no UDF, never
``eval()``.

Scoring model: the BASE query score inside ``function_score``/
``script_score`` is the inner query's relevance score
(:func:`.es_dsl.compile_score` — r12; previously the flat
filter-context 1.0). ``match_all`` and plain leaves still score 1.0
(times their ``boost``), text leaves score by deterministic term
frequency, and a filter-only ``bool`` scores 0.0 exactly like ES; the
oracle replays the same algebra. The top-level ``boost`` multiplies
the final score (Lucene's contract).

Painless subset for ``script_score``: the same ``params.x`` arithmetic
grammar as the TSVB ``bucket_script`` evaluator
(:mod:`.es_aggs`), extended with ``doc['field'].value`` access,
``_score``, and the deterministic ``Math.*`` calls column algebra can
express. A recursive-descent parser over a fixed token set — a
malformed or out-of-grammar script is a named 400.
"""

from __future__ import annotations

import datetime as _dt
import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    DslError,
    compile_dsl,
    compile_score,
)

_NUM = r"(?:\d+\.\d*|\.\d+|\d+)(?:[eE][-+]?\d+)?"
_SCRIPT_TOK = re.compile(
    rf"""\s*(?:
      ({_NUM})                                  # 1 number
    | params\.([A-Za-z_][A-Za-z0-9_]*)          # 2 param ref
    | doc\[\s*'([^']+)'\s*\]\.value             # 3 doc field access
    | Math\.([A-Za-z][A-Za-z0-9]*)              # 4 math call
    | (_score)                                  # 5 base score
    | (==|!=|<=|>=|&&|\|\||[-+*/%(),<>!?:])    # 6 operator
    )""",
    re.X,
)

_CMP_OPS = ("==", "!=", "<", "<=", ">", ">=")

#: Math.* calls with Column twins. Java's Math.log is the NATURAL log.
_MATH_1 = {
    "log": lambda c: F.when(c > 0, F.log(c)),
    "log10": lambda c: F.when(c > 0, F.log10(c)),
    "sqrt": lambda c: F.when(c >= 0, F.sqrt(c)),
    "abs": F.abs,
    "exp": F.exp,
    # Spark's floor/ceil return LONG and so SATURATE anything a long
    # cannot hold — NaN → 0, ±Inf AND finite doubles ≥ 2^63 →
    # Long.MIN/MAX. Java's Math.floor/ceil (the painless semantics
    # this compiler restates) are double→double: NaN/±Inf pass
    # through, and any |x| ≥ 2^52 is already integral so floor(x) = x.
    # Guard: outside ±2^63 (or NaN) return the input unchanged; the
    # long-typed fast path only serves the range it represents
    # exactly. Both tiers found by the hypothesis differential vs
    # DuckDB (double-typed floor, like Java).
    "floor": lambda c: F.when(
        F.isnan(c) | (F.abs(c) >= F.lit(9.223372036854776e18)), c
    ).otherwise(F.floor(c).cast("double")),
    "ceil": lambda c: F.when(
        F.isnan(c) | (F.abs(c) >= F.lit(9.223372036854776e18)), c
    ).otherwise(F.ceil(c).cast("double")),
}
_MATH_2 = {
    "pow": F.pow,
    "max": F.greatest,
    "min": F.least,
}


def _req_boost(value, where: str) -> float:
    """Validate a top-level ``boost``: ES requires a non-negative
    number."""
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        raise DslError(f"{where} boost must be a number, got {value!r}")
    b = float(value)
    if b < 0:
        raise DslError(
            f"{where} boost must be non-negative, got {value!r}")
    return b


def _truthy(c: Column) -> Column:
    """Non-zero is true in this arithmetic subset; null stays null."""
    return c != F.lit(0.0)


def _bool_to_double(cond: Column) -> Column:
    """Boolean Column → 1.0/0.0 double, null-propagating (a missing
    doc value must not silently count as false)."""
    return F.when(cond, F.lit(1.0)).when(~cond, F.lit(0.0))


def _tokenize(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(src):
        m = _SCRIPT_TOK.match(src, pos)
        if m is None:
            if src[pos:].strip() == "":
                break
            raise DslError(
                f"unsupported script syntax at {src[pos:]!r} "
                "(implemented: numbers, params.<name>, doc['f'].value, "
                "_score, Math.log/log10/sqrt/abs/exp/floor/ceil/pow/"
                "max/min, + - * / % ( ) , comparisons == != < <= > >=, "
                "&& || !, and the ?: conditional)"
            )
        if m.group(1) is not None:
            toks.append(("num", float(m.group(1))))
        elif m.group(2) is not None:
            toks.append(("param", m.group(2)))
        elif m.group(3) is not None:
            toks.append(("doc", m.group(3)))
        elif m.group(4) is not None:
            toks.append(("math", m.group(4)))
        elif m.group(5) is not None:
            toks.append(("score", None))
        else:
            toks.append(("op", m.group(6)))
        pos = m.end()
    return toks


def script_column(
    script: dict,
    field_resolver: Callable[[str], Column],
    base_score: Column | None,
) -> Column:
    """One painless-subset script → a double Column.

    Null semantics (documented): a null/missing doc value propagates
    to a null score and the hit drops from the ranked page — the
    engine's refuse-silently-wrong posture where painless would throw
    the whole request. Division/modulo by zero likewise nulls via
    ``try_divide``/``try_mod``-style guards.

    Booleans (r9, for the filter-context ``script`` query): comparisons
    and ``&& || !`` evaluate to 1.0/0.0 doubles (painless booleans are
    a distinct type, but this arithmetic subset folds them — the ``?:``
    conditional treats any non-zero as true). Null handling is SQL's
    Kleene logic (``0 && null`` is 0, ``1 || null`` is 1, a null
    comparison or ``?:`` condition stays null) — deterministic where
    painless would throw. ``base_score=None`` marks a context where ES exposes no
    ``_score`` (filter scripts, runtime fields) — referencing it there
    is a named 400.
    """
    if not isinstance(script, dict):
        raise DslError("script must be an object")
    unknown = sorted(set(script) - {"source", "params", "lang"})
    if unknown:
        raise DslError(f"unsupported script keys: {unknown}")
    if script.get("lang") not in (None, "painless"):
        raise DslError(f"unsupported script lang {script['lang']!r}")
    src = script.get("source")
    if not isinstance(src, str):
        raise DslError("script requires a source string")
    params = script.get("params") or {}
    if not isinstance(params, dict):
        raise DslError("script params must be an object")

    toks = _tokenize(src)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(op=None):
        nonlocal pos
        t = peek()
        if t[0] is None or (op is not None and t != ("op", op)):
            raise DslError(f"malformed script {src!r}")
        pos += 1
        return t

    def primary() -> Column:
        kind, val = peek()
        if kind == "num":
            take()
            return F.lit(float(val))
        if kind == "param":
            take()
            if val not in params:
                raise DslError(
                    f"script references params.{val} but params "
                    f"defines {sorted(params)}"
                )
            v = params[val]
            if not isinstance(v, (int, float)) or isinstance(v, bool):
                raise DslError(
                    f"script param {val!r} must be numeric, got {v!r}")
            return F.lit(float(v))
        if kind == "doc":
            take()
            return field_resolver(val).cast("double")
        if kind == "score":
            take()
            if base_score is None:
                raise DslError(
                    "_score is not available in this script context "
                    "(filter scripts and runtime fields see no score)"
                )
            return base_score
        if kind == "math":
            take()
            take("(")
            args = [expr()]
            while peek() == ("op", ","):
                take(",")
                args.append(expr())
            take(")")
            if val in _MATH_1 and len(args) == 1:
                return _MATH_1[val](args[0])
            if val in _MATH_2 and len(args) == 2:
                return _MATH_2[val](*args)
            raise DslError(
                f"unsupported Math.{val} with {len(args)} args "
                f"(implemented: {sorted(_MATH_1)} unary, "
                f"{sorted(_MATH_2)} binary)"
            )
        if (kind, val) == ("op", "("):
            take()
            v = expr()
            take(")")
            return v
        if (kind, val) == ("op", "-"):
            take()
            return -primary()
        if (kind, val) == ("op", "!"):
            take()
            return _bool_to_double(~_truthy(primary()))
        raise DslError(f"malformed script {src!r}")

    def mul_expr() -> Column:
        v = primary()
        while peek() in (("op", "*"), ("op", "/"), ("op", "%")):
            op = take()[1]
            r = primary()
            if op == "*":
                v = v * r
            elif op == "/":
                v = F.try_divide(v, r)
            else:
                v = v % F.nullif(r, F.lit(0.0))
        return v

    def add_expr() -> Column:
        v = mul_expr()
        while peek() in (("op", "+"), ("op", "-")):
            op = take()[1]
            r = mul_expr()
            v = (v + r) if op == "+" else (v - r)
        return v

    def cmp_expr() -> Column:
        v = add_expr()
        if peek() in [("op", o) for o in _CMP_OPS]:
            op = take()[1]
            r = add_expr()
            cond = {"==": v == r, "!=": v != r, "<": v < r,
                    "<=": v <= r, ">": v > r, ">=": v >= r}[op]
            return _bool_to_double(cond)
        return v

    def and_expr() -> Column:
        v = cmp_expr()
        while peek() == ("op", "&&"):
            take()
            r = cmp_expr()
            v = _bool_to_double(_truthy(v) & _truthy(r))
        return v

    def or_expr() -> Column:
        v = and_expr()
        while peek() == ("op", "||"):
            take()
            r = and_expr()
            v = _bool_to_double(_truthy(v) | _truthy(r))
        return v

    def expr() -> Column:
        # right-associative ?: — null condition yields null (no
        # branch is silently taken for a missing doc value)
        c = or_expr()
        if peek() == ("op", "?"):
            take()
            a = expr()
            take(":")
            b = expr()
            t = _truthy(c)
            return F.when(t, a).when(~t, b)
        return c

    out = expr()
    if peek()[0] is not None:
        raise DslError(f"malformed script {src!r} (trailing tokens)")
    return out.cast("double")


# ---------------------------------------------------------------------------
# field_value_factor — modifier(factor * value), log base 10 like Lucene
# ---------------------------------------------------------------------------

_FVF_MODIFIERS = {
    "none": lambda c: c,
    "log": lambda c: F.when(c > 0, F.log10(c)),
    "log1p": lambda c: F.when(c > -1, F.log10(c + F.lit(1.0))),
    "log2p": lambda c: F.when(c > -2, F.log10(c + F.lit(2.0))),
    "ln": lambda c: F.when(c > 0, F.log(c)),
    "ln1p": lambda c: F.when(c > -1, F.log(c + F.lit(1.0))),
    "ln2p": lambda c: F.when(c > -2, F.log(c + F.lit(2.0))),
    "square": lambda c: c * c,
    "sqrt": lambda c: F.when(c >= 0, F.sqrt(c)),
    "reciprocal": lambda c: F.try_divide(F.lit(1.0), c),
}


def _field_value_factor(body: dict, resolver) -> Column:
    if not isinstance(body, dict) or not body.get("field"):
        raise DslError("field_value_factor requires a field")
    unknown = sorted(set(body) - {"field", "factor", "modifier",
                                  "missing"})
    if unknown:
        raise DslError(
            f"unsupported field_value_factor keys: {unknown}")
    mod = str(body.get("modifier", "none"))
    if mod not in _FVF_MODIFIERS:
        raise DslError(
            f"unknown field_value_factor modifier {mod!r} "
            f"(implemented: {sorted(_FVF_MODIFIERS)})"
        )
    v = resolver(str(body["field"])).cast("double")
    if body.get("missing") is not None:
        v = F.coalesce(v, F.lit(float(body["missing"])))
    return _FVF_MODIFIERS[mod](v * F.lit(float(body.get("factor", 1.0))))


# ---------------------------------------------------------------------------
# decay functions — gauss / exp / linear over numeric and date fields
# ---------------------------------------------------------------------------

_DURATION_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s|m|h|d|w)\s*$")
_DURATION_SECS = {"ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0,
                  "d": 86400.0, "w": 604800.0}


def _duration_seconds(v, what: str) -> float:
    """A decay scale/offset for a date field: ES duration string (or a
    bare number of seconds) → seconds. ``now``-relative math is
    rejected by the caller — a cacheable plan must not embed the wall
    clock."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    m = _DURATION_RE.match(str(v))
    if not m:
        raise DslError(
            f"unsupported decay {what} {v!r} (use e.g. '10d', '2h')")
    return float(m.group(1)) * _DURATION_SECS[m.group(2)]


def _parse_origin_ts(origin) -> float:
    """Date-decay origin → epoch seconds. ``now`` is a named 400: the
    compiled plan is cached/replayed, so wall-clock anchors would make
    identical requests return different scores (pass an explicit
    ISO instant instead)."""
    if str(origin).strip().lower().startswith("now"):
        raise DslError(
            "decay origin 'now' is not supported (plans are "
            "deterministic; pass an explicit ISO timestamp)"
        )
    try:
        dt = _dt.datetime.fromisoformat(str(origin).replace("Z", "+00:00"))
    except ValueError:
        raise DslError(f"malformed decay origin {origin!r}") from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return dt.timestamp()


def _decay_column(kind: str, body: dict, resolver,
                  is_date: bool, schema_fields=None) -> Column:
    """One decay spec ``{field: {origin, scale, offset, decay}}`` →
    the decay value in (0, 1]. Shapes follow ES exactly:

    - gauss:  exp(-d'^2 / (2 sigma^2)), sigma^2 = -scale^2/(2 ln decay)
    - exp:    exp(lambda d'), lambda = ln(decay)/scale
    - linear: max(0, (s - d')/s), s = scale/(1 - decay)

    with d' = max(0, |x - origin| - offset). Dates measure distance in
    seconds (``unix_timestamp``); GEO fields (r13 late — detected by
    the ``f_lat``/``f_lon`` pair convention in ``schema_fields``)
    measure haversine km from an ES geo-point origin, with
    scale/offset in the ES distance grammar ("10km"). A missing/null
    field contributes the NEUTRAL 1.0 (distance 0) — ES's own decay
    contract for missing fields — which also makes a pattern table
    lacking the field rank uniformly instead of erroring.
    """
    if not isinstance(body, dict) or len(body) != 1:
        raise DslError(f"{kind} decay expects exactly one field")
    field, spec = next(iter(body.items()))
    if not isinstance(spec, dict):
        raise DslError(f"{kind} decay spec must be an object")
    unknown = sorted(set(spec) - {"origin", "scale", "offset", "decay"})
    if unknown:
        raise DslError(f"unsupported {kind} decay keys: {unknown}")
    if "origin" not in spec or "scale" not in spec:
        raise DslError(f"{kind} decay requires origin and scale")
    decay = float(spec.get("decay", 0.5))
    if not (0.0 < decay < 1.0):
        raise DslError(f"decay must be in (0, 1), got {decay}")

    f = str(field)
    if schema_fields is not None and f"{f}_lat" in schema_fields \
            and f"{f}_lon" in schema_fields:
        from sql_database_to_elastic_datalake_spark.functions.geo import (
            haversine_km,
            parse_distance_km,
        )
        from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
            _parse_geo_point,
        )

        plat, plon = _parse_geo_point(spec["origin"])
        try:
            scale = parse_distance_km(spec["scale"])
            offset = parse_distance_km(spec.get("offset", 0))
        except ValueError as ex:
            raise DslError(f"geo {kind} decay: {ex}") from None
        if scale <= 0:
            raise DslError(
                f"decay scale must be positive, got {scale}")
        raw = haversine_km(resolver(f"{f}_lat"), resolver(f"{f}_lon"),
                           F.lit(plat), F.lit(plon))
        return _decay_shape(kind, raw, scale, offset, decay)

    c = resolver(str(field))
    if is_date:
        x = F.unix_timestamp(c.cast("timestamp")).cast("double")
        origin = float(_parse_origin_ts(spec["origin"]))
        scale = _duration_seconds(spec["scale"], "scale")
        offset = _duration_seconds(spec.get("offset", 0), "offset")
    else:
        x = c.cast("double")
        try:
            origin = float(spec["origin"])
            scale = float(spec["scale"])
            offset = float(spec.get("offset", 0))
        except (TypeError, ValueError):
            raise DslError(
                f"numeric {kind} decay requires numeric origin/scale/"
                f"offset (for a date field pass ISO origin + duration "
                "scale)") from None
    if scale <= 0:
        raise DslError(f"decay scale must be positive, got {scale}")
    return _decay_shape(kind, F.abs(x - F.lit(origin)), scale, offset,
                        decay)


def _decay_shape(kind: str, raw_dist: Column, scale: float,
                 offset: float, decay: float) -> Column:
    """The shared decay shape over a raw distance Column (numeric/
    date |x − origin|, geo haversine): d' = max(0, raw − offset),
    null → distance 0 → decay 1.0 (the missing-field neutrality —
    greatest() skips nulls and the coalesce pins the contract)."""
    import math

    dist = F.coalesce(
        F.greatest(raw_dist - F.lit(float(offset)), F.lit(0.0)),
        F.lit(0.0))
    if kind == "gauss":
        sigma_sq = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma_sq))
    if kind == "exp":
        lam = math.log(decay) / scale
        return F.exp(dist * F.lit(lam))
    # linear
    s = scale / (1.0 - decay)
    return F.greatest(
        (F.lit(s) - dist) / F.lit(s), F.lit(0.0))


_DECAY_KINDS = ("gauss", "exp", "linear")
_FUNCTION_KINDS = ("filter", "weight", "field_value_factor",
                   "script_score", "random_score", *_DECAY_KINDS)
_SCORE_MODES = ("multiply", "sum", "avg", "first", "max", "min")
_BOOST_MODES = ("multiply", "replace", "sum", "avg", "max", "min")


def _one_function(
    fn: dict, resolver, schema_fields, base_score: Column,
    date_fields: set[str],
) -> tuple[Column, Column]:
    """One entry of the functions list → (matches, value). ``matches``
    is the function's filter (True when absent); ``value`` is the
    function result times its weight. A weight-only entry is the
    constant function ES documents it as."""
    unknown = sorted(set(fn) - set(_FUNCTION_KINDS))
    if unknown:
        raise DslError(f"unsupported score function keys: {unknown}")
    cond = F.lit(True)
    if fn.get("filter") is not None:
        from sql_database_to_elastic_datalake_spark.plans.es_dsl import _ns

        cond = _ns(compile_dsl(fn["filter"], field_resolver=resolver,
                               schema_fields=schema_fields))
    kinds = [k for k in fn if k in _FUNCTION_KINDS
             and k not in ("filter", "weight")]
    if len(kinds) > 1:
        raise DslError(
            f"a score function must have one kind, got {sorted(kinds)}")
    if not kinds:
        if "weight" not in fn:
            raise DslError(
                "a score function needs a kind (field_value_factor, "
                "gauss/exp/linear, script_score) or a weight")
        val: Column = F.lit(1.0)
    elif kinds[0] == "field_value_factor":
        val = _field_value_factor(fn["field_value_factor"], resolver)
    elif kinds[0] == "script_score":
        body = fn["script_score"]
        if not isinstance(body, dict) or "script" not in body:
            raise DslError("script_score function requires a script")
        val = script_column(body["script"], resolver, base_score)
    elif kinds[0] == "random_score":
        # r12: the SEEDED form is deterministic and therefore
        # implementable under the replayable-results contract — ES
        # itself documents that seed+field gives reproducible scores.
        # value = uniform [0, 1) from md5(seed ':' field), bit-exact
        # in any engine with md5 (the oracle replays it); the
        # UNSEEDED form (ES hashes a random per-request seed) stays a
        # named 400. Divergence: ES derives its uniform from a
        # different hash mix, so the VALUES differ — the contract
        # random_score provides (stable pseudo-random ordering keyed
        # by seed+field) is identical.
        body = fn["random_score"]
        if not isinstance(body, dict):
            raise DslError("random_score must be an object")
        bad = sorted(set(body) - {"seed", "field"})
        if bad:
            raise DslError(f"unsupported random_score keys: {bad}")
        if "seed" not in body or "field" not in body:
            raise DslError(
                "random_score requires BOTH seed and field (the "
                "unseeded form is nondeterministic — this engine's "
                "replayable-results contract needs the reproducible "
                "variant ES documents for consistent paging)")
        seed = body["seed"]
        if isinstance(seed, bool) or not isinstance(seed, (int, str)):
            raise DslError("random_score seed must be an int or string")
        val = (
            F.conv(
                F.substring(
                    F.md5(F.concat(
                        F.lit(f"{seed}:"),
                        resolver(str(body["field"])).cast("string"))),
                    1, 8),
                16, 10,
            ).cast("double") / F.lit(4294967296.0)
        )
    else:
        decay_body = fn[kinds[0]]
        if not isinstance(decay_body, dict) or len(decay_body) != 1:
            raise DslError(
                f"{kinds[0]} decay expects exactly one field")
        fname = next(iter(decay_body))
        val = _decay_column(kinds[0], decay_body, resolver,
                            is_date=str(fname) in date_fields,
                            schema_fields=schema_fields)
    if fn.get("weight") is not None:
        val = val * F.lit(float(fn["weight"]))
    return cond, val


def function_score_columns(
    body: dict,
    field_resolver: Callable[[str], Column],
    schema_fields: list[str],
    date_fields: set[str],
) -> tuple[Column, Column, float | None]:
    """A ``function_score`` body → (predicate, score, min_score).

    The predicate is the inner query's membership (the same compile
    the filter context uses); the score is pure column algebra:
    per-function (matches, weightxvalue) pairs folded under
    ``score_mode``, capped by ``max_boost``, combined with the base
    score under ``boost_mode``. A function whose filter does not match
    is EXCLUDED from the fold (ES semantics), and when none match the
    functions contribute the neutral 1.0.

    r12: the base score is the inner query's REAL relevance score
    (:func:`.es_dsl.compile_score` — tf-scored text leaves, boost-
    honoring compounds), no longer the flat filter-context 1.0; a
    ``match_all``/plain-leaf inner query still scores 1.0, so the
    pre-r12 shapes are unchanged, while a filter-only ``bool`` now
    scores 0.0 exactly like ES. The top-level ``boost`` multiplies the
    final combined score (Lucene's boost contract), where it was
    previously accepted-and-ignored.
    """
    if not isinstance(body, dict):
        raise DslError("function_score must be an object")
    unknown = sorted(set(body) - {
        "query", "functions", "score_mode", "boost_mode", "max_boost",
        "min_score", "boost", *_FUNCTION_KINDS, "random_score",
    })
    if unknown:
        raise DslError(f"unsupported function_score keys: {unknown}")
    score_mode = str(body.get("score_mode", "multiply"))
    boost_mode = str(body.get("boost_mode", "multiply"))
    if score_mode not in _SCORE_MODES:
        raise DslError(f"unknown score_mode {score_mode!r}")
    if boost_mode not in _BOOST_MODES:
        raise DslError(f"unknown boost_mode {boost_mode!r}")

    inner = body.get("query", {"match_all": {}})
    pred = compile_dsl(inner, field_resolver=field_resolver,
                       schema_fields=schema_fields)
    base = compile_score(inner, field_resolver=field_resolver,
                         schema_fields=schema_fields)

    fns = body.get("functions")
    if fns is None:
        # single-function shorthand riding the function_score object
        short = {k: v for k, v in body.items()
                 if k in _FUNCTION_KINDS or k == "random_score"}
        fns = [short] if short else []
    if not isinstance(fns, list):
        raise DslError("functions must be a list")
    pairs = [
        _one_function(fn, field_resolver, schema_fields, base,
                      date_fields)
        for fn in fns
    ]

    if not pairs:
        combined = F.lit(1.0)
    elif score_mode == "multiply":
        acc = F.lit(1.0)
        for cond, val in pairs:
            acc = acc * F.when(cond, val).otherwise(F.lit(1.0))
        combined = acc
    elif score_mode == "sum":
        acc = F.lit(0.0)
        any_m = F.lit(False)
        for cond, val in pairs:
            acc = acc + F.when(cond, val).otherwise(F.lit(0.0))
            any_m = any_m | cond
        combined = F.when(any_m, acc).otherwise(F.lit(1.0))
    elif score_mode == "avg":
        total = F.lit(0.0)
        n = F.lit(0.0)
        for cond, val in pairs:
            total = total + F.when(cond, val).otherwise(F.lit(0.0))
            n = n + F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))
        combined = F.coalesce(F.try_divide(total, n), F.lit(1.0))
    elif score_mode == "first":
        combined = F.coalesce(
            *[F.when(cond, val) for cond, val in pairs], F.lit(1.0))
    else:  # max / min — greatest/least skip nulls (non-matching fns)
        agg = F.greatest if score_mode == "max" else F.least
        vals = [F.when(cond, val) for cond, val in pairs]
        one = vals[0] if len(vals) == 1 else agg(*vals)
        combined = F.coalesce(one, F.lit(1.0))

    if body.get("max_boost") is not None:
        combined = F.least(combined, F.lit(float(body["max_boost"])))

    if boost_mode == "multiply":
        score = base * combined
    elif boost_mode == "replace":
        score = combined
    elif boost_mode == "sum":
        score = base + combined
    elif boost_mode == "avg":
        score = (base + combined) / F.lit(2.0)
    elif boost_mode == "max":
        score = F.greatest(base, combined)
    else:
        score = F.least(base, combined)

    if "boost" in body:
        # the top-level query boost: multiplies the final combined
        # score (Lucene wraps the whole function_score query)
        score = score * F.lit(_req_boost(body["boost"], "function_score"))

    ms = body.get("min_score")
    return pred, score.cast("double"), (
        float(ms) if ms is not None else None)


def script_score_columns(
    body: dict,
    field_resolver: Callable[[str], Column],
    schema_fields: list[str],
) -> tuple[Column, Column, float | None]:
    """A ``script_score`` QUERY body → (predicate, score, min_score).
    Score = the script result over the matched set, times the optional
    top-level ``boost``; ``_score`` inside the script binds to the
    inner query's relevance score (module docstring — r12; previously
    the flat 1.0)."""
    if not isinstance(body, dict):
        raise DslError("script_score must be an object")
    unknown = sorted(set(body) - {"query", "script", "min_score",
                                  "boost"})
    if unknown:
        raise DslError(f"unsupported script_score keys: {unknown}")
    if "script" not in body:
        raise DslError("script_score requires a script")
    inner = body.get("query", {"match_all": {}})
    pred = compile_dsl(inner, field_resolver=field_resolver,
                       schema_fields=schema_fields)
    base = compile_score(inner, field_resolver=field_resolver,
                         schema_fields=schema_fields)
    score = script_column(body["script"], field_resolver, base)
    if "boost" in body:
        score = score * F.lit(_req_boost(body["boost"], "script_score"))
    ms = body.get("min_score")
    return pred, score, (float(ms) if ms is not None else None)


# ---------------------------------------------------------------------------
# rank_feature / distance_feature (r9) — ranked-page scoring leaves
# ---------------------------------------------------------------------------

_RANK_FNS = ("saturation", "log", "sigmoid", "linear")

_DURATION_RE = re.compile(r"^(\d+)(ms|s|m|h|d)$")
_DURATION_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                "d": 86_400_000}


def _duration_millis(spec) -> float:
    if isinstance(spec, (int, float)) and not isinstance(spec, bool):
        return float(spec)
    m = _DURATION_RE.match(str(spec))
    if not m:
        raise DslError(
            f"malformed time pivot {spec!r} (implemented units: "
            f"{sorted(_DURATION_MS)})")
    return float(m.group(1)) * _DURATION_MS[m.group(2)]


def rank_feature_columns(
    body: dict, field_resolver: Callable[[str], Column],
) -> tuple[Column, Column, None]:
    """A ``rank_feature`` query body → (predicate, score, None).

    Membership is ES's: documents where the feature exists and is
    positive. Score functions (Lucene's, exactly): ``saturation``
    v/(v+pivot); ``log`` ln(scaling_factor·v + 1); ``sigmoid``
    v^e/(v^e + pivot^e); ``linear`` v — times ``boost``.

    Documented divergence: ES's default saturation pivot is an index
    statistic (≈ the feature's geometric mean) — this engine does not
    guess it; ``saturation`` without an explicit ``pivot`` is a named
    400 so results can never silently depend on corpus state.
    """
    if not isinstance(body, dict):
        raise DslError("rank_feature must be an object")
    unknown = sorted(set(body) - {"field", "boost", *_RANK_FNS})
    if unknown:
        raise DslError(f"unsupported rank_feature keys: {unknown}")
    field = body.get("field")
    if not isinstance(field, str):
        raise DslError("rank_feature requires a field")
    c = field_resolver(field)
    v = c.cast("double")
    # membership on the UNCAST column so the positive-feature filter
    # pushes into the parquet scan (a cast blocks pushdown)
    pred = c.isNotNull() & (c > 0)
    fns = [k for k in body if k in _RANK_FNS]
    if len(fns) > 1:
        raise DslError(
            f"rank_feature takes one score function, got {sorted(fns)}")
    if not fns:
        raise DslError(
            "rank_feature needs an explicit score function "
            "(saturation {pivot}, log {scaling_factor}, sigmoid "
            "{pivot, exponent}, linear {}) — ES's default saturation "
            "pivot is an index statistic this engine does not guess"
        )
    kind = fns[0]
    spec = body[kind] if isinstance(body[kind], dict) else {}
    if kind == "saturation":
        if "pivot" not in spec:
            raise DslError(
                "saturation requires an explicit pivot (see "
                "rank_feature docs: the ES default is corpus-derived)")
        p = float(spec["pivot"])
        if p <= 0:
            raise DslError("saturation pivot must be positive")
        score = v / (v + F.lit(p))
    elif kind == "log":
        if "scaling_factor" not in spec:
            raise DslError("log requires a scaling_factor")
        score = F.log(v * F.lit(float(spec["scaling_factor"])) + F.lit(1.0))
    elif kind == "sigmoid":
        if "pivot" not in spec or "exponent" not in spec:
            raise DslError("sigmoid requires pivot and exponent")
        p, e = float(spec["pivot"]), float(spec["exponent"])
        if p <= 0 or e <= 0:
            raise DslError("sigmoid pivot and exponent must be positive")
        ve = F.pow(v, F.lit(e))
        score = ve / (ve + F.lit(p ** e))
    else:  # linear
        score = v
    boost = float(body.get("boost", 1.0))
    return pred, (score * F.lit(boost)).cast("double"), None


def distance_feature_columns(
    body: dict, field_resolver: Callable[[str], Column],
    date_fields: set[str], schema_fields=None,
) -> tuple[Column, Column, None]:
    """A ``distance_feature`` query body → (predicate, score, None).

    score = boost · pivot / (pivot + |value − origin|), the ES
    formula, over numeric, date/timestamp, or (r13 late) geo_point
    fields. A geo field is detected by the parquet-native
    ``f_lat``/``f_lon`` pair in ``schema_fields`` (the struct form is
    name-ambiguous with a plain numeric column, so only the pair
    convention auto-detects); its origin takes the ES geo-point
    literal forms, its pivot the ES distance grammar (``"1000m"``),
    and distance is the same haversine the geo query leaves use.
    Membership is ES's: any document that has the field. Date pivots
    take ES time units (``7d``, ``3h``, …); ``origin: "now"`` is a
    named 400 (nondeterministic ranking contradicts the
    replayable-results contract — send a concrete timestamp)."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        _norm_schema_fields,
    )

    schema_fields = _norm_schema_fields(schema_fields)
    if not isinstance(body, dict):
        raise DslError("distance_feature must be an object")
    unknown = sorted(set(body) - {"field", "origin", "pivot", "boost"})
    if unknown:
        raise DslError(f"unsupported distance_feature keys: {unknown}")
    field = body.get("field")
    if not isinstance(field, str):
        raise DslError("distance_feature requires a field")
    if "origin" not in body or "pivot" not in body:
        raise DslError("distance_feature requires origin and pivot")
    origin, pivot = body["origin"], body["pivot"]
    boost = float(body.get("boost", 1.0))
    if schema_fields is not None \
            and f"{field}_lat" in schema_fields \
            and f"{field}_lon" in schema_fields:
        from sql_database_to_elastic_datalake_spark.functions.geo import (
            haversine_km,
            parse_distance_km,
        )
        from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
            _parse_geo_point,
        )

        plat, plon = _parse_geo_point(origin)
        try:
            p = parse_distance_km(pivot)
        except ValueError:
            raise DslError(
                f"malformed distance_feature pivot {pivot!r}") \
                from None
        if p <= 0:
            raise DslError("distance_feature pivot must be positive")
        lat_c = field_resolver(f"{field}_lat")
        lon_c = field_resolver(f"{field}_lon")
        dist = haversine_km(lat_c, lon_c, F.lit(plat), F.lit(plon))
        score = F.lit(boost) * F.lit(p) / (F.lit(p) + dist)
        return (lat_c.isNotNull() & lon_c.isNotNull(),
                score.cast("double"), None)
    c = field_resolver(field)
    if field in date_fields:
        if isinstance(origin, str) and origin.strip().lower() \
                .startswith("now"):
            raise DslError(
                "distance_feature origin 'now' is not supported "
                "(nondeterministic ranking; send a concrete timestamp)")
        p = _duration_millis(pivot)
        # origin parses in-plan with the same session-tz rules as the
        # column's own epoch conversion
        o_ms = F.unix_millis(F.to_timestamp(F.lit(str(origin))))
        dist = F.abs(F.unix_millis(c.cast("timestamp")) - o_ms) \
            .cast("double")
    else:
        try:
            o = float(origin)
            p = float(pivot)
        except (TypeError, ValueError):
            raise DslError(
                f"distance_feature on a numeric field needs numeric "
                f"origin/pivot, got origin={origin!r} pivot={pivot!r}"
            ) from None
        dist = F.abs(c.cast("double") - F.lit(o))
    if p <= 0:
        raise DslError("distance_feature pivot must be positive")
    score = F.lit(boost) * F.lit(p) / (F.lit(p) + dist)
    return c.isNotNull(), score.cast("double"), None


_EMIT_RE = re.compile(r"^\s*emit\s*\((.*)\)\s*;?\s*$", re.S)

_RUNTIME_TYPES = ("double", "long")


def runtime_column(spec: dict, field_resolver) -> Column:
    """One ``runtime_mappings`` entry → a typed Column. The script is
    the same painless subset :func:`script_column` takes; ES's
    ``emit(...)`` wrapper is unwrapped (a bare expression also
    works). Only numeric runtime types are expressible in the
    arithmetic grammar — ``keyword``/``date``/… are named 400s, not
    silently-wrong strings."""
    if not isinstance(spec, dict):
        raise DslError("runtime field spec must be an object")
    unknown = sorted(set(spec) - {"type", "script"})
    if unknown:
        raise DslError(f"unsupported runtime field keys: {unknown}")
    rtype = str(spec.get("type", "double"))
    if rtype not in _RUNTIME_TYPES:
        raise DslError(
            f"unsupported runtime field type {rtype!r} "
            f"(implemented: {list(_RUNTIME_TYPES)})"
        )
    script = spec.get("script")
    if isinstance(script, str):
        script = {"source": script}
    if not isinstance(script, dict) or "source" not in script:
        raise DslError("runtime field requires a script")
    src = str(script["source"])
    m = _EMIT_RE.match(src)
    if m:
        src = m.group(1)
    col = script_column({**script, "source": src}, field_resolver,
                        F.lit(1.0))
    return col.cast("long") if rtype == "long" else col
