"""Property-based tests (hypothesis).

The heavyweight one drives the ES-DSL compiler with randomly generated
query trees and checks Spark's filter results against an independent
pure-Python evaluator of the documented semantics — a differential test
for the compiler itself.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
    _wildcard_to_like,
    compile_dsl,
    tokenize,
)

# --- pure-python reference evaluator ---------------------------------------

ROWS = [
    {"id": 1, "kind": "a", "n": 5, "txt": "Spark merges fast",
     "labels": [{"name": "bug"}, {"name": "urgent"}],
     "cats": ["x", "y"], "n_req": 1},
    {"id": 2, "kind": "b", "n": 15, "txt": "slow pandas loop",
     "labels": [], "cats": ["x"], "n_req": 2},
    {"id": 3, "kind": "a", "n": 25, "txt": None, "labels": None,
     "cats": None, "n_req": 1},
    {"id": 4, "kind": None, "n": None, "txt": "spark spark spark",
     "labels": [{"name": "spark"}], "cats": ["z", "w", "x"], "n_req": None},
    {"id": 5, "kind": "c", "n": 0, "txt": "", "labels": [{"name": None}],
     "cats": [], "n_req": 0},
    # unicode row: accents, CJK, emoji — exercises lower/levenshtein/
    # regex/wildcard parity on non-ASCII code points
    {"id": 6, "kind": "ü", "n": 7, "txt": "Späŕk 样本 🙂 fast",
     "labels": [{"name": "ürgent"}], "cats": ["y", "z"], "n_req": 3},
]

ROWS_SCHEMA = (
    "id long, kind string, n long, txt string, "
    "labels array<struct<name: string>>, cats array<string>, n_req long"
)

#: column list handed to compile_dsl as schema_fields (and used by the
#: eval mirror) for multi_match wildcard field expansion
ROW_COLUMNS = ["id", "kind", "n", "txt", "labels", "cats", "n_req"]


def _lev(a: str, b: str) -> int:
    """Plain DP Levenshtein — the independent reference for `fuzzy`."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _wild_re(pattern: str) -> str:
    import re as _re

    return "".join(
        ".*" if c == "*" else "." if c == "?" else _re.escape(c)
        for c in pattern
    )


def _eval_msm(spec, n: int) -> int:
    """Independent mirror of the ES minimum_should_match grammar
    (deliberately NOT importing the module's resolver — the point of
    the differential is two implementations of the documented spec)."""
    if isinstance(spec, int):
        return spec if spec >= 0 else n + spec
    s = str(spec).strip()
    if "<" in s:
        brackets = sorted(
            (int(p.split("<")[0]), p.split("<", 1)[1]) for p in s.split()
        )
        chosen = None
        for test, sub in brackets:
            if n > test:
                chosen = sub
        return n if chosen is None else _eval_msm(chosen, n)
    if s.endswith("%"):
        pct = int(s[:-1])
        k = abs(pct) * n // 100
        return k if pct >= 0 else n - k
    return _eval_msm(int(s), n)


def eval_dsl(row: dict, dsl: dict) -> bool:
    kind, body = next(iter(dsl.items()))
    if kind == "match_all":
        return True
    if kind == "term":
        f, v = next(iter(body.items()))
        ci = isinstance(v, dict) and v.get("case_insensitive", False)
        if isinstance(v, dict):
            v = v["value"]  # spec form; boost (if present) is ignored
        if row[f] is None:
            return False
        if ci:
            return str(row[f]).lower() == str(v).lower()
        return row[f] == v
    if kind == "terms":
        f, vs = next(iter(body.items()))
        return row[f] is not None and row[f] in vs
    if kind == "range":
        f, bounds = next(iter(body.items()))
        x = row[f]
        if x is None:
            return False
        ops = {"gte": lambda a, b: a >= b, "gt": lambda a, b: a > b,
               "lte": lambda a, b: a <= b, "lt": lambda a, b: a < b}
        return all(ops[op](x, v) for op, v in bounds.items())
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "match":
        f, q = next(iter(body.items()))
        operator, ztq, fz = "or", "none", None
        if isinstance(q, dict):
            operator = q.get("operator", "or")
            ztq = q.get("zero_terms_query", "none")
            fz = q.get("fuzziness")
            q = q["query"]
        toks = tokenize(str(q))
        if not toks:
            return ztq == "all"  # ES zero_terms_query (checked first)

        s = row[f]
        if s is None:
            return False
        if fz is not None:
            # r7 fuzziness-in-match mirror: token-vs-token edit
            # distance (independent _lev DP vs the engine's
            # levenshtein expression)
            from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
                _max_edits,
            )

            words = tokenize(s)
            hits = (
                any(_lev(w, t) <= _max_edits(fz, t) for w in words)
                for t in toks
            )
            return all(hits) if operator == "and" else any(hits)
        hits = (t in s.lower() for t in toks)
        return all(hits) if operator == "and" else any(hits)
    if kind == "match_phrase":
        f, q = next(iter(body.items()))
        slop = 0
        if isinstance(q, dict):
            slop = q.get("slop", 0)
            q = q["query"]
        s = row[f]
        if s is None:
            return False
        if not slop:
            return str(q).lower() in s.lower()
        # r7 sloppy-phrase mirror: BRUTE-FORCE in-order assignment
        # search (the engine compiles a greedy chain — an independent
        # algorithm for the same documented semantics)
        toks = tokenize(str(q))
        if not toks:
            return False
        words = tokenize(s)
        positions = [[i for i, w in enumerate(words) if w == t]
                     for t in toks]
        if any(not p for p in positions):
            return False
        if len(toks) == 1:
            return True
        import itertools

        lim = len(toks) - 1 + slop
        return any(
            all(b > a for a, b in zip(combo, combo[1:]))
            and combo[-1] - combo[0] <= lim
            for combo in itertools.product(*positions)
        )
    if kind == "prefix":
        f, v = next(iter(body.items()))
        ci = isinstance(v, dict) and v.get("case_insensitive", False)
        if isinstance(v, dict):
            v = v["value"]
        s = row[f]
        if s is None:
            return False
        if ci:
            return str(s).lower().startswith(str(v).lower())
        return str(s).startswith(str(v))
    if kind == "wildcard":
        import re as _re

        f, v = next(iter(body.items()))
        ci = isinstance(v, dict) and v.get("case_insensitive", False)
        if isinstance(v, dict):
            v = v["value"]
        s = row[f]
        if s is None:
            return False
        if ci:
            return bool(_re.fullmatch(_wild_re(str(v).lower()),
                                      str(s).lower()))
        return bool(_re.fullmatch(_wild_re(str(v)), str(s)))
    if kind == "regexp":
        import re as _re

        f, v = next(iter(body.items()))
        ci = isinstance(v, dict) and v.get("case_insensitive", False)
        if isinstance(v, dict):
            v = v["value"]
        s = row[f]
        if s is None:
            return False
        flags = _re.IGNORECASE if ci else 0
        return bool(_re.fullmatch(str(v), str(s), flags))
    if kind == "fuzzy":
        from sql_database_to_elastic_datalake_spark.plans.es_dsl import _max_edits

        f = next(iter(body))
        spec = body[f] if isinstance(body[f], dict) else {}
        v = spec["value"] if spec else body[f]
        edits = _max_edits(spec.get("fuzziness", "AUTO"), str(v))
        s = row[f]
        return s is not None and _lev(str(s).lower(), str(v).lower()) <= edits
    if kind == "nested":
        els = row[body["path"]]
        if not els:
            return False
        prefix = body["path"] + "."

        def strip(node):
            k, b = next(iter(node.items()))
            if k == "bool":
                return {k: {ck: [strip(c) for c in (cv if isinstance(cv, list) else [cv])]
                            if ck != "minimum_should_match" else cv
                            for ck, cv in b.items()}}
            f, rest = next(iter(b.items()))
            f2 = f[len(prefix):] if f.startswith(prefix) else f
            return {k: {f2: rest}}

        inner = strip(body["query"])
        return any(eval_dsl(el, inner) for el in els)
    if kind == "constant_score":
        return eval_dsl(row, body["filter"])
    if kind == "match_phrase_prefix":
        f, q = next(iter(body.items()))
        if isinstance(q, dict):
            q = q["query"]
        s = row[f]
        return s is not None and str(q).lower() in s.lower()
    if kind == "terms_set":
        f, spec = next(iter(body.items()))
        vals = row[f]
        if vals is None:
            return False
        inter = len(set(vals) & set(spec["terms"]))
        if "minimum_should_match_field" in spec:
            need = row[spec["minimum_should_match_field"]]
            return need is not None and inter >= need
        return inter >= _eval_msm(spec["minimum_should_match"],
                                  len(spec["terms"]))
    if kind == "multi_match":
        fields = []
        for f in body["fields"]:
            name = str(f).split("^", 1)[0]
            if "*" in name or "?" in name:
                import fnmatch as _fn

                fields += [c for c in ROW_COLUMNS
                           if _fn.fnmatchcase(c, name)]
            else:
                fields.append(name)
        toks = tokenize(str(body["query"]))
        if not toks:
            return False
        op_all = str(body.get("operator", "or")).lower() == "and"
        seen = list(dict.fromkeys(fields))

        def field_hit(f):
            if row[f] is None:
                return False
            hits = (t in str(row[f]).lower() for t in toks)
            return all(hits) if op_all else any(hits)

        return any(field_hit(f) for f in seen)
    if kind in ("query_string", "simple_query_string"):
        # shared parse (pinned separately by tests/test_query_string.py),
        # INDEPENDENT evaluation of the parsed tree by this mirror
        from sql_database_to_elastic_datalake_spark.plans.query_string import (
            parse_query_string,
        )

        tree = parse_query_string(
            body, schema_fields=ROW_COLUMNS,
            simple=kind == "simple_query_string",
        )
        return eval_dsl(row, tree)
    # r7 leaves: membership-only mirrors (scoring keys are ignored in
    # filter context, the engine's documented divergence)
    if kind == "dis_max":
        return any(eval_dsl(row, q) for q in body["queries"])
    if kind == "boosting":
        return eval_dsl(row, body["positive"])
    if kind == "match_bool_prefix":
        f, q = next(iter(body.items()))
        operator = "or"
        if isinstance(q, dict):
            operator = q.get("operator", "or")
            q = q["query"]
        toks = tokenize(str(q))
        if not toks:
            return False
        s = row[f]
        if s is None:
            return False
        hits = (t in s.lower() for t in toks)
        return all(hits) if operator == "and" else any(hits)
    if kind == "combined_fields":
        toks = tokenize(str(body.get("query", "")))
        if not toks:
            return False
        fields = [str(f).split("^", 1)[0] for f in body["fields"]]
        import fnmatch as _fn

        expanded = []
        for f in fields:
            if "*" in f or "?" in f:
                expanded.extend(c for c in ROW_COLUMNS
                                if _fn.fnmatchcase(c, f))
            else:
                expanded.append(f)
        if not expanded:
            return False
        operator = str(body.get("operator", "or")).lower()
        hits = (
            any(row[f] is not None and t in str(row[f]).lower()
                for f in expanded)
            for t in toks
        )
        return all(hits) if operator == "and" else any(hits)
    if kind == "wrapper":
        import base64 as _b64
        import json as _json

        return eval_dsl(row, _json.loads(_b64.b64decode(body["query"])))
    if kind == "pinned":
        f = body.get("field", "id")
        pinned_hit = row.get(f) is not None and \
            str(row[f]) in [str(v) for v in body["ids"]]
        return pinned_hit or eval_dsl(row, body["organic"])
    if kind == "bool":
        must = body.get("must", [])
        must_not = body.get("must_not", [])
        should = body.get("should", [])
        clauses = [eval_dsl(row, m) for m in must]
        clauses += [not eval_dsl(row, m) for m in must_not]
        if should:
            raw = body.get("minimum_should_match")
            msm = (0 if (must or must_not) else 1) if raw is None \
                else _eval_msm(raw, len(should))
            if msm <= 0 and not (must or must_not):
                msm = 1  # Lucene: no required clauses -> >=1 optional
            if msm >= 1:
                clauses.append(
                    sum(eval_dsl(row, s) for s in should) >= msm
                )
        return all(clauses) if clauses else True
    raise AssertionError(kind)


# --- DSL tree strategy ------------------------------------------------------



def eval_score(row, dsl) -> float:
    """Independent python mirror of compile_score's deterministic
    scoring model (r12): tf-scored text leaves x boost x ^weights,
    constant-boost filter leaves, Lucene compound rules. Arithmetic
    mirrors the Column expression ORDER so doubles agree bit-for-bit.
    Only meaningful where eval_dsl(row, dsl) holds."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        _node_boost,
        split_field_boost,
    )

    kind, body = next(iter(dsl.items()))

    def tf(field, query):
        s = row.get(field)
        low = str(s).lower() if s is not None else None
        score = 0.0
        for t in tokenize(str(query)):
            occ = (0.0 if low is None
                   else (len(low) - len(low.replace(t, ""))) / len(t))
            score = score + 1.0 * occ
        return float(score)

    if kind == "bool":
        boost = float(body["boost"]) if "boost" in body else 1.0
        total = 0.0
        for key in ("must", "should"):
            subs = body.get(key) or []
            for sub in (subs if isinstance(subs, list) else [subs]):
                total = total + (eval_score(row, sub)
                                 if eval_dsl(row, sub) else 0.0)
        return total * boost
    if kind == "dis_max":
        boost = float(body["boost"]) if "boost" in body else 1.0
        tb = float(body.get("tie_breaker", 0.0))
        matched = [(eval_dsl(row, q), q) for q in body["queries"]]
        scores = [eval_score(row, q) for m, q in matched if m]
        best = max(scores) if scores else 0.0
        msum = 0.0
        for m, q in matched:
            msum = msum + (eval_score(row, q) if m else 0.0)
        return (best + tb * (msum - best)) * boost
    if kind == "boosting":
        boost = float(body["boost"]) if "boost" in body else 1.0
        pos = eval_score(row, body["positive"])
        if "negative" in body and eval_dsl(row, body["negative"]):
            pos = pos * float(body["negative_boost"])
        return pos * boost
    if kind == "constant_score":
        return float(body.get("boost", 1.0))
    if kind == "match_all":
        return _node_boost(body, kind) if isinstance(body, dict) else 1.0
    if kind == "match":
        f, spec = next(iter(body.items()))
        value = spec.get("query") if isinstance(spec, dict) else spec
        boost = (float(spec["boost"])
                 if isinstance(spec, dict) and "boost" in spec else 1.0)
        return tf(f, value) * boost
    if kind in ("match_phrase", "match_phrase_prefix"):
        f, spec = next(iter(body.items()))
        value = str(spec.get("query") if isinstance(spec, dict)
                    else spec).lower()
        boost = (float(spec["boost"])
                 if isinstance(spec, dict) and "boost" in spec else 1.0)
        if not value:
            return 0.0
        s = row.get(f)
        low = str(s).lower() if s is not None else None
        occ = (0.0 if low is None
               else (len(low) - len(low.replace(value, "")))
               / len(value))
        return occ * boost
    if kind == "multi_match":
        boost = float(body["boost"]) if "boost" in body else 1.0
        tb = float(body.get("tie_breaker", 0.0))
        weights: dict = {}
        for f in body["fields"]:
            name, w = split_field_boost(f)
            if "*" in name or "?" in name:
                import fnmatch as _fn

                for c in ROW_COLUMNS:
                    if _fn.fnmatchcase(c, name):
                        weights.setdefault(c, w)
            else:
                weights.setdefault(name, w)
        if not weights:
            return 0.0
        per = [tf(f, body.get("query", "")) * w
               for f, w in weights.items()]
        if str(body.get("type", "best_fields")) == "most_fields":
            score = per[0]
            for x in per[1:]:
                score = score + x
        else:
            best = per[0] if len(per) == 1 else max(per)
            total = per[0]
            for x in per[1:]:
                total = total + x
            score = best + tb * (total - best)
        return score * boost
    if kind in ("query_string", "simple_query_string"):
        from sql_database_to_elastic_datalake_spark.plans.query_string \
            import parse_query_string

        boost = (float(body["boost"])
                 if isinstance(body, dict) and "boost" in body else 1.0)
        tree = parse_query_string(
            body, schema_fields=ROW_COLUMNS,
            simple=kind == "simple_query_string")
        return eval_score(row, tree) * boost
    if kind == "wrapper":
        import base64 as _b64
        import json as _json

        return eval_score(row, _json.loads(_b64.b64decode(
            body["query"])))
    return _node_boost(body, kind)


leaf = st.one_of(
    st.just({"match_all": {}}),
    st.builds(lambda v: {"term": {"kind": v}}, st.sampled_from(["a", "b", "c", "x", "ü"])),
    st.builds(lambda vs: {"terms": {"n": vs}},
              st.lists(st.sampled_from([0, 5, 15, 25, 99]), min_size=1, max_size=3)),
    st.builds(
        lambda lo, hi: {"range": {"n": {"gte": lo, "lt": hi}}},
        st.integers(-5, 30), st.integers(-5, 30),
    ),
    st.builds(lambda f: {"exists": {"field": f}}, st.sampled_from(["kind", "n", "txt"])),
    st.builds(lambda q: {"match": {"txt": q}},
              st.sampled_from(["spark", "pandas loop", "fast spark", "zzz", "", "späŕk 样本"])),
    # r3-added compiler leaves, covered per the r3 verdict: regexp,
    # fuzzy, nested (the trees place any leaf under must_not/should, so
    # zero-terms match and NULL fields hit the null-safe negation path)
    st.builds(lambda q, op: {"match": {"txt": {"query": q, "operator": op}}},
              st.sampled_from(["spark fast", "slow loop", "spark zzz", ""]),
              st.sampled_from(["and", "or"])),
    st.builds(lambda q: {"match_phrase": {"txt": q}},
              st.sampled_from(["spark merges", "pandas loop", "SPARK", "zz"])),
    st.builds(lambda v: {"prefix": {"txt": v}},
              st.sampled_from(["Spa", "spark", "s", "", "Spä"])),
    st.builds(lambda v: {"wildcard": {"txt": v}},
              st.sampled_from(["*spark*", "S?ark*", "*loop", "*", "??"])),
    st.builds(lambda v: {"regexp": {"txt": v}},
              st.sampled_from(
                  ["[Ss]park.*", ".*(fast|loop)", "s.*k", "[a-z ]*", ""])),
    st.builds(
        lambda v, fz: {"fuzzy": {"txt": {"value": v, "fuzziness": fz}}},
        st.sampled_from(["spark spark spark", "slow pandas loop", "spork", "", "späŕk"]),
        st.sampled_from([0, 1, 2, "AUTO"]),
    ),
    st.builds(lambda v: {"nested": {"path": "labels",
                                    "query": {"term": {"labels.name": v}}}},
              st.sampled_from(["bug", "spark", "zzz", "ürgent"])),
    st.builds(lambda q, fs: {"multi_match": {"query": q, "fields": fs}},
              st.sampled_from(["spark", "pandas loop", "a", "zzz", ""]),
              st.sampled_from([["txt"], ["kind", "txt"], ["tx*"],
                               ["t?t", "kind^2"], ["k*"], ["zz*"],
                               ["txt", "tx*"]])),
    st.builds(lambda v, b: {"term": {"kind": {"value": v, "boost": b}}},
              st.sampled_from(["a", "b", "ü"]),
              st.sampled_from([0.1, 2.0, 5])),
    # r6 leaf options: case_insensitive variants, match
    # zero_terms_query, multi_match operator
    st.builds(lambda v: {"term": {"txt": {"value": v,
                                          "case_insensitive": True}}},
              st.sampled_from(["SPARK SPARK SPARK", "Slow Pandas Loop",
                               "späŕk 样本 🙂 fast", ""])),
    st.builds(lambda v: {"prefix": {"txt": {"value": v,
                                            "case_insensitive": True}}},
              st.sampled_from(["SPA", "sLoW", "SPÄ", ""])),
    st.builds(lambda v: {"wildcard": {"txt": {"value": v,
                                              "case_insensitive": True}}},
              st.sampled_from(["*SPARK*", "S?ARK*", "*LOOP"])),
    st.builds(lambda q, z: {"match": {"txt": {
                  "query": q, "zero_terms_query": z}}},
              st.sampled_from(["", "!!!", "spark", "·—·"]),
              st.sampled_from(["none", "all"])),
    st.builds(lambda q, fs, op: {"multi_match": {
                  "query": q, "fields": fs, "operator": op}},
              st.sampled_from(["spark fast", "slow loop", "a zzz"]),
              st.sampled_from([["txt"], ["kind", "txt"]]),
              st.sampled_from(["and", "or"])),
    st.builds(lambda inner, b: {"constant_score": {"filter": inner,
                                                   "boost": b}},
              st.sampled_from([{"term": {"kind": "a"}},
                               {"match": {"txt": "spark"}},
                               {"exists": {"field": "n"}}]),
              st.sampled_from([0.5, 2])),
    st.builds(lambda q: {"match_phrase_prefix": {"txt": q}},
              st.sampled_from(["pandas lo", "Spark mer", "spark spark sp",
                               "zz", ""])),
    # r7 options: match_phrase slop (greedy chain vs brute-force
    # mirror) and fuzziness-in-match (token-vs-token edit distance)
    st.builds(lambda q, sl: {"match_phrase": {"txt": {
                  "query": q, "slop": sl}}},
              st.sampled_from(["spark fast", "slow loop", "spark merges",
                               "merges spark", "spark spark spark",
                               "spark 样本 fast", "pandas fast loop"]),
              st.sampled_from([1, 2, 3])),
    st.builds(lambda q, fz, op: {"match": {"txt": {
                  "query": q, "fuzziness": fz, "operator": op}}},
              st.sampled_from(["spork", "pandas lop", "zzz", "spark fat",
                               "släw 样衣"]),
              st.sampled_from([0, 1, 2, "AUTO"]),
              st.sampled_from(["and", "or"])),
    st.builds(lambda terms, msm: {"terms_set": {"cats": {
                  "terms": terms, "minimum_should_match": msm}}},
              st.lists(st.sampled_from(["x", "y", "z", "w"]),
                       min_size=1, max_size=3, unique=True),
              st.sampled_from([1, 2, "50%", "100%", -1])),
    st.builds(lambda terms: {"terms_set": {"cats": {
                  "terms": terms, "minimum_should_match_field": "n_req"}}},
              st.lists(st.sampled_from(["x", "y", "z"]),
                       min_size=1, max_size=2, unique=True)),
    st.builds(lambda q: {"nested": {"path": "labels",
                                    "query": {"match": {"labels.name": q}}}},
              st.sampled_from(["bug urgent", "spark", ""])),
    # r7 leaves: dis_max / boosting / match_bool_prefix /
    # combined_fields / pinned / wrapper — compiled union/positive/
    # term-centric membership vs the independent mirrors above
    st.builds(lambda qs, tb: {"dis_max": {"queries": qs,
                                          "tie_breaker": tb}},
              st.lists(st.sampled_from(
                  [{"term": {"kind": "a"}}, {"match": {"txt": "spark"}},
                   {"range": {"n": {"gte": 10}}},
                   {"exists": {"field": "txt"}}]),
                  min_size=1, max_size=3),
              st.sampled_from([0.0, 0.7])),
    st.builds(lambda p, n: {"boosting": {"positive": p, "negative": n,
                                         "negative_boost": 0.5}},
              st.sampled_from([{"term": {"kind": "b"}},
                               {"match": {"txt": "loop"}},
                               {"range": {"n": {"lt": 20}}}]),
              st.sampled_from([{"term": {"kind": "a"}},
                               {"match_all": {}}])),
    st.builds(lambda q, op: {"match_bool_prefix": {"txt": {
                  "query": q, "operator": op}}},
              st.sampled_from(["spark fa", "slow lo", "pandas loop",
                               "zz", "spä"]),
              st.sampled_from(["and", "or"])),
    st.builds(lambda q, fs, op: {"combined_fields": {
                  "query": q, "fields": fs, "operator": op}},
              st.sampled_from(["spark a", "slow loop", "a b", "zzz"]),
              st.sampled_from([["txt"], ["kind", "txt"], ["tx*"],
                               ["txt^2", "k*"]]),
              st.sampled_from(["and", "or"])),
    st.builds(lambda ids, org: {"pinned": {"ids": ids, "organic": org,
                                           "field": "kind"}},
              st.lists(st.sampled_from(["a", "b", "zz"]), min_size=1,
                       max_size=2),
              st.sampled_from([{"match": {"txt": "spark"}},
                               {"term": {"kind": "c"}}])),
    st.builds(
        lambda inner: {"wrapper": {"query": __import__("base64")
                       .b64encode(__import__("json").dumps(inner)
                                  .encode()).decode()}},
        st.sampled_from([{"term": {"kind": "a"}},
                         {"match": {"txt": "pandas loop"}},
                         {"range": {"n": {"gte": 5, "lt": 25}}}]),
    ),
)


# --- query_string strategies (r6): random grammar compositions ---------------
# The string grammar parses to the structured leaves; the eval mirror
# parses with the SAME parser and evaluates the tree with the
# independent leaf/bool mirror above — so the differential covers the
# compiled semantics of every parsed tree, not the parse itself (the
# parser's shape is pinned by tests/test_query_string.py).

_qs_term = st.one_of(
    st.sampled_from(["spark", "pandas", "loop", "fast", "zzz", "ü",
                     "样本"]),
    st.sampled_from(['"pandas loop"', '"fast"', '"SPARK merges"']),
    st.sampled_from(["*spark*", "s?ark*", "*loop", "sp*"]),
    st.builds(lambda f, w: f + ":" + w,
              st.sampled_from(["txt", "kind"]),
              st.sampled_from(["spark", "a", "b", "zzz", "ü"])),
    # r7 bracket ranges: inclusive/exclusive mixes, open ends, the
    # [* TO *] exists form — compiled to the structured range leaf
    st.builds(
        lambda lo, hi, br: br[0] + str(lo) + " TO " + str(hi) + br[1],
        st.sampled_from([0, 5, 7, "*"]),
        st.sampled_from([15, 25, "*"]),
        st.sampled_from(["[]", "{}", "[}", "{]"]),
    ).map(lambda r: "n:" + r),
    st.sampled_from(["kind:[a TO b]", "kind:{a TO c}",
                     'n:["5" TO "25"]']),
    # r7 operators: ~ fuzzy (→ fuzziness-in-match), "…"~N slop
    # (→ match_phrase slop), /regex/ (→ the anchored regexp leaf)
    st.sampled_from(["spork~1", "txt:spark~", "pandas~2", "zzz~1"]),
    st.sampled_from(['"spark fast"~1', '"slow loop"~2',
                     'txt:"spark merges"~3', '"merges spark"~1']),
    st.sampled_from(["txt:/[Ss]park.*/", "txt:/(slow|fast).*/",
                     "kind:/[ab]/"]),
    # r12 boosts: term^w, field^w:term, "phrase"^w, fuzzy~N^w —
    # retained in the parsed tree and honored by the score compiler
    st.sampled_from(["spark^2", "txt:merge^3", "loop^0.5",
                     "txt^2:spark", '"pandas loop"^2',
                     '"spark fast"~1^3', "spork~1^2"]),
)
_qs_unary = st.builds(
    lambda p, t: p + t,
    st.sampled_from(["", "", "+", "-", "NOT "]), _qs_term,
)


def _qs_group(children):
    return st.builds(
        lambda items, op: "(" + op.join(items) + ")",
        st.lists(children, min_size=1, max_size=3),
        st.sampled_from([" ", " AND ", " OR ", " && ", " || "]),
    )


qs_leaf = st.builds(
    lambda q, op, fs: {"query_string": {
        "query": q, "fields": fs, "default_operator": op}},
    st.recursive(_qs_unary, _qs_group, max_leaves=4),
    st.sampled_from(["or", "and"]),
    # r12: weighted/wildcard field lists exercise the weight map
    st.sampled_from([["txt"], ["txt^2"], ["txt^1.5", "kind"],
                     ["tx*^2", "kind^3"]]),
)
simple_qs_leaf = st.builds(
    lambda items: {"simple_query_string": {
        "query": " ".join(items), "fields": ["txt"]}},
    st.lists(st.sampled_from(
        ["spark", "pandas", "-loop", "+fast", '"pandas loop"', "|",
         "zzz", "(spark | loop)"]), min_size=1, max_size=4),
)
leaf = st.one_of(leaf, qs_leaf, simple_qs_leaf)


def bool_node(children):
    return st.builds(
        lambda must, must_not, should, msm: {
            "bool": {
                "must": must, "must_not": must_not, "should": should,
                **({"minimum_should_match": msm} if should and msm else {}),
            }
        },
        st.lists(children, max_size=2),
        st.lists(children, max_size=1),
        st.lists(children, max_size=2),
        # 0 means "omit the key" (the strategy lambda drops falsy msm);
        # strings exercise the full spec grammar end-to-end
        st.sampled_from([0, 1, 2, 3, -1, "25%", "50%", "75%", "100%",
                         "-25%", "-50%", "1<50%", "2<-25% 9<-3"]),
    )


dsl_trees = st.recursive(leaf, bool_node, max_leaves=6)


@pytest.mark.usefixtures("spark")
class TestDslDifferential:
    @settings(
        # 25 keeps the suite fast; crank SPARK_GRAFT_HYP_EXAMPLES for a
        # deep differential sweep (done at 300 when the generator grows)
        max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "25")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(dsl=dsl_trees)
    def test_compiler_matches_python_eval(self, spark, dsl):
        df = getattr(self, "_df", None)
        if df is None:
            df = spark.createDataFrame(ROWS, ROWS_SCHEMA)
            type(self)._df = df
        got = sorted(
            r["id"] for r in
            df.filter(compile_dsl(dsl, schema_fields=ROW_COLUMNS)).collect()
        )
        want = sorted(r["id"] for r in ROWS if eval_dsl(r, dsl))
        assert got == want, f"dsl={dsl}"

    @settings(
        max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "25")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(dsl=dsl_trees)
    def test_score_compiler_matches_python_eval(self, spark, dsl):
        """r12: compile_score vs the independent python scorer — every
        generated tree's per-row relevance score (boosts, field
        weights, bool sums, dis_max tie_breaker, phrase counts, tf)
        must agree bit-for-bit on the rows the tree matches."""
        from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
            compile_score,
        )

        df = getattr(self, "_df", None)
        if df is None:
            df = spark.createDataFrame(ROWS, ROWS_SCHEMA)
            type(self)._df = df
        got = {
            r["id"]: r["_s"] for r in
            df.filter(compile_dsl(dsl, schema_fields=ROW_COLUMNS))
            .withColumn("_s", compile_score(dsl,
                                            schema_fields=ROW_COLUMNS))
            .collect()
        }
        want = {r["id"]: eval_score(r, dsl)
                for r in ROWS if eval_dsl(r, dsl)}
        assert got == want, f"dsl={dsl}"


@given(st.text(max_size=40))
def test_tokenize_invariants(s):
    toks = tokenize(s)
    assert all(t and t == t.lower() and t.isalnum() for t in toks)


@given(st.text(alphabet="ab*?%_\\", max_size=12))
def test_wildcard_to_like_escapes(p):
    like = _wildcard_to_like(p)
    # every SQL meta-char in the output traces back to an ES wildcard;
    # pre-existing SQL metas are escaped
    i = 0
    unescaped = []
    while i < len(like):
        if like[i] == "\\":
            i += 2
            continue
        unescaped.append(like[i])
        i += 1
    assert unescaped.count("%") == p.count("*")
    assert unescaped.count("_") == p.count("?")


# --- chunking / packing invariants -----------------------------------------


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_tokens=st.integers(min_value=1, max_value=60),
    chunk_size=st.integers(min_value=1, max_value=16),
    stride_frac=st.integers(min_value=1, max_value=16),
)
def test_chunk_documents_window_invariants(spark, n_tokens, chunk_size, stride_frac):
    """For any (n, size, stride): windows are exactly the slices
    tokens[i·stride : i·stride+size]; every token is covered; no window
    starts beyond the text."""
    from pyspark.sql import Row

    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        chunk_documents,
    )

    stride = min(stride_frac, chunk_size)  # stride ≤ size (standard use)
    words = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([Row(doc_id=1, text=" ".join(words))])
    out = sorted(
        chunk_documents(df, "doc_id", "text", chunk_size, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    covered = set()
    for r in out:
        i = r["chunk_idx"]
        start = i * stride
        expect = words[start : start + chunk_size]
        assert r["chunk"].split() == expect
        assert r["n_tokens"] == len(expect)
        assert start < n_tokens
        covered.update(range(start, min(start + chunk_size, n_tokens)))
    assert covered == set(range(n_tokens))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=500),
)
def test_pack_by_token_budget_is_prefix_floor(spark, counts, budget):
    from pyspark.sql import Row

    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        pack_by_token_budget,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, n=c) for i, c in enumerate(counts)]
    )
    from pyspark.sql import functions as F

    out = {r["doc_id"]: r["batch_id"]
           for r in pack_by_token_budget(df, "doc_id", F.col("n"), budget).collect()}
    prefix = 0
    prev_batch = 0
    for i, c in enumerate(counts):
        assert out[i] == prefix // budget
        assert out[i] >= prev_batch  # non-decreasing in doc order
        prev_batch = out[i]
        prefix += c


# --- painless-subset differential vs DuckDB (r10, verdict #9) --------------
#
# score_dsl.script_column is a hand-rolled recursive-descent parser now
# load-bearing for four surfaces (function_score, the script query,
# script-sourced metrics, runtime_mappings). Hypothesis builds a random
# AST, renders it BOTH as a painless source string (fully parenthesized)
# and as the equivalent DuckDB SQL expression encoding the documented
# semantics (null propagation, try_divide, Kleene logic, libm guards),
# then compares Spark's evaluation against DuckDB's row by row. Floats
# compare with a tiny relative tolerance: +-*/ are IEEE exact-rounded,
# but ln/exp/pow differ by last-ulps across libms (the engine's
# documented reason to keep them out of value-hash oracles).

_SCRIPT_FIELDS = ("a", "b", "c")  # c carries nulls
_SCRIPT_PARAMS = {"p": 2.5, "q": -3.0}

_script_leaf = st.one_of(
    st.sampled_from([("num", v) for v in
                     (0.0, 1.0, -2.0, 0.5, 3.25, 10.0)]),
    st.sampled_from([("field", f) for f in _SCRIPT_FIELDS]),
    st.sampled_from([("param", p) for p in _SCRIPT_PARAMS]),
)


def _script_node(children):
    return st.one_of(
        st.tuples(st.just("un"), st.sampled_from(["-", "!"]), children),
        st.tuples(st.just("bin"),
                  st.sampled_from(["+", "-", "*", "/", "%"]),
                  children, children),
        st.tuples(st.just("cmp"),
                  st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
                  children, children),
        st.tuples(st.just("logic"), st.sampled_from(["&&", "||"]),
                  children, children),
        st.tuples(st.just("cond"), children, children, children),
        st.tuples(st.just("math1"),
                  st.sampled_from(["log", "log10", "sqrt", "abs",
                                   "exp", "floor", "ceil"]), children),
        st.tuples(st.just("math2"),
                  st.sampled_from(["pow", "max", "min"]),
                  children, children),
    )


script_asts = st.recursive(_script_leaf, _script_node, max_leaves=8)


def _painless(node) -> str:
    k = node[0]
    if k == "num":
        return f"({node[1]!r})"
    if k == "field":
        return f"doc['{node[1]}'].value"
    if k == "param":
        return f"params.{node[1]}"
    if k == "un":
        return f"({node[1]}{_painless(node[2])})"
    if k in ("bin", "cmp", "logic"):
        return f"({_painless(node[2])} {node[1]} {_painless(node[3])})"
    if k == "cond":
        return (f"({_painless(node[1])} ? {_painless(node[2])}"
                f" : {_painless(node[3])})")
    if k == "math1":
        return f"Math.{node[1]}({_painless(node[2])})"
    return f"Math.{node[1]}({_painless(node[2])}, {_painless(node[3])})"


def _truthy_sql(x: str) -> str:
    return f"({x} <> 0.0)"


def _b2d_sql(cond: str) -> str:
    # null-propagating boolean → 1.0/0.0 (score_dsl._bool_to_double)
    return (f"(CASE WHEN {cond} THEN 1.0 "
            f"WHEN NOT {cond} THEN 0.0 END)")


def _sql(node) -> str:
    k = node[0]
    if k == "num":
        return f"(CAST({node[1]!r} AS DOUBLE))"
    if k == "field":
        return f"(CAST({node[1]} AS DOUBLE))"
    if k == "param":
        return f"(CAST({_SCRIPT_PARAMS[node[1]]!r} AS DOUBLE))"
    if k == "un":
        if node[1] == "-":
            return f"(-{_sql(node[2])})"
        return _b2d_sql(f"NOT {_truthy_sql(_sql(node[2]))}")
    if k == "bin":
        left, right = _sql(node[2]), _sql(node[3])
        if node[1] == "/":
            # try_divide: null on /0 (DuckDB doubles give inf)
            return f"({left} / nullif({right}, 0.0))"
        if node[1] == "%":
            # Java % on doubles is the TRUNCATED remainder (sign of
            # the dividend) — DuckDB's % operator matches; its fmod()
            # is the FLOORED remainder and does not. Null on %0.
            return f"({left} % nullif({right}, 0.0))"
        return f"({left} {node[1]} {right})"
    if k == "cmp":
        op = "=" if node[1] == "==" else node[1]
        return _b2d_sql(f"({_sql(node[2])} {op} {_sql(node[3])})")
    if k == "logic":
        sop = "AND" if node[1] == "&&" else "OR"
        return _b2d_sql(
            f"({_truthy_sql(_sql(node[2]))} {sop} "
            f"{_truthy_sql(_sql(node[3]))})")
    if k == "cond":
        t = _truthy_sql(_sql(node[1]))
        return (f"(CASE WHEN {t} THEN {_sql(node[2])} "
                f"WHEN NOT {t} THEN {_sql(node[3])} END)")
    if k == "math1":
        x = _sql(node[2])
        fn = node[1]
        if fn == "log":
            return f"(CASE WHEN {x} > 0 THEN ln({x}) END)"
        if fn == "log10":
            return f"(CASE WHEN {x} > 0 THEN log10({x}) END)"
        if fn == "sqrt":
            return f"(CASE WHEN {x} >= 0 THEN sqrt({x}) END)"
        if fn in ("floor", "ceil"):
            return f"(CAST({fn}({x}) AS DOUBLE))"
        return f"({fn}({x}))"
    fn = {"pow": "pow", "max": "greatest", "min": "least"}[node[1]]
    return f"({fn}({_sql(node[2])}, {_sql(node[3])}))"


_SCRIPT_ROWS = [
    (1, 0.0, 1.0, None),
    (2, -2.5, 0.0, 4.0),
    (3, 7.0, -1.0, -0.5),
    (4, 1.0, 100.0, 0.0),
    (5, -0.0, 0.25, 2.0),
    (6, 1e6, -1e-3, None),
]


@pytest.mark.usefixtures("spark")
class TestScriptDifferential:
    @settings(
        max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "25")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ast=script_asts)
    def test_script_column_matches_duckdb(self, spark, ast):
        import math

        import duckdb
        import pandas as pd

        from pyspark.sql import functions as F

        from sql_database_to_elastic_datalake_spark.plans.score_dsl import (
            script_column,
        )

        df = getattr(type(self), "_df", None)
        if df is None:
            df = spark.createDataFrame(
                _SCRIPT_ROWS,
                "id long, a double, b double, c double")
            type(self)._df = df
            type(self)._pdf = pd.DataFrame(
                _SCRIPT_ROWS, columns=["id", "a", "b", "c"],
                dtype=object).astype(
                    {"id": "int64", "a": "float64",
                     "b": "float64", "c": "float64"})
        src = _painless(ast)
        col = script_column(
            {"source": src, "params": _SCRIPT_PARAMS}, F.col,
            base_score=None)
        got = {r["id"]: r["v"]
               for r in df.select("id", col.alias("v")).collect()}
        tbl = type(self)._pdf  # noqa: F841 (duckdb reads local var)
        want = {int(r[0]): r[1] for r in duckdb.sql(
            f"SELECT id, {_sql(ast)} AS v FROM tbl ORDER BY id"
        ).fetchall()}
        for i in got:
            g, w = got[i], want[i]
            if g is None or w is None:
                assert g is None and w is None, \
                    f"src={src} id={i} spark={g} duckdb={w}"
            elif math.isnan(g) or math.isnan(w):
                assert math.isnan(g) and math.isnan(w), \
                    f"src={src} id={i} spark={g} duckdb={w}"
            else:
                assert math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-12), \
                    f"src={src} id={i} spark={g} duckdb={w}"


# --- span-query differential vs a pure-python evaluator (r10) ---------------
#
# The span algebra carries real [s, e) envelopes through producers
# (span_or/first/not/multi, nested ordered span_near) and a
# nested-exists membership walk with a greedy single-token fast path —
# enough moving parts that a structural bug (the HOF two-parameter
# lambda trap was found this round) can hide in a corner no example
# test covers. Hypothesis generates random span trees over a tiny
# vocabulary and compares Spark's filter membership against an
# independent python implementation of the documented span semantics.

_SPAN_VOCAB = ("a", "b", "c", "d")

_span_leaf = st.one_of(
    st.sampled_from([{"span_term": {"txt": t}} for t in _SPAN_VOCAB]),
    st.sampled_from([
        {"span_multi": {"match": {"prefix": {"txt": {"value": t}}}}}
        for t in ("a", "b")]),
)


def _span_node(children):
    return st.one_of(
        st.builds(lambda cs: {"span_or": {"clauses": cs}},
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda c, e: {"span_first": {"match": c, "end": e}},
                  children, st.integers(min_value=1, max_value=6)),
        st.builds(lambda i, x: {"span_not": {"include": i, "exclude": x}},
                  children, children),
        st.builds(
            lambda cs, slop, o: {"span_near": {
                "clauses": cs, "slop": slop, "in_order": o}},
            st.lists(children, min_size=1, max_size=3),
            st.integers(min_value=0, max_value=3),
            st.booleans()),
        st.builds(
            lambda b, l: {"span_containing": {"big": b, "little": l}},
            children, children),
        st.builds(
            lambda b, l: {"span_within": {"big": b, "little": l}},
            children, children),
    )


span_trees = st.recursive(_span_leaf, _span_node, max_leaves=5)

# top level additionally exercises the unordered walk
top_span_trees = st.one_of(
    span_trees,
    st.builds(
        lambda cs, slop, o: {"span_near": {
            "clauses": cs, "slop": slop, "in_order": o}},
        st.lists(span_trees, min_size=2, max_size=3),
        st.integers(min_value=0, max_value=4),
        st.booleans()),
)

_SPAN_DOCS = [
    (1, "a b c d"),
    (2, "d c b a"),
    (3, "a a b b"),
    (4, "c"),
    (5, ""),
    (6, None),
    (7, "b a d a c b"),
    (8, "a b a b a"),
]


def _py_spans(toks: list, node: dict) -> set:
    """Independent evaluator: a span clause → its set of (s, e)."""
    kind, body = next(iter(node.items()))
    if kind == "span_term":
        t = body["txt"] if not isinstance(body["txt"], dict) \
            else body["txt"]["value"]
        return {(i, i + 1) for i, w in enumerate(toks) if w == t}
    if kind == "span_multi":
        pre = body["match"]["prefix"]["txt"]["value"]
        return {(i, i + 1) for i, w in enumerate(toks)
                if w.startswith(pre)}
    if kind == "span_or":
        out: set = set()
        for cl in body["clauses"]:
            out |= _py_spans(toks, cl)
        return out
    if kind == "span_first":
        return {sp for sp in _py_spans(toks, body["match"])
                if sp[1] <= body["end"]}
    if kind == "span_not":
        inc = _py_spans(toks, body["include"])
        exc = _py_spans(toks, body["exclude"])
        return {a for a in inc
                if not any(a[0] < b[1] and b[0] < a[1] for b in exc)}
    if kind in ("span_containing", "span_within"):
        big = _py_spans(toks, body["big"])
        little = _py_spans(toks, body["little"])
        if kind == "span_containing":
            return {a for a in big
                    if any(a[0] <= b[0] and b[1] <= a[1]
                           for b in little)}
        return {a for a in little
                if any(b[0] <= a[0] and a[1] <= b[1] for b in big)}
    if kind == "span_near":
        subs = [_py_spans(toks, cl) for cl in body["clauses"]]
        slop = body.get("slop", 0)
        # chain producer: envelopes with gap budget; unordered = the
        # union over clause permutations (every disjoint arrangement
        # is some ordered chain)
        import itertools

        orders = [subs] if body.get("in_order", True) \
            else [list(p) for p in itertools.permutations(subs)]
        out = set()
        for arrs in orders:

            def rec(i, s0, prev_e, g):
                if g > slop:
                    return
                if i == len(arrs):
                    out.add((s0, prev_e))
                    return
                for (s, e) in arrs[i]:
                    if s >= prev_e:
                        rec(i + 1, s0, e, g + (s - prev_e))

            for (s, e) in arrs[0]:
                rec(1, s, e, 0)
        return out
    raise AssertionError(kind)


def _py_member(toks: list, node: dict) -> bool:
    kind, body = next(iter(node.items()))
    if kind == "span_near" and not body.get("in_order", True):
        # Lucene NearSpansUnordered.atMatch: window condition only —
        # overlapping clause spans are PERMITTED (r11; the former
        # pairwise-disjoint check was stricter than Lucene)
        subs = [_py_spans(toks, cl) for cl in body["clauses"]]
        slop = body.get("slop", 0)
        import itertools

        for combo in itertools.product(*subs):
            win = max(e for _, e in combo) - min(s for s, _ in combo)
            if win - sum(e - s for s, e in combo) <= slop:
                return True
        return False
    return bool(_py_spans(toks, node))


@pytest.mark.usefixtures("spark")
class TestSpanDifferential:
    @settings(
        max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "25")),
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(tree=top_span_trees)
    def test_span_compiler_matches_python(self, spark, tree):
        df = getattr(type(self), "_df", None)
        if df is None:
            df = spark.createDataFrame(_SPAN_DOCS, "id long, txt string")
            type(self)._df = df
        got = sorted(
            r["id"] for r in
            df.filter(compile_dsl(tree)).collect())
        want = sorted(
            i for i, txt in _SPAN_DOCS
            if txt is not None and _py_member(txt.split(), tree))
        assert got == want, f"tree={tree}"


# ---------------------------------------------------------------------------
# Search-template renderer differential (r11): random templates from the
# implemented mustache subset, rendered BOTH by the engine and by an
# independent build-then-encode construction that never touches the
# template text — escaping or substitution bugs show up as JSON
# inequality.
# ---------------------------------------------------------------------------

_tpl_scalars = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.text(max_size=20),  # includes quotes/backslashes/unicode
)
_tpl_names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)


@settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "25")) * 4,
    deadline=None,
)
@given(
    params=st.dictionaries(_tpl_names, _tpl_scalars, max_size=4),
    json_param=st.one_of(
        st.lists(st.integers(min_value=0, max_value=99), max_size=4),
        st.dictionaries(st.text(max_size=5), st.integers(), max_size=3),
        st.none(),
    ),
)
def test_template_renderer_differential(params, json_param):
    import json as _json

    from sql_database_to_elastic_datalake_spark.plans.templates import (
        render_search_template,
    )

    # Build the EXPECTED body first (pure data), then derive a template
    # whose rendering must reproduce it: every scalar param rides a
    # string slot "v:{{name}}" (string context exercises JSON escaping)
    # and a numeric slot where numbers/bools appear bare; the structure
    # param rides {{#toJson}}.
    names = sorted(params)
    expected: dict = {"query": {"match_all": {}}}
    tpl_fields = ['"query": {"match_all": {}}']
    all_params = dict(params)
    for n in names:
        v = params[n]
        if isinstance(v, str):
            sval = v
        elif isinstance(v, bool):
            sval = "true" if v else "false"
        else:
            sval = _json.dumps(v)
        expected[f"s_{n}"] = f"v:{sval}"
        tpl_fields.append(f'"s_{n}": "v:{{{{{n}}}}}"')
    if json_param is not None:
        all_params["the_json"] = json_param
        expected["struct"] = json_param
        tpl_fields.append('"struct": {{#toJson}}the_json{{/toJson}}')
    tpl = "{" + ", ".join(tpl_fields) + "}"
    got = render_search_template(tpl, all_params)
    assert got == expected, (tpl, all_params)
    # r12 sections: the same body wrapped so every field rides inside
    # a truthy section, an inverted-absent section appends a default,
    # and a LIST section replays the integer json_param elements with
    # {{.}} — the independent construction never renders text
    if isinstance(json_param, list):
        all_params["on"] = True
        sec_tpl = ("{" + ", ".join(tpl_fields)
                   + ', "seq": [-1{{#the_json}}, {{.}}{{/the_json}}]'
                   + ', "dflt": "{{#on}}y{{/on}}{{^off}}n{{/off}}"'
                   + "}")
        sec_expected = dict(expected)
        sec_expected["seq"] = [-1, *json_param]
        sec_expected["dflt"] = "yn"
        got = render_search_template(sec_tpl, all_params)
        assert got == sec_expected, (sec_tpl, all_params)
    # r13 partials: hoist the whole field list into a stored fragment
    # referenced via {{>frag}} — rendering in the calling context must
    # reproduce the SAME body the inline form produced
    part_tpl = "{ {{>frag}} }"
    got = render_search_template(
        part_tpl, all_params,
        partials={"frag": ", ".join(tpl_fields)})
    assert got == expected, (part_tpl, all_params)


# --- frequent_item_sets: cube path ≡ bitmask path ---------------------------


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from([None, 0, 1, 2]),
                  st.sampled_from([None, "x", "y"]),
                  st.sampled_from([None, "p", "q", "r"])),
        min_size=1, max_size=25),
    min_size_=st.integers(min_value=1, max_value=3),
    support=st.sampled_from([0.05, 0.2, 0.5]),
)
def test_fis_cube_path_equals_bitmask_path(spark, rows, min_size_, support):
    """The scalar cube() fast path and the array bitmask path are two
    plans for the SAME semantics: wrapping every scalar in a
    one-element array forces the bitmask path with an identical item
    model, so results must match bucket-for-bucket (keys, counts,
    support, closedness) on arbitrary frames with NULLs."""
    from sql_database_to_elastic_datalake_spark.plans.es_aggs import (
        frequent_item_sets_result,
    )

    body = {"fields": [{"field": "a"}, {"field": "b"}, {"field": "c"}],
            "minimum_set_size": min_size_, "minimum_support": support,
            "size": 100}
    scalar_df = spark.createDataFrame(
        rows, "a long, b string, c string")
    wrapped_df = spark.createDataFrame(
        [([a] if a is not None else [],
          [b] if b is not None else [],
          [c] if c is not None else [])
         for a, b, c in rows],
        "a array<long>, b array<string>, c array<string>")
    assert frequent_item_sets_result(scalar_df, body) == \
        frequent_item_sets_result(wrapped_df, body)


# --- mixture resampling invariants ------------------------------------------


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=20),
                   min_size=1, max_size=4),
    weights=st.lists(st.floats(min_value=0.1, max_value=5.0,
                               allow_nan=False),
                     min_size=1, max_size=4),
)
def test_resample_invariants(spark, sizes, weights):
    """For any domain sizes and positive weights: each listed domain
    lands EXACTLY round(w/Σw · N_total) rows; per-doc copy counts
    within a domain differ by at most 1; copy indices are dense."""
    from collections import Counter

    from sql_database_to_elastic_datalake_spark.operators.chunking import (
        resample_to_mixture,
    )

    doms = [f"d{i}" for i in range(len(sizes))]
    rows, rid = [], 0
    for dom, n in zip(doms, sizes):
        for _ in range(n):
            rows.append((rid, dom))
            rid += 1
    df = spark.createDataFrame(rows, "id long, dom string")
    wmap = {d: w for d, w in zip(doms, weights)}
    out = resample_to_mixture(df, "id", "dom", wmap).collect()
    total = sum(sizes)
    tw = sum(wmap.values())
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["dom"], []).append(r)
    for d, w in wmap.items():
        target = round(w / tw * total)
        got = by_dom.get(d, [])
        assert len(got) == target, (d, target, len(got))
        copies = Counter(r["id"] for r in got)
        if copies:
            assert max(copies.values()) - min(copies.values()) <= 1
        for i, n in copies.items():
            assert sorted(r["copy"] for r in got if r["id"] == i) \
                == list(range(n))


def test_math_floor_ceil_nonfinite_painless_semantics(spark):
    """Pinned regression for the differential's find: Java's
    Math.floor/ceil return NaN/±Inf unchanged, while Spark's
    long-typed floor/ceil CLAMP them (NaN → 0, Inf → Long.MAX). The
    compiler must pass non-finite through."""
    import math

    from pyspark.sql import functions as F

    from sql_database_to_elastic_datalake_spark.plans.score_dsl import (
        script_column,
    )

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (float("-inf"),), (1.5,)],
        "a double")
    for fn, finite in (("floor", 1.0), ("ceil", 2.0)):
        out = [r["v"] for r in df.select(script_column(
            {"source": f"Math.{fn}(doc['a'].value)"},
            F.col, base_score=None).alias("v")).collect()]
        assert math.isnan(out[0])
        assert out[1] == float("inf") and out[2] == float("-inf")
        assert out[3] == finite
    # finite doubles past Long.MAX are already integral — Java returns
    # them unchanged where Spark's long floor would saturate at 2^63
    big = spark.createDataFrame([(3.2e19,), (-3.2e19,)], "a double")
    for fn in ("floor", "ceil"):
        out = [r["v"] for r in big.select(script_column(
            {"source": f"Math.{fn}(doc['a'].value)"},
            F.col, base_score=None).alias("v")).collect()]
        assert out == [3.2e19, -3.2e19]
