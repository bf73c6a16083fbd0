"""Lucene ``query_string`` / ``simple_query_string`` → query-DSL trees.

The reference's advanced-search route forwards request bodies VERBATIM
to ``es.search`` (/root/reference/src/search_api.py:38-46), and the
other common leaf family a Kibana/saved query carries besides the
structured leaves is the query-string pair. This module PARSES the
string grammar into the same query-DSL dict trees
:func:`.es_dsl.compile_dsl` already compiles — the string syntax is
pure front-end; every leaf below it reuses the compiled, differential-
tested ``match`` / ``match_phrase`` / ``wildcard`` / ``bool`` semantics
and therefore pushes down / whole-stage-codegens exactly like them.

Supported syntax (the sane subset; everything else is a named 400):

  * bare terms (``spark fast``) joined by ``default_operator`` (OR);
  * ``field:value`` terms, ``field:"a phrase"``, ``field:(grouped …)``
    — ``query_string`` dialect only (``simple_query_string`` has no
    field syntax, per ES);
  * quoted phrases (``"exact phrase"``);
  * explicit ``AND`` / ``OR`` / ``NOT`` (and ``&&`` / ``||`` / ``!``)
    in ``query_string``; ``+`` (and) / ``|`` (or) / ``-`` (not) in
    ``simple_query_string``;
  * ``(`` grouping ``)``;
  * ``*`` / ``?`` wildcards inside terms (compiled to the ``wildcard``
    leaf — case-sensitive, the engine's documented wildcard posture);
  * ``+term`` / ``-term`` prefixes in ``query_string`` (must /
    must_not);
  * ``_exists_:field`` (→ the ``exists`` leaf) and the range
    shorthand ``field:>10`` / ``field:<=2024-01-01`` (→ the ``range``
    leaf; numeric-looking bounds compare numerically) —
    ``query_string`` dialect only;
  * bracket ranges ``field:[a TO b]`` / ``field:{a TO b}`` (r7 — the
    most common still-rejected Kibana search-bar idiom): inclusive
    ``[``/``]``, exclusive ``{``/``}``, ``*`` for an open end
    (``[* TO *]`` → the ``exists`` leaf) — compiled to the structured
    ``range`` leaf; a field-less range applies per default field.
    ``query_string`` dialect only (ES's simple dialect has no range
    syntax — brackets stay literal text there);
  * fuzzy ``term~`` / ``term~N`` (→ the r7 fuzziness-in-match leaf,
    token-vs-token edit distance, AUTO when no number) and sloppy
    phrases ``"a b"~N`` (→ ``match_phrase`` ``slop``) — both dialects,
    matching ES;
  * regex ``/…/`` (→ the structured ``regexp`` leaf, whole-value
    anchored; space-free patterns only, ``query_string`` dialect
    only — ES's simple dialect treats ``/`` as literal text);
  * per-term / per-field ``^boost`` — accepted and ignored (the
    module-wide boost divergence in :mod:`.es_dsl`).

``simple_query_string`` keeps ES's LENIENT posture for *malformed*
syntax (unbalanced quote/paren degrades to literal terms, like ES),
but genuinely malformed operator uses (a bare ``~``, an unterminated
regex in the query dialect) still raise ``DslError``.

Field resolution: an explicit ``fields`` list (entries may be wildcard
patterns and carry ``^boost`` suffixes) or ``default_field`` is
expanded against the table schema exactly like ``multi_match``;
omitted, it defaults to ES's ``*`` (every column).
"""

from __future__ import annotations

import fnmatch
import re

from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError

#: leaf-body keys with implemented semantics (boost: accepted-ignored)
_ALLOWED_KEYS = {
    "query", "fields", "default_field", "default_operator", "boost",
}


def _coerce_number(s: str):
    """Range-shorthand bounds compare numerically when they look like
    numbers (a string literal against a numeric column would
    mis-coerce), else stay strings (dates, ISO timestamps)."""
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _expand_fields(
    patterns: list[str], schema_fields: list[str] | None
) -> dict[str, float]:
    """Expand field names/patterns to an ordered name → ^boost-weight
    map (first occurrence wins, mirroring the membership path's
    dedup). r12: the weight is RETAINED — it multiplies into each
    generated leaf's ``boost`` so the scored paths honor ``title^2``
    (previously accepted-and-ignored)."""
    from sql_database_to_elastic_datalake_spark.plans.es_dsl import (
        split_field_boost,
    )

    out: dict[str, float] = {}
    for f in patterns:
        name, w = split_field_boost(f, "query_string field")
        if "*" in name or "?" in name:
            if schema_fields is None:
                raise DslError(
                    f"query_string field pattern {f!r} needs the table "
                    "schema (pass schema_fields=df.columns)"
                )
            for c in schema_fields:
                if fnmatch.fnmatchcase(c, name):
                    out.setdefault(c, w)
        else:
            out.setdefault(name, w)
    return out


def _split_term_boost(value: str) -> tuple[str, float]:
    """Strip a Lucene ``term^boost`` suffix, returning the weight.
    Malformed suffixes are named 400s (ES rejects ``a^x`` too)."""
    if "^" not in value:
        return value, 1.0
    term, _, suf = value.partition("^")
    try:
        w = float(suf)
    except ValueError:
        raise DslError(
            f"malformed term boost {value!r} in query string "
            "(expected term^number)") from None
    if w < 0:
        raise DslError(
            f"term boost must be non-negative ({value!r})")
    return term, w


def _with_boost(leaf: dict, b: float) -> dict:
    """Attach a combined field-weight x term-boost to a generated
    structured leaf, in the spec shape the DSL compiler reads. A
    neutral 1.0 attaches nothing, so boost-free query strings parse to
    byte-identical trees."""
    if b == 1.0:
        return leaf
    kind, body = next(iter(leaf.items()))
    if kind == "exists":
        return {kind: {**body, "boost": b}}
    if kind == "bool":
        return {kind: {**body, "boost": b}}
    f, spec = next(iter(body.items()))
    if kind == "range":
        return {kind: {f: {**spec, "boost": b}}}
    if not isinstance(spec, dict):
        key = "query" if kind in ("match", "match_phrase") else "value"
        spec = {key: spec}
    return {kind: {f: {**spec, "boost": b}}}


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_WORD_STOP = set(' \t\n\r()"')


def _tokens(s: str, simple: bool) -> list[tuple]:
    """Token stream: ('(',) (')',) ('AND',) ('OR',) ('NOT',) ('PLUS',)
    ('PHRASE', text) ('WORD', text)."""
    out: list[tuple] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c in "()":
            out.append((c,))
            i += 1
            continue
        if c == '"':
            j = s.find('"', i + 1)
            if j < 0:
                raise DslError("unterminated phrase quote")
            out.append(("PHRASE", s[i + 1:j]))
            i = j + 1
            continue
        if simple:
            if c == "|":
                out.append(("OR",))
                i += 1
                continue
            if c == "+":
                out.append(("AND",))
                i += 1
                continue
            if c == "-":
                out.append(("NOT",))
                i += 1
                continue
        else:
            if s.startswith("&&", i):
                out.append(("AND",))
                i += 2
                continue
            if s.startswith("||", i):
                out.append(("OR",))
                i += 2
                continue
            if c == "!":
                out.append(("NOT",))
                i += 1
                continue
            if c == "+":
                out.append(("PLUS",))
                i += 1
                continue
            if c == "-":
                out.append(("NOT",))
                i += 1
                continue
        j = i
        while j < n and s[j] not in _WORD_STOP and not (
            simple and s[j] in "|+"
        ):
            if not simple and s[j] == "/" and (j == i or s[j - 1] == ":"):
                # a /regex/ span (only at term start or after field:):
                # consume to the closing unescaped slash so grouping /
                # alternation chars inside the pattern don't split the
                # token; an unterminated regex reaches the leaf parser,
                # which names the error
                k = s.find("/", j + 1)
                while k > 0 and s[k - 1] == "\\":
                    k = s.find("/", k + 1)
                if k < 0:
                    j = n
                else:
                    j = k + 1
                continue
            j += 1
        word = s[i:j]
        i = j
        if not simple and word in ("AND", "OR", "NOT"):
            out.append((word,))
        else:
            out.append(("WORD", word))
    return out


# ---------------------------------------------------------------------------
# parser (recursive descent)
#
#   or_expr  := seq (OR seq)*
#   seq      := and_expr+            (implicit adjacency)
#   and_expr := unary (AND unary)*
#   unary    := (NOT | PLUS)* primary
#   primary  := '(' or_expr ')' | PHRASE | WORD | field ':' primary
#
# An implicit sequence assembles Lucene's actual default-OR behavior:
# '+'-marked clauses become must, NOT/'-' become must_not, bare clauses
# become should with minimum_should_match 1 only when nothing is
# required — which is what Lucene does for `+a b -c`.
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[tuple], fields: list[str],
                 default_and: bool, simple: bool,
                 weights: dict[str, float] | None = None):
        self.toks = toks
        self.i = 0
        self.fields = fields
        self.default_and = default_and
        self.simple = simple
        #: field → ^boost weight from the fields list (r12)
        self.weights = weights or {}

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # -- grammar ----------------------------------------------------------
    def or_expr(self, fields: list[str]) -> dict:
        parts = [self.seq(fields)]
        while self.peek() == ("OR",):
            self.next()
            parts.append(self.seq(fields))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    def seq(self, fields: list[str]) -> dict:
        items: list[tuple[str | None, dict]] = []
        while True:
            t = self.peek()
            if t is None or t in ((")",), ("OR",)):
                break
            items.append(self.and_chain(fields))
        if not items:
            raise DslError("empty query group")
        if len(items) == 1 and items[0][0] is None:
            return items[0][1]
        must, must_not, should = [], [], []
        for mod, node in items:
            if mod == "must" or (mod is None and self.default_and):
                must.append(node)
            elif mod == "must_not":
                must_not.append(node)
            else:
                should.append(node)
        body: dict = {}
        if must:
            body["must"] = must
        if must_not:
            body["must_not"] = must_not
        if should:
            body["should"] = should
            body["minimum_should_match"] = 0 if must else 1
        return {"bool": body}

    def and_chain(self, fields: list[str]) -> tuple[str | None, dict]:
        mod, node = self.unary(fields)
        parts = [node]
        while self.peek() == ("AND",):
            self.next()
            m2, n2 = self.unary(fields)
            # `a AND -b` folds the negation into the conjunction
            parts.append({"bool": {"must_not": [n2]}}
                         if m2 == "must_not" else n2)
        if len(parts) > 1:
            if mod == "must_not":
                parts[0] = {"bool": {"must_not": [parts[0]]}}
                mod = None
            return mod, {"bool": {"must": parts}}
        return mod, node

    def unary(self, fields: list[str]) -> tuple[str | None, dict]:
        # the modifier is returned UNWRAPPED so seq() can place a
        # negation at its Lucene level (`a -b` = should:[a],
        # must_not:[b] — NOT `a OR (not b)`)
        mod: str | None = None
        while True:
            t = self.peek()
            if t == ("NOT",):
                self.next()
                mod = None if mod == "must_not" else "must_not"
            elif t == ("PLUS",):
                self.next()
                if mod is None:
                    mod = "must"
            else:
                break
        return mod, self.primary(fields)

    def primary(self, fields: list[str]) -> dict:
        t = self.next()
        if t is None:
            raise DslError("query string ended unexpectedly")
        if t == ("(",):
            node = self.or_expr(fields)
            if self.next() != (")",):
                raise DslError("unbalanced parenthesis in query string")
            return node
        if t[0] == "PHRASE":
            return self._phrase_leaf(t[1], fields)
        if t[0] == "WORD":
            return self._word(t[1], fields)
        raise DslError(f"unexpected token {t[0]} in query string")

    # -- leaves -----------------------------------------------------------
    def _word(self, word: str, fields: list[str]) -> dict:
        if not self.simple and ":" in word:
            field, _, value = word.partition(":")
            if not field:
                raise DslError("query string term starts with ':'")
            if field == "_exists_":
                # Lucene's _exists_:field → the structured exists leaf
                if not value:
                    raise DslError("_exists_: requires a field name")
                return {"exists": {"field": value}}
            from sql_database_to_elastic_datalake_spark.plans.es_dsl \
                import split_field_boost

            name, fw = split_field_boost(field, "query_string field")
            if value and value[0] in "<>":
                # range shorthand (field:>10, field:<=2024-01-01) →
                # the structured range leaf
                op = {"<": "lt", ">": "gt",
                      "<=": "lte", ">=": "gte"}[
                          value[:2] if value[1:2] == "=" else value[0]]
                bound = value[2:] if value[1:2] == "=" else value[1:]
                if not bound:
                    raise DslError(
                        f"range shorthand {word!r} has no bound")
                return _with_boost(
                    {"range": {name: {op: _coerce_number(bound)}}}, fw)
            sub = [name]
            sub_w = {name: fw}
            if value and value[0] in "[{":
                # Lucene bracket range: field:[a TO b] / {a TO b}
                bounds = self._to_range_bounds(value)
                if not bounds:
                    return _with_boost(
                        {"exists": {"field": name}}, fw)  # [* TO *]
                return _with_boost({"range": {name: bounds}}, fw)
            if value:
                return self._term_leaf(value, sub, weights=sub_w)
            nxt = self.peek()
            if nxt == ("(",) or (nxt and nxt[0] == "PHRASE"):
                # field:(grouped …) / field:"a phrase"
                saved = self.weights
                self.weights = sub_w
                try:
                    return self.primary(sub)
                finally:
                    self.weights = saved
            raise DslError(f"field {field!r} has no value in query string")
        return self._term_leaf(word, fields)

    def _to_range_bounds(self, first: str) -> dict:
        """Consume the token tail of a ``[a TO b]`` / ``{a TO b}``
        range whose opening word is ``first`` and build the structured
        ``range`` bounds: inclusive ``[``/``]``, exclusive ``{``/``}``,
        ``*`` = unbounded (both open → caller emits ``exists``)."""
        open_ch = first[0]
        parts: list[str] = []
        close: str | None = None

        def push(w: str) -> None:
            nonlocal close
            if w and w[-1] in "]}":
                close = w[-1]
                w = w[:-1]
            if w:
                parts.append(w)

        push(first[1:])
        while close is None:
            t = self.next()
            if t is None:
                raise DslError(
                    "unterminated [a TO b] range in query string")
            if t[0] == "PHRASE":
                parts.append(t[1])  # quoted bound ("2024-01-01")
            elif t[0] == "WORD":
                push(t[1])
            else:
                raise DslError(
                    "malformed [a TO b] range in query string")
        if len(parts) != 3 or parts[1].upper() != "TO":
            raise DslError(
                "malformed range — expected [<from> TO <to>] "
                f"(got {parts!r})"
            )
        lo, hi = parts[0], parts[2]
        bounds: dict = {}
        if lo != "*":
            bounds["gte" if open_ch == "[" else "gt"] = _coerce_number(lo)
        if hi != "*":
            bounds["lte" if close == "]" else "lt"] = _coerce_number(hi)
        return bounds

    def _term_leaf(self, value: str, fields: list[str],
                   weights: dict[str, float] | None = None) -> dict:
        value, tb = _split_term_boost(value)
        if not value:
            raise DslError("empty term in query string")
        if (value[0] in "[{" or value == "TO") and not self.simple:
            # field-less bracket range: applies to the default fields
            # (one range leaf per field). A stray TO outside a range
            # stays an error — Lucene's parser rejects it too.
            if value == "TO":
                raise DslError(
                    "stray TO outside a [a TO b] range in query string")
            bounds = self._to_range_bounds(value)
            if not bounds:
                return self._per_field(
                    fields, lambda f: {"exists": {"field": f}},
                    term_boost=tb, weights=weights)
            return self._per_field(
                fields, lambda f: {"range": {f: bounds}},
                term_boost=tb, weights=weights)
        if value[0] == "/" and not self.simple:
            # /regex/ → the structured regexp leaf (whole-value
            # anchoring, the engine's documented regexp posture).
            # Space-free regexes only — the tokenizer splits on
            # whitespace, Lucene's own parser has the same shape.
            if len(value) < 3 or not value.endswith("/"):
                raise DslError(
                    f"unterminated regex {value!r} in query string")
            pat = value[1:-1]
            return self._per_field(fields,
                                   lambda f: {"regexp": {f: pat}},
                                   term_boost=tb, weights=weights)
        if "~" in value:
            # Lucene fuzzy: term~ (AUTO) / term~N → the r7
            # fuzziness-in-match leaf (token-vs-token edit distance)
            m = re.fullmatch(r"(.*[^~])~(\d*)", value)
            if m is None or not m.group(1):
                raise DslError(
                    f"malformed fuzzy term {value!r} in query string")
            term, edits = m.group(1), m.group(2)
            fuzz = int(edits) if edits else "AUTO"
            return self._per_field(
                fields,
                lambda f: {"match": {f: {"query": term,
                                         "fuzziness": fuzz}}},
                term_boost=tb, weights=weights)
        if "*" in value or "?" in value:
            return self._per_field(
                fields, lambda f: {"wildcard": {f: value}},
                term_boost=tb, weights=weights)
        return self._per_field(fields, lambda f: {"match": {f: value}},
                               term_boost=tb, weights=weights)

    def _phrase_leaf(self, text: str, fields: list[str]) -> dict:
        # "a phrase"~N → match_phrase slop (the r7 positional leaf);
        # the slop suffix arrives as its own WORD token after the
        # quoted phrase
        nxt = self.peek()
        slop, pb = 0, 1.0
        if nxt and nxt[0] == "WORD":
            m = re.fullmatch(
                r"(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?", nxt[1])
            if m and nxt[1]:
                self.next()
                slop = int(m.group(1)) if m.group(1) else 0
                pb = float(m.group(2)) if m.group(2) else 1.0
        if slop:
            return self._per_field(
                fields,
                lambda f: {"match_phrase": {f: {"query": text,
                                                "slop": slop}}},
                term_boost=pb)
        return self._per_field(
            fields, lambda f: {"match_phrase": {f: text}},
            term_boost=pb)

    def _per_field(self, fields: list[str], mk,
                   term_boost: float = 1.0,
                   weights: dict[str, float] | None = None) -> dict:
        if not fields:
            # ES: a field list that expands to nothing matches no docs
            return {"bool": {"must_not": [{"match_all": {}}]}}
        w = self.weights if weights is None else weights
        leaves = [
            _with_boost(mk(f), w.get(f, 1.0) * term_boost)
            for f in fields
        ]
        if len(fields) == 1:
            return leaves[0]
        return {"bool": {"should": leaves,
                         "minimum_should_match": 1}}


def parse_query_string(
    body: dict | str,
    schema_fields: list[str] | None = None,
    simple: bool = False,
) -> dict:
    """Parse a ``query_string`` / ``simple_query_string`` leaf body into
    an equivalent structured query-DSL tree (see module docstring for
    the supported grammar)."""
    if isinstance(body, str):
        body = {"query": body}
    if not isinstance(body, dict) or "query" not in body:
        raise DslError("query_string requires a query")
    unknown = sorted(set(body) - _ALLOWED_KEYS)
    if unknown:
        raise DslError(
            f"unsupported query_string options: {unknown} "
            f"(supported: {sorted(_ALLOWED_KEYS - {'boost'})})"
        )
    raw_fields = body.get("fields")
    if raw_fields is None:
        default = body.get("default_field", "*")
        raw_fields = [default]
    if not isinstance(raw_fields, list) or not raw_fields:
        raise DslError("query_string fields must be a non-empty list")
    weighted = _expand_fields(raw_fields, schema_fields)
    fields = list(weighted)
    op = str(body.get("default_operator", "or")).lower()
    if op not in ("and", "or"):
        raise DslError(f"unknown default_operator {op!r}")
    text = str(body["query"])
    if not text.strip():
        # ES: an empty query string matches no documents
        return {"bool": {"must_not": [{"match_all": {}}]}}

    def _parse(qs: str) -> dict:
        toks = _tokens(qs, simple)
        p = _Parser(toks, fields, default_and=op == "and",
                    simple=simple, weights=weighted)
        node = p.or_expr(fields)
        if p.peek() is not None:
            raise DslError("unbalanced parenthesis in query string")
        return node

    if not simple:
        return _parse(text)
    # simple_query_string is LENIENT on malformed syntax (ES never
    # errors on it): degrade to the bare terms. Unsupported-FEATURE
    # rejections (fuzzy ~ etc.) still surface — re-raised unchanged.
    try:
        return _parse(text)
    except DslError as ex:
        if "not supported" in str(ex):
            raise
        terms = [w for w in text.replace('"', " ").replace("(", " ")
                 .replace(")", " ").replace("|", " ").replace("+", " ")
                 .split() if w not in ("-",)]
        cleaned = " ".join(t.lstrip("-") for t in terms if t.lstrip("-"))
        if not cleaned:
            return {"bool": {"must_not": [{"match_all": {}}]}}
        return _parse(cleaned)
