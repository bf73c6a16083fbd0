"""Search templates — ES's ``_search/template`` mustache surface.

Reference parity: the reference forwards search bodies verbatim to ES
(/root/reference/src/search_api.py:38-46), where ``_search/template``
is a standard client idiom (saved queries parameterized at call time).
This module implements the MUSTACHE SUBSET real templates use:

  * ``{{var}}``      — scalar substitution, JSON-escaped (ES configures
    mustache with a JSON escaper, not the HTML default);
  * ``{{#toJson}}var{{/toJson}}`` — full JSON encoding of the
    parameter (arrays/objects — the "pass a terms list" idiom);
  * ``{{#name}}…{{/name}}`` sections (r12): render nothing on a falsy
    value (missing/null/false/empty list — the mustache spec's falsey
    set), once per element over a list (the element pushed as the
    lookup context, ``{{.}}`` the implicit iterator), once with the
    value pushed otherwise — full spec context-stack lookup, nested
    sections included;
  * ``{{^name}}…{{/name}}`` inverted sections (r12): render exactly
    when the section value is falsy — the "default this clause when
    the param is absent" idiom.

  * ``{{>name}}`` partials (r13): the stored template ``name``
    (the ``_scripts`` namespace) rendered in the CALLING context —
    the "shared query fragment" idiom; unknown or recursive partials
    are named 400s.

  * ``{{{var}}}`` / ``{{&var}}`` (r13 late) — RAW scalar insertion
    (no escaping): the published-template idiom for a parameter that
    is itself a pre-escaped fragment.

Everything else in the mustache grammar (comments, set-delimiter,
lambdas ``{{#join}}``/``{{#url}}``, dotted paths) is a NAMED 400 — the reject-instead-of-drop policy: a template relying on
unimplemented syntax must fail loudly, not render wrong.

Rendering happens over the template's JSON TEXT (object sources are
serialized first, like ES), then the result must parse back to a JSON
object — the rendered body flows through the ordinary
``/search/advanced`` pipeline unchanged.
"""

from __future__ import annotations

import json
import re

from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError

_NAME_RE = re.compile(r"[A-Za-z0-9_-]+|\.")  # no dotted paths

_TOJSON_CLOSE = "{{/toJson}}"


def _check_name(name: str) -> str:
    name = name.strip()
    if not _NAME_RE.fullmatch(name):
        raise DslError(
            f"unsupported template variable {name!r} (plain parameter "
            "names only — mustache dotted-path traversal is not "
            "implemented)")
    return name


def _scalar(value) -> str:
    """A ``{{var}}`` insertion: the value's text form with JSON string
    escaping (the template's own quotes provide string context, like
    ES's mustache+JSON-escaper stack). Missing/None renders empty —
    mustache's rule."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    if isinstance(value, str):
        return json.dumps(value)[1:-1]  # escaped content, no quotes
    raise DslError(
        "template parameter is an array/object — interpolate those "
        "with {{#toJson}}name{{/toJson}}, not {{name}}")


def _raw(value) -> str:
    """A ``{{{var}}}`` / ``{{&var}}`` insertion: the value's text form
    with NO escaping — the caller's fragment lands verbatim (so a
    param can carry, e.g., a pre-escaped query_string). Same
    missing/None→empty and array/object→400 rules as :func:`_scalar`."""
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return json.dumps(value)
    if isinstance(value, str):
        return value
    raise DslError(
        "template parameter is an array/object — interpolate those "
        "with {{#toJson}}name{{/toJson}}, not {{{name}}}")


def _falsy(value) -> bool:
    """The mustache spec's falsey set: absent/null, false, and the
    empty list. (0 and "" are TRUTHY per the spec.)"""
    return value is None or value is False or (
        isinstance(value, list) and not value)


def _parse(tpl: str, i: int, stop: str | None):
    """Parse template text into a node list until the matching
    ``{{/stop}}`` close (or end of input when ``stop`` is None).
    Nodes: ("text", s) | ("var", name) | ("tojson", name) |
    ("section", name, children) | ("inverted", name, children).
    Returns (nodes, next_index)."""
    nodes: list[tuple] = []
    while True:
        j = tpl.find("{{", i)
        if j < 0:
            if stop is not None:
                raise DslError(
                    f"missing {{{{/{stop}}}}} close tag in template")
            nodes.append(("text", tpl[i:]))
            return nodes, len(tpl)
        nodes.append(("text", tpl[i:j]))
        end = tpl.find("}}", j + 2)
        if end < 0:
            raise DslError("unterminated {{ tag in template")
        tag = tpl[j + 2:end]
        i = end + 2
        if tag.startswith("{"):
            # r13 late: triple-stache {{{var}}} — RAW (unescaped)
            # scalar insertion, the published-template idiom for a
            # param that is itself a query-string fragment. The
            # naive `find("}}")` above stopped INSIDE the closing
            # `}}}`; the third brace is the next char.
            if i >= len(tpl) or tpl[i] != "}":
                raise DslError(
                    "unterminated mustache triple-stache {{{ }}}")
            i += 1
            nodes.append(("raw", _check_name(tag[1:])))
            continue
        if tag.startswith("#"):
            section = tag[1:].strip()
            if section == "toJson":
                close = tpl.find(_TOJSON_CLOSE, i)
                if close < 0:
                    raise DslError("missing {{/toJson}} close tag")
                var = _check_name(tpl[i:close])
                i = close + len(_TOJSON_CLOSE)
                nodes.append(("tojson", var))
                continue
            if section in ("join", "url"):
                # ES-mustache CUSTOM LAMBDAS, not plain sections —
                # rendering them with section semantics would be
                # silently wrong, so they stay named 400s
                raise DslError(
                    f"unsupported mustache section "
                    f"{{{{#{section}}}}} (ES's {section} lambda is "
                    "not implemented; sections/inversions/toJson are)")
            name = _check_name(section)
            children, i = _parse(tpl, i, stop=name)
            nodes.append(("section", name, children))
        elif tag.startswith("^"):
            name = _check_name(tag[1:])
            children, i = _parse(tpl, i, stop=name)
            nodes.append(("inverted", name, children))
        elif tag.startswith("/"):
            name = tag[1:].strip()
            if stop is None or name != stop:
                raise DslError(
                    f"unexpected close tag {{{{/{name}}}}}" + (
                        f" (open section is {{{{#{stop}}}}})"
                        if stop else " with no open section"))
            return nodes, i
        elif tag[:1] == ">":
            # r13 (r12 verdict #5): partials, resolved from the STORED
            # template namespace at render time (ES ships stored search
            # templates as the partial source); they inherit the
            # calling context per the mustache spec
            nodes.append(("partial", _check_name(tag[1:])))
        elif tag[:1] == "&":
            # {{&var}} is the spec's alias for triple-stache
            nodes.append(("raw", _check_name(tag[1:])))
        elif tag[:1] in ("!", "="):
            raise DslError(
                f"unsupported mustache tag {{{{{tag}}}}} (supported: "
                "{{var}}, {{{var}}}/{{&var}}, "
                "{{#toJson}}var{{/toJson}}, {{#section}}, "
                "{{^inverted}}, {{>partial}})")
        else:
            nodes.append(("var", _check_name(tag)))


def _lookup(stack: list, name: str):
    """Mustache context-stack resolution: ``.`` is the innermost
    frame; a plain name walks the stack innermost-out and returns the
    first dict frame that defines it (missing → None)."""
    if name == ".":
        return stack[-1]
    for frame in reversed(stack):
        if isinstance(frame, dict) and name in frame:
            return frame[name]
    return None


def _render(nodes: list[tuple], stack: list, out: list[str],
            partials: dict | None = None,
            active_partials: frozenset = frozenset()) -> None:
    for node in nodes:
        kind = node[0]
        if kind == "text":
            out.append(node[1])
        elif kind == "var":
            out.append(_scalar(_lookup(stack, node[1])))
        elif kind == "raw":
            out.append(_raw(_lookup(stack, node[1])))
        elif kind == "tojson":
            val = _lookup(stack, node[1])
            out.append(json.dumps(val))
        elif kind == "section":
            val = _lookup(stack, node[1])
            if _falsy(val):
                continue
            if isinstance(val, list):
                for el in val:
                    _render(node[2], stack + [el], out, partials,
                            active_partials)
            else:
                # dicts push a lookup frame; truthy scalars push as
                # the {{.}} value — both once, per the spec
                _render(node[2], stack + [val], out, partials,
                        active_partials)
        elif kind == "partial":
            name = node[1]
            tpl = (partials or {}).get(name)
            if tpl is None:
                raise DslError(
                    f"unknown template partial {{{{>{name}}}}} — "
                    "store it first (PUT _scripts/" + name + ")")
            if name in active_partials:
                # the spec allows recursion bounded by falsy data;
                # a JSON-body template that re-includes itself can
                # only diverge — reject by name instead of hanging
                raise DslError(
                    f"recursive template partial {{{{>{name}}}}}")
            src = tpl["source"] if isinstance(tpl, dict) and \
                "source" in tpl else tpl
            text = json.dumps(src) if isinstance(src, dict) else str(src)
            sub, _ = _parse(text, 0, stop=None)
            # partials inherit the CALLING context (mustache spec) —
            # same stack, no new frame
            _render(sub, stack, out, partials,
                    active_partials | {name})
        else:  # inverted
            val = _lookup(stack, node[1])
            if _falsy(val):
                _render(node[2], stack, out, partials,
                        active_partials)


def render_search_template(source, params, partials: dict | None = None,
                           ) -> dict:
    """Render a search template to the request body it parameterizes.

    ``source`` is the template (a string of JSON-with-mustache, or an
    object that is serialized first — both ES request shapes);
    ``params`` the parameter object; ``partials`` the stored-template
    namespace ``{{>name}}`` resolves against (r13 — each partial's
    source renders in the CALLING context per the mustache spec;
    unknown and recursive partials are named 400s). Returns the
    rendered body dict; every malformed input is a named
    :class:`DslError` (the route's 400)."""
    if isinstance(source, dict):
        tpl = json.dumps(source)
    elif isinstance(source, str):
        tpl = source
    else:
        raise DslError("template source must be a string or an object")
    if params is None:
        params = {}
    if not isinstance(params, dict):
        raise DslError("template params must be an object")

    nodes, _ = _parse(tpl, 0, stop=None)
    out: list[str] = []
    _render(nodes, [params], out, partials)
    rendered = "".join(out)
    try:
        body = json.loads(rendered)
    except ValueError as ex:
        raise DslError(
            f"template did not render to valid JSON ({ex}); "
            f"rendered head: {rendered[:200]!r}") from None
    if not isinstance(body, dict):
        raise DslError("template must render to a JSON object")
    return body


def validate_stored_script(body) -> dict:
    """``PUT _scripts/<id>`` body validation → the script dict to
    store. ES requires ``{"script": {"lang": "mustache", "source":
    …}}`` for search templates; anything else is the caller's 400."""
    if not isinstance(body, dict) or not isinstance(
            body.get("script"), dict):
        raise DslError("stored template body must carry a script object")
    script = body["script"]
    lang = script.get("lang", "mustache")
    if lang != "mustache":
        raise DslError(
            f"unsupported script lang {lang!r} for a search template "
            "(mustache only)")
    source = script.get("source")
    if not isinstance(source, (str, dict)):
        raise DslError("script source must be a string or an object")
    return {"lang": "mustache", "source": source}
