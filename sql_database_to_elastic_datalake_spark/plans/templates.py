"""Search templates — ES's ``_search/template`` mustache surface.

Reference parity: the reference forwards search bodies verbatim to ES
(/root/reference/src/search_api.py:38-46), where ``_search/template``
is a standard client idiom (saved queries parameterized at call time).
This module implements the MUSTACHE SUBSET real templates use:

  * ``{{var}}``      — scalar substitution, JSON-escaped (ES configures
    mustache with a JSON escaper, not the HTML default);
  * ``{{#toJson}}var{{/toJson}}`` — full JSON encoding of the
    parameter (arrays/objects — the "pass a terms list" idiom).

Everything else in the mustache grammar (conditional sections,
inverted sections, partials, triple-stache, ``{{#join}}``,
``{{#url}}``, dotted paths) is a NAMED 400 — the reject-instead-of-
drop policy: a template relying on unimplemented syntax must fail
loudly, not render wrong.

Rendering happens over the template's JSON TEXT (object sources are
serialized first, like ES), then the result must parse back to a JSON
object — the rendered body flows through the ordinary
``/search/advanced`` pipeline unchanged.
"""

from __future__ import annotations

import json
import re

from sql_database_to_elastic_datalake_spark.plans.es_dsl import DslError

_NAME_RE = re.compile(r"[A-Za-z0-9_-]+")  # no '.' — dotted-path 400s

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


def render_search_template(source, params) -> dict:
    """Render a search template to the request body it parameterizes.

    ``source`` is the template (a string of JSON-with-mustache, or an
    object that is serialized first — both ES request shapes);
    ``params`` the parameter object. Returns the rendered body dict;
    every malformed input is a named :class:`DslError` (the route's
    400)."""
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

    out: list[str] = []
    i = 0
    while True:
        j = tpl.find("{{", i)
        if j < 0:
            out.append(tpl[i:])
            break
        out.append(tpl[i:j])
        end = tpl.find("}}", j + 2)
        if end < 0:
            raise DslError("unterminated {{ tag in template")
        tag = tpl[j + 2:end]
        i = end + 2
        if tag.startswith("{"):
            raise DslError(
                "unsupported mustache triple-stache {{{ }}} — scalar "
                "{{var}} is already JSON-escaped; use "
                "{{#toJson}}var{{/toJson}} for structures")
        if tag.startswith("#"):
            section = tag[1:].strip()
            if section != "toJson":
                raise DslError(
                    f"unsupported mustache section {{{{#{section}}}}} "
                    "(only {{#toJson}} is implemented)")
            close = tpl.find(_TOJSON_CLOSE, i)
            if close < 0:
                raise DslError("missing {{/toJson}} close tag")
            var = _check_name(tpl[i:close])
            i = close + len(_TOJSON_CLOSE)
            out.append(json.dumps(params.get(var))
                       if var in params else "null")
        elif tag[:1] in ("/", "^", ">", "!", "&", "="):
            raise DslError(
                f"unsupported mustache tag {{{{{tag}}}}} (supported: "
                "{{var}} and {{#toJson}}var{{/toJson}})")
        else:
            var = _check_name(tag)
            out.append(_scalar(params.get(var)))
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
