"""Search templates (ES `_scripts/<id>` + `_search/template`): stored,
parameterized query shapes rendered with mustache-style placeholders and
dispatched onto the typed query surfaces.

ES stores a mustache source under `_scripts` and `_search/template`
renders it into a full query body. The engine-native analogue keeps the
same three-step contract:

  store    put_template(root, name, {...}) -> <root>/templates.json via
           the storage abstraction (temp + rename; readable by any later
           session — the reference's jobspec files play the same role for
           imports, plans/jobspec.py)
  render   render_template: every string value may carry {{param}} /
           {{param:default}} placeholders; a string that IS exactly one
           placeholder substitutes the RAW param (ints/floats/lists stay
           typed — the ES json-encoding trick); rendering recurses
           through dicts/lists; a missing param with no default raises
  search   search_template dispatches the rendered body onto the reader:
           `query_string` -> query_string_df, `query` -> search_df,
           `phrase` -> search_phrase_df, with optional k /
           min_should_match / filter_sql / default_operator / slop
           carried through — both reader tiers expose those surfaces
           with identical signatures.

The template body is data, not code: rendering never evals anything, and
dispatch only reaches the fixed set of query surfaces above.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame

from .storage import LocalFS

TEMPLATES_FILE = "templates.json"

_PLACEHOLDER = re.compile(r"\{\{\s*([A-Za-z_][\w.]*)(?::((?:[^{}]|\{[^{]|\}[^}])*))?\s*\}\}")


def _tpl_path(root: str) -> str:
    return os.path.join(root, TEMPLATES_FILE)


def _load(root: str, fs) -> dict:
    p = _tpl_path(root)
    return json.loads(fs.read_text(p)) if fs.exists(p) else {}


def put_template(root: str, name: str, template: dict, fs=None) -> None:
    """Store/overwrite a named template (ES PUT _scripts/<id>)."""
    if not isinstance(template, dict):
        raise ValueError("template must be a dict (the query body shape)")
    fs = fs or LocalFS()
    tpls = _load(root, fs)
    tpls[name] = template
    fs.makedirs(root)
    fs.write_text(_tpl_path(root), json.dumps(tpls))


def get_template(root: str, name: str, fs=None) -> dict:
    fs = fs or LocalFS()
    tpls = _load(root, fs)
    if name not in tpls:
        raise KeyError(f"no template {name!r} under {root} (have {sorted(tpls)})")
    return tpls[name]


def list_templates(root: str, fs=None) -> list[str]:
    return sorted(_load(root, fs or LocalFS()))


def delete_template(root: str, name: str, fs=None) -> None:
    fs = fs or LocalFS()
    tpls = _load(root, fs)
    tpls.pop(name, None)
    fs.write_text(_tpl_path(root), json.dumps(tpls))


def render_template(template, params: dict | None = None):
    """Substitute {{param}} / {{param:default}} placeholders through the
    template body (recursing into dicts and lists). A string that is
    EXACTLY one placeholder substitutes the raw (typed) param value; a
    placeholder embedded in a longer string interpolates str(value).
    Missing param without a default -> KeyError."""
    params = params or {}

    def value_of(m: re.Match):
        name, default = m.group(1), m.group(2)
        if name in params:
            return params[name]
        if default is not None:
            return default
        raise KeyError(f"missing template param {name!r}")

    def render(node):
        if isinstance(node, dict):
            return {k: render(v) for k, v in node.items()}
        if isinstance(node, list):
            return [render(v) for v in node]
        if isinstance(node, str):
            m = _PLACEHOLDER.fullmatch(node)
            if m:
                return value_of(m)
            return _PLACEHOLDER.sub(lambda mm: str(value_of(mm)), node)
        return node

    return render(template)


_DISPATCH_KEYS = ("query_string", "query", "phrase")


def search_template(
    reader,
    body_or_name,
    params: dict | None = None,
    root: str | None = None,
    fs=None,
) -> DataFrame:
    """ES `_search/template`: render and run. Pass a template dict
    directly (inline template) or a stored name + root. Body shape —
    exactly one of:

      {"query_string": "...", "default_operator"?, ...}
      {"query": "...", "min_should_match"?, ...}
      {"phrase": "...", "slop"?, ...}

    plus optional `k` (int or null for the unranked set) and
    `filter_sql`, all placeholder-able. Dispatches onto the reader's
    typed surfaces (both tiers share the signatures)."""
    if isinstance(body_or_name, str):
        if root is None:
            raise ValueError("stored-template lookup needs root=")
        body = get_template(root, body_or_name, fs=fs)
    else:
        body = body_or_name
    body = render_template(body, params)
    present = [k for k in _DISPATCH_KEYS if k in body]
    if len(present) != 1:
        raise ValueError(
            f"template body needs exactly one of {_DISPATCH_KEYS}, got {present}"
        )
    kind = present[0]
    k = body.get("k", 10)
    if k is not None:
        k = int(k)
    filter_sql = body.get("filter_sql")
    if kind == "query_string":
        return reader.query_string_df(
            str(body["query_string"]),
            k=k,
            default_operator=str(body.get("default_operator", "or")),
            filter_sql=filter_sql,
        )
    if kind == "phrase":
        return reader.search_phrase_df(
            str(body["phrase"]),
            k=k,
            slop=int(body.get("slop", 0)),
            filter_sql=filter_sql,
        )
    return reader.search_df(
        str(body["query"]),
        k=k,
        min_should_match=int(body.get("min_should_match", 1)),
        filter_sql=filter_sql,
    )
