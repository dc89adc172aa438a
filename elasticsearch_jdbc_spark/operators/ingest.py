"""ES ingest-pipeline analogue: the processor chain an Elasticsearch
node runs at index time (PUT _ingest/pipeline, `processors` array),
compiled to ONE Catalyst projection chain — every processor is a column
transform, never a UDF, so whole-stage codegen fuses the whole pipeline
into the ingest scan.

The reference importer feeds rows into ES where these pipelines run
server-side (the mapping/transform examples across its README build
exactly such chains); here the same declarative JSON becomes part of
the Spark plan, so the transform work distributes with the ingest job
instead of burdening the indexing cluster.

Supported processors (ES ingest reference): set (value / copy_from /
override), rename, remove, convert, gsub, split, join, trim, lowercase,
uppercase, append, date (multi-format), dissect, fingerprint, bytes,
urldecode, html_strip, csv, script, drop.

Engine-native deltas (documented, tested in tests/test_ingest.py):
  - `if` conditions and `script` sources are Spark SQL expressions over
    the row's columns (not painless); `script` requires target_field.
  - `date.formats` take Spark datetime patterns; the parse is
    try-semantics per format with first-match-wins (the ES rule) and a
    null result when nothing matches (ES would fail the doc; use an
    `if`/`drop` pair for strictness).
  - `convert` uses try_cast semantics: unparseable values become null
    rather than failing the document.
  - fields are top-level columns (the flat row->document fold world of
    operators/fold.py — nested targets spell dotted names literally).
  - fingerprint joins values with '|' before hashing (ES's exact
    concat recipe is version-dependent; ours is pinned and documented).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

_CONVERT = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}

_BYTE_FACTORS = [
    ("pb", 1024**5), ("tb", 1024**4), ("gb", 1024**3),
    ("mb", 1024**2), ("kb", 1024), ("b", 1),
]

_FINGERPRINT = {"sha256": 256, "sha512": 512, "sha1": None, "md5": None}


def _one(d: dict):
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"processor must be a single-key object, got {d!r}")
    return next(iter(d.items()))


def _need(body: dict, key: str, kind: str):
    if key not in body:
        raise ValueError(f"{kind} processor needs {key!r}")
    return body[key]


def _missing_ok(df: DataFrame, body: dict, kind: str) -> bool:
    """ES ignore_missing: absent field -> no-op when set, error when not."""
    field = _need(body, "field", kind)
    if field in df.columns:
        return False
    if body.get("ignore_missing", False):
        return True
    raise ValueError(f"{kind}: unknown column {field!r} (set ignore_missing)")


def _conditional(df: DataFrame, body: dict, target: str, new: Column) -> DataFrame:
    """Apply `new` to `target`, honoring the processor-level `if`
    condition (rows failing it keep the prior value — null for a new
    column), the ES per-processor conditional."""
    cond = body.get("if")
    if cond is not None:
        old = F.col(target) if target in df.columns else F.lit(None)
        new = F.when(F.expr(cond).cast("boolean"), new).otherwise(old)
    return df.withColumn(target, new)


def _reject_if(body, name: str, df=None, target=None) -> None:
    """Type- or shape-changing processors cannot take a row-level `if`
    onto an EXISTING column: a DataFrame column is single-typed, so the
    when/otherwise branch coercion either fails analysis (split/join:
    array vs string) or re-wraps the false branch in a STRICT cast that
    crashes on exactly the unparseable values try_cast exists to
    tolerate (convert). A `target_field` that is a NEW column is fine —
    the false branch is NULL, which carries any type. Rejecting loudly
    beats the previous silent-ignore (rename/remove) and runtime
    crashes."""
    if body.get("if") is None:
        return
    if df is not None and target is not None and target not in df.columns:
        return
    raise ValueError(
        f"{name} processor supports `if` only with a NEW target_field "
        "(engine-native restriction: the result column is single-typed);"
        " split the pipeline or pre-filter instead"
    )


def _p_set(df, body):
    field = _need(body, "field", "set")
    if "copy_from" in body:
        val = F.col(body["copy_from"])
    else:
        val = F.lit(_need(body, "value", "set"))
    if not body.get("override", True) and field in df.columns:
        val = F.coalesce(F.col(field), val)
    return _conditional(df, body, field, val)


def _p_rename(df, body):
    _reject_if(body, "rename")
    if _missing_ok(df, body, "rename"):
        return df
    field, target = body["field"], _need(body, "target_field", "rename")
    if target in df.columns:
        raise ValueError(f"rename: target {target!r} already exists (ES rule)")
    return df.withColumnRenamed(field, target)


def _p_remove(df, body):
    _reject_if(body, "remove")
    fields = body.get("field")
    fields = [fields] if isinstance(fields, str) else list(fields or [])
    if not fields:
        raise ValueError("remove processor needs field")
    for f_ in fields:
        if f_ not in df.columns and not body.get("ignore_missing", False):
            raise ValueError(f"remove: unknown column {f_!r}")
    return df.drop(*[f_ for f_ in fields if f_ in df.columns])


def _p_convert(df, body):
    if _missing_ok(df, body, "convert"):
        return df
    t = _need(body, "type", "convert")
    if t not in _CONVERT:
        raise ValueError(f"convert: type {t!r} not in {sorted(_CONVERT)}")
    target = body.get("target_field", body["field"])
    _reject_if(body, "convert", df, target)
    return _conditional(
        df, body, target, F.col(body["field"]).try_cast(_CONVERT[t])
    )


def _p_gsub(df, body):
    if _missing_ok(df, body, "gsub"):
        return df
    target = body.get("target_field", body["field"])
    new = F.regexp_replace(
        F.col(body["field"]),
        _need(body, "pattern", "gsub"),
        _need(body, "replacement", "gsub"),
    )
    return _conditional(df, body, target, new)


def _p_split(df, body):
    if _missing_ok(df, body, "split"):
        return df
    target = body.get("target_field", body["field"])
    _reject_if(body, "split", df, target)
    arr = F.split(F.col(body["field"]), _need(body, "separator", "split"))
    if not body.get("preserve_trailing", False):
        # ES default: drop trailing empty fields. Highest 1-based index
        # holding a non-empty element bounds the slice (0 when all empty).
        arr_sql = arr
        keep = F.coalesce(
            F.array_max(
                F.transform(
                    arr_sql,
                    lambda x, i: F.when(x != "", i + 1).otherwise(F.lit(0)),
                )
            ),
            F.lit(0),
        )
        arr = F.slice(arr_sql, F.lit(1), keep)
    return _conditional(df, body, target, arr)


def _p_join(df, body):
    if _missing_ok(df, body, "join"):
        return df
    target = body.get("target_field", body["field"])
    _reject_if(body, "join", df, target)
    return _conditional(
        df, body, target,
        F.array_join(F.col(body["field"]), _need(body, "separator", "join")),
    )


def _str_op(op):
    def run(df, body):
        kind = {"trim": "trim", "lower": "lowercase", "upper": "uppercase"}[op]
        if _missing_ok(df, body, kind):
            return df
        target = body.get("target_field", body["field"])
        fn = {"trim": F.trim, "lower": F.lower, "upper": F.upper}[op]
        return _conditional(df, body, target, fn(F.col(body["field"])))

    return run


def _p_append(df, body):
    field = _need(body, "field", "append")
    vals = body.get("value")
    vals = vals if isinstance(vals, list) else [vals]
    lit = F.array(*[F.lit(v) for v in vals])
    if field not in df.columns:
        new = lit
    else:
        base = F.col(field)
        dt = dict(df.dtypes)[field]
        if not dt.startswith("array"):
            base = F.array(base)
        new = (
            F.concat(base, lit)
            if body.get("allow_duplicates", True)
            # allow_duplicates=false skips only APPENDED values already
            # present — the base array keeps its own duplicates (ES
            # contract; array_union would also dedup the base, ADVICE r4)
            else F.concat(base, F.array_except(lit, base))
        )
    return _conditional(df, body, field, new)


def _p_date(df, body):
    if _missing_ok(df, body, "date"):
        return df
    formats = _need(body, "formats", "date")
    target = body.get("target_field", "@timestamp")
    ts = F.coalesce(
        *[F.try_to_timestamp(F.col(body["field"]), F.lit(f)) for f in formats]
    )
    out_fmt = body.get("output_format")
    return _conditional(
        df, body, target, F.date_format(ts, out_fmt) if out_fmt else ts
    )


def dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern ('%{a} %{b->} %{?skip} %{c}') to an
    anchored regex + ordered capture names. Keys match non-greedily up
    to the next literal; the final key takes the rest (the dissect
    contract). `%{}` / `%{?name}` match without capturing; `->` (right
    padding) lets the following literal repeat."""
    parts = re.split(r"%\{([^}]*)\}", pattern)
    rx, names = "", []
    lits = parts[0::2]
    keys = parts[1::2]
    if not keys:
        raise ValueError(f"dissect pattern has no keys: {pattern!r}")
    rx += re.escape(lits[0])
    for i, key in enumerate(keys):
        lit = lits[i + 1]
        pad = key.endswith("->")
        key = key[:-2] if pad else key
        skip = key == "" or key.startswith("?")
        last = i == len(keys) - 1 and lit == ""
        body = ".*" if last else ".*?"
        rx += f"({body})" if not skip else body
        if not skip:
            names.append(key)
        if lit:
            rx += re.escape(lit) + (f"(?:{re.escape(lit)})*" if pad else "")
    return "^" + rx + "$", names


def _p_dissect(df, body):
    if _missing_ok(df, body, "dissect"):
        return df
    rx, names = dissect_regex(_need(body, "pattern", "dissect"))
    col = F.col(body["field"])
    for i, name in enumerate(names):
        df = _conditional(df, body, name, F.regexp_extract(col, rx, i + 1))
    return df


def _p_fingerprint(df, body):
    fields = _need(body, "fields", "fingerprint")
    method = body.get("method", "sha256").lower().replace("-", "")
    if method not in _FINGERPRINT:
        raise ValueError(f"fingerprint: method {method!r} not in {sorted(_FINGERPRINT)}")
    joined = F.concat_ws("|", *[F.col(f_).cast("string") for f_ in fields])
    if method == "md5":
        h = F.md5(joined)
    elif method == "sha1":
        h = F.sha1(joined)
    else:
        h = F.sha2(joined, _FINGERPRINT[method])
    return _conditional(df, body, body.get("target_field", "fingerprint"), h)


def _p_bytes(df, body):
    if _missing_ok(df, body, "bytes"):
        return df
    target = body.get("target_field", body["field"])
    s = F.lower(F.trim(F.col(body["field"])))
    num = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)\s*([kmgtp]?b)$", 1)
    unit = F.regexp_extract(s, r"^([0-9]*\.?[0-9]+)\s*([kmgtp]?b)$", 2)
    expr = F.lit(None).cast("long")
    for u, factor in _BYTE_FACTORS:
        expr = F.when(
            unit == u, (num.cast("double") * factor).cast("long")
        ).otherwise(expr)
    return _conditional(df, body, target, expr)


def _p_urldecode(df, body):
    if _missing_ok(df, body, "urldecode"):
        return df
    target = body.get("target_field", body["field"])
    return _conditional(df, body, target, F.url_decode(F.col(body["field"])))


def _p_html_strip(df, body):
    if _missing_ok(df, body, "html_strip"):
        return df
    target = body.get("target_field", body["field"])
    return _conditional(
        df, body, target, F.regexp_replace(F.col(body["field"]), "<[^>]*>", "")
    )


def _p_csv(df, body):
    if _missing_ok(df, body, "csv"):
        return df
    targets = _need(body, "target_fields", "csv")
    sep = body.get("separator", ",")
    quote = body.get("quote", '"')
    # from_csv honors quoted fields containing the separator (the ES
    # csv processor's quote contract); a naive split mis-parsed them
    parsed = F.from_csv(
        F.col(body["field"]),
        ", ".join(f"_c{i} STRING" for i in range(len(targets))),
        {"sep": sep, "quote": quote},
    )
    for i, t in enumerate(targets):
        val = parsed[f"_c{i}"]
        if body.get("trim", False):
            val = F.trim(val)
        df = _conditional(df, body, t, val)
    return df


def _p_script(df, body):
    src = body.get("source") or (body.get("script") or {}).get("source")
    if not src:
        raise ValueError("script processor needs source")
    target = body.get("target_field")
    if not target:
        raise ValueError(
            "script processor needs target_field (engine-native delta: "
            "scripts are Spark SQL expressions producing one column)"
        )
    return _conditional(df, body, target, F.expr(src))


def _p_drop(df, body):
    cond = _need(body, "if", "drop")
    # ES: a null/false condition means DO NOT drop — a bare ~cond is
    # NULL for null-condition rows and the filter would drop them
    return df.filter(~F.coalesce(F.expr(cond).cast("boolean"), F.lit(False)))


_PROCESSORS = {
    "set": _p_set,
    "rename": _p_rename,
    "remove": _p_remove,
    "convert": _p_convert,
    "gsub": _p_gsub,
    "split": _p_split,
    "join": _p_join,
    "trim": _str_op("trim"),
    "lowercase": _str_op("lower"),
    "uppercase": _str_op("upper"),
    "append": _p_append,
    "date": _p_date,
    "dissect": _p_dissect,
    "fingerprint": _p_fingerprint,
    "bytes": _p_bytes,
    "urldecode": _p_urldecode,
    "html_strip": _p_html_strip,
    "csv": _p_csv,
    "script": _p_script,
    "drop": _p_drop,
}


def apply_pipeline(df: DataFrame, processors: list[dict]) -> DataFrame:
    """Run an ES ingest pipeline (`processors` array, ES JSON shape) over
    a DataFrame: each processor folds into the projection, so the whole
    chain compiles to one whole-stage-codegen pass over the scan (drop
    conditions become filters, pushable by Catalyst)."""
    if not isinstance(processors, list):
        raise ValueError("processors must be a list of single-key objects")
    for p in processors:
        kind, body = _one(p)
        if kind not in _PROCESSORS:
            raise ValueError(
                f"unsupported processor {kind!r}; supported: "
                f"{sorted(_PROCESSORS)}"
            )
        df = _PROCESSORS[kind](df, body or {})
    return df


def simulate_pipeline(spark, processors: list[dict], docs: list[dict]):
    """ES `_ingest/pipeline/_simulate`: run the chain over literal test
    documents and return the transformed rows (driver-side list) — the
    dry-run surface ES exposes for pipeline debugging."""
    if not docs:
        raise ValueError("simulate needs at least one doc")
    df = spark.createDataFrame(docs)
    return [r.asDict() for r in apply_pipeline(df, processors).collect()]
