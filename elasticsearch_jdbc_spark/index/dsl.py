"""ES JSON query-DSL compiler: the request-body `query` object every ES
client sends (match / term / bool / dis_max / function_score / span /
wrapper / ...), compiled onto the engine's typed query surfaces and
composed distributed.

The reference imports rows INTO Elasticsearch precisely so users can run
these JSON bodies against the result (README.md's query examples are
request bodies); an engine claiming "switch and keep your queries" has to
accept them. This module is that adapter: `search_dsl_df(reader, body)`
works against BOTH reader tiers (base IndexReader and the live
IncrementalIndexReader) because every leaf dispatches onto surfaces the
two tiers share, and composition only touches the tier's key columns.

Architecture — compile, don't interpret per doc:
  leaf queries    -> the typed surface's UNRANKED match set (k=None):
                     one declarative plan per leaf, postings stay on
                     executors, term filters push to parquet.
  filter context  -> metadata predicates compiled to Spark SQL, pruned
                     docs scans, non-scoring semi-joins.
  compound nodes  -> score-set algebra over (keys, score) DataFrames:
                     must = inner-join + score sum, should = left-join +
                     coalesce add (+ minimum_should_match counting),
                     must_not = anti-join, filter = semi-join. All joins
                     are on the doc keys, so AQE/broadcast handles the
                     small sides and nothing funnels through a driver.
  ONE ordered cut ranks at the very end (never per clause).

The flat-bool fast path (every clause a bare term) remains
search_bool_df's ONE-postings-scan kernel — this layer trades one scan
per leaf for full compositionality, the right trade for the nested
bodies the single-scan kernel cannot express.

Supported nodes (ES query-dsl.html): match, match_all, match_none,
match_phrase, match_phrase_prefix (span-compiled MultiPhraseQuery gate),
match_bool_prefix, multi_match (best_fields / most_fields /
combined_fields / cross_fields / phrase), combined_fields (BM25F
term-centric blend), term, terms, terms_set, range, exists, ids, parent_id,
has_child, has_parent (join-field queries over a metadata FK column),
prefix, fuzzy, wildcard, regexp, percolate (reverse search: stored
saved-query text vs a supplied document), intervals (match /
all_of / any_of rules — compositions compile onto the span algebra),
span_term/span_near/span_first/span_or/span_not/span_within/
span_containing/span_multi (prefix/fuzzy/wildcard rewrite)/
span_field_masking (per-field position spaces), geo_distance,
geo_bounding_box, geo_shape, geo_polygon (deprecated-ES sugar over the
same ray cast), shape (the cartesian x/y twin), distance_feature, script (filter-context SQL
predicate), query_string, simple_query_string, bool,
constant_score, dis_max, boosting, function_score (field_value_factor +
script), script_score, rank_feature, wrapper, more_like_this, pinned.

Engine-native deltas (documented, all checked in tests/test_dsl.py):
  - scripts are Spark SQL expressions (`{"script": {"source": "..."}}`)
    over `_score` + docs metadata columns, not painless.
  - `term`/`terms`/`range`/`exists` on a docs METADATA column compile to
    filter-context SQL scoring `boost` (ES keyword-field behavior); on
    the indexed text they are verbatim-token postings lookups.
  - geo queries name their lat/lon columns explicitly
    (`{"geo_distance": {"distance_km": 12, "lat": .., "lon": ..,
    "lat_col": "lat", "lon_col": "lon"}}`).
  - `simple_query_string` routes through the query_string compiler (the
    engine's parser already degrades gracefully).
"""

from __future__ import annotations

import base64
import json
import os
import re

from pyspark.sql import DataFrame, functions as F


# ------------------------------------------------------------------ ctx


class _Ctx:
    def __init__(self, reader, runtime: dict | None = None):
        self.reader = reader
        self.live = hasattr(reader, "segments")
        self.keys = ["segment", "doc_id"] if self.live else ["doc_id"]
        r0 = reader.readers[reader.segments[0]] if self.live else reader
        self.r0 = r0
        self.fields = r0.manifest.get("fields")
        self.runtime = runtime or {}
        self._docs = None
        self._n = 0  # alias uniquifier

    def docs(self) -> DataFrame:
        if self._docs is None:
            d = (
                self.reader.live_docs()
                if self.live
                else self.reader.spark.read.parquet(
                    os.path.join(self.reader.index_dir, "docs")
                )
            )
            # runtime_mappings: computed columns over the stored docs
            # metadata, evaluated by Catalyst at query time (never stored,
            # never a second scan). withColumn REPLACES an existing column
            # of the same name — exactly ES's "runtime fields shadow
            # mapped fields" rule (runtime-search-request.html).
            for name, col in self.runtime.items():
                d = d.withColumn(name, col)
            self._docs = d
        return self._docs

    def meta_cols(self) -> list[str]:
        return [c for c in self.docs().columns if c not in ("doc_id", "segment")]

    def filter_ids(self, sql: str) -> DataFrame:
        if self.runtime:
            # the predicate may reference runtime columns, which only the
            # ctx's docs view carries; base-column conjuncts still push
            # into the parquet scan, runtime exprs compute JVM-side above
            return self.docs().filter(F.expr(sql)).select(*self.keys)
        return (
            self.reader._filter_docs(sql)
            if self.live
            else self.reader._filter_doc_ids(sql)
        )

    def alias(self) -> str:
        self._n += 1
        return f"_c{self._n}"


def _one(d: dict):
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"expected a single-key object, got {d!r}")
    return next(iter(d.items()))


def _aslist(x):
    if x is None:
        return []
    return x if isinstance(x, list) else [x]


_RUNTIME_CASTS = {
    "keyword": "string",
    "long": "bigint",
    "double": "double",
    "boolean": "boolean",
    "date": "timestamp",
    "ip": "string",
}


def _parse_runtime(rm: dict) -> dict:
    """ES `runtime_mappings` -> {name: Column}. The ES shape is
    {name: {"type": t, "script": {"source": src}}} (runtime-mapping-fields
    .html); engine-native delta (same rule as every other script surface
    here): `source` is a Spark SQL expression over the docs metadata
    columns, not Painless. {name: "expr"} is accepted shorthand (type
    inferred by Catalyst). The declared type casts the expression — ES
    coerces script emit values to the field type the same way."""
    out = {}
    for name, spec in rm.items():
        if isinstance(spec, str):
            out[name] = F.expr(spec)
            continue
        if not isinstance(spec, dict) or "script" not in spec:
            raise ValueError(
                f"runtime_mappings[{name!r}] wants a SQL-expression string "
                "or {'type': ..., 'script': {'source': ...}}"
            )
        src = spec["script"]
        src = src["source"] if isinstance(src, dict) else src
        col = F.expr(src)
        t = spec.get("type")
        if t is not None:
            if t not in _RUNTIME_CASTS:
                raise ValueError(
                    f"runtime field type {t!r} not supported; have "
                    f"{sorted(_RUNTIME_CASTS)}"
                )
            col = col.cast(_RUNTIME_CASTS[t])
        out[name] = col
    return out


def _sql_lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _operator(spec: dict) -> str:
    """ES `operator` option, normalized: case-insensitive (Operator
    .fromString), unknown values rejected instead of silently ignored."""
    op = str(spec.get("operator", "or")).lower()
    if op not in ("and", "or"):
        raise ValueError(f"operator must be and|or, got {spec['operator']!r}")
    return op


def _set_score(ctx: _Ctx, df: DataFrame, boost: float) -> DataFrame:
    return df.select(*ctx.keys, F.lit(float(boost)).cast("double").alias("score"))


def _scale(df: DataFrame, boost: float) -> DataFrame:
    if float(boost) == 1.0:
        return df
    return df.withColumn("score", F.col("score") * F.lit(float(boost)))


def _field_spec(body: dict):
    """{field: text} or {field: {query/value: ..., opts}} -> (field, opts)."""
    field, spec = _one(body)
    if not isinstance(spec, dict):
        spec = {"query": spec}
    spec = dict(spec)
    if "value" in spec and "query" not in spec:
        spec["query"] = spec.pop("value")
    return field, spec


def _plain_text_query(query) -> str | None:
    """A bare default-options {'match': {content: <str>}} body -> its
    text; None otherwise (the typed-surface dispatch precondition)."""
    if not isinstance(query, dict) or len(query) != 1:
        return None
    kind, spec = next(iter(query.items()))
    if kind != "match":
        return None
    try:
        f, s = _field_spec(spec)
    except ValueError:
        return None
    if f not in ("content", "text", "_all") or set(s) - {"query"}:
        return None
    v = s["query"]
    return v if isinstance(v, str) else None


def _text_field_check(ctx: _Ctx, field: str):
    """Resolve a text-query field: per-field boosts dict on a fields
    corpus; None on a plain corpus (where only the content pseudo-fields
    are legal)."""
    if ctx.fields:
        if field not in ctx.fields:
            raise ValueError(f"unknown field {field!r}; indexed: {ctx.fields}")
        return {field: 1.0}
    if field not in ("content", "text", "_all"):
        raise ValueError(
            f"plain corpus indexes content only; field {field!r} "
            "(use 'content', or build with fields=...)"
        )
    return None


def _parse_msm(msm, total: int) -> int:
    """The full ES `minimum_should_match` syntax
    (query-dsl-minimum-should-match.html) resolved against `total`
    optional clauses: positive int (that many), negative int (total
    minus that many), "N%" (floor of the percentage), "-N%" (total minus
    the floored missing count — ES's documented rounding: -25% of 9 is
    7, while 75% of 9 is 6), and conditional combinations "n<spec
    [n<spec ...]" (the spec with the LARGEST n below total applies;
    total <= every n means ALL clauses required). Values < 1 mean no
    constraint (the Lucene contract); values > total simply match
    nothing, as in Lucene."""
    if isinstance(msm, bool):
        raise ValueError(f"bad minimum_should_match {msm!r}")
    if isinstance(msm, int):
        v = msm
    elif isinstance(msm, str):
        s = msm.strip()
        if "<" in s:
            chosen = None
            for part in s.split():
                nstr, _, sub = part.partition("<")
                try:
                    n = int(nstr)
                except ValueError:
                    raise ValueError(
                        f"bad minimum_should_match combination {msm!r}"
                    ) from None
                if not sub:
                    raise ValueError(
                        f"bad minimum_should_match combination {msm!r}"
                    )
                if total > n and (chosen is None or n > chosen[0]):
                    chosen = (n, sub)
            if chosen is None:
                return total
            return _parse_msm(chosen[1], total)
        try:
            if s.endswith("%"):
                # the sign is textual, not numeric: "-N%" means N percent
                # MISSING (total minus the floored count) even at -0.x%
                neg = s.startswith("-")
                # multiply BEFORE dividing (the Lucene evaluation order,
                # p * n / 100): int(58/100.0 * 100) is 57 under binary
                # floating point, while int(58 * 100 / 100.0) is 58
                v = int(abs(float(s[:-1])) * total / 100.0)
                return total - v if neg else v
            v = int(s)
        except ValueError:
            raise ValueError(f"bad minimum_should_match {msm!r}") from None
    else:
        raise ValueError(f"bad minimum_should_match {msm!r}")
    if v < 0:
        v = total + v
    return max(v, 0)


# ----------------------------------------------------------------- leafs


def _leaf_match(ctx, body):
    field, spec = _field_spec(body)
    boosts = _text_field_check(ctx, field)
    q = spec["query"]
    msm = spec.get("minimum_should_match")
    op = _operator(spec)  # validated even when msm overrides it
    ntoks = len(ctx.r0.query_terms(q))
    m = (ntoks if op == "and" else 1) if msm is None else _parse_msm(msm, ntoks)
    df = ctx.reader.match_df(q, min_should_match=m, boosts=boosts)
    return _scale(df, spec.get("boost", 1.0))


def _leaf_match_phrase(ctx, body):
    field, spec = _field_spec(body)
    _text_field_check(ctx, field)
    df = ctx.reader.search_phrase_df(
        spec["query"], k=None,
        field=field if ctx.fields else None,
        slop=int(spec.get("slop", 0)),
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_match_bool_prefix(ctx, body):
    """ES match_bool_prefix (query-dsl-match-bool-prefix-query.html):
    every analyzed token but the last becomes a term clause, the last a
    prefix clause — the search-as-you-type companion that, unlike
    match_phrase_prefix, imposes no position constraint. Delegates to
    the typed one-postings-scan kernel (match_bool_prefix_df: term
    clauses + the prefix expansion as a final or-group inside ONE
    search_bool_df call), which also carries ES's `operator` option;
    score-identical to the bool-should-of-leaves composition
    (pinned by test_match_bool_prefix)."""
    field, spec = _field_spec(body)
    boosts = _text_field_check(ctx, field)
    from ..functions.tokenizer import tokenize_py

    if not tokenize_py(str(spec["query"])):
        raise ValueError("match_bool_prefix analyzed to no tokens")
    df = ctx.reader.match_bool_prefix_df(
        spec["query"], k=None,
        operator=_operator(spec), boosts=boosts,
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_multi_match(ctx, body):
    body = dict(body)
    q = body["query"]
    fields = body.get("fields")
    boosts = None
    if fields:
        boosts = {}
        for f0 in fields:
            name, _, w = f0.partition("^")
            boosts[name] = float(w) if w else 1.0
    msm = body.get("minimum_should_match")
    # ES `operator`: "and" requires EVERY analyzed term to match (in
    # some field — the term-centric reading all multi_match types share
    # under the engine's msm model; the per-field AND of ES best_fields
    # is a documented deviation, README ledger). Validated even when an
    # explicit msm overrides it.
    op = _operator(body)
    ntoks = len(ctx.r0.query_terms(q))
    m = (ntoks if op == "and" else 1) if msm is None else _parse_msm(msm, ntoks)
    df = ctx.reader.multi_match_df(
        q, boosts=boosts, match_type=body.get("type", "best_fields"),
        k=None, min_should_match=m,
        tie_breaker=float(body.get("tie_breaker", 0.0)),
    )
    return _scale(df, body.get("boost", 1.0))


def _leaf_term(ctx, body):
    field, spec = _field_spec(body)
    v = spec["query"]
    boost = float(spec.get("boost", 1.0))
    if field in ctx.meta_cols():
        if dict(ctx.docs().dtypes).get(field, "").startswith("array"):
            # ES keyword-array semantics: a multi-valued field matches
            # when ANY element equals the term
            sql = f"array_contains({field}, {_sql_lit(v)})"
        else:
            sql = f"{field} = {_sql_lit(v)}"
        return _set_score(ctx, ctx.filter_ids(sql), boost)
    _text_field_check(ctx, field)
    tok = (field + "\x1f" + str(v)) if ctx.fields else str(v)
    return _scale(ctx.reader.search_terms_df([tok], None), boost)


def _leaf_terms(ctx, body):
    body = dict(body)
    boost = float(body.pop("boost", 1.0))
    field, values = _one(body)
    if isinstance(values, dict) and "id" in values and "path" in values:
        # ES terms LOOKUP: the referenced doc's `path` field values
        # BECOME the terms set (query-dsl-terms-query.html#query-dsl-
        # terms-lookup). Engine-native: the lookup doc lives in THIS
        # corpus (`index` is accepted and ignored — one corpus per
        # reader); `id` addresses the doc identity column (`id_field`,
        # default 'path' like ids_df). One mget point read resolves the
        # predicate; filter context, like ES (constant score).
        from .query import terms_lookup_sql

        if field not in ctx.meta_cols():
            raise ValueError(
                f"terms lookup targets a docs metadata column; {field!r} "
                f"not in {ctx.meta_cols()}"
            )
        like = {str(values.get("id_field", "path")): values["id"]}
        is_arr = dict(ctx.docs().dtypes).get(field, "").startswith("array")
        sql = terms_lookup_sql(
            ctx.reader, like, str(values["path"]), field, array_target=is_arr
        )
        return _set_score(ctx, ctx.filter_ids(sql), boost)
    if not isinstance(values, list) or not values:
        raise ValueError(
            "terms query wants {field: [v, ...]} (or the lookup shape "
            "{field: {'id': ..., 'path': ...}})"
        )
    if field in ctx.meta_cols():
        lits = ", ".join(_sql_lit(v) for v in values)
        if dict(ctx.docs().dtypes).get(field, "").startswith("array"):
            # ES keyword-array semantics: any element in the value set
            sql = f"arrays_overlap({field}, array({lits}))"
        else:
            sql = f"{field} IN ({lits})"
        return _set_score(ctx, ctx.filter_ids(sql), boost)
    _text_field_check(ctx, field)
    toks = [
        (field + "\x1f" + str(v)) if ctx.fields else str(v) for v in values
    ]
    return _scale(ctx.reader.search_terms_df(toks, None, groups=[toks]), boost)


_RANGE_OPS = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}


def _leaf_range(ctx, body):
    field, spec = _one(body)
    spec = dict(spec)
    boost = float(spec.pop("boost", 1.0))
    if field not in ctx.meta_cols():
        raise ValueError(
            f"range wants a docs metadata column; {field!r} not in "
            f"{ctx.meta_cols()}"
        )
    parts = [
        f"{field} {_RANGE_OPS[op]} {_sql_lit(v)}"
        for op, v in spec.items()
        if op in _RANGE_OPS
    ]
    if not parts:
        raise ValueError("range query needs gte/gt/lte/lt")
    return _set_score(ctx, ctx.filter_ids(" AND ".join(parts)), boost)


def _leaf_exists(ctx, body):
    field = body["field"] if isinstance(body, dict) else body
    boost = float(body.get("boost", 1.0)) if isinstance(body, dict) else 1.0
    if field not in ctx.meta_cols():
        raise ValueError(f"exists wants a docs metadata column, got {field!r}")
    dt = dict(ctx.docs().dtypes).get(field, "")
    if dt.startswith("array"):
        # ES exists = "has at least one indexed value": an empty array
        # (or one holding only nulls) has none and must NOT match
        sql = (
            f"{field} IS NOT NULL AND exists({field}, x -> x IS NOT NULL)"
        )
    elif dt.startswith("map"):
        sql = f"{field} IS NOT NULL AND size({field}) > 0"
    else:
        sql = f"{field} IS NOT NULL"
    return _set_score(ctx, ctx.filter_ids(sql), boost)


_NESTED_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _nested_elem_sql(path: str, q: dict, elem_fields: list[str]) -> str:
    """Compile a `nested` inner-query subtree to ONE boolean SQL
    expression over the lambda variable `e` (an element of the
    array-of-structs column `path`). Keeping the whole subtree inside a
    single lambda is what enforces ES's same-element rule: two
    predicates ANDed here must hit the SAME element, never two different
    ones. Supported inner kinds: term / terms / range / exists /
    match_all / bool (arbitrarily nested)."""

    def fld(f: str) -> str:
        if not isinstance(f, str) or not f.startswith(path + "."):
            raise ValueError(
                f"nested inner field {f!r} must be qualified under the "
                f"nested path {path!r} (ES: 'comments.stars')"
            )
        inner = f[len(path) + 1 :]
        if not _NESTED_IDENT.fullmatch(inner):
            raise ValueError(f"bad nested inner field name {inner!r}")
        if inner not in elem_fields:
            raise ValueError(
                f"nested element has no field {inner!r}; has {elem_fields}"
            )
        return f"e.{inner}"

    kind, spec = _one(q)
    if kind == "match_all":
        return "true"
    if kind == "term":
        field, tspec = _field_spec(spec)
        return f"{fld(field)} = {_sql_lit(tspec['query'])}"
    if kind == "terms":
        body2 = {k: v for k, v in dict(spec).items() if k != "boost"}
        field, values = _one(body2)
        if not isinstance(values, list) or not values:
            raise ValueError("nested terms wants {field: [v, ...]}")
        lits = ", ".join(_sql_lit(v) for v in values)
        return f"{fld(field)} IN ({lits})"
    if kind == "range":
        field, rspec = _one(spec)
        parts = [
            f"{fld(field)} {_RANGE_OPS[op]} {_sql_lit(v)}"
            for op, v in dict(rspec).items()
            if op in _RANGE_OPS
        ]
        if not parts:
            raise ValueError("nested range needs gte/gt/lte/lt")
        return "(" + " AND ".join(parts) + ")"
    if kind == "exists":
        field = spec["field"] if isinstance(spec, dict) else spec
        return f"{fld(field)} IS NOT NULL"
    if kind == "bool":
        conj = [
            _nested_elem_sql(path, x, elem_fields)
            for x in _aslist(spec.get("must")) + _aslist(spec.get("filter"))
        ]
        must_not = [
            _nested_elem_sql(path, x, elem_fields)
            for x in _aslist(spec.get("must_not"))
        ]
        should = [
            _nested_elem_sql(path, x, elem_fields)
            for x in _aslist(spec.get("should"))
        ]
        exprs = [f"({p})" for p in conj] + [f"(NOT ({p}))" for p in must_not]
        if should:
            # filter-context should: msm defaults to 1 when there is no
            # must/filter sibling, else 0 (purely optional) — the ES rule
            msm = spec.get("minimum_should_match", 1 if not conj else 0)
            msm = _parse_msm(msm, len(should))
            if msm == 1:
                exprs.append("(" + " OR ".join(f"({p})" for p in should) + ")")
            elif msm > 1:
                counts = " + ".join(
                    f"(CASE WHEN ({p}) THEN 1 ELSE 0 END)" for p in should
                )
                exprs.append(f"(({counts}) >= {msm})")
            # msm == 0: optional clauses, no constraint in filter context
        if not exprs:
            raise ValueError("empty bool inside nested query")
        return " AND ".join(exprs)
    raise ValueError(
        f"unsupported query kind {kind!r} inside nested; supported: "
        "term, terms, range, exists, match_all, bool"
    )


def _leaf_nested(ctx, body):
    """ES `nested` query (query-dsl-nested-query.html): per-element
    scoped predicates over an array-of-structs docs column. The defining
    contract — ALL inner predicates must match the SAME element — maps
    to Spark's `exists(path, e -> <inner conjunction>)` higher-order
    function: one docs-scan projection, whole-stage codegen, no explode,
    no shuffle (the fold layer builds these arrays from bracket labels,
    PlainKeyValueStreamListener.java:291-321, README.md:553-605).

    score_mode: matching elements are filter-context predicates with
    constant per-element score 1.0, so 'none'/'avg'/'max'/'min' all
    yield boost × 1.0 and 'sum' yields boost × (matching-element count)
    — exactly ES's combination rules applied to constant child scores
    (documented deviation: no per-element BM25 relevance)."""
    spec = dict(body)
    path = spec.get("path")
    inner = spec.get("query")
    boost = float(spec.get("boost", 1.0))
    mode = spec.get("score_mode", "avg")
    if not path or not isinstance(inner, dict):
        raise ValueError("nested wants {'path': col, 'query': {...}}")
    if mode not in ("none", "avg", "max", "min", "sum"):
        raise ValueError(f"unsupported nested score_mode {mode!r}")
    schema = {f.name: f for f in ctx.docs().schema.fields}
    if path not in schema:
        raise ValueError(
            f"nested path {path!r} not a docs metadata column; "
            f"have {ctx.meta_cols()}"
        )
    from pyspark.sql.types import ArrayType, StructType

    dt = schema[path].dataType
    if not (
        isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType)
    ):
        raise ValueError(
            f"nested path {path!r} must be array<struct<...>>, got "
            f"{dt.simpleString()}"
        )
    elem_fields = [f.name for f in dt.elementType.fields]
    pred = _nested_elem_sql(path, inner, elem_fields)
    if spec.get("inner_hits") is not None:
        raise ValueError(
            "inner_hits rides the typed surface — reader.nested_df(path, "
            "query, inner_hits_size=n) — not the composable DSL leaf "
            "(leaves return (keys, score) only)"
        )
    sql = f"exists({path}, e -> {pred})"
    if mode == "sum":
        matched = ctx.docs().filter(F.expr(sql))
        return matched.select(
            *ctx.keys,
            (
                F.expr(f"size(filter({path}, e -> {pred}))").cast("double")
                * F.lit(boost)
            ).alias("score"),
        )
    return _set_score(ctx, ctx.filter_ids(sql), boost)


def nested_df(
    reader,
    path: str,
    query: dict,
    score_mode: str = "avg",
    boost: float = 1.0,
    k: int | None = None,
    inner_hits_size: int | None = None,
) -> DataFrame:
    """Typed ES `nested` query surface (both reader tiers). With
    `inner_hits_size`, each hit also carries `inner_hits` — the first n
    MATCHING elements of the array (ES nested inner_hits) — and
    `inner_hits_total`, the full matching-element count. One extra
    projection over the same docs scan (`slice(filter(path, ...))`), no
    explode, no join beyond the leaf's own."""
    ctx = _Ctx(reader)
    out = _leaf_nested(
        ctx,
        {"path": path, "query": query, "score_mode": score_mode,
         "boost": boost},
    )
    if inner_hits_size is not None:
        if inner_hits_size < 1:
            raise ValueError("inner_hits_size must be >= 1")
        dt = {f.name: f.dataType for f in ctx.docs().schema.fields}[path]
        pred = _nested_elem_sql(
            path, query, [f.name for f in dt.elementType.fields]
        )
        deco = ctx.docs().select(
            *ctx.keys,
            F.expr(
                f"slice(filter({path}, e -> {pred}), 1, {int(inner_hits_size)})"
            ).alias("inner_hits"),
            F.expr(f"size(filter({path}, e -> {pred}))").alias(
                "inner_hits_total"
            ),
        )
        out = out.join(deco, ctx.keys)
    if k is not None:
        order = [F.desc("score")] + [F.asc(c) for c in ctx.keys]
        out = out.orderBy(*order).limit(int(k))
    return out


def _leaf_ids(ctx, body):
    df = ctx.reader.ids_df(
        list(body["values"]), id_field=body.get("id_field", "path")
    )
    return _set_score(ctx, df, body.get("boost", 1.0))


def _leaf_parent_id(ctx, body):
    df = ctx.reader.parent_id_df(
        body["id"], parent_field=body.get("field", "parent")
    )
    return _set_score(ctx, df, body.get("boost", 1.0))


def _leaf_prefix(ctx, body):
    field, spec = _field_spec(body)
    boosts = _text_field_check(ctx, field)
    df = ctx.reader.search_prefix_df(
        str(spec["query"]), k=None,
        limit=int(spec.get("rewrite_limit", 128)), boosts=boosts,
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_match_none(ctx, body):
    # ES match_none: the empty match set — the identity element of the
    # should/dis_max algebra, an empty relation of the tier's key shape
    return _set_score(ctx, ctx.docs().select(*ctx.keys).limit(0), 0.0)


def _leaf_match_phrase_prefix(ctx, body):
    """ES match_phrase_prefix compiled onto the span algebra: every
    analyzed token but the last is a span_term, the last is a span_multi
    prefix (SpanRewriteMethod expansion capped at max_expansions) — the
    Lucene MultiPhraseQuery shape as an ordered span_near gate, scored
    under the engine's documented gate+BM25 span contract
    (query-dsl match-query-phrase-prefix; the reference's users issue
    these from every search-as-you-type box)."""
    field, spec = _field_spec(body)
    _text_field_check(ctx, field)
    from ..functions.tokenizer import tokenize_py

    toks = tokenize_py(str(spec["query"]))
    if not toks:
        raise ValueError("match_phrase_prefix analyzed to no tokens")
    limit = int(spec.get("max_expansions", 50))
    last: dict = {
        "span_multi": {
            "match": {"prefix": {"value": toks[-1]}},
            "max_expansions": limit,
        }
    }
    if len(toks) == 1:
        span = last
    else:
        span = {
            "span_near": {
                "clauses": [{"span_term": t} for t in toks[:-1]] + [last],
                "slop": int(spec.get("slop", 0)),
                "in_order": True,
            }
        }
    df = ctx.reader.search_span_df(
        span, k=None, field=field if ctx.fields else None
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_combined_fields(ctx, body):
    """ES combined_fields: the BM25F term-centric blend — tf sums across
    fields BEFORE saturation (search_combined_df's documented contract),
    vs multi_match/most_fields' per-field score sum after it."""
    body = dict(body)
    if not ctx.fields:
        raise ValueError("combined_fields requires a fields-indexed corpus")
    q = body["query"]
    boosts = None
    if body.get("fields"):
        boosts = {}
        for f0 in body["fields"]:
            name, _, w = f0.partition("^")
            if name not in ctx.fields:
                raise ValueError(
                    f"unknown field {name!r}; indexed: {ctx.fields}"
                )
            boosts[name] = float(w) if w else 1.0
    msm = body.get("minimum_should_match")
    op = _operator(body)  # validated even when msm overrides it
    ntoks = len(ctx.r0.query_terms(q))
    m = (ntoks if op == "and" else 1) if msm is None else _parse_msm(msm, ntoks)
    df = ctx.reader.search_combined_df(
        q, boosts=boosts, k=None, min_should_match=m
    )
    return _scale(df, body.get("boost", 1.0))


def _leaf_terms_set(ctx, body):
    """ES terms_set: per-doc minimum_should_match from a metadata field
    (minimum_should_match_field) or a Catalyst SQL expression (the
    minimum_should_match_script analogue — engine-native delta: Spark SQL
    over the docs columns, never eval'd Python). Non-scoring filter
    context scoring `boost` (delta vs ES's per-term BM25 sum,
    documented)."""
    field, spec = _one(body)
    spec = dict(spec)
    script = spec.get("minimum_should_match_script")
    if isinstance(script, dict):
        script = script.get("source")
    if spec.get("terms") is None:
        # without this, _aslist(None) -> ['None'] would silently query
        # the literal term 'None' (ADVICE r4)
        raise ValueError("terms_set needs a non-empty 'terms' list")
    df = ctx.reader.terms_set_df(
        field,
        [str(t) for t in _aslist(spec.get("terms"))],
        msm_field=spec.get("minimum_should_match_field"),
        msm_sql=script,
    )
    return _set_score(ctx, df.select(*ctx.keys), float(spec.get("boost", 1.0)))


def _percolate_required_col(msm, n):
    """Per-doc `minimum_should_match` for the percolate leaf: the
    _parse_msm grammar resolved against a COLUMN of per-query term
    counts instead of one int — positive/negative ints and "N%"/"-N%"
    with the same textual-sign floor rounding. The "n<spec" conditional
    form needs a scalar total and is rejected (engine-native
    restriction, documented). Clamped to [1, n] like _mlt_min_match —
    the percolate family's rule."""
    if isinstance(msm, bool):
        raise ValueError(f"bad minimum_should_match {msm!r}")
    if isinstance(msm, int):
        v = F.lit(msm) if msm >= 0 else (n + F.lit(msm))
    elif isinstance(msm, str):
        s = msm.strip()
        if "<" in s:
            raise ValueError(
                "percolate minimum_should_match: conditional 'n<spec' "
                "combinations need a per-request clause count and are "
                "unsupported here (engine-native restriction)"
            )
        try:
            if s.endswith("%"):
                neg = s.startswith("-")
                # multiply before dividing (the _parse_msm FP rule)
                cnt = F.floor(
                    n.cast("double") * F.lit(abs(float(s[:-1]))) / F.lit(100.0)
                ).cast("int")
                v = (n - cnt) if neg else cnt
            else:
                iv = int(s)
                # a negative integer STRING means n-minus, same as the
                # int form (the _parse_msm grammar)
                v = F.lit(iv) if iv >= 0 else (n + F.lit(iv))
        except ValueError:
            raise ValueError(f"bad minimum_should_match {msm!r}") from None
    else:
        raise ValueError(f"bad minimum_should_match {msm!r}")
    return F.greatest(F.lit(1), F.least(v.cast("int"), n))


def _leaf_percolate(ctx, body):
    """ES `percolate` query (percolate-query.html): reverse search — the
    index stores QUERIES and the body supplies the DOCUMENT; the match
    set is the stored queries the document satisfies (the alerting /
    saved-search shape the reference feeds via ES 2.x's .percolator
    type, README.md's percolation section). Engine-native shape
    (documented): each stored query is TEXT in a docs metadata column
    (`field`); it matches when >= minimum_should_match of its DISTINCT
    terms occur in the document's token set, msm resolved PER QUERY
    against that query's own term count (the percolate_df /
    _mlt_min_match model, applied in the reverse direction). score =
    matched stored-term count (percolate_df's `matched`), times boost.

    Plan: the document tokenizes once on the driver (bytes, not data);
    each stored query tokenizes JVM-side via the codegen tokenizer
    (tokens_col — bit-identical token stream to the pandas indexing
    path) and intersects with the literal document-token array. ONE
    docs-table scan, whole-stage codegen end to end — no postings, no
    shuffle, no UDF; cost is O(stored queries) regardless of document
    size."""
    from ..functions.tokenizer import tokenize_py, tokens_col

    spec = dict(body)
    field = spec.get("field")
    if not field or field not in ctx.meta_cols():
        raise ValueError(
            f"percolate wants 'field' naming the docs metadata column "
            f"holding stored query text; {field!r} not in {ctx.meta_cols()}"
        )
    if "documents" in spec:
        raise ValueError(
            "percolate supports a single 'document' (engine-native "
            "restriction); issue one percolate query per document"
        )
    doc = spec.get("document")
    if doc is None:
        raise ValueError("percolate needs a 'document'")

    def _doc_values(v) -> list:
        # ES analyzes field VALUES only: flatten nested objects/arrays
        # recursively — stringifying a dict would tokenize its KEYS and
        # repr punctuation into spurious matchable tokens
        if v is None:
            return []
        if isinstance(v, dict):
            return [x for sub in v.values() for x in _doc_values(sub)]
        if isinstance(v, (list, tuple)):
            return [x for sub in v for x in _doc_values(sub)]
        return [str(v)]

    text = " ".join(_doc_values(doc))  # dict/list/scalar all flatten
    have = sorted(set(tokenize_py(text)))
    if len(have) > 10000:
        # the document's distinct tokens become plan literals; cap like
        # ES's indices.query.bool.max_clause_count posture so one huge
        # document cannot build an unbounded Catalyst expression
        raise ValueError(
            f"percolate document has {len(have)} distinct tokens; "
            "cap is 10000 (plan-literal bound)"
        )
    stored = F.array_distinct(tokens_col(F.col(field)))
    n = F.size(stored)
    matched = (
        F.size(F.array_intersect(stored, F.array(*[F.lit(t) for t in have])))
        if have
        else F.lit(0)
    )
    out = (
        ctx.docs()
        .filter(F.col(field).isNotNull())
        .select(
            *ctx.keys,
            matched.cast("double").alias("score"),
            n.alias("_n"),
            _percolate_required_col(
                spec.get("minimum_should_match", 1), n
            ).alias("_req"),
        )
        .filter((F.col("_n") > 0) & (F.col("score") >= F.col("_req")))
        .select(*ctx.keys, "score")
    )
    return _scale(out, spec.get("boost", 1.0))


def _inner_match_text(q) -> str:
    """Extract the match text from a has_child/has_parent inner query:
    a plain string, or a {'match': {field: text|{'query': text}}} body
    (engine-native restriction — the join surfaces take an analyzed
    match query, not an arbitrary DSL subtree; documented)."""
    if isinstance(q, str):
        return q
    kind, b = _one(q)
    if kind != "match":
        raise ValueError(
            "has_child/has_parent inner query supports match only "
            f"(engine-native restriction), got {kind!r}"
        )
    _, spec = _field_spec(b)
    return str(spec["query"])


def _leaf_has_child(ctx, body):
    spec = dict(body)
    df = ctx.reader.has_child_df(
        _inner_match_text(spec["query"]),
        parent_field=spec.get("parent_field", "parent"),
        id_field=spec.get("id_field", "path"),
        score_mode=spec.get("score_mode", "none"),
        min_children=int(spec.get("min_children", 1)),
        max_children=(
            int(spec["max_children"]) if spec.get("max_children") else None
        ),
    )
    return _scale(
        df.select(*ctx.keys, F.col("score").cast("double").alias("score")),
        spec.get("boost", 1.0),
    )


def _leaf_has_parent(ctx, body):
    spec = dict(body)
    df = ctx.reader.has_parent_df(
        _inner_match_text(spec["query"]),
        parent_field=spec.get("parent_field", "parent"),
        id_field=spec.get("id_field", "path"),
        score=bool(spec.get("score", False)),
    )
    return _scale(
        df.select(*ctx.keys, F.col("score").cast("double").alias("score")),
        spec.get("boost", 1.0),
    )


def _leaf_distance_feature(ctx, body):
    """ES distance_feature: matches every doc with the field, scored
    boost * pivot / (pivot + |field - origin|) — the closer to origin the
    higher. Numeric/epoch fields (dates as their epoch numbers —
    engine-native delta vs ES date-math strings, documented). One docs
    scan, pure codegen arithmetic, no postings."""
    spec = dict(body)
    field = spec["field"]
    if field not in ctx.meta_cols():
        raise ValueError(
            f"distance_feature wants a docs metadata column; {field!r} "
            f"not in {ctx.meta_cols()}"
        )
    origin = float(spec["origin"])
    pivot = float(spec["pivot"])
    if pivot <= 0:
        raise ValueError("distance_feature pivot must be > 0")
    boost = float(spec.get("boost", 1.0))
    dist = F.abs(F.col(field).cast("double") - F.lit(origin))
    return (
        ctx.docs()
        .filter(F.col(field).isNotNull())
        .select(
            *ctx.keys,
            (F.lit(boost) * F.lit(pivot) / (F.lit(pivot) + dist))
            .cast("double")
            .alias("score"),
        )
    )


def _leaf_script_query(ctx, body):
    """ES script query (filter context): the predicate is a Spark SQL
    boolean expression over the docs metadata columns (the engine's
    script dialect everywhere — never eval'd Python), scoring `boost`."""
    s = body.get("script")
    if isinstance(s, dict):
        s = s.get("source")
    if not s or not isinstance(s, str):
        raise ValueError(
            "script query wants {'script': {'source': <Spark SQL bool expr>}}"
        )
    return _set_score(ctx, ctx.filter_ids(s), float(body.get("boost", 1.0)))


def _leaf_fuzzy(ctx, body):
    field, spec = _field_spec(body)
    boosts = _text_field_check(ctx, field)
    df = ctx.reader.search_fuzzy_df(
        str(spec["query"]), k=None,
        fuzziness=spec.get("fuzziness", "AUTO"),
        limit=int(spec.get("max_expansions", 16)), boosts=boosts,
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_wildcard(ctx, body):
    field, spec = _field_spec(body)
    _text_field_check(ctx, field)
    pat = str(spec["query"])
    if ctx.fields:
        pat = field + "\x1f" + pat
    df = ctx.reader.search_wildcard_df(
        pat, k=None, limit=int(spec.get("rewrite_limit", 128))
    )
    return _scale(df, spec.get("boost", 1.0))


def _leaf_regexp(ctx, body):
    field, spec = _field_spec(body)
    _text_field_check(ctx, field)
    pat = str(spec["query"])
    if ctx.fields:
        pat = field + "\x1f" + pat
    df = ctx.reader.search_regexp_df(
        pat, k=None, limit=int(spec.get("rewrite_limit", 128))
    )
    return _scale(df, spec.get("boost", 1.0))


def _interval_rule_to_span(rule: dict) -> dict:
    """Compile an ES intervals RULE tree (match / all_of / any_of,
    intervals-query.html) onto the engine's canonical span algebra
    (index/spans.py): match -> span_term / ordered-near of its analyzed
    tokens, all_of -> span_near (max_gaps = slop, ordered = in_order),
    any_of -> span_or. Lucene evaluates intervals with its own
    minimal-interval iterators; the span algebra here enforces the same
    minimality discipline, so the compiled tree keeps the exact
    proximity gate (the documented gate+BM25 intervals contract)."""
    kind, spec = _one(rule)
    if kind == "match":
        from ..functions.tokenizer import tokenize_py

        toks = tokenize_py(str(spec["query"]))
        if not toks:
            raise ValueError(
                f"intervals match query {spec['query']!r} tokenized to nothing"
            )
        if len(toks) == 1:
            return {"span_term": toks[0]}
        return {
            "span_near": {
                "clauses": [{"span_term": t} for t in toks],
                "slop": int(spec.get("max_gaps", 0)),
                "in_order": bool(spec.get("ordered", True)),
            }
        }
    if kind == "all_of":
        return {
            "span_near": {
                "clauses": [
                    _interval_rule_to_span(r) for r in spec["intervals"]
                ],
                "slop": int(spec.get("max_gaps", 0)),
                "in_order": bool(spec.get("ordered", True)),
            }
        }
    if kind == "any_of":
        return {
            "span_or": {
                "clauses": [
                    _interval_rule_to_span(r) for r in spec["intervals"]
                ]
            }
        }
    raise ValueError(
        f"unsupported intervals rule {kind!r}; supported: match, all_of, any_of"
    )


def _leaf_intervals(ctx, body):
    field, spec = _one(body)
    _text_field_check(ctx, field)
    rules = {k: v for k, v in spec.items() if k != "boost"}
    if "match" in rules and len(rules) == 1:
        # the flat match rule keeps the dedicated exact minimal-interval
        # kernel (positions decode once, no span-tree recursion)
        m = spec["match"]
        df = ctx.reader.search_intervals_df(
            m["query"], max_gaps=int(m.get("max_gaps", 0)),
            ordered=bool(m.get("ordered", True)), k=None,
            field=field if ctx.fields else None,
        )
    elif rules:
        span = _interval_rule_to_span(dict([next(iter(rules.items()))]))
        df = ctx.reader.search_span_df(
            span, k=None, field=field if ctx.fields else None
        )
    else:
        raise ValueError("intervals needs a match / all_of / any_of rule")
    return _scale(df, spec.get("boost", 1.0))


def _span_to_native(node, fields_out: set):
    """ES span JSON ({"span_term": {field: tok}}) -> the engine's native
    span spec ({"span_term": tok}); collects every field it sees so the
    caller can enforce the single-field rule ES imposes on spans."""
    kind, body = _one(node)
    if kind == "span_term":
        if isinstance(body, dict):
            field, spec = _field_spec(body)
            fields_out.add(field)
            return {"span_term": str(spec["query"])}
        return {"span_term": str(body)}
    if kind == "span_first":
        return {
            "span_first": {
                "match": _span_to_native(body["match"], fields_out),
                "end": int(body["end"]),
            }
        }
    if kind == "span_not":
        return {
            "span_not": {
                "include": _span_to_native(body["include"], fields_out),
                "exclude": _span_to_native(body["exclude"], fields_out),
                "pre": int(body.get("pre", 0)),
                "post": int(body.get("post", 0)),
            }
        }
    if kind in ("span_within", "span_containing"):
        return {
            kind: {
                "little": _span_to_native(body["little"], fields_out),
                "big": _span_to_native(body["big"], fields_out),
            }
        }
    if kind == "span_multi":
        m = body.get("match")
        if not isinstance(m, dict) or len(m) != 1:
            raise ValueError(
                "span_multi wants {'match': {prefix|fuzzy|wildcard: {field: spec}}}"
            )
        mk, mb = _one(m)
        if isinstance(mb, dict) and len(mb) == 1:
            fname, fspec = next(iter(mb.items()))
            if fname not in ("value", "query"):
                fields_out.add(fname)
        out = {"match": {mk: mb}}
        if "max_expansions" in body:
            out["max_expansions"] = int(body["max_expansions"])
        return {"span_multi": out}
    if kind == "span_field_masking":
        # the inner query keeps ITS field for execution/scoring; only the
        # masked name participates in the surrounding single-field rule
        # (ES: span-field-masking-query.html — deviation: scores use the
        # actual field's statistics, ES uses the masked field's norms)
        inner: set = set()
        q = _span_to_native(body["query"], inner)
        if len(inner) > 1:
            raise ValueError(
                f"span_field_masking inner query must target one field, "
                f"got {sorted(inner)}"
            )
        mask = body.get("field")
        if not isinstance(mask, str) or not mask.strip():
            raise ValueError(
                "span_field_masking wants {'query': span, 'field': name}"
            )
        fields_out.add(mask)
        actual = next(iter(inner)) if inner else mask
        return {"span_field": {"field": actual, "query": q}}
    if kind in ("span_near", "span_or"):
        out = {
            "clauses": [_span_to_native(c, fields_out) for c in body["clauses"]]
        }
        if kind == "span_near":
            out["slop"] = int(body.get("slop", 0))
            out["in_order"] = bool(body.get("in_order", True))
        return {kind: out}
    raise ValueError(f"unknown span node {kind!r}")


def _leaf_span(ctx, kind, body):
    fields: set = set()
    spec = _span_to_native({kind: body}, fields)
    if len(fields) > 1:
        raise ValueError(f"span clauses must share one field, got {fields}")
    field = next(iter(fields)) if fields else None
    if field is not None:
        _text_field_check(ctx, field)
    return ctx.reader.search_span_df(
        spec, k=None, field=field if ctx.fields else None
    )


def _leaf_geo_distance(ctx, body):
    from ..functions.geo import geo_distance_sql

    sql = geo_distance_sql(
        body.get("lat_col", "lat"), body.get("lon_col", "lon"),
        float(body["lat"]), float(body["lon"]), float(body["distance_km"]),
    )
    return _set_score(ctx, ctx.filter_ids(sql), body.get("boost", 1.0))


def _leaf_geo_bbox(ctx, body):
    from ..functions.geo import geo_bbox_sql

    tl, br = body["top_left"], body["bottom_right"]
    sql = geo_bbox_sql(
        body.get("lat_col", "lat"), body.get("lon_col", "lon"),
        float(tl["lat"]), float(tl["lon"]), float(br["lat"]), float(br["lon"]),
    )
    return _set_score(ctx, ctx.filter_ids(sql), body.get("boost", 1.0))


def _leaf_geo_shape(ctx, body):
    """ES `geo_shape` query over indexed POINTS (the engine's geo model:
    planted lat/lon metadata columns; the shape side comes from the
    query). Polygon / MultiPolygon / envelope bodies — GeoJSON or WKT
    (the A6 detector's six shapes parse via wkt_to_geojson_py,
    GeoJSONShapeSerializer.java:38-202) — compile to ONE even-odd
    ray-casting boolean expression with literal edge coefficients
    (functions/geo.py point_in_rings_sql): filter context, no UDF,
    whole-stage codegen. Relations over points: intersects == within ==
    point-in-shape; disjoint negates; contains is rejected (a point
    cannot contain a polygon — ES semantics)."""
    from ..functions.geo import geo_shape_rings, point_in_rings_sql

    body = dict(body)
    boost = float(body.pop("boost", 1.0))
    lat_col = body.pop("lat_col", "lat")
    lon_col = body.pop("lon_col", "lon")
    if "shape" in body:
        spec = body
    else:
        _field, spec = _one(body)
        spec = dict(spec) if isinstance(spec, dict) else {"shape": spec}
    relation = str(spec.get("relation", "intersects")).lower()
    if relation == "contains":
        raise ValueError(
            "geo_shape relation 'contains' is impossible over point "
            "fields (a point cannot contain a shape) — ES rejects it too"
        )
    if relation not in ("intersects", "within", "disjoint"):
        raise ValueError(f"unsupported geo_shape relation {relation!r}")
    rings = geo_shape_rings(spec.get("shape"))
    for col in (lat_col, lon_col):
        if col not in ctx.meta_cols():
            raise ValueError(
                f"geo column {col!r} not in docs metadata {ctx.meta_cols()}"
            )
    sql = point_in_rings_sql(lat_col, lon_col, rings)
    if relation == "disjoint":
        sql = f"(NOT {sql})"
    return _set_score(ctx, ctx.filter_ids(sql), boost)


def _leaf_shape(ctx, body):
    """ES `shape` query (cartesian, query-dsl-shape-query.html): the
    planar twin of geo_shape over indexed cartesian POINTS (x/y docs
    metadata columns, defaults x_col='x' / y_col='y'). Same GeoJSON/WKT
    shape grammar and the same even-odd ray cast — the polygon test's
    edge coefficients are coordinate-system-agnostic (nothing
    great-circle in it), so the geo kernel applies verbatim with y in
    the 'lat' slot and x in the 'lon' slot. Relations intersects /
    within / disjoint; contains rejected over points (ES semantics)."""
    body = dict(body)
    body.setdefault("lat_col", body.pop("y_col", "y"))
    body.setdefault("lon_col", body.pop("x_col", "x"))
    return _leaf_geo_shape(ctx, body)


def _geo_point_latlon(p) -> tuple[float, float]:
    """One ES geo-point literal -> (lat, lon). ES accepts an object
    ({"lat", "lon"}), a GeoJSON-order array ([lon, lat]), or a
    "lat,lon" string (query-dsl-geo-polygon-query.html)."""
    if isinstance(p, dict):
        return float(p["lat"]), float(p["lon"])
    if isinstance(p, str):
        lat_s, lon_s = p.split(",")
        return float(lat_s), float(lon_s)
    if isinstance(p, (list, tuple)) and len(p) == 2:
        lon, lat = p
        return float(lat), float(lon)
    raise ValueError(f"unparseable geo point {p!r}")


def _leaf_geo_polygon(ctx, body):
    """Deprecated-but-still-served ES `geo_polygon` query: the vertex
    list closes into one linear ring and rides the geo_shape leaf's
    even-odd ray-cast (point_in_rings_sql) — same filter-context,
    codegen-only plan; exists so request bodies written against older
    ES versions keep working (ES serves it behind a deprecation
    warning; the replacement geo_shape leaf sits alongside)."""
    from ..functions.geo import point_in_rings_sql

    body = dict(body)
    boost = float(body.pop("boost", 1.0))
    lat_col = body.pop("lat_col", "lat")
    lon_col = body.pop("lon_col", "lon")
    if "points" in body:
        spec = body
    else:
        _field, spec = _one(body)
    points = spec.get("points") if isinstance(spec, dict) else None
    if not points or len(points) < 3:
        raise ValueError("geo_polygon wants 'points': [>=3 vertices]")
    ring = [[lon, lat] for lat, lon in map(_geo_point_latlon, points)]
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    for col in (lat_col, lon_col):
        if col not in ctx.meta_cols():
            raise ValueError(
                f"geo column {col!r} not in docs metadata {ctx.meta_cols()}"
            )
    sql = point_in_rings_sql(lat_col, lon_col, [ring])
    return _set_score(ctx, ctx.filter_ids(sql), boost)


def _leaf_query_string(ctx, body):
    if isinstance(body, str):
        body = {"query": body}
    df = ctx.reader.query_string_df(
        body["query"], k=None,
        default_operator=body.get("default_operator", "or").lower(),
    )
    return _scale(df, body.get("boost", 1.0))


def _leaf_simple_query_string(ctx, body):
    """ES simple_query_string: the same mini-language with the SQS infix
    spellings — standalone `+` means AND and `|` means OR
    (simple-query-string-syntax) — translated token-wise onto the
    query_string parser; `-`, quotes, `*`, `~N` already coincide.
    `flags` is accepted and ignored (all supported features stay on —
    SQS flags only ever REMOVE syntax, and unknown syntax here degrades
    to plain terms, the SQS contract of never erroring). The rewrite is
    QUOTE-AWARE: operators inside a quoted phrase are literal in ES
    (analysis drops them), so a standalone + or | inside quotes passes
    through untouched instead of corrupting the phrase with an
    AND/OR token. Unspaced infix (foo+bar) degrades to plain terms
    (documented SQS degradation, never an error)."""
    if isinstance(body, str):
        body = {"query": body}
    body = dict(body)
    segs = re.split(r'("[^"]*"(?:~\d+)?)', str(body["query"]))
    out_segs = []
    for i, seg in enumerate(segs):
        if i % 2:  # quoted phrase (+ optional ~slop): untouched
            out_segs.append(seg)
            continue
        toks = seg.split(" ")
        # a sign character ATTACHED to the following quote ('+"a b"')
        # ends this segment without trailing whitespace — leave it for
        # the parser's own sign handling instead of gluing AND onto the
        # quote
        keep_last = i + 1 < len(segs) and seg != "" and not seg.endswith(" ")
        body_toks = toks[:-1] if keep_last else toks
        mapped = [{"+": "AND", "|": "OR"}.get(t, t) for t in body_toks]
        if keep_last:
            last = toks[-1]
            if last == "|":
                # '|' is NOT a parser sign (only +/- are): detach it as
                # the OR connective so the quoted phrase stays intact
                mapped.extend(["OR", ""])
            else:
                mapped.append(last)
        out_segs.append(" ".join(mapped))
    body["query"] = "".join(out_segs)
    body.pop("flags", None)
    return _leaf_query_string(ctx, body)


def _leaf_knn(ctx, body):
    """ES `knn` search clause over an embedding METADATA column, scored
    (1 + cosine) / 2 (ES's cosine-similarity mapping) so hybrid
    bool-should compositions with BM25 stay positive. `filter` is a
    nested query body with PRE-filter semantics (restricts the corpus
    BEFORE candidate generation, like ES knn.filter).

    `num_candidates` (the ES approximation knob): on a base-tier reader
    with an `enable_ann` IVF sidecar, routes through the partition-pruned
    centroid probe (reader.knn_df) — the 10^12-scale path. Without a
    sidecar (or on the live tier) it falls back to the exact scan, which
    is strictly-better recall."""
    from ..operators.similarity import cosine

    field = body["field"]
    docs = ctx.docs()
    if field not in docs.columns:
        raise ValueError(
            f"unknown embedding column {field!r}; docs table has "
            f"{ctx.meta_cols()}"
        )
    qv = [float(x) for x in body["query_vector"]]
    k = int(body.get("k", 10))
    restrict = None
    if body.get("filter") is not None:
        restrict = _compile(ctx, body["filter"]).select(*ctx.keys)
    nc = body.get("num_candidates")
    if (
        not ctx.live
        and hasattr(ctx.reader, "knn_df")
        and (nc is None or ctx.reader._ann_meta(field) is not None)
    ):
        scored = ctx.reader.knn_df(
            field, qv, num_candidates=nc, restrict_df=restrict
        )
    else:
        qcol = F.array(*[F.lit(x) for x in qv])
        cand = docs
        if restrict is not None:
            cand = cand.join(restrict, ctx.keys, "left_semi")
        scored = cand.filter(F.col(field).isNotNull()).select(
            *ctx.keys,
            (
                (
                    F.lit(1.0)
                    + cosine(
                        F.transform(F.col(field), lambda x: x.cast("double")), qcol
                    )
                )
                / F.lit(2.0)
            ).alias("score"),
        )
    sim = body.get("similarity")
    if sim is not None:
        # ES knn.similarity: minimum raw similarity for a match — under
        # the (1 + cos) / 2 score mapping, a cosine threshold s becomes
        # a score threshold (1 + s) / 2, applied BEFORE the k cut
        scored = scored.filter(
            F.col("score") >= (1.0 + float(sim)) / 2.0
        )
    top = scored.orderBy(F.desc("score"), *[F.asc(c) for c in ctx.keys]).limit(k)
    return _scale(top, body.get("boost", 1.0))


def _leaf_sparse_vector(ctx, body):
    """ES `sparse_vector` (ELSER-style weighted-token scoring; the
    `weighted_tokens` shape): score = sum over the query's (token,
    weight) pairs of weight * doc_rank_features[token], docs with zero
    overlap excluded. The rank-features live in a map<string,double>
    METADATA column; the whole score is one static JVM expression tree
    over the docs scan — no explode, no UDF, token count bounded by the
    query."""
    field = body["field"]
    docs = ctx.docs()
    if field not in docs.columns:
        raise ValueError(
            f"unknown rank-features column {field!r}; docs table has "
            f"{ctx.meta_cols()}"
        )
    qv = body.get("query_vector") or {}
    if not isinstance(qv, dict) or not qv:
        raise ValueError("sparse_vector needs a non-empty query_vector map")
    score = None
    for tok, w in qv.items():
        term = F.lit(float(w)) * F.coalesce(
            F.element_at(F.col(field), F.lit(tok)).cast("double"), F.lit(0.0)
        )
        score = term if score is None else score + term
    out = (
        docs.filter(F.col(field).isNotNull())
        .select(*ctx.keys, score.alias("score"))
        .filter(F.col("score") > 0)
    )
    return _scale(out, body.get("boost", 1.0))


def _leaf_mlt(ctx, body):
    like = body["like"]
    if isinstance(like, list):
        # ES accepts a LIST of like-texts (concatenated term source) and
        # {_id/_index} doc references — the latter are impossible here:
        # the index stores no _source (the database is authoritative),
        # so there is no stored text to expand a doc reference from
        if any(not isinstance(x, str) for x in like):
            raise ValueError(
                "more_like_this doc references ({'_id': ...}) are "
                "unsupported: the index stores no _source — pass the "
                "document's text itself"
            )
        like = " ".join(like)
    flds = body.get("fields")
    if flds and not ctx.fields:
        flds = None  # plain corpus: content pseudo-field only
    df = ctx.reader.more_like_this_df(
        like, k=None,
        max_query_terms=int(body.get("max_query_terms", 25)),
        min_term_freq=int(body.get("min_term_freq", 2)),
        min_doc_freq=int(body.get("min_doc_freq", 2)),
        min_should_match=body.get("minimum_should_match", "30%"),
        fields=flds,
    )
    return _scale(df, body.get("boost", 1.0))


# ------------------------------------------------------------- compounds


def _sum_scores(ctx, dfs: list[DataFrame]) -> DataFrame:
    """Inner-join DataFrames on the doc keys, scores adding."""
    out = dfs[0]
    for df in dfs[1:]:
        a = ctx.alias()
        out = out.join(
            df.withColumnRenamed("score", a), ctx.keys
        ).withColumn("score", F.col("score") + F.col(a)).drop(a)
    return out


def _flat_bool_fast(ctx, body):
    """ONE-postings-scan fast path for a FLAT bool: when every clause is
    a bare default-options `match` on the content pseudo-field of a
    plain corpus, the whole bool routes through the search_bool_df
    kernel — one postings scan over the union of terms, conjunction and
    exclusion as aggregation predicates — instead of one postings scan
    per leaf plus joins (VERDICT r4 #4). `filter` clauses STAY on the
    fast path: filter context never scores (ES contract), so each one
    compiles independently and semi-joins the kernel's match set — for
    the common match-must + metadata-filter body the postings are still
    scanned ONCE (metadata filters compile to docs scans). Returns None
    (fall back to the generic compiler) whenever exact score parity is
    not guaranteed: fields corpora (per-field namespaces/boosts),
    explicit minimum_should_match, non-match scoring clauses,
    per-clause options, stopword-empty clauses, or a term shared by two
    clauses (the kernel scans each term once; the per-leaf path would
    sum it twice)."""
    if ctx.fields or ctx.runtime:
        return None
    if "minimum_should_match" in body:
        return None
    known = {"must", "should", "must_not", "filter", "boost"}
    if any(k not in known for k in body):
        return None
    if body.get("filter") and not body.get("must"):
        # should+filter without must: ES defaults msm to 0 when a filter
        # clause exists, so docs matching ONLY the filter qualify (score
        # 0) — the kernel path requires >=1 should term and would drop
        # them; the generic compiler handles this shape correctly
        return None

    def clause_tokens(key):
        out = []
        for q in _aslist(body.get(key)):
            if not isinstance(q, dict) or len(q) != 1 or "match" not in q:
                return None
            field, spec = _field_spec(q["match"])
            if field not in ("content", "text", "_all"):
                return None
            if set(spec) - {"query"}:
                return None
            v = spec["query"]
            if not isinstance(v, str):
                return None
            toks = ctx.reader.query_terms(v)
            if not toks:
                return None  # stopword-empty clause: semantics diverge
            out.append(toks)
        return out

    must = clause_tokens("must")
    should = clause_tokens("should")
    must_not = clause_tokens("must_not")
    if must is None or should is None or must_not is None:
        return None
    if not (must or should):
        return None  # let the generic path raise its error
    flat = [t for c in must + should for t in c]
    if len(flat) != len(set(flat)):
        return None
    # each clause rides as ONE nested or-group (ES match, operator OR:
    # >=1 token of the clause); must_not flattens to exclusion terms
    out = ctx.reader.search_bool_df(
        must=must,
        should=should,
        must_not=[t for c in must_not for t in c],
        k=None,
    )
    for q in _aslist(body.get("filter")):
        out = out.join(
            _compile(ctx, q).select(*ctx.keys), ctx.keys, "left_semi"
        )
    return _scale(out, float(body.get("boost", 1.0)))


def _compound_bool(ctx, body):
    fast = _flat_bool_fast(ctx, body)
    if fast is not None:
        return fast
    must = [_compile(ctx, q) for q in _aslist(body.get("must"))]
    filt = [_compile(ctx, q) for q in _aslist(body.get("filter"))]
    should = [_compile(ctx, q) for q in _aslist(body.get("should"))]
    must_not = [_compile(ctx, q) for q in _aslist(body.get("must_not"))]
    if not (must or filt or should):
        raise ValueError("bool needs at least one positive clause")
    msm = body.get("minimum_should_match")
    base = _sum_scores(ctx, must) if must else None
    for fdf in filt:
        if base is None:
            base = _set_score(ctx, fdf, 0.0)
        else:
            base = base.join(fdf.select(*ctx.keys), ctx.keys, "left_semi")
    if should:
        if base is None:
            # pure-should bool: qualify on msm (default 1), scores add
            if msm is None:
                msm = 1
            parts = [
                df.select(*ctx.keys, "score", F.lit(i).alias("_cl"))
                for i, df in enumerate(should)
            ]
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            base = (
                u.groupBy(*ctx.keys)
                .agg(
                    F.sum("score").alias("score"),
                    F.countDistinct("_cl").alias("_n"),
                )
                .filter(F.col("_n") >= _parse_msm(msm, len(should)))
                .drop("_n")
            )
        else:
            # scoring companions: add when present; msm (default 0) gates
            if msm is None:
                msm = 0
            hit_cols = []
            for df in should:
                a = ctx.alias()
                hit_cols.append(a)
                base = base.join(
                    df.withColumnRenamed("score", a), ctx.keys, "left"
                ).withColumn(
                    "score", F.col("score") + F.coalesce(F.col(a), F.lit(0.0))
                )
            m = _parse_msm(msm, len(should))
            if m > 0:
                n_hit = sum(
                    F.when(F.col(a).isNotNull(), 1).otherwise(0)
                    for a in hit_cols
                )
                base = base.filter(n_hit >= m)
            base = base.drop(*hit_cols)
    for ndf in must_not:
        base = base.join(ndf.select(*ctx.keys), ctx.keys, "left_anti")
    return _scale(base, body.get("boost", 1.0))


def _compound_constant_score(ctx, body):
    inner = _compile(ctx, body["filter"])
    return _set_score(ctx, inner, body.get("boost", 1.0))


def _compound_dis_max(ctx, body):
    dfs = [_compile(ctx, q) for q in body["queries"]]
    tb = float(body.get("tie_breaker", 0.0))
    u = dfs[0]
    for df in dfs[1:]:
        u = u.unionByName(df)
    out = (
        u.groupBy(*ctx.keys)
        .agg(F.max("score").alias("_best"), F.sum("score").alias("_sum"))
        .select(
            *ctx.keys,
            (
                F.col("_best") + F.lit(tb) * (F.col("_sum") - F.col("_best"))
            ).alias("score"),
        )
    )
    return _scale(out, body.get("boost", 1.0))


def _compound_boosting(ctx, body):
    pos = _compile(ctx, body["positive"])
    neg = _compile(ctx, body["negative"]).select(*ctx.keys)
    nb = float(body.get("negative_boost", 0.5))
    a = ctx.alias()
    return (
        pos.join(neg.withColumn(a, F.lit(1)), ctx.keys, "left")
        .withColumn(
            "score",
            F.when(F.col(a).isNotNull(), F.col("score") * F.lit(nb)).otherwise(
                F.col("score")
            ),
        )
        .drop(a)
    )


def _script_source(spec) -> str:
    if isinstance(spec, str):
        return spec
    if isinstance(spec, dict):
        src = spec.get("source") or spec.get("script")
        if isinstance(src, dict):
            src = src.get("source")
        if isinstance(src, str):
            return src
    raise ValueError(f"script wants {{'source': '<spark sql>'}}, got {spec!r}")


def _compound_script_score(ctx, body):
    inner = _compile(ctx, body["query"]).withColumnRenamed("score", "_score")
    src = _script_source(body["script"])
    out = (
        inner.join(ctx.docs(), ctx.keys)
        .withColumn("score", F.expr(src).cast("double"))
        .select(*ctx.keys, "score")
    )
    if body.get("min_score") is not None:
        out = out.filter(F.col("score") >= float(body["min_score"]))
    return out


_FVF_MODS = {
    "none": lambda c: c,
    "log1p": lambda c: F.log(c + F.lit(1.0)),
    "sqrt": lambda c: F.sqrt(c),
    "square": lambda c: c * c,
}


_FS_KINDS = (
    "script_score", "field_value_factor", "random_score",
    "gauss", "exp", "linear", "weight",
)


def _fs_value(ctx, spec: dict):
    """One function_score FUNCTION entry -> its value Column over the
    docs view (weight multiplies; a weight-only entry IS the weight —
    the ES weight function). random_score is the engine-native
    deterministic variant: xxhash64(doc keys, seed) mapped to [0, 1) —
    reproducible across runs and partitionings (ES's is also
    deterministic given seed + field). Decay kinds gauss/exp/linear
    cover numeric/date fields (functions/scoring.decay_expr); geo decay
    rides the typed function_score_df surface."""
    kinds = [k for k in spec if k in _FS_KINDS and k != "weight"]
    if len(kinds) > 1:
        raise ValueError(f"one function per entry; got {sorted(kinds)}")
    w = F.lit(float(spec.get("weight", 1.0)))
    if not kinds:
        if "weight" not in spec:
            raise ValueError(
                "function entry needs one of script_score / "
                "field_value_factor / random_score / gauss / exp / "
                "linear / weight"
            )
        return w
    kind = kinds[0]
    fspec = spec[kind]
    if kind == "script_score":
        return w * F.expr(_script_source(fspec)).cast("double")
    if kind == "field_value_factor":
        col = F.coalesce(
            F.col(fspec["field"]).cast("double"),
            F.lit(float(fspec.get("missing", 1.0))),
        )
        mod = fspec.get("modifier", "none")
        if mod not in _FVF_MODS:
            raise ValueError(f"unknown field_value_factor modifier {mod!r}")
        # ES applies factor BEFORE the modifier: modifier(factor * value)
        return w * _FVF_MODS[mod](col * F.lit(float(fspec.get("factor", 1.0))))
    if kind == "random_score":
        # hash the STABLE doc identity (the manifest key columns), not
        # the internal (segment, doc_id) keys — same draw on the base
        # and live tiers for the same document
        seed = int((fspec or {}).get("seed", 0))
        idc = list(ctx.r0.manifest["key_cols"])
        h = F.xxhash64(*[F.col(c) for c in idc], F.lit(seed))
        return w * (F.pmod(h, F.lit(1 << 52)).cast("double") / F.lit(float(1 << 52)))
    # decay kinds over a numeric/date field
    from ..functions.scoring import decay_expr

    (field, dspec), = fspec.items()
    origin = dspec["origin"]
    if isinstance(origin, str):
        import datetime as _dt

        from ..functions.datemath import parse_date_math

        origin = (
            parse_date_math(origin)
            .replace(tzinfo=_dt.timezone.utc)
            .timestamp()
        )
    return w * F.expr(
        decay_expr(
            kind, field, float(origin), float(dspec["scale"]),
            offset=float(dspec.get("offset", 0.0)),
            decay=float(dspec.get("decay", 0.5)),
        )
    )


def _compound_function_score(ctx, body):
    """ES function_score: the single-function shorthands AND the
    `functions` array — per-entry filter (a query body restricting which
    docs the function applies to), weight, score_mode combining the
    APPLYING functions (multiply / sum / avg / first / max / min; no
    function applying = neutral 1.0), max_boost cap, boost_mode merging
    with the query score (multiply / replace / sum / avg / max / min),
    min_score cut. Everything evaluates inside codegen over ONE
    hits-join-docs projection; per-entry filters join as match-set
    indicator relations on the doc keys (AQE broadcasts the small ones;
    never a second corpus scan)."""
    inner = _compile(ctx, body["query"])
    bmode = body.get("boost_mode", "multiply")
    if bmode not in ("multiply", "replace", "sum", "avg", "max", "min"):
        raise ValueError(f"unsupported boost_mode {bmode!r}")
    smode = body.get("score_mode", "multiply")
    if smode not in ("multiply", "sum", "avg", "first", "max", "min"):
        raise ValueError(f"unsupported score_mode {smode!r}")
    entries = body.get("functions")
    if entries is None:
        shorthand = {k: body[k] for k in _FS_KINDS if k in body}
        if not shorthand:
            raise ValueError(
                "function_score needs `functions` or one of "
                f"{_FS_KINDS}"
            )
        entries = [shorthand]
    rows = inner.join(ctx.docs(), ctx.keys)
    vals, gates = [], []
    for i, entry in enumerate(_aslist(entries)):
        entry = dict(entry)
        filt = entry.pop("filter", None)
        vals.append(_fs_value(ctx, entry))
        if filt is None:
            gates.append(F.lit(True))
        else:
            flag = f"_fsm{i}"
            ind = _compile(ctx, filt).select(*ctx.keys).withColumn(
                flag, F.lit(True)
            )
            # no broadcast HINT: a function filter can match most of the
            # corpus (its indicator is corpus-sized) — AQE picks the
            # broadcast when the match set is actually small
            rows = rows.join(ind, ctx.keys, "left")
            gates.append(F.col(flag).isNotNull())
    applied = [F.when(g, v) for g, v in zip(gates, vals)]
    if smode == "multiply":
        factor = applied[0].otherwise(1.0)
        for a in applied[1:]:
            factor = factor * a.otherwise(1.0)
    elif smode == "sum":
        n = sum(F.when(g, 1).otherwise(0) for g in gates)
        s = sum(F.coalesce(a, F.lit(0.0)) for a in applied)
        factor = F.when(n > 0, s).otherwise(1.0)
    elif smode == "avg":
        n = sum(F.when(g, 1).otherwise(0) for g in gates)
        s = sum(F.coalesce(a, F.lit(0.0)) for a in applied)
        factor = F.when(n > 0, s / n).otherwise(1.0)
    elif smode == "first":
        factor = F.coalesce(*applied, F.lit(1.0))
    elif smode == "max":
        factor = F.coalesce(F.greatest(*applied, F.lit(None).cast("double"))
                            if len(applied) > 1 else applied[0], F.lit(1.0))
    else:  # min
        factor = F.coalesce(F.least(*applied, F.lit(None).cast("double"))
                            if len(applied) > 1 else applied[0], F.lit(1.0))
    if body.get("max_boost") is not None:
        factor = F.least(factor, F.lit(float(body["max_boost"])))
    s = F.col("score")
    combined = {
        "multiply": s * factor,
        "replace": factor,
        "sum": s + factor,
        "avg": (s + factor) / F.lit(2.0),
        "max": F.greatest(s, factor),
        "min": F.least(s, factor),
    }[bmode]
    out = rows.withColumn("_f", combined).select(
        *ctx.keys, F.col("_f").alias("score")
    )
    if body.get("min_score") is not None:
        out = out.filter(F.col("score") >= float(body["min_score"]))
    return _scale(out, body.get("boost", 1.0))


def _compound_rank_feature(ctx, body):
    from .query import IndexReader

    field = body["field"]
    if "saturation" in body:
        fn, kw = "saturation", {"pivot": float(body["saturation"]["pivot"])}
    elif "log" in body:
        fn, kw = "log", {"scale": float(body["log"]["scaling_factor"])}
    elif "sigmoid" in body:
        fn, kw = "sigmoid", {
            "pivot": float(body["sigmoid"]["pivot"]),
            "exponent": float(body["sigmoid"]["exponent"]),
        }
    else:
        raise ValueError("rank_feature needs saturation/log/sigmoid")
    expr = IndexReader._rank_feature_expr(
        field, fn, kw.get("pivot"), kw.get("scale"), kw.get("exponent")
    )
    docs = ctx.docs()
    if field not in docs.columns:
        raise ValueError(f"unknown feature column {field!r}")
    boost = float(body.get("boost", 1.0))
    return docs.select(*ctx.keys, (F.lit(boost) * expr).alias("score"))


def _compound_wrapper(ctx, body):
    raw = base64.b64decode(body["query"]).decode("utf-8")
    return _compile(ctx, json.loads(raw))


# --------------------------------------------------------------- dispatch


def _compound_pinned(ctx, body):
    """ES `pinned` query (PinnedQueryBuilder): the listed ids rank FIRST,
    in the order given, ahead of every organic hit; organic hits keep
    their relevance order below and pinned docs are removed from the
    organic set. Generalizes IndexReader.search_pinned_df (whose organic
    side is a plain match string) to ANY organic subquery, under the
    SAME sentinel contract: score = PINNED_BASE_SCORE - position, exact
    in float64 (see the constant's comment in index/query.py on why
    ES's Float.MAX_VALUE base can't express per-rank steps).

    Plan: the organic query compiles once; the pin list is a tiny
    literal DataFrame broadcast-joined to the docs table on `id_field`
    (the pruned metadata scan, no postings access), and the organic set
    drops pins via one broadcast anti-join — no extra index scan for
    the pins at any corpus scale."""
    from .query import IndexReader
    ids = [str(v) for v in _aslist(body["ids"])]
    if not ids:
        raise ValueError("pinned needs at least one id")
    if "organic" not in body:
        raise ValueError("pinned needs an organic query")
    id_field = body.get("id_field", "path")
    docs = ctx.docs()
    if id_field not in docs.columns:
        raise ValueError(
            f"unknown docs column {id_field!r}; docs table has {docs.columns}"
        )
    organic = _compile(ctx, body["organic"])
    spark = docs.sparkSession
    pin = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(ids)], "pin_rank int, pin_id string"
    )
    pinned = docs.join(
        F.broadcast(pin), docs[id_field].cast("string") == pin.pin_id
    ).select(
        *ctx.keys,
        (
            F.lit(IndexReader.PINNED_BASE_SCORE)
            - F.col("pin_rank").cast("double")
        ).alias("score"),
    )
    rest = organic.join(
        F.broadcast(pinned.select(*ctx.keys)), ctx.keys, "left_anti"
    )
    return pinned.unionByName(rest)


_LEAFS = {
    "match": _leaf_match,
    "match_phrase": _leaf_match_phrase,
    "match_bool_prefix": _leaf_match_bool_prefix,
    "multi_match": _leaf_multi_match,
    "term": _leaf_term,
    "terms": _leaf_terms,
    "range": _leaf_range,
    "exists": _leaf_exists,
    "nested": _leaf_nested,
    "ids": _leaf_ids,
    "parent_id": _leaf_parent_id,
    "prefix": _leaf_prefix,
    "fuzzy": _leaf_fuzzy,
    "wildcard": _leaf_wildcard,
    "regexp": _leaf_regexp,
    "intervals": _leaf_intervals,
    "match_none": _leaf_match_none,
    "match_phrase_prefix": _leaf_match_phrase_prefix,
    "combined_fields": _leaf_combined_fields,
    "terms_set": _leaf_terms_set,
    "percolate": _leaf_percolate,
    "has_child": _leaf_has_child,
    "has_parent": _leaf_has_parent,
    "distance_feature": _leaf_distance_feature,
    "script": _leaf_script_query,
    "geo_distance": _leaf_geo_distance,
    "geo_bounding_box": _leaf_geo_bbox,
    "geo_shape": _leaf_geo_shape,
    "shape": _leaf_shape,
    "geo_polygon": _leaf_geo_polygon,
    "query_string": _leaf_query_string,
    "simple_query_string": _leaf_simple_query_string,
    "more_like_this": _leaf_mlt,
    "knn": _leaf_knn,
    "sparse_vector": _leaf_sparse_vector,
    "weighted_tokens": _leaf_sparse_vector,
}

_COMPOUNDS = {
    "bool": _compound_bool,
    "constant_score": _compound_constant_score,
    "dis_max": _compound_dis_max,
    "boosting": _compound_boosting,
    "script_score": _compound_script_score,
    "function_score": _compound_function_score,
    "rank_feature": _compound_rank_feature,
    "wrapper": _compound_wrapper,
    "pinned": _compound_pinned,
}

_SPAN_KINDS = (
    "span_term", "span_near", "span_first", "span_or", "span_not",
    "span_within", "span_containing", "span_multi", "span_field_masking",
)


def _compile(ctx: _Ctx, body: dict) -> DataFrame:
    kind, spec = _one(body)
    if kind == "match_all":
        boost = float((spec or {}).get("boost", 1.0))
        out = _set_score(ctx, ctx.docs().select(*ctx.keys), boost)
    elif kind in _SPAN_KINDS:
        out = _leaf_span(ctx, kind, spec)
    elif kind in _LEAFS:
        out = _LEAFS[kind](ctx, spec)
    elif kind in _COMPOUNDS:
        out = _COMPOUNDS[kind](ctx, spec)
    else:
        raise ValueError(
            f"unsupported query kind {kind!r}; supported: "
            f"{sorted([*_LEAFS, *_COMPOUNDS, *_SPAN_KINDS, 'match_all'])}"
        )
    # normalize: every node trades in exactly (keys, score) — surfaces
    # that decorate extra columns must not leak them into the algebra
    return out.select(*ctx.keys, F.col("score").cast("double").alias("score"))


def _profile_node(body: dict) -> dict:
    """Structural profile of one query node: its kind, the engine surface
    it dispatches to (the compiled function's name — greppable straight
    into this module), and its child query nodes. Mirrors _compile's
    dispatch exactly, so an unsupported body fails profile the same way
    it would fail search."""
    kind, spec = _one(body)
    if kind == "match_all":
        surface = "docs_scan"
    elif kind in _SPAN_KINDS:
        surface = "_leaf_span/span_algebra"
    elif kind in _LEAFS:
        surface = _LEAFS[kind].__name__
    elif kind in _COMPOUNDS:
        surface = _COMPOUNDS[kind].__name__
    else:
        raise ValueError(
            f"unsupported query kind {kind!r}; supported: "
            f"{sorted([*_LEAFS, *_COMPOUNDS, *_SPAN_KINDS, 'match_all'])}"
        )
    children: list[dict] = []
    if kind in _COMPOUNDS and kind != "wrapper":
        kinds = set(_LEAFS) | set(_COMPOUNDS) | set(_SPAN_KINDS) | {"match_all"}

        def walk(v):
            if isinstance(v, dict) and len(v) == 1 and next(iter(v)) in kinds:
                children.append(_profile_node(v))
            elif isinstance(v, dict):
                for x in v.values():
                    walk(x)
            elif isinstance(v, list):
                for x in v:
                    walk(x)

        walk(spec)
    elif kind == "wrapper":
        # decode and profile the wrapped body (the ES profile shows the
        # rewritten query, not the base64 envelope)
        raw = spec["query"] if isinstance(spec, dict) else spec
        children.append(_profile_node(json.loads(base64.b64decode(raw))))
    return {"type": kind, "surface": surface, "children": children}


def _tier_order(ctx: _Ctx, primary) -> list:
    """Primary ordering + the tier's deterministic tie-break (ES
    _shard_doc): doc_id asc on a base index, segment recency then doc_id
    on a live one."""
    if ctx.live:
        rank_map = ctx.reader._rank_map()
        return list(primary) + [
            F.desc(rank_map[F.col("segment")]), F.asc("doc_id")
        ]
    return list(primary) + [F.asc("doc_id")]


_RESCORE_MODES = ("total", "multiply", "avg", "max", "min")


def _apply_rescore(ctx: _Ctx, out: DataFrame, spec: dict) -> DataFrame:
    """One ES rescorer (rescore-search-results.html), generalized: the
    first-pass top window_size (ranked with the tier tie-break — a
    k-bounded TakeOrdered, never the full match set) left-joins the
    rescore query's UNRANKED match set (ANY query body, not just phrase —
    a strict superset of the reader's rescore_df) and combines
    query_weight*q with rescore_query_weight*r under score_mode
    total/multiply/avg/max/min; a window doc the rescore query misses
    keeps query_weight*q (the ES contract). Engine-native delta
    (documented): hits BEYOND the window are dropped rather than kept at
    their first-pass rank — callers page within the window."""
    if not isinstance(spec, dict) or "query" not in spec:
        raise ValueError(
            "rescore wants {'window_size': n, 'query': {'rescore_query': "
            "...}}"
        )
    window = int(spec.get("window_size", 100))
    q = spec["query"]
    rq = q.get("rescore_query")
    if not isinstance(rq, dict):
        raise ValueError("rescore.query.rescore_query must be a query object")
    wq = float(q.get("query_weight", 1.0))
    wr = float(q.get("rescore_query_weight", 1.0))
    mode = q.get("score_mode", "total")
    if mode not in _RESCORE_MODES:
        raise ValueError(f"score_mode {mode!r}: one of {_RESCORE_MODES}")
    first = out.orderBy(*_tier_order(ctx, [F.desc("score")])).limit(window)
    resc = _compile(ctx, rq).withColumnRenamed("score", "_r")
    j = first.join(resc, ctx.keys, "left")
    qc = F.col("score") * F.lit(wq)
    rc = F.col("_r") * F.lit(wr)
    matched = {
        "total": qc + rc,
        "multiply": qc * rc,
        "avg": (qc + rc) / F.lit(2.0),
        "max": F.greatest(qc, rc),
        "min": F.least(qc, rc),
    }[mode]
    combined = F.when(F.col("_r").isNull(), qc).otherwise(matched)
    return j.select(*ctx.keys, combined.cast("double").alias("score"))


_SORT_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _apply_sort(ctx: _Ctx, out: DataFrame, sort) -> tuple:
    """Compile the ES `sort` array onto the match set: each entry is
    '_score', a docs metadata column (runtime fields included — the ctx
    docs view carries them), or a Spark SQL expression (the ES script /
    _geo_distance computed-sort surface, returned as sort_<i>). `missing`
    honors _first/_last (ES default _last). Returns the decorated match
    set plus the ordering columns; the caller appends the tier tie-break
    (ES _shard_doc).

    Index-sort fast path (base tier): when the request is a
    same-direction prefix of the build's index_sort AND each entry's
    null placement matches the layout (the builder sorted with Spark
    defaults — asc = nulls FIRST, desc = nulls last — so an asc entry
    must say missing: _first; desc matches the ES _last default), doc_id
    is monotone with the request and the ordering collapses to the one
    long column. Sort columns still decorate the output."""
    docs = ctx.docs()
    entries = []
    resolved = []  # (output column name, direction) per entry
    cols, order = [], []
    for i, s in enumerate(_aslist(sort)):
        if isinstance(s, str):
            f, direction, missing = s, ("desc" if s == "_score" else "asc"), "_last"
        elif isinstance(s, dict) and len(s) == 1:
            (f, spec), = s.items()
            if isinstance(spec, str):
                direction, missing = spec, "_last"
            else:
                direction = spec.get("order", "desc" if f == "_score" else "asc")
                missing = spec.get("missing", "_last")
        else:
            raise ValueError(f"bad sort entry {s!r}")
        head, _, leaf = f.partition(".")
        if f == "_score":
            col = F.col("score")
            rname = "score"
        elif f in ("_id", "_doc"):
            # ES _id / _doc sort: the doc identity / index order — both
            # map to the engine's monotone internal doc_id (the builder
            # assigns ids in key order, so _id order IS _doc order here)
            col = F.col("doc_id")
            rname = "doc_id"
        elif (
            leaf
            and _NESTED_IDENT.fullmatch(head)
            and _NESTED_IDENT.fullmatch(leaf)
            and dict(docs.dtypes).get(head, "").startswith("array<struct")
        ):
            # ES nested sort: sort a doc by an aggregate of a field
            # across its array-of-structs elements — `mode` min (asc
            # default) / max (desc default) / sum / avg
            # (sort-search-results.html nested sorting). One
            # whole-stage-codegen projection, no explode.
            # explicit mode wins; otherwise the ES default follows the
            # direction (desc -> max, asc -> min) for EVERY entry shape,
            # including the {'field': 'desc'} dict shorthand
            mode = None
            if isinstance(s, dict):
                mspec = next(iter(s.values()))
                if isinstance(mspec, dict):
                    mode = mspec.get("mode")
            if mode is None:
                mode = "max" if direction == "desc" else "min"
            vals = f"transform({head}, e -> cast(e.{leaf} as double))"
            exprs = {
                "min": f"array_min({vals})",
                "max": f"array_max({vals})",
                "sum": f"aggregate({vals}, 0D, (a, x) -> a + coalesce(x, 0D))",
                # avg over EXISTING values only (ES ignores missing
                # element values; dividing by the full element count
                # would understate docs with null-valued elements)
                "avg": (
                    f"aggregate({vals}, 0D, (a, x) -> a + coalesce(x, 0D))"
                    f" / nullif(size(filter({vals}, x -> x IS NOT NULL)), 0)"
                ),
            }
            if mode not in exprs:
                raise ValueError(
                    f"nested sort mode {mode!r}: one of {sorted(exprs)}"
                )
            name = f"sort_{i}"
            docs = docs.withColumn(name, F.expr(exprs[mode]))
            cols.append(name)
            col = F.col(name)
            rname = name
        elif f in out.columns:
            # already on the match set (a collapse key, collapse_count, a
            # column an earlier entry joined) — no second join
            col = F.col(f)
            rname = f
        elif f in docs.columns:
            if f not in cols:
                cols.append(f)
            col = F.col(f)
            rname = f
        elif _SORT_IDENT.fullmatch(f):
            meta = [c for c in docs.columns if c not in ("doc_id", "segment")]
            raise ValueError(f"unknown sort field {f!r}; docs table has {meta}")
        else:
            name = f"sort_{i}"
            docs = docs.withColumn(name, F.expr(f))
            cols.append(name)
            col = F.col(name)
            rname = name
        asc = direction != "desc"
        if missing == "_first":
            order.append(col.asc_nulls_first() if asc else col.desc_nulls_first())
        else:
            order.append(col.asc_nulls_last() if asc else col.desc_nulls_last())
        entries.append((f, direction, missing))
        resolved.append((rname, direction, missing))
    if cols:
        out = out.join(docs.select(*ctx.keys, *cols), ctx.keys)
    isort = ctx.r0.manifest.get("index_sort")
    if not ctx.live and isort and len(entries) <= len(isort):
        # a runtime field SHADOWING an index_sort column must disable the
        # fast path: doc_id order reflects the STORED values, not the
        # runtime expression the user is sorting on (ADVICE r4)
        ok = all(
            (f, d) == tuple(isort[i])
            and f not in ctx.runtime
            and ((d == "desc" and m == "_last") or (d == "asc" and m == "_first"))
            for i, (f, d, m) in enumerate(entries)
        )
        if ok:
            order = [F.asc("doc_id")]
    return out, order, resolved


def profile_dsl(
    reader,
    body: dict,
    k: int | None = 10,
    filter_sql: str | None = None,
) -> dict:
    """ES `"profile": true` analogue for a request body: how the engine
    will execute the query, WITHOUT guessing — the compiled DataFrame's
    own physical plan.

    Returns {"query_tree", "physical_plan", "hits"}:
      * query_tree — the node-by-node dispatch _compile will perform
        (kind -> engine surface -> children), the ES profile's query
        component tree;
      * physical_plan — Spark's formatted explain of the FULL ranked
        plan (scans with PushedFilters, exchanges, codegen spans): the
        ES profile's collector/timing breakdown is a per-shard wall-time
        report, Spark's equivalent observability is the plan plus the UI
        stage metrics, so that is what we surface (engine-native delta);
      * hits — the ranked result DataFrame itself (profile in ES still
        returns hits; nothing here forces an extra execution — the plan
        string comes from the optimizer, not a run).
    """
    q = body
    if isinstance(q, dict) and len(q) > 1:
        q = {kk: vv for kk, vv in q.items() if kk not in (
            "collapse", "runtime_mappings", "sort", "size", "from",
            "search_after", "fields", "_source", "rescore", "post_filter",
            "min_score", "aggs", "aggregations", "highlight", "suggest")}
    knn_hybrid = None
    if isinstance(q, dict) and "knn" in q and "query" in q:
        # top-level knn + query: profile both sides under one fusion node
        q = dict(q)
        knn_hybrid = _aslist(q.pop("knn"))
    if isinstance(q, dict) and "query" in q and len(q) == 1:
        q = q["query"]
    if isinstance(q, dict) and len(q) == 1 and "retriever" in q:
        # retriever trees fuse ranked sub-searches (not match-set algebra);
        # profile the tree shape, leave leaf expansion to their own bodies
        def rtree(spec):
            (rk, rs), = spec.items()
            return {
                "type": rk, "surface": "_retriever_compile",
                "children": [rtree(c) for c in rs.get("retrievers", [])],
            }

        tree = rtree(q["retriever"])
    else:
        tree = _profile_node(q)
    if knn_hybrid is not None:
        tree = {
            "type": "knn_hybrid",
            "surface": "search_dsl_df score-sum fusion (ES 8 top-level knn)",
            "children": [tree] + [
                {"type": "knn", "surface": "_leaf_knn", "children": []}
                for _ in knn_hybrid
            ],
        }
    hb = body
    if isinstance(hb, dict) and (
        "aggs" in hb or "aggregations" in hb
        or "highlight" in hb or "suggest" in hb
    ):
        hb = {kk: vv for kk, vv in hb.items()
              if kk not in ("aggs", "aggregations", "highlight", "suggest")}
    df = search_dsl_df(reader, hb, k=k, filter_sql=filter_sql)
    try:
        qe = df._jdf.queryExecution()
        mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = qe.explainString(mode)
    except Exception:  # non-JVM backends: degrade to the simple string
        plan = df._jdf.queryExecution().toString()
    return {"query_tree": tree, "physical_plan": plan, "hits": df}


def compile_dsl(reader, body: dict) -> DataFrame:
    """Compile an ES JSON query body to the UNRANKED match-set DataFrame
    (tier keys + score) — the substrate for counts, facets, deletes, or a
    caller-side ranked cut."""
    if (
        isinstance(body, dict)
        and "query" in body
        and len(body) == 1
        and isinstance(body["query"], dict)
    ):
        body = body["query"]  # accept the full request-body envelope
    return _compile(_Ctx(reader), body)


# -------------------------------------------------------- aggregations


_METRIC_KINDS = (
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "percentiles", "percentile_ranks", "weighted_avg", "extended_stats",
    "boxplot", "top_metrics", "geo_bounds", "geo_centroid", "geo_line",
    "cartesian_bounds", "cartesian_centroid",
    "t_test", "rate", "reverse_nested",
)
_PIPELINE_KINDS = (
    "derivative", "cumulative_sum", "moving_fn", "moving_percentiles",
    "serial_diff", "bucket_script", "bucket_selector", "bucket_sort",
    "normalize", "avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
    "cumulative_cardinality", "stats_bucket", "extended_stats_bucket",
    "percentiles_bucket",
)
_BUCKET_KINDS = (
    "terms", "histogram", "date_histogram", "range", "date_range",
    "filter", "filters", "missing",
    "rare_terms", "multi_terms", "categorize_text", "global",
    "geotile_grid", "geohash_grid", "sampler", "diversified_sampler",
    "random_sampler", "ip_range", "ip_prefix", "geo_distance",
    "nested", "children", "parent", "time_series",
)


_RATE_FIXED_SECS = {
    "second": 1.0, "minute": 60.0, "hour": 3600.0,
    "day": 86400.0, "week": 604800.0,
}
_RATE_CAL_MONTHS = {"month": 1.0, "quarter": 3.0, "year": 12.0}


def _rate_expr(name: str, spec: dict, levels: list[dict]):
    """ES `rate` metric: the per-bucket sum (of `field`, or the doc
    count) normalized to `unit` — value = sum * unit_length /
    bucket_length. Must sit under a date_histogram; the factor resolves
    at compile time from the enclosing bucket's interval, so the metric
    stays one aggregate Column in the tree's single groupBy pass.
    Fixed-second units (second..week) and calendar month-family units
    (month/quarter/year) each convert within their own family; mixing
    families (a `day` rate under a `month` histogram) is rejected like
    ES's incompatible-interval error."""
    parent = next(
        (lv for lv in reversed(levels) if "dh_cal" in lv or "dh_secs" in lv),
        None,
    )
    if parent is None:
        raise ValueError("rate needs an enclosing date_histogram bucket")
    unit = spec.get("unit")
    if unit is None:
        factor = 1.0
    elif "dh_secs" in parent:
        if unit not in _RATE_FIXED_SECS:
            raise ValueError(
                f"rate unit {unit!r} incompatible with a fixed-interval "
                "date_histogram; use second..week"
            )
        factor = _RATE_FIXED_SECS[unit] / float(parent["dh_secs"])
    else:
        cal = parent["dh_cal"]
        if cal in _RATE_FIXED_SECS and unit in _RATE_FIXED_SECS:
            factor = _RATE_FIXED_SECS[unit] / _RATE_FIXED_SECS[cal]
        elif cal in _RATE_CAL_MONTHS and unit in _RATE_CAL_MONTHS:
            factor = _RATE_CAL_MONTHS[unit] / _RATE_CAL_MONTHS[cal]
        else:
            raise ValueError(
                f"rate unit {unit!r} incompatible with calendar_interval "
                f"{cal!r} (fixed-second and month-family units do not mix)"
            )
    mode = spec.get("mode", "sum")
    field = spec.get("field")
    if field is None:
        base = F.count(F.lit(1))
    elif mode == "value_count":
        base = F.count(F.col(field))
    else:
        base = F.sum(F.col(field))
    return (base * F.lit(factor)).alias(name)


def _metric_src(field, spec) -> str:
    """SQL-string source for string-built metric expressions
    (percentile calls): field / _score / script, with `missing`
    coalesced — mirrors the Column path above."""
    if spec.get("script") is not None and field is None:
        src = f"({_script_source(spec['script'])})"
    else:
        src = "_score" if field == "_score" else field
    if spec.get("missing") is not None:
        src = f"coalesce({src}, {_sql_lit(spec['missing'])})"
    return src


def _metric_exprs(name: str, kind: str, spec: dict) -> list:
    """One ES metric sub-aggregation -> aggregate Columns. Multi-valued
    metrics flatten into suffixed columns ({name}_count, {name}_p50...).
    `script` replaces `field` with a computed value (the engine script
    dialect — Spark SQL over the row's columns, evaluated inside the
    same aggregation pass); `missing` substitutes for null field values
    BEFORE aggregating (the ES contract)."""
    field = spec.get("field")
    if spec.get("script") is not None and field is None:
        col = F.expr(_script_source(spec["script"]))
    else:
        col = (
            F.col("_score") if field == "_score"
            else F.col(field) if field else None
        )
    if col is not None and spec.get("missing") is not None:
        col = F.coalesce(col, F.lit(spec["missing"]))
    if kind in ("avg", "sum", "min", "max"):
        fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[kind]
        return [fn(col).alias(name)]
    if kind == "value_count":
        return [F.count(col).alias(name)]
    if kind == "cardinality":
        if spec.get("exact"):
            return [F.count_distinct(col).alias(name)]
        rsd = max(
            0.01,
            min(0.05, 1.04 / (float(spec.get("precision_threshold", 3000)) ** 0.5)),
        )
        return [F.approx_count_distinct(col, rsd).alias(name)]
    if kind == "stats":
        return [
            F.count(col).alias(f"{name}_count"),
            F.min(col).alias(f"{name}_min"),
            F.max(col).alias(f"{name}_max"),
            F.avg(col).alias(f"{name}_avg"),
            F.sum(col).alias(f"{name}_sum"),
        ]
    if kind == "percentiles":
        ps = [float(p) for p in spec.get("percents", (25.0, 50.0, 75.0))]
        src = _metric_src(field, spec)
        return [
            F.expr(f"percentile({src}, {p / 100.0})").alias(
                f"{name}_p{str(p).rstrip('0').rstrip('.').replace('.', '_')}"
            )
            for p in ps
        ]
    if kind == "weighted_avg":
        v, w = spec["value"]["field"], spec["weight"]["field"]
        return [
            (
                F.sum(F.col(v) * F.col(w)) / F.sum(F.when(F.col(v).isNotNull(), F.col(w)))
            ).alias(name)
        ]
    if kind == "extended_stats":
        # the typed aggs.extended_stats field set, flattened with the
        # {name}_ prefix — every moment is a sum shape, so the whole
        # block stays ONE partial-aggregable pass
        sig = float(spec.get("sigma", 2.0))
        c = col.cast("double")
        return [
            F.count(c).alias(f"{name}_count"),
            F.round(F.min(c), 6).alias(f"{name}_min"),
            F.round(F.max(c), 6).alias(f"{name}_max"),
            F.round(F.sum(c), 6).alias(f"{name}_sum"),
            F.round(F.avg(c), 6).alias(f"{name}_avg"),
            F.round(F.sum(c * c), 6).alias(f"{name}_sum_of_squares"),
            F.round(F.var_pop(c), 6).alias(f"{name}_variance"),
            F.round(F.var_samp(c), 6).alias(f"{name}_variance_sampling"),
            F.round(F.stddev_pop(c), 6).alias(f"{name}_std_deviation"),
            F.round(F.stddev_samp(c), 6).alias(f"{name}_std_deviation_sampling"),
            F.round(F.avg(c) + F.lit(sig) * F.stddev_pop(c), 6).alias(
                f"{name}_std_upper"
            ),
            F.round(F.avg(c) - F.lit(sig) * F.stddev_pop(c), 6).alias(
                f"{name}_std_lower"
            ),
        ]
    if kind == "percentile_ranks":
        # inverse percentiles: % of non-null observations <= each probe
        # value (aggs.percentile_ranks, exact) — one conditional mean per
        # probe, columns suffixed with the probe value
        values = [float(v) for v in spec.get("values", ())]
        if not values:
            raise ValueError("percentile_ranks needs at least one probe value")
        c = col.cast("double")
        # nulls are NOT observations (ES ignores missing values): avg
        # over a when() that leaves null rows null, so they drop out of
        # both numerator and denominator
        return [
            F.round(
                F.avg(
                    F.when(c <= F.lit(v), 1.0).when(c.isNotNull(), 0.0)
                ) * 100.0, 6
            ).alias(
                f"{name}_{str(v).rstrip('0').rstrip('.').replace('.', '_').replace('-', 'm')}"
            )
            for v in values
        ]
    if kind == "boxplot":
        # min / q1 / q2 / q3 / max (aggs.boxplot: exact percentile at
        # oracle scale; percentile_approx is the one-word cluster swap)
        src = _metric_src(field, spec)
        c = col.cast("double")
        return [
            F.round(F.min(c), 6).alias(f"{name}_min"),
            F.round(F.expr(f"percentile({src}, 0.25)"), 6).alias(f"{name}_q1"),
            F.round(F.expr(f"percentile({src}, 0.5)"), 6).alias(f"{name}_q2"),
            F.round(F.expr(f"percentile({src}, 0.75)"), 6).alias(f"{name}_q3"),
            F.round(F.max(c), 6).alias(f"{name}_max"),
        ]
    if kind == "top_metrics":
        # per-bucket metric values from the row ranked first by the sort
        # field. size=1 (the ES default) compiles to max_by/min_by — still
        # ONE partial-aggregable pass, no window; size>1 needs the typed
        # aggs.top_metrics (row_number window) and is rejected here.
        if int(spec.get("size", 1)) != 1:
            raise ValueError(
                "top_metrics body kind supports size=1 only; use "
                "aggs.top_metrics for size>1"
            )
        sort = spec.get("sort")
        if not isinstance(sort, dict) or len(sort) != 1:
            raise ValueError("top_metrics wants sort: {field: asc|desc}")
        s_field, s_order = next(iter(sort.items()))
        if isinstance(s_order, dict):
            s_order = s_order.get("order", "asc")
        if s_order not in ("asc", "desc"):
            raise ValueError(f"top_metrics sort order must be asc|desc, got {s_order!r}")
        mets = spec.get("metrics")
        mets = [mets] if isinstance(mets, dict) else list(mets or ())
        if not mets:
            raise ValueError("top_metrics needs at least one metric")
        s = F.col(s_field)
        out = []
        for m in mets:
            mc = F.col(m["field"]).cast("double")
            # deterministic tie-break on equal sort keys: the SMALLEST
            # metric value (the typed top_metrics rule; ES leaves ties
            # unspecified) — encoded as the struct's second key
            if s_order == "desc":
                out.append(
                    F.max_by(mc, F.struct(s.alias("s"), (-mc).alias("t")))
                    .alias(f"{name}_{m['field']}")
                )
            else:
                out.append(
                    F.min_by(mc, F.struct(s.alias("s"), mc.alias("t")))
                    .alias(f"{name}_{m['field']}")
                )
        out.append(
            (F.max(s) if s_order == "desc" else F.min(s)).alias(
                f"{name}_sort_value"
            )
        )
        return out
    if kind == "geo_bounds":
        # tightest bounding box over the engine's split lat/lon columns
        # (the geotile_grid body-kind convention); NULL coords ignored
        lat = F.col(spec.get("lat_col", "lat")).cast("double")
        lon = F.col(spec.get("lon_col", "lon")).cast("double")
        ok_lat = F.when(lon.isNotNull(), lat)
        ok_lon = F.when(lat.isNotNull(), lon)
        return [
            F.round(F.max(ok_lat), 6).alias(f"{name}_top_left_lat"),
            F.round(F.min(ok_lon), 6).alias(f"{name}_top_left_lon"),
            F.round(F.min(ok_lat), 6).alias(f"{name}_bottom_right_lat"),
            F.round(F.max(ok_lon), 6).alias(f"{name}_bottom_right_lon"),
        ]
    if kind == "geo_line":
        # ES geo_line (search-aggregations-metrics-geoline.html): per
        # bucket, the (lon, lat) points ordered by the sort field as a
        # GeoJSON LineString coordinate array, truncated to `size` (ES
        # caps size at 10000 — same cap here). Engine-native: split
        # lat/lon columns (the geo body-kind convention) and a NUMERIC
        # sort field. Aggregate shape: collect_list of (sort, lon, lat)
        # structs -> array_sort (struct order = sort key, then lon/lat
        # as the deterministic tie-break) -> reverse for desc -> slice
        # -> transform to [lon, lat] pairs: ONE aggregate Column plus
        # codegen array projections, inside the tree's single groupBy.
        # Like ES, the per-bucket point set is collected before the
        # size cut — bucket sizes are bounded by the same 10k contract.
        sort = spec.get("sort")
        sort_field = sort.get("field") if isinstance(sort, dict) else sort
        if not sort_field:
            raise ValueError("geo_line wants sort: {'field': <column>}")
        order = spec.get("sort_order", "asc")
        if order not in ("asc", "desc"):
            raise ValueError(f"geo_line sort_order must be asc|desc, got {order!r}")
        size = int(spec.get("size", 10000))
        if not (1 <= size <= 10000):
            raise ValueError("geo_line size must be in [1, 10000] (the ES cap)")
        lat = F.col(spec.get("lat_col", "lat")).cast("double")
        lon = F.col(spec.get("lon_col", "lon")).cast("double")
        sv = F.col(sort_field).cast("double")
        pts = F.collect_list(
            F.when(
                sv.isNotNull() & lat.isNotNull() & lon.isNotNull(),
                F.struct(sv.alias("s"), lon.alias("x"), lat.alias("y")),
            )
        )
        arr = F.array_sort(pts)
        if order == "desc":
            arr = F.reverse(arr)
        arr = F.slice(arr, 1, size)
        out = [
            F.transform(arr, lambda p: F.array(p["x"], p["y"])).alias(name),
            F.lit("LineString").alias(f"{name}_type"),
        ]
        if spec.get("include_sort"):
            out.append(
                F.transform(arr, lambda p: p["s"]).alias(f"{name}_sort_values")
            )
        return out
    if kind == "t_test":
        # Welch t statistic between two populations of `field` selected
        # by group_field == a / b (engine-native spec; ES's per-side
        # filter bodies reduce to this for the metadata-column case).
        # Closed form over per-group (n, mean, s2) — aggregate Columns
        # only, so the block joins the tree's single groupBy pass.
        v = F.col(spec["field"]).cast("double")
        g = F.col(spec["group_field"])
        in_a = g == F.lit(spec["a"])
        in_b = g == F.lit(spec["b"])
        ok = v.isNotNull()
        n_a = F.count(F.when(ok & in_a, 1))
        n_b = F.count(F.when(ok & in_b, 1))
        mean_a = F.avg(F.when(ok & in_a, v))
        mean_b = F.avg(F.when(ok & in_b, v))
        var_a = F.var_samp(F.when(ok & in_a, v))
        var_b = F.var_samp(F.when(ok & in_b, v))
        sa, sb = var_a / n_a, var_b / n_b
        se = F.sqrt(sa + sb)
        dof = (
            (sa + sb) * (sa + sb)
            / (sa * sa / (n_a - 1) + sb * sb / (n_b - 1))
        )
        return [
            n_a.cast("long").alias(f"{name}_n_a"),
            n_b.cast("long").alias(f"{name}_n_b"),
            F.round(mean_a, 6).alias(f"{name}_mean_a"),
            F.round(mean_b, 6).alias(f"{name}_mean_b"),
            F.round((mean_a - mean_b) / se, 6).alias(f"{name}_t_stat"),
            F.round(dof, 4).alias(f"{name}_welch_df"),
        ]
    if kind == "geo_centroid":
        lat = F.col(spec.get("lat_col", "lat")).cast("double")
        lon = F.col(spec.get("lon_col", "lon")).cast("double")
        both = lat.isNotNull() & lon.isNotNull()
        return [
            F.round(F.avg(F.when(both, lat)), 6).alias(f"{name}_lat"),
            F.round(F.avg(F.when(both, lon)), 6).alias(f"{name}_lon"),
            F.sum(both.cast("long")).alias(f"{name}_count"),
        ]
    if kind == "cartesian_bounds":
        # ES cartesian_bounds (the planar twin of geo_bounds over
        # point-typed x/y columns — the `shape` query's coordinate
        # convention): tightest axis-aligned box, NULL coords ignored
        x = F.col(spec.get("x_col", "x")).cast("double")
        y = F.col(spec.get("y_col", "y")).cast("double")
        ok_x = F.when(y.isNotNull(), x)
        ok_y = F.when(x.isNotNull(), y)
        return [
            F.round(F.min(ok_x), 6).alias(f"{name}_top_left_x"),
            F.round(F.max(ok_y), 6).alias(f"{name}_top_left_y"),
            F.round(F.max(ok_x), 6).alias(f"{name}_bottom_right_x"),
            F.round(F.min(ok_y), 6).alias(f"{name}_bottom_right_y"),
        ]
    if kind == "cartesian_centroid":
        # planar centroid — arithmetic mean per axis (the ES contract
        # for point fields), same shape as geo_centroid
        x = F.col(spec.get("x_col", "x")).cast("double")
        y = F.col(spec.get("y_col", "y")).cast("double")
        both = x.isNotNull() & y.isNotNull()
        return [
            F.round(F.avg(F.when(both, x)), 6).alias(f"{name}_x"),
            F.round(F.avg(F.when(both, y)), 6).alias(f"{name}_y"),
            F.sum(both.cast("long")).alias(f"{name}_count"),
        ]
    raise ValueError(f"unknown metric aggregation {kind!r}")


def _bucket_key(ctx: _Ctx, rows: DataFrame, name: str, kind: str, spec: dict):
    """Attach the bucket key column `name` to `rows` (exploding when a doc
    lands in several buckets — range/filters). Returns (rows, level_meta)
    where level_meta carries the post-aggregation cut knobs."""
    sized = (
        "terms", "multi_terms", "categorize_text", "geotile_grid",
        "geohash_grid", "time_series",
    )
    raw_spec = spec
    if not isinstance(spec, dict):
        spec = {}  # the `filter` kind takes a raw SQL string body
    meta = {
        "name": name,
        "size": (
            int(spec.get(
                "size",
                10000
                if kind in ("geotile_grid", "geohash_grid", "time_series")
                else 10,
            ))
            if kind in sized
            else None
        ),
        "min_doc_count": int(
            spec.get(
                "min_doc_count",
                1 if (kind in sized or kind == "ip_prefix") else 0,
            )
        ),
        "max_doc_count": (
            int(spec.get("max_doc_count", 1)) if kind == "rare_terms" else None
        ),
    }
    if kind in ("terms", "multi_terms"):
        # ES terms `order`: which buckets survive the size cut —
        # {"_count"|"_key"|<metric name>: "asc"|"desc"} (metric ordering
        # resolves at the innermost level where the metric columns
        # live). Validated/applied in the cut pass; output rows stay
        # key-chain ordered (engine-native contract — the ORDER selects
        # buckets, it does not reshuffle the relation).
        o = spec.get("order")
        if o is not None:
            if not isinstance(o, dict) or len(o) != 1:
                raise ValueError(
                    'terms order wants one {"_count"|"_key"|<metric>: '
                    '"asc"|"desc"} entry'
                )
            (oname, odir), = o.items()
            if str(odir).lower() not in ("asc", "desc"):
                raise ValueError(f"terms order direction {odir!r}")
            meta["order"] = (oname, str(odir).lower())
    if kind in ("terms", "rare_terms"):
        c = F.col(spec["field"])
        if spec.get("missing") is not None:
            # ES `missing`: docs without the field land in this bucket
            if dict(rows.dtypes).get(spec["field"], "").startswith("array"):
                raise ValueError(
                    "terms missing over array fields unsupported "
                    "(engine-native restriction)"
                )
            c = F.coalesce(c, F.lit(spec["missing"]))
        # ES array-field semantics: a doc contributes to EVERY element's
        # bucket (and once per bucket even with duplicate elements) —
        # keys explode, doc_count stays a doc count
        if dict(rows.dtypes).get(spec["field"], "").startswith("array"):
            rows = rows.withColumn(name, F.explode(F.array_distinct(c)))
        else:
            rows = rows.withColumn(name, c)
        # ES include/exclude: restrict the bucket-key space — a list of
        # exact values or a whole-term-anchored Java regex (the ES
        # contract). Applied to the ROWS before the groupBy, so the
        # filter sits below the aggregation, not on the bucket list.
        for spec_key, positive in (("include", True), ("exclude", False)):
            v = spec.get(spec_key)
            if v is None:
                continue
            kcol = F.col(name)
            if isinstance(v, (list, tuple)):
                cond = kcol.isin(*v)
            elif isinstance(v, str):
                cond = kcol.cast("string").rlike(f"^(?:{v})$")
            else:
                raise ValueError(
                    f"terms {spec_key} wants a value list or a regex "
                    f"string, got {type(v).__name__}"
                )
            rows = rows.filter(cond if positive else ~cond)
        return rows, meta
    if kind == "geotile_grid":
        # web-mercator z/x/y bucket key (the typed aggs.geotile_grid
        # closed form — one codegen projection, no geohash interleave);
        # bucket order = doc_count desc, key asc, size cut like terms
        from .aggs import geotile_key

        key = geotile_key(
            spec.get("lat_col", "lat"),
            spec.get("lon_col", "lon"),
            int(spec.get("precision", 7)),
        )
        rows = rows.filter(
            F.col(spec.get("lat_col", "lat")).isNotNull()
            & F.col(spec.get("lon_col", "lon")).isNotNull()
        )
        return rows.withColumn(name, key), meta
    if kind == "geohash_grid":
        # base32 geohash cell key — the Arrow-batched encode kernel
        # (functions/geo.py geohash_np), size cut like geotile/terms
        from ..functions.geo import geohash_udf

        gh = geohash_udf(int(spec.get("precision", 5)))
        lat = F.col(spec.get("lat_col", "lat"))
        lon = F.col(spec.get("lon_col", "lon"))
        rows = rows.filter(lat.isNotNull() & lon.isNotNull())
        return rows.withColumn(name, gh(lat, lon)), meta
    if kind in ("ip_range", "geo_distance"):
        # multi-bucket tagging kinds (a doc may land in several
        # overlapping buckets, like `range`): ONE codegen projection
        # tags every matching label, explode keys the buckets; docs
        # matching no bucket drop (inner explode). Same from-inclusive /
        # to-exclusive rule as the typed kernels.
        from .aggs import _cidr_bounds, _ipv4_to_long

        labels = []
        ranges = _aslist(spec.get("ranges") or ())
        if not ranges:
            raise ValueError(f"{kind} needs at least one range")
        if kind == "ip_range":
            v = _ipv4_to_long(F.col(spec["field"]))
            for rg in ranges:
                if "mask" in rg:
                    lo, hi = _cidr_bounds(rg["mask"])
                    label = rg.get("key", rg["mask"])
                else:
                    lo = (
                        None if rg.get("from") is None
                        else _cidr_bounds(rg["from"] + "/32")[0]
                    )
                    hi = (
                        None if rg.get("to") is None
                        else _cidr_bounds(rg["to"] + "/32")[0]
                    )
                    label = rg.get(
                        "key", f"{rg.get('from', '')}-{rg.get('to', '')}"
                    )
                cond = v.isNotNull()
                if lo is not None:
                    cond = cond & (v >= F.lit(lo))
                if hi is not None:
                    cond = cond & (v < F.lit(hi))
                labels.append(F.when(cond, F.lit(label)))
        else:
            from ..functions.geo import haversine_km

            origin = spec.get("origin") or {}
            lat0 = float(origin["lat"])
            lon0 = float(origin["lon"])
            latc = F.col(spec.get("lat_col", "lat"))
            lonc = F.col(spec.get("lon_col", "lon"))
            dist = haversine_km(latc, lonc, F.lit(lat0), F.lit(lon0))
            for rg in ranges:
                lo, hi = rg.get("from"), rg.get("to")
                label = rg.get(
                    "key",
                    f"{'' if lo is None else lo}-{'' if hi is None else hi}",
                )
                cond = latc.isNotNull() & lonc.isNotNull()
                if lo is not None:
                    cond = cond & (dist >= F.lit(float(lo)))
                if hi is not None:
                    cond = cond & (dist < F.lit(float(hi)))
                labels.append(F.when(cond, F.lit(label)))
        return (
            rows.withColumn(
                name, F.explode(F.array_compact(F.array(*labels)))
            ),
            meta,
        )
    if kind == "ip_prefix":
        # /prefix_length network rollup keyed by the canonical network
        # address string — the typed ip_prefix's codegen mask+format
        from .aggs import _ipv4_to_long

        plen = int(spec["prefix_length"])
        if not 0 <= plen <= 32:
            raise ValueError(f"prefix_length must be 0..32, got {plen}")
        v = _ipv4_to_long(F.col(spec["field"]))
        masked = (
            F.floor(v / F.lit(2 ** (32 - plen))) * F.lit(2 ** (32 - plen))
            if plen < 32
            else v
        )
        key = F.concat_ws(
            ".",
            F.floor(masked / 16777216).cast("long"),
            (F.floor(masked / 65536) % 256).cast("long"),
            (F.floor(masked / 256) % 256).cast("long"),
            (masked % 256).cast("long"),
        )
        rows = rows.withColumn(
            name,
            F.when(v.isNotNull(), F.concat(key, F.lit(f"/{plen}"))),
        ).filter(F.col(name).isNotNull())
        return rows, meta
    if kind == "multi_terms":
        # ES returns the key as an array; flattened output joins the
        # parts with '|' (engine-native single-column key chain)
        parts = [F.col(t["field"]).cast("string") for t in spec["terms"]]
        if len(parts) < 2:
            raise ValueError("multi_terms needs at least 2 terms sources")
        return rows.withColumn(name, F.concat_ws("|", *parts)), meta
    if kind == "time_series":
        # ES TSDB `time_series` bucket (the downsample companion,
        # search-aggregations-bucket-time-series-aggregation): one
        # bucket per time series, keyed by the dimension tuple — the
        # engine's _tsid analogue. ES derives the dimensions from
        # dimension-flagged mappings; engine-native the body names them
        # ({"dimensions": [<docs column>, ...]}, documented). The key
        # joins with '|' (the multi_terms single-column key-chain rule);
        # size defaults to ES's 10000 cap. Sub-aggs (typically a
        # date_histogram + metrics) nest normally — the whole tree
        # stays ONE groupBy over (tsid, ...) keys.
        dims = spec.get("dimensions")
        if not dims or not isinstance(dims, list):
            raise ValueError(
                "time_series wants {'dimensions': [<docs column>, ...]} "
                "(engine-native: ES derives dimensions from mappings)"
            )
        if name in rows.columns:
            # the key column would silently overwrite a docs column the
            # subtree may still address (including a dimension column —
            # a multi-dim key named after one dimension would replace
            # that dimension with the joined tsid string)
            raise ValueError(
                f"time_series agg name {name!r} shadows a docs column; "
                "pick a name that is not a field"
            )
        # NULL dimensions must stay distinguishable AND consistent
        # across arities: concat_ws SKIPS nulls (merging (null,'a') with
        # ('a',null)), so every null dim — single-dimension included —
        # carries the \x00 sentinel token
        parts = [
            F.coalesce(F.col(d).cast("string"), F.lit("\x00")) for d in dims
        ]
        key = parts[0] if len(parts) == 1 else F.concat_ws("|", *parts)
        return rows.withColumn(name, key), meta
    if kind == "histogram":
        x = F.col(spec["field"]).cast("double")
        interval = float(spec["interval"])
        if interval <= 0:
            raise ValueError("histogram interval must be > 0")
        off = float(spec.get("offset", 0.0))
        key = F.floor((x - F.lit(off)) / F.lit(interval)) * F.lit(interval) + F.lit(off)
        # ES fills empty histogram buckets when min_doc_count is 0 (its
        # default); the engine stays SPARSE unless the body opts in with
        # an EXPLICIT min_doc_count: 0 or extended_bounds (documented
        # deviation — sparse relations are the 100-TB-safe default).
        # The dense fill happens over the (tiny) bucket list after the
        # one groupBy, never over raw rows.
        meta["interval"] = interval
        meta["offset"] = off
        eb = spec.get("extended_bounds")
        if eb is not None:
            if not isinstance(eb, dict) or not {"min", "max"} <= set(eb):
                raise ValueError(
                    "extended_bounds wants {'min': lo, 'max': hi}"
                )
            meta["ebounds"] = (float(eb["min"]), float(eb["max"]))
        meta["dense"] = (
            eb is not None
            or ("min_doc_count" in spec and int(spec["min_doc_count"]) == 0)
        )
        return rows.withColumn(name, key), meta
    if kind == "date_histogram":
        fld = spec["field"]
        tz = spec.get("time_zone")
        if tz:
            # ES time_zone: bucket BOUNDARIES shift to the zone's local
            # midnight/hour, keys stay UTC instants — truncate in the
            # zone, convert back (calendar intervals; fixed intervals
            # are zone-invariant epochs except for the offset, which ES
            # also expresses via `offset`)
            def _tz_key(unit):
                return F.to_utc_timestamp(
                    F.date_trunc(unit, F.from_utc_timestamp(F.col(fld), tz)),
                    tz,
                )
        cal = spec.get("calendar_interval")
        if cal:
            unit = {
                "minute": "minute", "1m": "minute", "hour": "hour",
                "1h": "hour", "day": "day", "1d": "day", "week": "week",
                "1w": "week", "month": "month", "1M": "month",
                "quarter": "quarter", "year": "year", "1y": "year",
            }.get(cal)
            if unit is None:
                raise ValueError(f"unsupported calendar_interval {cal!r}")
            meta["dh_cal"] = unit
            if spec.get("extended_bounds") is not None or (
                "min_doc_count" in spec and int(spec["min_doc_count"]) == 0
            ):
                raise ValueError(
                    "date_histogram empty-bucket fill needs a "
                    "fixed_interval — calendar buckets are not an "
                    "arithmetic series (engine-native restriction)"
                )
            key = _tz_key(unit) if tz else F.date_trunc(unit, F.col(fld))
            return rows.withColumn(name, key), meta
        fixed = spec.get("fixed_interval")
        if not fixed:
            raise ValueError("date_histogram needs calendar_interval/fixed_interval")
        import re as _re

        m = _re.fullmatch(r"(\d+)(ms|s|m|h|d)", str(fixed))
        if not m:
            raise ValueError(f"bad fixed_interval {fixed!r}")
        secs = int(m.group(1)) * {
            "ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400
        }[m.group(2)]
        ts = F.col(fld).cast("double")
        key = (F.floor(ts / F.lit(secs)) * F.lit(secs)).cast("timestamp")
        meta["dh_secs"] = secs
        # same opt-in dense-fill contract as histogram (fixed intervals
        # only — calendar buckets are not an arithmetic series)
        eb = spec.get("extended_bounds")
        if eb is not None:
            if not isinstance(eb, dict) or not {"min", "max"} <= set(eb):
                raise ValueError(
                    "extended_bounds wants {'min': lo, 'max': hi}"
                )
            from ..functions.datemath import parse_date_math

            def _eb_epoch(v):
                if isinstance(v, str):
                    v = parse_date_math(v)
                if hasattr(v, "timestamp"):
                    import datetime as _dt

                    return v.replace(tzinfo=_dt.timezone.utc).timestamp()
                return float(v) / 1000.0  # ES epoch_millis
            meta["ebounds"] = (_eb_epoch(eb["min"]), _eb_epoch(eb["max"]))
        meta["dense"] = (
            eb is not None
            or ("min_doc_count" in spec and int(spec["min_doc_count"]) == 0)
        )
        return rows.withColumn(name, key), meta
    if kind == "date_range":
        # range over a date field; from/to accept ES date math (the
        # lt-exclusive upper / gte-inclusive lower contract, like range).
        # Endpoints resolve ONCE at compile time (driver-side, same as
        # ES's shard-request rewrite), so the bucket predicate stays a
        # pure codegen expression over the scan.
        from ..functions.datemath import parse_date_math

        def _endpoint(v):
            if isinstance(v, str):
                return parse_date_math(v)
            return v

        fld = F.col(spec["field"]).cast("timestamp")
        labels = []
        for rg in spec["ranges"]:
            lo, hi = _endpoint(rg.get("from")), _endpoint(rg.get("to"))
            label = rg.get("key") or (
                f"{'' if lo is None else lo.isoformat()}-"
                f"{'' if hi is None else hi.isoformat()}"
            )
            cond = fld.isNotNull()
            if lo is not None:
                cond = cond & (fld >= F.lit(lo))
            if hi is not None:
                cond = cond & (fld < F.lit(hi))
            labels.append(F.when(cond, F.lit(label)))
        return (
            rows.withColumn(
                name, F.explode(F.array_compact(F.array(*labels)))
            ),
            meta,
        )
    if kind == "range":
        fld = F.col(spec["field"]).cast("double")
        labels = []
        for rg in spec["ranges"]:
            lo, hi = rg.get("from"), rg.get("to")
            label = rg.get("key") or (
                f"{'' if lo is None else _fmt_num(lo)}-"
                f"{'' if hi is None else _fmt_num(hi)}"
            )
            cond = F.lit(True)
            if lo is not None:
                cond = cond & (fld >= F.lit(float(lo)))
            if hi is not None:
                cond = cond & (fld < F.lit(float(hi)))
            labels.append(F.when(cond, F.lit(label)))
        arr = F.array_compact(F.array(*labels))
        return (
            rows.withColumn(name, F.explode(arr)),
            meta,
        )
    if kind == "filter":
        # ES single-filter bucket: the subtree aggregates over the rows
        # matching the embedded query body (or a raw filter-SQL string);
        # ONE implicit bucket keyed by the agg's own name. Query-body
        # filters restrict via a left-semi join on the doc keys (the
        # filters-kind member-join shape); string filters stay codegen.
        if isinstance(raw_spec, str):
            rows = rows.filter(F.expr(raw_spec))
        elif isinstance(raw_spec, dict) and raw_spec:
            member = _compile(ctx, raw_spec).select(*ctx.keys)
            rows = rows.join(member, ctx.keys, "left_semi")
        else:
            raise ValueError("filter bucket needs a query body or SQL string")
        return rows.withColumn(name, F.lit(name)), meta
    if kind == "filters":
        tags = []
        for fname, f0 in spec["filters"].items():
            cond = (
                F.expr(f0)
                if isinstance(f0, str)
                else F.lit(None)  # query-body filters resolved below
            )
            if isinstance(f0, dict):
                member = _compile(ctx, f0).select(*ctx.keys).withColumn(
                    f"_in_{fname}", F.lit(True)
                )
                rows = rows.join(member, ctx.keys, "left")
                cond = F.col(f"_in_{fname}").isNotNull()
            tags.append(F.when(cond, F.lit(fname)))
        rows = rows.withColumn(name, F.explode(F.array_compact(F.array(*tags))))
        return rows.drop(*[c for c in rows.columns if c.startswith("_in_")]), meta
    if kind == "missing":
        return (
            rows.filter(F.col(spec["field"]).isNull()).withColumn(
                name, F.lit("missing")
            ),
            meta,
        )
    if kind == "categorize_text":
        # the deterministic exact-pattern variant (see aggs.categorize_text):
        # key = the field's analyzed tokens with number-bearing tokens
        # dropped (ES's category-defining-token rule); messages with no
        # defining token form no bucket. Sized/ordered like terms
        # (doc_count desc), matching the ES response.
        toks = F.filter(
            F.filter(
                F.split(F.lower(F.col(spec["field"])), r"[^a-z0-9]+"),
                lambda t: t != "",
            ),
            lambda t: ~t.rlike("[0-9]"),
        )
        key = F.array_join(toks, " ")
        return (
            rows.withColumn(name, key).filter(F.col(name) != ""),
            meta,
        )
    raise ValueError(f"unknown bucket aggregation {kind!r}")


def _fmt_num(v) -> str:
    f = float(v)
    return str(int(f)) if f == int(f) else str(f)


def _es_composite_sources(sources) -> tuple[list, list[str], list[bool]]:
    """ES-JSON composite `sources` -> (the engine-native source tuples of
    query._composite_sources, per-source orders, per-source
    missing_bucket flags). ES shape: [{name: {terms|histogram|
    date_histogram: {field, order?, missing_bucket?}}}, ...]."""
    native, orders, missing = [], [], []
    for s in _aslist(sources):
        name, body = _one(s)
        kind, sp = _one(body)
        field = sp["field"]
        if kind == "terms":
            native.append((name, field))
        elif kind == "histogram":
            native.append((name, (field, float(sp["interval"]))))
        elif kind == "date_histogram":
            unit = sp.get("calendar_interval") or sp.get("fixed_interval")
            if not unit:
                raise ValueError(
                    f"composite source {name!r}: date_histogram wants "
                    "calendar_interval"
                )
            native.append((name, (field, str(unit))))
        else:
            raise ValueError(
                f"composite source kind {kind!r}; supported: terms / "
                "histogram / date_histogram"
            )
        orders.append(str(sp.get("order", "asc")))
        missing.append(bool(sp.get("missing_bucket", False)))
    return native, orders, missing


def _highlight_texts(q: dict) -> list[str]:
    """Walk a query-DSL tree collecting the text every scoring/matching
    clause contributes — the term source for highlighting (ES highlights
    from the query's analyzed terms; must_not clauses never highlight)."""
    kind, spec = _one(q)
    out: list[str] = []
    if kind in (
        "match", "match_phrase", "match_phrase_prefix", "term",
        "prefix", "fuzzy", "wildcard",
    ):
        _f, s = _field_spec(spec)
        out.append(str(s["query"]))
    elif kind == "terms":
        b = {k: v for k, v in dict(spec).items() if k != "boost"}
        _f, vals = _one(b)
        if isinstance(vals, dict):
            # terms LOOKUP shape ({'id': ..., 'path': ...}): the term set
            # resolves at query time from another doc — stringifying the
            # dict would inject 'id'/'path' junk into the highlight terms
            vals = []
        out.extend(str(v) for v in _aslist(vals))
    elif kind in (
        "multi_match", "combined_fields", "query_string",
        "simple_query_string", "more_like_this",
    ):
        v = spec.get("query") or spec.get("like") or ""
        out.extend(str(x) for x in _aslist(v))
    elif kind == "bool":
        for sub in (
            _aslist(spec.get("must"))
            + _aslist(spec.get("filter"))
            + _aslist(spec.get("should"))
        ):
            out.extend(_highlight_texts(sub))
    elif kind == "dis_max":
        for sub in spec.get("queries", []):
            out.extend(_highlight_texts(sub))
    elif kind == "boosting":
        out.extend(_highlight_texts(spec["positive"]))
    elif kind == "constant_score":
        out.extend(_highlight_texts(spec["filter"]))
    elif kind in ("function_score", "script_score") and "query" in spec:
        out.extend(_highlight_texts(spec["query"]))
    return out


def _apply_highlight(reader, hits, hl, query_body, source):
    """Request-body `highlight` section: enrich the (tiny) ranked hits
    page with the best matching fragment of each doc's text, query terms
    tag-wrapped. The index stores no _source (the reference's model: the
    database is authoritative, README.md quick-start), so the corpus
    `source` DataFrame must be passed to search_request. Plan = the
    typed highlight_df's: hits join docs keys, left-join the source on
    the key columns (k rows prune the scan), ONE mapInPandas snippet
    kernel over the k survivors — text never reaches the driver."""
    # capture the page's resolved sort BEFORE any reassignment of
    # `hits` (joins return new objects without the sideband)
    page_sort = list(getattr(hits, "_sort_resolved", None) or [])
    if source is None:
        raise ValueError(
            "the body has a highlight section — the index stores no "
            "_source, pass the corpus: search_request(body, "
            "source=<corpus DataFrame>)"
        )
    if not isinstance(hl, dict) or not hl.get("fields"):
        raise ValueError("highlight wants {'fields': {<source col>: {...}}}")
    specs = []  # (text_col, window, pre, post) — per-field ES overrides
    for text_col, fspec in hl["fields"].items():
        fspec = fspec or {}
        pre = (
            _aslist(fspec.get("pre_tags") or hl.get("pre_tags")) or ["<em>"]
        )[0]
        post = (
            _aslist(fspec.get("post_tags") or hl.get("post_tags"))
            or ["</em>"]
        )[0]
        # engine-native knob: fragment width in TOKENS (ES fragment_size
        # is chars; ~8 chars/token maps the default 100 -> 12)
        window = int(fspec.get("window", hl.get("window", 12)))
        if text_col not in source.columns:
            raise ValueError(
                f"highlight field {text_col!r} not a source column; "
                f"source has {source.columns}"
            )
        specs.append((text_col, window, pre, post))
    from ..functions.tokenizer import tokenize_py
    from .query import _snippet_map, _snippet_map_multi

    terms: set[str] = set()
    if query_body is not None:
        for t in _highlight_texts(query_body):
            terms.update(tokenize_py(t))
    ctx = _Ctx(reader)
    key_cols = list(ctx.r0.manifest["key_cols"])
    need = [c for c in key_cols if c not in hits.columns]
    if need:
        hits = hits.join(ctx.docs().select(*ctx.keys, *need), ctx.keys)
    text_cols = [c for c, *_ in specs]
    rows = hits.join(source.select(*key_cols, *text_cols), key_cols, "left")
    if len(specs) == 1:
        (text_col, window, pre, post), = specs
        out = _snippet_map(rows, text_col, terms, window, pre, post)
    else:
        # several highlight fields: ONE mapInPandas pass computes every
        # field's fragment; columns come back as {col}_snippet /
        # {col}_n_hits (the ES per-field highlight object, flattened)
        out = _snippet_map_multi(rows, specs, terms)
    # restore the page's ORDER: the body's sort when one was present
    # (search_dsl_df decorates the resolved sort columns onto the page
    # and sidebands their names), else relevance — highlighting must
    # never re-rank a sorted page by score (it used to)
    order = []
    for n, d, m in page_sort:
        c = F.col(n)
        asc = d != "desc"
        if m == "_first":
            order.append(c.asc_nulls_first() if asc else c.desc_nulls_first())
        else:
            order.append(c.asc_nulls_last() if asc else c.desc_nulls_last())
    if not order:
        order = [F.desc("score")]
    return out.orderBy(*order, *[F.asc(c) for c in ctx.keys])


def _apply_suggest(reader, suggest: dict) -> dict:
    """Request-body `suggest` section: {name: {'text'|'prefix': ...,
    'term'|'phrase'|'completion': {...}}} — each named suggester
    dispatches to the matching typed surface (suggest_df /
    phrase_suggest_df / complete_df) and comes back as a DataFrame."""
    if not isinstance(suggest, dict):
        raise ValueError(
            "suggest wants {name: {'text': ..., 'term'|'phrase'|"
            "'completion': {...}}}"
        )
    fields = (
        reader.readers[reader.segments[0]]
        if hasattr(reader, "segments")
        else reader
    ).manifest.get("fields")
    out: dict = {}
    for name, spec in suggest.items():
        spec = dict(spec)
        text = spec.pop("text", None)
        prefix = spec.pop("prefix", None)
        kinds = [k for k in spec if k in ("term", "phrase", "completion")]
        if len(kinds) != 1:
            raise ValueError(
                f"suggester {name!r} wants exactly one of "
                "term/phrase/completion"
            )
        kind = kinds[0]
        s = dict(spec[kind] or {})
        field = s.get("field")
        if not fields:
            field = None  # plain corpus: single namespace (suggest_df)
        if kind == "term":
            if text is None:
                raise ValueError(f"term suggester {name!r} needs 'text'")
            out[name] = reader.suggest_df(
                text,
                size=int(s.get("size", 5)),
                max_edits=int(s.get("max_edits", 2)),
                prefix_length=int(s.get("prefix_length", 1)),
                field=field,
                # ES body default: only suggest for absent terms
                suggest_mode=str(s.get("suggest_mode", "missing")),
            )
        elif kind == "phrase":
            if text is None:
                raise ValueError(f"phrase suggester {name!r} needs 'text'")
            kw = {
                k: s[k]
                for k in (
                    "size", "max_edits", "prefix_length",
                    "candidates_per_token",
                )
                if k in s
            }
            out[name] = reader.phrase_suggest_df(text, field=field, **kw)
        else:
            p = prefix if prefix is not None else text
            if p is None:
                raise ValueError(
                    f"completion suggester {name!r} needs 'prefix'"
                )
            fz = s.get("fuzzy") or {}
            out[name] = reader.complete_df(
                p,
                size=int(s.get("size", 5)),
                fuzziness=int(fz.get("fuzziness", 0)),
                name=s.get("name"),
            )
    return out


def search_request(reader, body: dict, source: DataFrame | None = None) -> dict:
    """The full ES `_search` response shape from ONE request body:
    {"hits": <ranked DataFrame>, "aggregations": <DataFrame | None>,
    "suggest": <{name: DataFrame} | None>,
    "total": <{"value", "relation"} | None — the `track_total_hits`
    section: True = exact count of the query match set ("eq"), an
    integer = the count clamped at the cap ("gte" past it); post_filter
    and min_score narrow it, the page cut never does>.

    The body splits exactly as ES does: `query` + hit-shaping params
    (sort/from/size/fields/_source/collapse/rescore/min_score/
    post_filter/runtime_mappings) drive the hits; a top-level `knn`
    fuses with the query by score sum (search_dsl_df); the `aggs`
    section computes over the QUERY match set — post_filter narrows the
    hits only, never the aggregations (the faceted-navigation contract
    post_filter exists for). runtime_mappings are shared by both sides.
    A `highlight` section decorates each hit with (snippet, n_hits)
    columns — pass the corpus as `source` (the index stores no _source;
    the database is authoritative, the reference's model). A `suggest`
    section returns one DataFrame per named suggester
    (term/phrase/completion). An aggs-only request uses "size": 0 (hits
    comes back empty but with the stable schema). Independent plans, one
    body — ES too runs the agg/suggest collectors separately from the
    top-k collector."""
    body = dict(body)
    aggs = body.pop("aggs", None)
    if aggs is None:
        aggs = body.pop("aggregations", None)
    highlight = body.pop("highlight", None)
    suggest = body.pop("suggest", None)
    tth = body.pop("track_total_hits", None)
    if "query" not in body:
        body["query"] = {"match_all": {}}
    rm = body.get("runtime_mappings")
    query = body["query"]
    total = None
    if tth:
        # ES hits.total: the query match-set size independent of the
        # page cut; post_filter and min_score narrow it (they narrow
        # hits), sort/from/size never do. True -> exact ("eq");
        # an integer cap -> the exact count clamped with "gte" (ES
        # stops counting at the cap; the engine counts one unranked
        # aggregation either way — no top-k, nothing collected).
        q_only: dict = {"query": query}
        for sec in ("post_filter", "min_score"):
            if sec in body:
                q_only[sec] = body[sec]
        if rm:
            q_only["runtime_mappings"] = rm
        n = search_dsl_df(reader, q_only, k=None).count()
        if tth is True:
            total = {"value": n, "relation": "eq"}
        else:
            cap = int(tth)
            total = {
                "value": min(n, cap),
                "relation": "eq" if n <= cap else "gte",
            }
    hits = search_dsl_df(reader, body)
    if highlight is not None:
        hits = _apply_highlight(reader, hits, highlight, query, source)
    aggs_df = None
    if aggs is not None:
        aggs_df = aggs_dsl_df(
            reader, aggs,
            query=None if query == {"match_all": {}} else query,
            runtime_mappings=rm,
        )
    suggest_out = _apply_suggest(reader, suggest) if suggest else None
    return {
        "hits": hits, "aggregations": aggs_df, "suggest": suggest_out,
        "total": total,
    }


def aggs_dsl_df(
    reader,
    aggs: dict,
    query: dict | None = None,
    filter_sql: str | None = None,
    runtime_mappings: dict | None = None,
) -> DataFrame:
    """ES request-body `aggs` section compiled to ONE distributed
    aggregation over the query's match set (all live docs when `query` is
    None — the match_all default).

    Grammar: {name: {<kind>: spec [, "aggs": {...}]}} with bucket kinds
    terms / histogram / date_histogram / range / filters / missing /
    rare_terms (doc_count <= max_doc_count, default 1) / multi_terms
    (composite key, parts '|'-joined into one column) / geotile_grid
    (web-mercator z/x/y key) / geohash_grid (base32 cell key) /
    ip_range + geo_distance (multi-bucket tagging) / ip_prefix (subnet
    rollup) / time_series (TSDB per-dimension-tuple buckets) / sampler + diversified_sampler (row-set
    restrictors before the subtree; no key of their own) / nested
    (top-level context switch to array<struct> elements; sub-aggs count
    nested docs, fields address as '<path>.<field>', reverse_nested
    metric recovers parent-doc counts) / children + parent (top-level
    join-field context switch: one left-semi join on the
    parent_field/id_field columns; sub-aggs run over child docs /
    distinct referenced parents) — plus
    top-level dispatches to the typed kernels for composite,
    significant_terms, significant_text, terms+top_hits,
    median_absolute_deviation, and string_stats — and
    metric kinds avg / sum / min / max / value_count / cardinality /
    stats / percentiles / percentile_ranks / extended_stats / boxplot /
    top_metrics (size=1) / geo_bounds / geo_centroid / weighted_avg
    (field "_score" targets the relevance score) — and, at the same
    innermost level, pipeline kinds derivative / cumulative_sum /
    moving_fn / serial_diff / bucket_script / bucket_selector /
    bucket_sort referencing sibling metrics via buckets_path
    (_apply_body_pipelines). Engine-native restrictions (documented): ONE bucket
    agg per nesting level (sibling metrics live at the INNERMOST level);
    the whole tree computes in one groupBy over the flattened key chain,
    parent doc_counts as window sums — no per-bucket subqueries, no
    second scan.

    Output: one row per innermost bucket, flattened — each level
    contributes `{name}` (key) and `{name}_doc_count`, metrics contribute
    their (suffixed) columns; rows ordered by the key chain. terms levels
    honor size (doc_count desc, key asc per parent), min_doc_count,
    `missing` (null-field bucket), and `order` — {"_count"|"_key"|
    <metric name>: "asc"|"desc"} picks WHICH buckets survive the size
    cut (metric order at the innermost level, where the metric columns
    live); the output relation stays key-chain ordered."""
    ctx = _Ctx(
        reader,
        runtime=_parse_runtime(runtime_mappings) if runtime_mappings else None,
    )
    docs = ctx.docs()
    if query is not None:
        matched = _compile(ctx, query)
        rows = matched.withColumnRenamed("score", "_score").join(docs, ctx.keys)
    else:
        rows = docs.withColumn("_score", F.lit(0.0))
    if filter_sql:
        rows = rows.join(ctx.filter_ids(filter_sql), ctx.keys, "left_semi")

    # composite: the bucket-space paginator — top-level only (ES
    # contract), sub-aggs are metrics, routed to the dedicated kernel
    # whose `after` cursor prunes rows BELOW the shuffle
    if len(aggs) == 1:
        (_cname, _cspec), = aggs.items()
        _ckinds = [k for k in _cspec if k != "aggs"]
        if _ckinds == ["significant_text"]:
            # request-body significant_text: the re-analysis foreground
            # variant (filter_duplicate_text folds byte-identical token
            # streams to one vote) — same dispatch contract as
            # significant_terms below
            spec = dict(_cspec["significant_text"])
            qtext = _plain_text_query(query)
            if qtext is None:
                raise ValueError(
                    "significant_text in a request body needs a bare "
                    "{'match': {'content': <text>}} query (engine-native:"
                    " the significant_text_df foreground contract)"
                )
            return reader.significant_text_df(
                qtext,
                size=int(spec.get("size", 10)),
                min_doc_count=int(spec.get("min_doc_count", 3)),
                filter_duplicate_text=bool(
                    spec.get("filter_duplicate_text", False)
                ),
                filter_sql=filter_sql,
            )
        if _ckinds == ["significant_terms"]:
            # request-body significant_terms: dispatch to the typed
            # one-scan JLH kernel. Engine-native: it runs over the
            # indexed TEXT terms with a plain match foreground (the
            # typed surface's contract), so the body query must be a
            # bare match on the content pseudo-field.
            spec = dict(_cspec["significant_terms"])
            qtext = _plain_text_query(query)
            if qtext is None:
                raise ValueError(
                    "significant_terms in a request body needs a bare "
                    "{'match': {'content': <text>}} query (engine-native:"
                    " the significant_terms_df foreground contract)"
                )
            if spec.get("field") not in (None, "content", "text", "_all"):
                raise ValueError(
                    "significant_terms runs over the indexed text terms; "
                    f"field {spec.get('field')!r} unsupported"
                )
            return reader.significant_terms_df(
                qtext,
                size=int(spec.get("size", 10)),
                min_doc_count=int(spec.get("min_doc_count", 3)),
                filter_sql=filter_sql,
            )
        if _ckinds == ["adjacency_matrix"]:
            # k named filters -> k + k(k-1)/2 intersection counts in ONE
            # partial-aggregable pass (typed aggs.adjacency_matrix).
            # Engine-native: filters are SQL predicates over the docs
            # metadata (the `filters` bucket kind accepts DSL bodies,
            # but the matrix's one-pass boolean-column plan needs
            # Catalyst expressions); sub-aggs rejected (one-row shape).
            from .aggs import adjacency_matrix as _adjm

            if _cspec.get("aggs"):
                raise ValueError("adjacency_matrix takes no sub-aggregations")
            spec = dict(_cspec["adjacency_matrix"])
            flt = spec.get("filters")
            if not isinstance(flt, dict) or not all(
                isinstance(v, str) for v in flt.values()
            ):
                raise ValueError(
                    "adjacency_matrix wants filters: {name: <sql "
                    "predicate>} (engine-native: the one-pass boolean-"
                    "column plan compiles Catalyst expressions)"
                )
            out = _adjm(rows, flt, separator=spec.get("separator", "&"))
            return out.select(
                F.col("key").alias(_cname),
                F.col("doc_count").alias(f"{_cname}_doc_count"),
            )
        if _ckinds == ["auto_date_histogram"]:
            # interval chosen from ONE min/max scalar collect (bounded,
            # documented), then the usual date_trunc groupBy; the chosen
            # unit rides every row as {name}_interval (ES returns the
            # settled interval in the response the same way)
            from .aggs import auto_date_histogram as _adh

            if _cspec.get("aggs"):
                raise ValueError(
                    "auto_date_histogram takes no sub-aggregations "
                    "(engine-native; use date_histogram for subtrees)"
                )
            spec = dict(_cspec["auto_date_histogram"])
            unit, out = _adh(
                rows, spec["field"], int(spec.get("buckets", 10))
            )
            return out.select(
                F.col("bucket").alias(_cname),
                F.col("n_docs").cast("long").alias(f"{_cname}_doc_count"),
                F.lit(unit).alias(f"{_cname}_interval"),
            )
        if _ckinds == ["variable_width_histogram"]:
            # deterministic exact-quantile variant (typed kernel) —
            # ES's streaming clustering is order-dependent by its own
            # docs; the quantile boundaries are the reproducible twin
            from .aggs import variable_width_histogram as _vwh

            if _cspec.get("aggs"):
                raise ValueError(
                    "variable_width_histogram takes no sub-aggregations"
                )
            spec = dict(_cspec["variable_width_histogram"])
            out = _vwh(rows, spec["field"], int(spec.get("buckets", 10)))
            return out.select(
                F.col("key").alias(_cname),
                F.col("min").alias(f"{_cname}_min"),
                F.col("max").alias(f"{_cname}_max"),
                F.col("doc_count").alias(f"{_cname}_doc_count"),
            )
        if _ckinds == ["median_absolute_deviation"]:
            # two-pass kernel (scalar median broadcast between passes) —
            # not expressible as one aggregate Column, so it dispatches
            # top-level like composite. `{name}` carries the MAD (the ES
            # response value); `{name}_median` is the engine's bonus
            # column (the typed surface's second output).
            from .aggs import median_absolute_deviation as _mad

            if _cspec.get("aggs"):
                raise ValueError(
                    "median_absolute_deviation takes no sub-aggregations"
                )
            spec = dict(_cspec["median_absolute_deviation"])
            return _mad(rows, spec["field"]).select(
                F.col("mad").alias(_cname),
                F.col("median").alias(f"{_cname}_median"),
            )
        if _ckinds == ["string_stats"]:
            # length stats are one JVM pass; the entropy side is the
            # Arrow char-histogram kernel — dispatches top-level to the
            # typed aggs.string_stats, columns flattened with the
            # {name}_ prefix (the ES response field set)
            from .aggs import string_stats as _sstats

            if _cspec.get("aggs"):
                raise ValueError("string_stats takes no sub-aggregations")
            spec = dict(_cspec["string_stats"])
            out = _sstats(rows, spec["field"])
            return out.select(
                *[
                    F.col(c).alias(f"{_cname}_{c}")
                    for c in ("count", "min_length", "max_length",
                              "avg_length", "entropy")
                ]
            )
        if (
            _ckinds == ["terms"]
            and len(_cspec.get("aggs") or {}) == 1
            and next(
                k
                for s in _cspec["aggs"].values()
                for k in s
                if k != "aggs"
            )
            == "top_hits"
        ):
            # terms bucket whose ONLY sub-agg is top_hits: the ES
            # drill-down shape, dispatched to the typed top_hits_df
            # kernel (bucket winners broadcast back, per-hit window over
            # winners' rows only). Engine-native: relevance-sorted hits
            # (the ES default); an explicit non-_score sort is rejected.
            spec = dict(_cspec["terms"])
            (_hname, _hspec), = _cspec["aggs"].items()
            hspec = dict(_hspec["top_hits"])
            hs = hspec.get("sort")
            if hs is not None:
                names = []
                for e0 in _aslist(hs):
                    names.extend(
                        e0.keys() if isinstance(e0, dict) else [e0]
                    )
                if any(n != "_score" for n in names):
                    raise ValueError(
                        "top_hits in a request body supports the default "
                        "_score sort only (engine-native)"
                    )
            qtext = _plain_text_query(query)
            if qtext is None:
                raise ValueError(
                    "terms+top_hits in a request body needs a bare "
                    "{'match': {'content': <text>}} query (engine-native:"
                    " the top_hits_df contract)"
                )
            return reader.top_hits_df(
                qtext,
                spec["field"],
                n_buckets=int(spec.get("size", 10)),
                size=int(hspec.get("size", 3)),
                filter_sql=filter_sql,
            )
        if _ckinds == ["composite"]:
            from .query import _composite_agg

            spec = _cspec["composite"]
            metric_cols = []
            for n, s in (_cspec.get("aggs") or {}).items():
                kind, sp = _one({k: v for k, v in s.items() if k != "aggs"})
                if kind not in _METRIC_KINDS:
                    raise ValueError(
                        "composite sub-aggregations are metrics only "
                        f"(engine-native restriction), got {kind!r}"
                    )
                metric_cols.extend(_metric_exprs(n, kind, sp))
            native, orders, missing = _es_composite_sources(spec["sources"])
            names = [n for n, _ in native]
            a = spec.get("after")
            if a is not None:
                absent = set(names) - set(a)
                if absent:
                    raise ValueError(
                        f"after key missing sources: {sorted(absent)}"
                    )
                a = tuple(a[n] for n in names)
            return _composite_agg(
                rows,
                native,
                size=int(spec.get("size", 10)),
                after=a,
                metric_cols=metric_cols,
                orders=orders,
                missing=missing,
            ).withColumnRenamed("n_docs", "doc_count")

    levels: list[dict] = []
    node = aggs
    metric_cols: list = []
    pipe_specs: dict = {}
    pipe_metrics: dict = {}
    nested_path: str | None = None
    while True:
        buckets = {
            n: s for n, s in node.items() if next(iter(s)) in _BUCKET_KINDS
        }
        metrics = {
            n: s
            for n, s in node.items()
            if next(iter(s)) in _METRIC_KINDS
        }
        pipes = {
            n: s
            for n, s in node.items()
            if next(iter(s)) in _PIPELINE_KINDS
        }
        unknown = set(node) - set(buckets) - set(metrics) - set(pipes)
        if unknown:
            kinds = {next(iter(node[n])) for n in unknown}
            raise ValueError(f"unknown aggregation kind(s) {sorted(kinds)}")
        if len(buckets) > 1:
            raise ValueError(
                "one bucket aggregation per level (engine-native "
                f"restriction); got {sorted(buckets)}"
            )
        if buckets and (metrics or pipes):
            raise ValueError(
                "metrics live at the innermost level (engine-native "
                "restriction); move them under the bucket's aggs"
            )
        if metrics or pipes:
            for n, s in metrics.items():
                kind, spec = _one({k: v for k, v in s.items() if k != "aggs"})
                if kind == "rate":
                    metric_cols.append(_rate_expr(n, spec, levels))
                    continue
                if kind == "reverse_nested":
                    # ES reverse_nested: jump back from element context to
                    # PARENT docs — in the one-groupBy tree the parent-doc
                    # count per innermost bucket is count_distinct over the
                    # doc keys, which the nested explode preserved on every
                    # element row. Full reverse only; sub-aggs under
                    # reverse_nested are out (engine-native restrictions).
                    if nested_path is None:
                        raise ValueError(
                            "reverse_nested is only legal inside a nested "
                            "aggregation (ES contract)"
                        )
                    if isinstance(spec, dict) and spec.get("path"):
                        raise ValueError(
                            "reverse_nested partial path unsupported; full "
                            "reverse to parent docs only (engine-native "
                            "restriction)"
                        )
                    if s.get("aggs"):
                        raise ValueError(
                            "sub-aggregations under reverse_nested "
                            "unsupported (engine-native restriction)"
                        )
                    metric_cols.append(
                        F.count_distinct(
                            *[F.col(c) for c in ctx.keys]
                        ).alias(f"{n}_doc_count")
                    )
                    continue
                metric_cols.extend(_metric_exprs(n, kind, spec))
            pipe_specs = pipes
            pipe_metrics = metrics
            break
        if not buckets:
            break
        (name, s0), = buckets.items()
        kind, spec = _one({k: v for k, v in s0.items() if k != "aggs"})
        if kind == "global":
            # ES global bucket: escape the query scope entirely — the
            # subtree aggregates over ALL live docs (the ES contract:
            # global is only legal top-level and takes no parameters)
            if levels:
                raise ValueError("global must be the top-level aggregation")
            if spec:
                raise ValueError("global takes no parameters")
            rows = docs.withColumn("_score", F.lit(0.0)).withColumn(
                name, F.lit("global")
            )
            meta = {
                "name": name, "size": None, "min_doc_count": 0,
                "max_doc_count": None,
            }
        elif kind == "nested":
            # ES `nested` aggregation
            # (search-aggregations-bucket-nested-aggregation): switch the
            # aggregation context from parent docs to the ELEMENTS of an
            # array-of-structs column. ONE explode — sub-aggs then run
            # over element rows, so every doc_count below this level
            # counts nested docs (the ES nested contract) and inner
            # fields address ES-style as '<path>.<field>' (plain struct
            # access on the exploded column, still whole-stage codegen —
            # the array was built by the bracket fold,
            # PlainKeyValueStreamListener.java:291-321). The level keys a
            # single constant bucket (its name), doc_count = total
            # element count via the same window-sum rule as every parent
            # level. Top-level only (engine-native restriction, the
            # `global` posture); reverse_nested metrics below recover
            # parent-doc counts because the explode preserves the doc
            # keys on every element row.
            if levels:
                raise ValueError(
                    "nested must be the top-level aggregation "
                    "(engine-native restriction)"
                )
            path = spec.get("path")
            if not path or not isinstance(path, str):
                raise ValueError(
                    "nested wants {'path': <array<struct> docs column>}"
                )
            if name == path:
                raise ValueError(
                    "nested agg name must differ from its path (the "
                    "bucket key column would shadow the element struct)"
                )
            from pyspark.sql.types import ArrayType, StructType

            sch = {f.name: f.dataType for f in rows.schema.fields}
            dt = sch.get(path)
            if not (
                isinstance(dt, ArrayType)
                and isinstance(dt.elementType, StructType)
            ):
                raise ValueError(
                    f"nested path {path!r} must be array<struct<...>>, "
                    f"got {dt.simpleString() if dt is not None else 'no such column'}"
                )
            rows = rows.withColumn(path, F.explode(path)).withColumn(
                name, F.lit(path)
            )
            nested_path = path
            meta = {
                "name": name, "size": None, "min_doc_count": 0,
                "max_doc_count": None,
            }
        elif kind in ("children", "parent"):
            # ES `children` / `parent` aggregations (join-field,
            # search-aggregations-bucket-children-aggregation): switch
            # the aggregation context from the query-scoped docs to
            # their CHILD docs (children) or to the distinct PARENT docs
            # they reference (parent). The join field is the has_child
            # column model: children carry the parent's `id_field` value
            # in their `parent_field` metadata column (engine-native
            # spec {parent_field, id_field}, defaults parent/path; ES's
            # mapped-relation `type` key is accepted and inert —
            # documented). ONE left-semi join on the join key — the
            # probe side is the scoped docs' key column only, AQE
            # broadcasts it when small and never forces a broadcast of a
            # corpus-sized side (the function_score filter rule). The
            # level keys a single constant bucket; doc_count below this
            # level counts docs in the NEW context (child docs /
            # distinct parents — the ES contract). Top-level only
            # (engine-native restriction, the global/nested posture).
            if levels:
                raise ValueError(
                    f"{kind} must be the top-level aggregation "
                    "(engine-native restriction)"
                )
            pf = spec.get("parent_field", "parent")
            idf = spec.get("id_field", "path")
            for c in (pf, idf):
                if c not in ctx.meta_cols():
                    raise ValueError(
                        f"{kind} join column {c!r} not in docs metadata "
                        f"{ctx.meta_cols()}"
                    )
            if kind == "children":
                ref = rows.select(F.col(idf).alias("__ca_key"))
                side = ctx.docs().filter(F.col(pf).isNotNull())
                rows = side.join(
                    ref, side[pf] == ref["__ca_key"], "left_semi"
                )
            else:
                ref = rows.filter(F.col(pf).isNotNull()).select(
                    F.col(pf).alias("__ca_key")
                )
                side = ctx.docs()
                rows = side.join(
                    ref, side[idf] == ref["__ca_key"], "left_semi"
                )
            rows = rows.withColumn("_score", F.lit(0.0)).withColumn(
                name, F.lit(kind)
            )
            meta = {
                "name": name, "size": None, "min_doc_count": 0,
                "max_doc_count": None,
            }
        elif kind in ("sampler", "diversified_sampler", "random_sampler"):
            # samplers restrict the ROW SET before the sub-tree runs —
            # they add no bucket key (ES: one implicit bucket). sampler =
            # top shard_size rows by score; random_sampler = the
            # deterministic md5-threshold subset (one codegen filter);
            # diversified_sampler further caps per-value contributions
            # (aggs.diversified_sampler's one-window plan). Dispatch to
            # the typed kernels and continue compiling the subtree over
            # the sample.
            sub = s0.get("aggs") or {}
            if not sub:
                raise ValueError(f"{kind} needs sub-aggregations")
            if kind == "sampler":
                shard = int(spec.get("shard_size", 100))
                rows = rows.orderBy(
                    F.desc("_score"), *[F.asc(c) for c in ctx.keys]
                ).limit(shard)
            elif kind == "random_sampler":
                from .aggs import random_sampler as _rsamp

                rows = _rsamp(
                    rows,
                    float(spec["probability"]),
                    seed=int(spec.get("seed", 0)),
                )
            else:
                from .aggs import diversified_sampler as _divsamp

                rows = _divsamp(
                    rows,
                    spec["field"],
                    [("_score", "desc")] + [(c, "asc") for c in ctx.keys],
                    max_docs_per_value=int(spec.get("max_docs_per_value", 1)),
                    shard_size=spec.get("shard_size"),
                )
            node = sub
            continue
        else:
            rows, meta = _bucket_key(ctx, rows, name, kind, spec)
        meta["kind"] = kind
        levels.append(meta)
        node = s0.get("aggs") or {}
        if not node:
            break

    keys = [lv["name"] for lv in levels]
    if not keys:
        if pipe_specs:
            raise ValueError(
                "pipeline aggregations need an enclosing bucket "
                "aggregation (ES contract)"
            )
        return rows.agg(*(metric_cols or [F.count(F.lit(1)).alias("doc_count")]))
    inner = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(f"{keys[-1]}_doc_count"), *metric_cols
    )
    from pyspark.sql.window import Window as _W

    # parent doc_counts as window sums over the innermost buckets
    for i in range(len(levels) - 1):
        inner = inner.withColumn(
            f"{keys[i]}_doc_count",
            F.sum(f"{keys[-1]}_doc_count").over(
                _W.partitionBy(*keys[: i + 1])
            ),
        )
    # per-level min_doc_count + terms size cuts (parent-partitioned)
    for i, lv in enumerate(levels):
        dc = F.col(f"{keys[i]}_doc_count")
        if lv["min_doc_count"] > 0:
            inner = inner.filter(dc >= lv["min_doc_count"])
        if lv.get("max_doc_count") is not None:
            inner = inner.filter(dc <= lv["max_doc_count"])
        if lv["size"] is not None:
            parent = keys[:i]
            order_spec = lv.get("order")
            if order_spec:
                oname, odir = order_spec
                if oname == "_count":
                    oc = dc
                elif oname == "_key":
                    oc = F.col(keys[i])
                else:
                    # metric-valued order: the metric columns exist only
                    # at the innermost level of the one-groupBy tree
                    if i != len(levels) - 1:
                        raise ValueError(
                            f"terms order by metric {oname!r} is only "
                            "supported on the innermost bucket level "
                            "(engine-native restriction)"
                        )
                    if oname not in inner.columns:
                        raise ValueError(
                            f"terms order references unknown metric "
                            f"{oname!r}; have {sorted(inner.columns)}"
                        )
                    oc = F.col(oname)
                oc = oc.desc() if odir == "desc" else oc.asc()
            else:
                oc = dc.desc()
            rk = F.dense_rank().over(
                _W.partitionBy(*parent).orderBy(oc, F.col(keys[i]).asc())
            )
            inner = inner.withColumn("_rk", rk).filter(
                F.col("_rk") <= lv["size"]
            ).drop("_rk")
    if any(lv.get("dense") for lv in levels):
        if len(levels) != 1:
            raise ValueError(
                "histogram empty-bucket fill (explicit min_doc_count 0 / "
                "extended_bounds) is only supported when the histogram "
                "is the only bucket level (engine-native restriction)"
            )
        lv = levels[0]
        key = keys[0]
        is_date = "dh_secs" in lv
        interval = float(lv["dh_secs"] if is_date else lv["interval"])
        # work in the key's NUMERIC view (epoch seconds for
        # date_histogram) so one arithmetic series serves both kinds
        kn = F.col(key).cast("double") if is_date else F.col(key)
        lo_c = F.min(kn).alias("_lo")
        hi_c = F.max(kn).alias("_hi")
        if lv.get("ebounds"):
            # extended_bounds snap to the bucket grid and widen the
            # observed range (the ES contract: bounds EXTEND, never trim)
            import math as _math

            off = float(lv.get("offset", 0.0))
            eb_lo = _math.floor((lv["ebounds"][0] - off) / interval) * interval + off
            eb_hi = _math.floor((lv["ebounds"][1] - off) / interval) * interval + off
            lo_c = F.coalesce(
                F.least(F.min(kn), F.lit(eb_lo)), F.lit(eb_lo)
            ).alias("_lo")
            hi_c = F.coalesce(
                F.greatest(F.max(kn), F.lit(eb_hi)), F.lit(eb_hi)
            ).alias("_hi")
        # dense bucket series from the (two-scalar) bounds row; join back
        # on the integral bucket index so FP regeneration can never miss
        gen = F.col("_lo") + F.col("_i") * F.lit(interval)
        series = (
            inner.agg(lo_c, hi_c)
            .select(
                "_lo",
                F.explode(
                    F.sequence(
                        F.lit(0).cast("long"),
                        F.round(
                            (F.col("_hi") - F.col("_lo")) / F.lit(interval)
                        ).cast("long"),
                    )
                ).alias("_i"),
            )
            .select((gen.cast("timestamp") if is_date else gen).alias(key))
        )

        def bk(df):
            n = F.col(key).cast("double") if is_date else F.col(key)
            return df.withColumn(
                "_bk", F.round(n / F.lit(interval)).cast("long")
            )

        inner = (
            bk(series)
            .join(bk(inner).drop(key), "_bk", "left")
            .drop("_bk")
            .withColumn(
                f"{key}_doc_count",
                F.coalesce(F.col(f"{key}_doc_count"), F.lit(0)),
            )
        )
    if pipe_specs:
        inner = _apply_body_pipelines(
            inner, keys, levels[-1].get("kind"), pipe_specs,
            rows=rows, metrics_node=pipe_metrics,
        )
    return inner.orderBy(*keys)


def _apply_body_pipelines(inner, keys, innermost_kind, pipes,
                          rows=None, metrics_node=None):
    """ES pipeline aggregations reached through the REQUEST BODY: the
    sibling-of-metrics entries at the innermost level, referencing
    sibling metric columns via `buckets_path` ("_count" = the bucket's
    doc_count, "_key" in sorts = the bucket key; dotted stats paths
    flatten with '_', the engine's suffix rule). All compile onto the
    typed kernels (aggs.pipeline_aggs / bucket_selector / bucket_sort):
    ONE WindowExec over the bucket LIST (never raw rows), partitioned by
    the parent key chain and ordered by the innermost bucket key asc —
    the ES reduce-time order. Runs AFTER min_doc_count/size cuts (ES
    pipelines see the returned buckets). Engine-native deltas
    (documented): bucket_script / bucket_selector scripts are SQL
    expressions with `params.X` substituted by the resolved column
    (Painless arithmetic/comparison syntax is SQL-compatible for the
    common cases); the final relation stays ordered by the key chain, so
    bucket_sort contributes its from/size truncation, not presentation
    order; gap_policy is fixed at `skip` (NULL propagates)."""
    from .aggs import bucket_selector as _bselector
    from .aggs import bucket_sort as _bsort
    from .aggs import pipeline_aggs as _paggs

    cols = set(inner.columns)

    def path_col(p, allow_key=False):
        p = str(p)
        if p == "_count":
            return f"{keys[-1]}_doc_count"
        if p == "_key" and allow_key:
            return keys[-1]
        c = p.replace(".", "_")
        # pipeline outputs are addressable too (bucket_sort on a
        # derivative, selector on a normalize, ...) — they exist by the
        # time the sort/selector stages run
        if c not in cols and c not in pipes:
            raise ValueError(
                f"buckets_path {p!r} does not resolve to a bucket column; "
                f"have {sorted(cols)}"
            )
        return c

    def subst(script, paths):
        out = str(script)
        # longest param name first so params.ab never partially
        # rewrites as params.a's substitution
        for k in sorted(paths, key=len, reverse=True):
            out = out.replace(f"params.{k}", path_col(paths[k]))
        if "params." in out:
            raise ValueError(f"unresolved params.* in script {script!r}")
        return out

    ordered_kinds = (
        "derivative", "cumulative_sum", "moving_fn", "moving_percentiles",
        "serial_diff",
    )
    specs: dict = {}
    norm_specs: list = []
    sibling_reducers: dict = {}
    cc_specs: list = []
    selector_sql = None
    sort_spec = None
    for name, s in pipes.items():
        kind, spec = _one(s)
        if kind in ordered_kinds and innermost_kind not in (
            "histogram", "date_histogram",
        ):
            raise ValueError(
                f"{kind} requires a histogram/date_histogram parent "
                "(ES contract)"
            )
        if kind == "derivative":
            specs[name] = ("derivative", path_col(spec["buckets_path"]))
        elif kind == "cumulative_sum":
            specs[name] = ("cumulative_sum", path_col(spec["buckets_path"]))
        elif kind == "serial_diff":
            specs[name] = (
                "serial_diff", path_col(spec["buckets_path"]),
                int(spec.get("lag", 1)),
            )
        elif kind == "moving_fn":
            m = re.fullmatch(
                r"\s*MovingFunctions\."
                r"(unweightedAvg|max|min|sum|stdDev)\(\s*values\s*\)\s*",
                str(spec.get("script", "")),
            )
            if not m:
                raise ValueError(
                    "moving_fn script must be MovingFunctions."
                    "unweightedAvg|max|min|sum|stdDev(values) "
                    "(engine-native whitelist)"
                )
            fn = {
                "unweightedAvg": "moving_avg", "max": "moving_max",
                "min": "moving_min", "sum": "moving_sum",
                "stdDev": "moving_stddev",
            }[m.group(1)]
            specs[name] = (
                fn, path_col(spec["buckets_path"]), int(spec["window"])
            )
        elif kind == "moving_percentiles":
            # engine-native: buckets_path names ONE flattened percentile
            # (or any metric) column, and `percent` is explicit — the ES
            # shape carries the parent percentiles agg's percents
            specs[name] = (
                "moving_percentile",
                path_col(spec["buckets_path"]),
                int(spec["window"]),
                float(spec.get("percent", 50.0)),
            )
        elif kind == "normalize":
            norm_specs.append((
                name,
                path_col(spec["buckets_path"]),
                str(spec.get("method", "percent_of_sum")),
            ))
        elif kind == "cumulative_cardinality":
            # EXACT running-distinct curve (typed kernel): buckets_path
            # names a sibling `cardinality` agg whose FIELD supplies the
            # keys (the ES shape), or the spec carries `field` directly.
            # Needs the raw rows (keys per bucket, not the bucket list)
            # and a single-level bucket (the typed kernel's global curve).
            if len(keys) != 1:
                raise ValueError(
                    "cumulative_cardinality supports a single bucket "
                    "level (engine-native)"
                )
            fld = spec.get("field")
            if fld is None:
                path = spec.get("buckets_path")
                sib = (metrics_node or {}).get(path)
                card = (sib or {}).get("cardinality")
                if not card:
                    raise ValueError(
                        "cumulative_cardinality wants buckets_path -> a "
                        "sibling cardinality agg (or an explicit field)"
                    )
                fld = card["field"]
            cc_specs.append((name, fld))
        elif kind in ("avg_bucket", "sum_bucket", "min_bucket", "max_bucket"):
            # sibling reducers: ES returns the scalar BESIDE the bucket
            # array; the flattened relation repeats it per bucket row of
            # the parent group (documented shape delta)
            sibling_reducers[name] = (kind[:3], path_col(spec["buckets_path"]))
        elif kind in (
            "stats_bucket", "extended_stats_bucket", "percentiles_bucket"
        ):
            # multi-valued sibling reducers — flattened like the metric
            # family ({name}_count/{name}_avg/... , {name}_p50...), each
            # value repeated per bucket row of the parent group
            sibling_reducers[name] = (
                kind,
                path_col(spec["buckets_path"]),
                [float(p) for p in _aslist(spec.get("percents") or [50.0])],
            )
        elif kind == "bucket_script":
            specs[name] = (
                "bucket_script",
                subst(spec["script"], dict(spec.get("buckets_path") or {})),
            )
        elif kind == "bucket_selector":
            selector_sql = subst(
                spec["script"], dict(spec.get("buckets_path") or {})
            )
        elif kind == "bucket_sort":
            entries = []
            for e in _aslist(spec.get("sort") or ()):
                if isinstance(e, str):
                    entries.append((path_col(e, allow_key=True), "asc"))
                else:
                    f0, o = _one(e)
                    order = o.get("order", "asc") if isinstance(o, dict) else str(o)
                    entries.append((path_col(f0, allow_key=True), order))
            sort_spec = (
                entries,
                None if spec.get("size") is None else int(spec["size"]),
                int(spec.get("from", 0)),
            )
    if specs:
        inner = _paggs(inner, keys[-1], specs, partition_cols=keys[:-1])
    if cc_specs:
        from .aggs import cumulative_cardinality as _cc

        for name, fld in cc_specs:
            curve = _cc(
                rows.select(F.col(keys[-1]), F.col(fld)), keys[-1], fld
            ).select(keys[-1], F.col("value").alias(name))
            # the curve is bucket-list-sized; broadcast onto the buckets
            inner = inner.join(F.broadcast(curve), keys[-1], "left")
    if norm_specs:
        from .aggs import normalize as _normalize

        for name, c, method in norm_specs:
            inner = _normalize(
                inner, c, method=method,
                partition_cols=keys[:-1], out=name,
            )
    if sibling_reducers:
        from pyspark.sql.window import Window as _W

        w = _W.partitionBy(*keys[:-1])
        fns = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}
        for name, red in sibling_reducers.items():
            if len(red) == 2:
                fn0, c = red
                inner = inner.withColumn(
                    name, fns[fn0](F.col(c).cast("double")).over(w)
                )
                continue
            kind0, c, percents = red
            v = F.col(c).cast("double")
            if kind0 == "percentiles_bucket":
                for p in percents:
                    tag = str(int(p)) if p == int(p) else str(p).replace(".", "_")
                    inner = inner.withColumn(
                        f"{name}_p{tag}",
                        F.expr(
                            f"percentile(cast(`{c}` as double), {p / 100.0})"
                        ).over(w),
                    )
                continue
            inner = (
                inner.withColumn(f"{name}_count", F.count(v).over(w))
                .withColumn(f"{name}_min", F.min(v).over(w))
                .withColumn(f"{name}_max", F.max(v).over(w))
                .withColumn(f"{name}_avg", F.avg(v).over(w))
                .withColumn(f"{name}_sum", F.sum(v).over(w))
            )
            if kind0 == "extended_stats_bucket":
                inner = (
                    inner.withColumn(
                        f"{name}_sum_of_squares", F.sum(v * v).over(w)
                    )
                    .withColumn(f"{name}_variance", F.var_pop(v).over(w))
                    .withColumn(
                        f"{name}_std_deviation", F.stddev_pop(v).over(w)
                    )
                )
    if selector_sql is not None:
        inner = _bselector(inner, selector_sql)
    if sort_spec is not None:
        entries, size, from_ = sort_spec
        if not entries:
            # ES allows bucket_sort with only from/size — truncation in
            # the current (key-chain) order
            entries = [(keys[-1], "asc")]
        inner = _bsort(
            inner, entries, size=size, from_=from_,
            partition_cols=keys[:-1],
        )
    return inner


def _retriever_compile(ctx, spec) -> DataFrame:
    """ES 8 retriever tree (the `retriever` section of a search body):
    `standard` wraps a query DSL body, `knn` is the dense-vector leaf,
    `linear` fuses N sub-retrievers by weighted NORMALIZED score
    (minmax / l2_norm / none per entry, the ES 8.18 contract),
    `rrf` fuses N sub-retrievers' rank_window_size-deep rankings with
    Reciprocal Rank Fusion (rank_constant; optional weights) — no score
    calibration, only ranks enter, which is why RRF is the production
    hybrid combine at 10^12 docs. Sub-retrievers nest recursively.

    Plan shape: each sub-retriever's window cut is a distributed
    TakeOrdered (orderBy+limit, never a global row_number over the full
    match set); rank assignment then windows over the <=window-row cut,
    and the fusion itself is rrf_fuse's two narrow stages over N x
    window rows — nothing downstream scales with corpus size."""
    from pyspark.sql.window import Window as _W

    from ..operators.similarity import rrf_fuse

    kind, rbody = _one(spec)
    if kind == "standard":
        return _compile(ctx, rbody["query"])
    if kind == "knn":
        return _leaf_knn(ctx, rbody)
    if kind == "rrf":
        subs = _aslist(rbody.get("retrievers"))
        if len(subs) < 2:
            raise ValueError("rrf retriever needs at least 2 sub-retrievers")
        window = int(rbody.get("rank_window_size", 100))
        const = int(rbody.get("rank_constant", 60))
        weights = rbody.get("weights")
        order = [F.desc("score")] + [F.asc(c) for c in ctx.keys]
        ranked = []
        for s in subs:
            top = _retriever_compile(ctx, s).orderBy(*order).limit(window)
            ranked.append(
                top.withColumn("rank", F.row_number().over(_W.orderBy(*order)))
            )
        fused = rrf_fuse(
            ranked, ctx.keys, k=window, rank_k=const, weights=weights
        )
        return fused.select(*ctx.keys, F.col("rrf_score").alias("score"))
    if kind == "linear":
        # ES 8.18 linear retriever: weighted NORMALIZED-score fusion —
        # each sub-retriever's window normalizes its own scores (minmax /
        # l2_norm / none), weights scale, absent docs contribute 0. Same
        # plan posture as rrf: window cuts are TakeOrdered, the fusion
        # runs over <=N x window rows (operators/similarity.linear_fuse).
        from ..operators.similarity import linear_fuse

        subs = _aslist(rbody.get("retrievers"))
        if len(subs) < 2:
            raise ValueError("linear retriever needs at least 2 sub-retrievers")
        window = int(rbody.get("rank_window_size", 100))
        order = [F.desc("score")] + [F.asc(c) for c in ctx.keys]
        entries = []
        for s in subs:
            s = dict(s)
            weight = float(s.pop("weight", 1.0))
            norm = s.pop("normalizer", "none")
            inner = s.pop("retriever", None)
            if inner is None:
                raise ValueError(
                    "linear sub-entry wants {'retriever': {...}, "
                    "'weight': w, 'normalizer': 'minmax'|'l2_norm'|'none'}"
                )
            top = _retriever_compile(ctx, inner).orderBy(*order).limit(window)
            entries.append((top, weight, norm))
        fused = linear_fuse(entries, ctx.keys, k=window)
        return fused.select(*ctx.keys, F.col("linear_score").alias("score"))
    raise ValueError(f"unsupported retriever kind {kind!r}")


def search_dsl_df(
    reader,
    body: dict,
    k: int | None = 10,
    filter_sql: str | None = None,
) -> DataFrame:
    """ES `_search` with a JSON request body: compile (see compile_dsl),
    optionally restrict with filter context, ONE ordered top-k cut with
    the tier's tie-break (doc_id on a base index; segment recency then
    doc_id on a live one). A single-key `{"retriever": ...}` body routes
    through the ES 8 retriever tree (standard / knn / rrf fusion).

    `{"query": ..., "collapse": {"field": f}}` collapses hits to ONE row
    per distinct value of the docs metadata column f — the best-scoring
    doc under the tier's tie-break (ES field collapsing,
    collapse-search-results.html). Collapsed output carries two extra
    columns: the collapse key f and `collapse_count` (group size — the
    inner_hits total). Plan: the match set joins the (doc_id -> f)
    projection and window-ranks per key: one hash shuffle on the
    collapse key, no driver funnel; the ordered cut runs on the <=
    |distinct f| survivors.

    `{"query": ..., "runtime_mappings": {name: {"type": t, "script":
    {"source": sql}}}}` adds query-time computed fields over the docs
    metadata (runtime-search-request.html): usable in every
    filter-context leaf (term/terms/range/exists/script), in collapse,
    in `sort`, and shadowing a mapped column of the same name. Catalyst
    evaluates the expression inside the docs scan projection — no second
    pass, no storage.

    `sort` / `from` / `size` (the request-body pagination trio): `sort`
    entries are '_score', docs metadata columns (each {field: {"order":
    .., "missing": "_first"|"_last"}} or shorthand), or Spark SQL
    expressions (the ES script-sort surface, returned as sort_<i>); the
    tier tie-break is always appended (ES _shard_doc). `size` overrides
    the `k` argument; `from` skips rows AFTER the global order — fine for
    shallow pages; `search_after` (the previous page's last sort values,
    optionally + the doc-id tie-break) paginates DEEP: the cursor
    predicate filters strictly past the boundary BEFORE the cut, so page
    N never materializes N×k rows (the same advice ES gives). Plan: sort
    columns join from the (pruned) docs scan; the cut is ONE TakeOrdered
    on the sort keys.

    `fields` / `_source` / `docvalue_fields` (response shaping): enrich
    the ranked page with docs metadata columns — a list of names (or ES
    {"field": name} objects), `_source: true` = all metadata columns,
    runtime fields included; docvalue_fields merges into the same
    enrichment (the docs store IS columnar). `script_fields` adds
    per-hit computed columns — the engine-native script dialect (Spark
    SQL over docs columns + `_score`) evaluated inside codegen on the
    tiny page. The page joins the pruned docs projection (hits_df's
    plan); ranking is re-established after the join."""
    if isinstance(body, dict) and ("aggs" in body or "aggregations" in body):
        raise ValueError(
            "the body has an aggs section — search_dsl_df returns hits "
            "only; use search_request(body) for {hits, aggregations}, or "
            "aggs_dsl_df for aggregations alone"
        )
    runtime = {}
    if isinstance(body, dict) and "runtime_mappings" in body and len(body) > 1:
        body = dict(body)
        runtime = _parse_runtime(body.pop("runtime_mappings"))
    ctx = _Ctx(reader, runtime=runtime)
    sort = size = fields_sel = search_after = None
    script_fields: dict = {}
    dv_sel: list = []
    offset = 0
    if isinstance(body, dict) and len(body) > 1 and (
        "sort" in body or "size" in body or "from" in body
        or "fields" in body or "_source" in body or "search_after" in body
        or "docvalue_fields" in body or "script_fields" in body
        or "stored_fields" in body
    ):
        body = dict(body)
        sort = body.pop("sort", None)
        size = body.pop("size", None)
        search_after = body.pop("search_after", None)
        offset = int(body.pop("from", 0) or 0)
        if search_after is not None and offset:
            raise ValueError(
                "search_after cannot be combined with from (ES contract)"
            )
        # response shaping: `fields` / `_source` enrich hits with docs
        # metadata columns (runtime fields included — the ctx docs view
        # carries them). _source: true = all metadata; false = keys+score
        # only (the default here anyway); a list = that subset.
        fl = body.pop("fields", None)
        src = body.pop("_source", None)
        # `docvalue_fields`: ES's columnar-values twin of `fields` — the
        # engine's docs metadata IS columnar parquet, so the section is
        # the same enrichment join; names merge with fields/_source
        # (format specs are accepted and ignored — parquet values are
        # already typed). `script_fields`: per-hit computed columns, the
        # engine-native script dialect (Spark SQL over docs columns +
        # `_score`, the script_score/runtime_mappings contract) —
        # evaluated on the (tiny) ranked page after the enrichment join,
        # whole-stage codegen, never a UDF.
        dvf = body.pop("docvalue_fields", None)
        if dvf is not None:
            dv_sel = [
                f["field"] if isinstance(f, dict) else f for f in _aslist(dvf)
            ]
        # `stored_fields`: the docs metadata IS the stored layer here —
        # same enrichment; "_none_" is the ES opt-out (keys+score only,
        # the default shape anyway)
        stf = body.pop("stored_fields", None)
        if stf is not None and stf != "_none_":
            dv_sel += [f for f in _aslist(stf) if f not in dv_sel]
        sfs = body.pop("script_fields", None)
        if sfs is not None:
            if not isinstance(sfs, dict) or not sfs:
                raise ValueError(
                    "script_fields wants {name: {'script': {'source': "
                    "'<spark sql>'}}}"
                )
            for sname, sspec in sfs.items():
                script_fields[sname] = _script_source(sspec)
        if fl is not None:
            fields_sel = [
                f["field"] if isinstance(f, dict) else f for f in _aslist(fl)
            ]
        elif isinstance(src, list):
            fields_sel = list(src)
        elif src is True:
            fields_sel = True
    if size is not None:
        k = int(size)  # the body's size wins over the API default (ES)
    rescore = post_filter = min_score = None
    if isinstance(body, dict) and "rescore" in body and len(body) > 1:
        body = dict(body)
        rescore = body.pop("rescore")
        if sort is not None:
            # ES rejects rescore combined with any sort other than
            # _score: the rescorer's reordering would be silently thrown
            # away by the sort section (ADVICE r4)
            names = []
            for e in _aslist(sort):
                names.extend(e.keys() if isinstance(e, dict) else [e])
            if any(n != "_score" for n in names):
                raise ValueError(
                    "rescore cannot be combined with a sort other than "
                    "'_score' (Elasticsearch rejects this combination)"
                )
    if isinstance(body, dict) and "post_filter" in body and len(body) > 1:
        body = dict(body)
        post_filter = body.pop("post_filter")
    if isinstance(body, dict) and "min_score" in body and len(body) > 1:
        body = dict(body)
        min_score = float(body.pop("min_score"))
    collapse = None
    if isinstance(body, dict) and "collapse" in body and len(body) > 1:
        body = dict(body)
        collapse = body.pop("collapse")
    knn_sec = None
    if isinstance(body, dict) and "knn" in body and "query" in body:
        # TOP-LEVEL knn alongside query: the ES 8 hybrid contract — both
        # sides run, a doc's final score is the SUM of its query score
        # and its knn score (docs found by only one side keep that
        # side's score). A body with knn and no query stays the DSL leaf.
        body = dict(body)
        knn_sec = body.pop("knn")
    if isinstance(body, dict) and "query" in body and len(body) > 1:
        # every supported request-body section was popped above — name
        # what is left instead of failing with a single-key parse error
        extra = sorted(k for k in body if k != "query")
        raise ValueError(
            f"unsupported request-body sections {extra}; supported: "
            "query, retriever, knn, aggs / highlight / suggest (via "
            "search_request), collapse, rescore, post_filter, min_score, "
            "runtime_mappings, sort, from, size, search_after, fields, "
            "_source, docvalue_fields, script_fields, stored_fields"
        )
    if (
        isinstance(body, dict)
        and "retriever" in body
        and len(body) == 1
        and isinstance(body["retriever"], dict)
    ):
        out = _retriever_compile(ctx, body["retriever"])
    else:
        if (
            isinstance(body, dict)
            and "query" in body
            and len(body) == 1
            and isinstance(body["query"], dict)
        ):
            body = body["query"]
        out = _compile(ctx, body)
    if knn_sec is not None:
        # score-sum fusion, one full-outer join per knn section (ES 8
        # allows a list); join on the key-name list so Spark coalesces
        # the key columns of the two sides
        for ks in _aslist(knn_sec):
            kdf = _leaf_knn(ctx, dict(ks))
            out = (
                out.withColumnRenamed("score", "_qs")
                .join(
                    kdf.withColumnRenamed("score", "_ks"),
                    ctx.keys,
                    "full_outer",
                )
                .select(
                    *ctx.keys,
                    (
                        F.coalesce(F.col("_qs"), F.lit(0.0))
                        + F.coalesce(F.col("_ks"), F.lit(0.0))
                    ).alias("score"),
                )
            )
    if filter_sql:
        out = out.join(ctx.filter_ids(filter_sql), ctx.keys, "left_semi")
    if rescore is not None:
        # a LIST of rescorers applies sequentially, each pass's combined
        # score feeding the next window (the ES multi-rescore contract)
        for rspec in _aslist(rescore):
            out = _apply_rescore(ctx, out, rspec)
    if min_score is not None:
        out = out.filter(F.col("score") >= F.lit(min_score))
    if post_filter is not None:
        # post_filter narrows the HITS only — aggregations over the same
        # body (search_request) see the pre-post_filter match set, the
        # faceted-navigation contract ES defines post_filter for
        if not isinstance(post_filter, dict):
            raise ValueError("post_filter must be a query object")
        out = out.join(_compile(ctx, post_filter), ctx.keys, "left_semi")
    order = None
    collapse_sr: list = []
    if collapse is not None:
        if not isinstance(collapse, dict) or "field" not in collapse:
            raise ValueError("collapse wants {'field': <docs column>}")
        cf = collapse["field"]
        if cf not in ctx.meta_cols():
            raise ValueError(
                f"collapse field {cf!r} not a docs metadata column; "
                f"have {ctx.meta_cols()}"
            )
        ih = collapse.get("inner_hits")
        ih_name, ih_size = None, 0
        if ih is not None:
            # ES collapse.inner_hits: each collapsed row also carries its
            # group's top-N members, ordered like the head selection —
            # engine-native shape: an array<struct<doc keys, score>>
            # column named by the request. Costs ONE window shuffle on
            # the collapse key (the same key the collapse groups on).
            if not isinstance(ih, dict):
                raise ValueError("inner_hits wants {'name': ..., 'size': n}")
            unknown_ih = set(ih) - {"name", "size"}
            if unknown_ih:
                raise ValueError(
                    f"unsupported inner_hits options {sorted(unknown_ih)}; "
                    "supported: name, size (members order = the head-"
                    "selection order)"
                )
            ih_name = str(ih.get("name", "inner_hits"))
            ih_size = int(ih.get("size", 3))
        sort_names = []
        if sort is not None:
            for e in _aslist(sort):
                sort_names.extend(e.keys() if isinstance(e, dict) else [e])
        if sort is not None and "collapse_count" not in sort_names:
            # ES field collapsing selects each group's head by the SEARCH
            # SORT, not by score (ADVICE r4). Semantics force a per-group
            # ordering on an arbitrary sort, so this path pays ONE window
            # shuffle on the collapse key; the no-sort path below keeps
            # the map-side-combinable max_by aggregate. (Sorting on
            # `collapse_count` — an engine extension, the column only
            # exists post-collapse — keeps the post-collapse sort.)
            out, order, collapse_sr = _apply_sort(ctx, out, sort)
            sort = None  # consumed — the ordered cut reuses `order`
            if cf not in out.columns:
                out = out.join(ctx.docs().select(*ctx.keys, cf), ctx.keys)
            if ctx.live:
                rank_map = reader._rank_map()
                tie = [F.desc(rank_map[F.col("segment")]), F.asc("doc_id")]
            else:
                tie = [F.asc("doc_id")]
            from pyspark.sql.window import Window

            wkey = Window.partitionBy(cf)
            ranked = out.withColumn(
                "collapse_count", F.count(F.lit(1)).over(wkey)
            ).withColumn(
                "_rn",
                F.row_number().over(wkey.orderBy(*(list(order) + tie))),
            )
            out = ranked.filter(F.col("_rn") == 1).drop("_rn")
            if ih_name:
                members = (
                    ranked.filter(F.col("_rn") <= ih_size)
                    .groupBy(cf)
                    .agg(
                        F.sort_array(
                            F.collect_list(
                                F.struct("_rn", *ctx.keys, "score")
                            )
                        ).alias(ih_name)
                    )
                )
                out = out.join(members, cf, "left")
        else:
            # per-key head via max_by — a map-side-combinable aggregate,
            # NOT a window over the full match set (collapse_df's plan
            # argument: a window would shuffle-sort every matching doc;
            # the agg combines partials). Tie-break mirrors the tier's
            # ordered cut.
            out = out.join(ctx.docs().select(*ctx.keys, cf), ctx.keys)
            if ctx.live:
                rank_map = reader._rank_map()
                ordkey = F.struct(
                    F.col("score"),
                    rank_map[F.col("segment")].alias("_rk"),
                    (-F.col("doc_id")).alias("_nd"),
                )
            else:
                ordkey = F.struct(
                    F.col("score"), (-F.col("doc_id")).alias("_nd")
                )
            pre = out
            out = (
                out.groupBy(cf)
                .agg(
                    F.max_by(
                        F.struct(*ctx.keys, "score"), ordkey
                    ).alias("_head"),
                    F.count(F.lit(1)).alias("collapse_count"),
                )
                .select(F.col("_head.*"), cf, "collapse_count")
            )
            if ih_name:
                from pyspark.sql.window import Window

                if ctx.live:
                    mtie = [
                        F.desc(rank_map[F.col("segment")]), F.asc("doc_id")
                    ]
                else:
                    mtie = [F.asc("doc_id")]
                w_ih = Window.partitionBy(cf).orderBy(
                    F.desc("score"), *mtie
                )
                members = (
                    pre.withColumn("_rn", F.row_number().over(w_ih))
                    .filter(F.col("_rn") <= ih_size)
                    .groupBy(cf)
                    .agg(
                        F.sort_array(
                            F.collect_list(
                                F.struct("_rn", *ctx.keys, "score")
                            )
                        ).alias(ih_name)
                    )
                )
                out = out.join(members, cf, "left")
    # collapse-with-sort consumed the sort section above but its
    # resolved columns still decorate the page — keep them on the
    # sideband so highlight restores THAT order, not score desc
    sort_resolved = collapse_sr
    if sort is not None:
        out, order, sort_resolved = _apply_sort(ctx, out, sort)
    if search_after is not None:
        # ES request-body search_after: deep pagination that filters
        # strictly past the previous page's last sort values BEFORE the
        # ordered cut — page N never materializes N×k rows (the same
        # cursor discipline as the typed search_after surfaces). The
        # cursor is the sort values, optionally + the tier doc id as the
        # trailing tie-break (ES _shard_doc). Engine-native: null sort
        # values cannot sit on a cursor boundary (pass a non-null
        # tie-break) — the lexicographic strict comparison drops them.
        if collapse is not None:
            raise ValueError(
                "search_after cannot be combined with collapse (ES "
                "contract)"
            )
        if not sort_resolved:
            raise ValueError(
                "search_after requires a sort section (ES contract)"
            )
        cur = list(search_after)
        names = [n for n, *_ in sort_resolved]
        dirs = [d for _, d, *_ in sort_resolved]
        if len(cur) < len(names):
            # zip would silently truncate, building a wrong predicate
            # (and an empty cursor would leave no predicate at all)
            raise ValueError(
                f"search_after wants {len(names)} values "
                f"(one per sort entry), got {len(cur)}"
            )
        # (column expr, direction, cursor literal) triples — the sort
        # entries plus the TIER's tie-break: base appends asc doc_id
        # (+1 cursor value); live ordering is (segment recency-rank
        # desc, doc_id asc), so its cursor tie-break is +2 values
        # (segment, doc_id) — a bare doc_id cannot disambiguate a
        # sort-value tie that straddles segments and would drop or
        # duplicate page-boundary rows (the typed surfaces' cursor rule)
        ents = [
            (F.col(n), d, F.lit(v))
            for n, d, v in zip(names, dirs, cur[: len(names)])
        ]
        rest = cur[len(names):]
        if ctx.live:
            if len(rest) == 2:
                seg, did = rest
                if seg not in reader.segments:
                    raise ValueError(
                        f"search_after cursor segment {seg!r} not in "
                        f"{reader.segments}"
                    )
                rm = reader._rank_map()
                ents.append((rm[F.col("segment")], "desc", rm[F.lit(seg)]))
                ents.append((F.col("doc_id"), "asc", F.lit(did)))
            elif rest:
                raise ValueError(
                    f"search_after wants {len(names)} values (or +2 for "
                    "the live-tier (segment, doc_id) tie-break), got "
                    f"{len(cur)}"
                )
        else:
            if len(rest) == 1:
                ents.append((F.col("doc_id"), "asc", F.lit(rest[0])))
            elif rest:
                raise ValueError(
                    f"search_after wants {len(names)} values (or +1 for "
                    f"the doc-id tie-break), got {len(cur)}"
                )
        pred = None
        prefix_eq = None
        for c, d, lit in ents:
            strict = (c < lit) if d == "desc" else (c > lit)
            clause = strict if prefix_eq is None else (prefix_eq & strict)
            pred = clause if pred is None else (pred | clause)
            eq = c.eqNullSafe(lit)
            prefix_eq = eq if prefix_eq is None else (prefix_eq & eq)
        out = out.filter(pred)

    def shape(df):
        if fields_sel is None and not dv_sel and not script_fields:
            return df
        docs = ctx.docs()
        want = (
            [c for c in docs.columns if c not in ("doc_id", "segment")]
            if fields_sel is True
            else list(fields_sel or [])
        )
        want += [f for f in dv_sel if f not in want]
        unknown = [f for f in want if f not in docs.columns]
        if unknown:
            meta = [c for c in docs.columns if c not in ("doc_id", "segment")]
            raise ValueError(f"unknown fields {unknown}; docs table has {meta}")
        if script_fields:
            # scripts may reference ANY docs column: join the full
            # metadata projection onto the (tiny) page, compute each
            # script inside codegen, then drop the columns the response
            # didn't ask for. `_score` aliases the relevance score.
            add_all = [
                c for c in docs.columns
                if c not in ctx.keys and c not in df.columns
            ]
            joined = df.join(
                docs.select(*ctx.keys, *add_all), ctx.keys, "left"
            )
            if "score" in joined.columns and "_score" not in joined.columns:
                joined = joined.withColumn("_score", F.col("score"))
            for sname, ssrc in script_fields.items():
                joined = joined.withColumn(sname, F.expr(ssrc))
            keep = (
                list(df.columns)
                + [f for f in want if f not in df.columns]
                + list(script_fields)
            )
            return joined.select(*keep)
        add = [f for f in want if f not in df.columns]
        if not add:
            return df
        # the (tiny) ranked page joins the pruned docs projection — the
        # doc-key set pushes into the scan, same plan as hits_df
        return df.join(docs.select(*ctx.keys, *add), ctx.keys, "left")

    if k is None and not offset:
        res = shape(out)  # unranked match set (+ sort cols if any)
        res._sort_resolved = sort_resolved
        return res
    if order is None:
        order = [F.desc("score")]
    if ctx.live:
        rank_map = reader._rank_map()
        order = order + [F.desc(rank_map[F.col("segment")]), F.asc("doc_id")]
    else:
        order = order + [F.asc("doc_id")]
    out = out.orderBy(*order)
    if offset:
        out = out.offset(offset)  # ES `from`: skip AFTER the global order
    if k is not None:
        out = out.limit(k)
    if fields_sel is not None or dv_sel or script_fields:
        # re-establish ranking after the enrichment join
        out = shape(out).orderBy(*order)
    # sideband for search_request: which columns carry the body's sort
    # (so post-page enrichment like highlight can restore THAT order,
    # not blindly score desc)
    out._sort_resolved = sort_resolved
    return out
