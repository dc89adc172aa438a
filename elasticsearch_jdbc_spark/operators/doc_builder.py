"""Label-driven document construction: the reference's row->JSON-document
compiler, rebuilt as a Catalyst expression generator.

The reference infers document shape from column *labels* at runtime and
folds consecutive same-`_id` rows into one JSON document
(PlainKeyValueStreamListener.java:132-352; Values.java:43-94;
PlainIndexableObject.java:123-217). This module compiles the same label
grammar into a single Spark aggregation + a tree of JVM string-building
expressions — no Python in the data path, so document construction runs
inside whole-stage codegen and scales with the cluster, while matching the
reference's golden outputs (ValueListenerTests.java:29-396) byte-for-byte
on the JSON bodies.

Label grammar (README.md:447-605):
  _id, _optype, _index, ...   control keys -> metadata columns, not body
  a.b.c                       dot path -> nested object
  a.b[]                       sequence -> comma-split multi-value cell
  a.b[sub] / a.b[s.t]         bracket -> array of (nested) objects,
                              one element per source row, in row order
  _source                     the cell IS the whole JSON body

Cell algebra (Values.java:43-94, spec'd in ValuesTests.java:38-117):
  repeated values append with dedup (first-occurrence order); a null never
  joins a non-empty list; a lone null is replaced by the first non-null;
  1 value renders as a scalar, >1 as an array (Values.java:161-176).

Fold-order note: the reference folds in JDBC cursor order and requires
ORDER BY _id (README.md:490). Spark's groupBy is unordered, so the caller
passes `order_col` (a monotonically increasing row sequence) and every
collected list is sorted by it before rendering — same observable
semantics, shuffle-safe, deterministic at any parallelism.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .fold import CONTROL_KEYS

_BRACKET = re.compile(r"^(.*)\[(.*?)\]$")  # PlainKeyValueStreamListener.java:41


# ---------------------------------------------------------------------------
# label parsing -> spec tree
# ---------------------------------------------------------------------------


def parse_labels(
    labels: list[str], column_name_map: dict[str, str] | None = None
) -> dict:
    """Split labels into control keys, scalar paths, sequence paths and
    bracket groups. `column_name_map` rewrites dot segments before parsing
    (StandardSource.mapColumnName, StandardSource.java:1938-1955).

    Returns {"control": [...], "fields": [(label, kind, parts, subparts)]}
    where kind in {"scalar", "seq", "bracket"}; for brackets, consecutive
    labels with the same base path form one group (insertion order kept —
    LinkedHashMap semantics, PlainIndexableObject.java:33-49).
    """
    def remap(label: str) -> str:
        if not column_name_map:
            return label
        return ".".join(column_name_map.get(p, p) for p in label.split("."))

    control, fields = [], []
    for raw in labels:
        if raw in CONTROL_KEYS:
            # the reference diverts only its FIXED control-key set
            # (ControlKeys); any other underscore-prefixed label is an
            # ordinary field and folds into the JSON body
            control.append(raw)
            continue
        label = remap(raw)
        m = _BRACKET.match(label)
        if m and m.group(2) == "":
            fields.append((raw, "seq", m.group(1).split("."), None))
        elif m:
            fields.append((raw, "bracket", m.group(1).split("."), m.group(2).split(".")))
        else:
            fields.append((raw, "scalar", label.split("."), None))
    return {"control": control, "fields": fields}


# ---------------------------------------------------------------------------
# JSON fragment expressions (all JVM-side string builders)
# ---------------------------------------------------------------------------


def _json_scalar(
    c: Column, detect_json: bool = False, plain: bool = False
) -> Column:
    """One value -> its JSON text. Strings are escaped via to_json(array(v))
    minus the brackets (never a Python escaper); numerics/booleans render
    PLAIN — unquoted, by SOURCE TYPE (`plain`, resolved from the input
    schema like the reference's JDBC-type dispatch; the reference
    suppresses scientific notation, ValueListenerTests.java:262-280 —
    Spark's decimal/long casts are plain). With detect_json, a string
    cell that parses as a JSON object/array is inlined as structure
    (PlainKeyValueStreamListener.java:181-192)."""
    s = c.cast("string")
    if plain:
        return s
    arr = F.to_json(F.array(s))  # '["escaped"]'
    quoted = arr.substr(F.lit(2), F.length(arr) - 2)
    if detect_json:
        return F.when(s.rlike(r"^\s*[\[{].*[\]}]\s*$"), s).otherwise(quoted)
    return quoted


def _render_cell(
    vs: Column, detect_json: bool, ignore_null: bool, plain: bool = False
) -> Column:
    """Deduped ordered value array -> JSON fragment (Values.java:161-176):
    0 values -> null (or omit under ignore_null), 1 -> scalar, n -> array.
    Returns NULL column when the field should be omitted entirely."""
    frag_one = _json_scalar(F.element_at(vs, 1), detect_json, plain)
    frag_many = F.concat(
        F.lit("["),
        F.array_join(
            F.transform(vs, lambda v: _json_scalar(v, detect_json, plain)),
            ",",
        ),
        F.lit("]"),
    )
    empty = F.lit(None).cast("string") if ignore_null else F.lit("null")
    return (
        F.when(F.size(vs) == 0, empty)
        .when(F.size(vs) == 1, frag_one)
        .otherwise(frag_many)
    )


def _obj(fields: list[tuple[str, Column]]) -> Column:
    """{"k":frag,...} — a NULL fragment omits its field (concat_ws skips
    nulls), and an all-omitted object collapses to {} (ignore_null empty-map
    collapse, PlainIndexableObject.java:182-192)."""
    parts = [
        F.when(frag.isNotNull(), F.concat(F.lit(f'"{k}":'), frag))
        for k, frag in fields
    ]
    return F.concat(F.lit("{"), F.concat_ws(",", *parts), F.lit("}"))


def _nest(tree: dict) -> Column:
    """Recursive dot-path tree -> object fragment. Leaves are fragment
    Columns; interior nodes are dicts (insertion-ordered). A node carrying
    both a value and children (label `person` + `person.attributes`,
    ValueListenerTests.java:208-227) stores the value under the `_SELF`
    slot: its object body is spliced together with the structural children
    — the expression analogue of the reference's map merge
    (PlainKeyValueStreamListener.java:272-352)."""
    self_frag = tree.get(_SELF)
    out = []
    for k, v in tree.items():
        if k == _SELF:
            continue
        out.append((k, _nest(v) if isinstance(v, dict) else v))
    if self_frag is None:
        return _obj(out)
    # splice the self OBJECT's body together with the children; a
    # non-object self value (a scalar under a path that also has
    # children — the reference only ever merges objects here) lands in
    # an engine-native "value" slot instead of producing malformed
    # JSON, and an EMPTY self body is skipped (concat_ws skips nulls
    # but not empty strings)
    t = F.trim(self_frag)
    stripped = t.substr(F.lit(2), F.length(t) - 2)
    inner = F.when(t.rlike(r"^\{.*\}$"), stripped).otherwise(
        F.concat(F.lit('"value":'), t)
    )
    inner = F.when(F.length(F.trim(inner)) > 0, inner)
    parts = [
        F.when(frag.isNotNull(), F.concat(F.lit(f'"{k}":'), frag))
        for k, frag in out
    ]
    return F.concat(F.lit("{"), F.concat_ws(",", inner, *parts), F.lit("}"))


_SELF = "\0self"


# ---------------------------------------------------------------------------
# the fold + render operator
# ---------------------------------------------------------------------------


def fold_documents(
    df: DataFrame,
    labels: list[str] | None = None,
    order_col: str = "_seq",
    detect_json: bool = False,
    ignore_null: bool = False,
    column_name_map: dict[str, str] | None = None,
) -> DataFrame:
    """Fold rows into JSON documents keyed by `_id`, reproducing the
    reference's golden semantics (ValueListenerTests.java) with one Spark
    aggregation.

    Input: a DataFrame whose column names ARE the labels (plus `order_col`
    carrying the source row order). Backtick-quoted names carry the dots and
    brackets. Output: one row per `_id` with control columns + `doc` (the
    JSON body string, field order = label order).

    Implementation: per scalar/seq field, collect ordered (seq, value)
    structs with nulls dropped ("a null never joins a list"), sort, project,
    dedup (first occurrence). Per bracket group, collect ordered row structs
    — NO dedup, one array element per row (the reference appends each row's
    object, ValueListenerTests.java:243-260 keeps triplicates). Rendering is
    a pure expression tree — scalar vs array decided per cell at runtime.
    """
    labels = labels or [c for c in df.columns if c != order_col]
    spec = parse_labels(labels, column_name_map)
    _dtypes = dict(df.dtypes)
    _PLAIN = ("tinyint", "smallint", "int", "bigint", "float", "double",
              "boolean")

    def _is_plain(label: str) -> bool:
        t = _dtypes.get(label, "")
        return t in _PLAIN or t.startswith("decimal")
    if "_source" in spec["control"]:
        # the cell IS the body (PlainKeyValueStreamListener.java:149-157)
        aggs = [F.min(F.struct(order_col, "_source"))["_source"].alias("doc")]
        for ck in spec["control"]:
            if ck not in ("_id", "_source"):
                aggs.append(F.min(F.struct(order_col, ck))[ck].alias(ck))
        return df.groupBy("_id").agg(*aggs)

    def col(label: str) -> Column:
        return F.col(f"`{label}`")

    aggs: list[Column] = []
    bracket_groups: dict[str, list[tuple[str, list[str]]]] = {}
    bracket_order: dict[str, int] = {}
    slot = 0
    slots: dict[str, str] = {}

    for raw, kind, parts, subparts in spec["fields"]:
        if kind == "bracket":
            base = ".".join(parts)
            bracket_groups.setdefault(base, []).append((raw, subparts))
            if base not in bracket_order:
                bracket_order[base] = slot
                slot += 1
            continue
        name = f"_f{slot}"
        slots[raw] = name
        slot += 1
        pair = F.struct(F.col(order_col).alias("o"), col(raw).alias("v"))
        ordered = F.transform(
            F.array_sort(F.collect_list(F.when(col(raw).isNotNull(), pair))),
            lambda s: s["v"],
        )
        if kind == "seq":
            # comma-split sequence (Values.java:51-57): split each value,
            # flatten in order, dedup first-occurrence
            ordered = F.flatten(F.transform(ordered, lambda v: F.split(v.cast("string"), ",")))
        aggs.append(F.array_distinct(ordered).alias(name))

    for base, members in bracket_groups.items():
        name = f"_b{bracket_order[base]}"
        slots[base] = name
        row_struct = F.struct(
            F.col(order_col).alias("o"),
            *[col(raw).alias(f"s{i}") for i, (raw, _sp) in enumerate(members)],
        )
        aggs.append(F.array_sort(F.collect_list(row_struct)).alias(name))

    for ck in spec["control"]:
        if ck != "_id":
            aggs.append(F.min(F.struct(order_col, ck))[ck].alias(ck))

    folded = df.groupBy("_id").agg(*aggs)

    # ---- render: build the dot-path tree of fragments in label order ----
    tree: dict = {}

    def insert(parts: list[str], frag: Column) -> None:
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if not isinstance(nxt, dict):  # leaf already there -> merge slot
                nxt = node[p] = {_SELF: nxt}
            node = nxt
        k = parts[-1]
        if isinstance(node.get(k), dict):  # children already there
            node[k][_SELF] = frag
        else:
            node[k] = frag

    done_brackets: set[str] = set()
    for raw, kind, parts, subparts in spec["fields"]:
        if kind == "bracket":
            base = ".".join(parts)
            if base in done_brackets:
                continue
            done_brackets.add(base)
            members = bracket_groups[base]
            arr = F.col(slots[base])

            def make_elem_obj(members):
                def elem_obj(e: Column) -> Column:
                    # nested dots inside brackets build sub-objects
                    # (PlainKeyValueStreamListener.java:303-316)
                    etree: dict = {}
                    for i, (_raw, sp) in enumerate(members):
                        # a null member is omitted from its row object
                        # (Values null rule applied element-wise)
                        frag_i = F.when(
                            e[f"s{i}"].isNotNull(),
                            _json_scalar(
                                e[f"s{i}"], detect_json, _is_plain(_raw)
                            ),
                        )
                        node = etree
                        for p in sp[:-1]:
                            node = node.setdefault(p, {})
                        node[sp[-1]] = frag_i
                    return _nest(etree)

                return elem_obj

            frag = F.concat(
                F.lit("["),
                F.array_join(F.transform(arr, make_elem_obj(members)), ","),
                F.lit("]"),
            )
            insert(parts, frag)
        else:
            insert(
                parts,
                _render_cell(
                    F.col(slots[raw]), detect_json, ignore_null,
                    # seq cells comma-split into STRING pieces
                    kind == "scalar" and _is_plain(raw),
                ),
            )

    doc = _nest(tree)
    keep = ["_id"] + [c for c in spec["control"] if c != "_id"]
    return folded.select(*keep, doc.alias("doc"))
