"""Property-based check: fold_documents == a direct pure-Python model of
the reference's fold semantics (Values append-dedup + null rules,
bracket row-append, [] comma-split), over randomized labels and rows.
Hypothesis drives the shapes; the Spark plan must agree with the model
on parsed-JSON equality for every id."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from elasticsearch_jdbc_spark.operators.doc_builder import fold_documents

# ---------------- pure-Python model ----------------


def model_fold(labels: list[str], rows: list[tuple], ignore_null: bool) -> dict:
    def set_path(node, parts, val):
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
        return val

    def get_path(node, parts):
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        return node.get(parts[-1])

    docs: dict[str, dict] = {}
    cells: dict[tuple, dict] = {}  # (id, label) -> state
    for row in rows:
        rid = row[labels.index("_id")]
        doc = docs.setdefault(rid, {})
        bracket_rows: dict[str, dict] = {}
        for lab, val in zip(labels, row):
            if lab == "_id":
                continue
            if lab.endswith("[]"):
                base = lab[:-2]
                vals = cells.setdefault((rid, lab), [])
                if val is not None:
                    for v in str(val).split(","):
                        if v not in vals:
                            vals.append(v)
                continue
            if "[" in lab:
                base, sub = lab[: lab.index("[")], lab[lab.index("[") + 1 : -1]
                bracket_rows.setdefault(base, {})
                if val is not None:
                    node = bracket_rows[base]
                    parts = sub.split(".")
                    for p in parts[:-1]:
                        node = node.setdefault(p, {})
                    node[parts[-1]] = val
                continue
            vals = cells.setdefault((rid, lab), [])
            if val is not None and val not in vals:
                vals.append(val)
        for base, obj in bracket_rows.items():
            cells.setdefault((rid, base + "[#]"), []).append(obj)

    out = {}
    for rid, doc in docs.items():
        body: dict = {}
        for lab in labels:
            if lab == "_id":
                continue
            if lab.endswith("[]"):
                base, key = lab[:-2], (rid, lab)
            elif "[" in lab:
                base, key = lab[: lab.index("[")], (rid, lab[: lab.index("[")] + "[#]")
                if _bracket_done(body, base):
                    continue
                set_path_parts(body, base.split("."), cells.get(key, []))
                continue
            else:
                base, key = lab, (rid, lab)
            vals = cells.get(key, [])
            if len(vals) == 0:
                v = None if not ignore_null else _OMIT
            elif len(vals) == 1:
                v = vals[0]
            else:
                v = vals
            parts = base.split(".")
            if v is not _OMIT:
                set_path_parts(body, parts, v)
            elif len(parts) > 1:
                # ignore_null drops the leaf but interior objects still
                # materialize as {} (PlainIndexableObject.java:182-192)
                node = body
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
        out[rid] = body
    return out


_OMIT = object()


def set_path_parts(node, parts, val):
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = val


def _bracket_done(body, base):
    node = body
    for p in base.split("."):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


# ---------------- strategies ----------------

_seg = st.sampled_from(["a", "b", "c", "d"])
_val = st.one_of(st.none(), st.sampled_from(["x", "y", "z1", "hello world", "0.5"]))
_seqval = st.one_of(st.none(), st.sampled_from(["p", "p,q", "q,r,s"]))


@st.composite
def label_sets(draw):
    """2-4 scalar dot-path labels with non-overlapping leaves, optionally a
    [] sequence and a 2-field bracket group."""
    n_scalar = draw(st.integers(1, 3))
    labels, used = ["_id"], set()
    for i in range(n_scalar):
        depth = draw(st.integers(1, 3))
        parts = [draw(_seg) for _ in range(depth - 1)] + [f"leaf{i}"]
        lab = ".".join(parts)
        prefixes = {".".join(parts[: j + 1]) for j in range(len(parts))}
        if prefixes & used:
            continue
        used |= prefixes
        labels.append(lab)
    if draw(st.booleans()):
        labels.append("tags[]")
    if draw(st.booleans()):
        labels.append("items[k1]")
        labels.append("items[k2]")
    return labels


@st.composite
def tables(draw):
    labels = draw(label_sets())
    n_rows = draw(st.integers(1, 6))
    ids = [str(draw(st.integers(1, 3))) for _ in range(n_rows)]
    ids.sort()  # the reference requires ORDER BY _id (README.md:490)
    rows = []
    for rid in ids:
        row = []
        for lab in labels:
            if lab == "_id":
                row.append(rid)
            elif lab.endswith("[]"):
                row.append(draw(_seqval))
            else:
                row.append(draw(_val))
        rows.append(tuple(row))
    return labels, rows


# ---------------- the property ----------------


@pytest.mark.slow
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tables(), st.booleans())
def test_fold_matches_model(spark, table, ignore_null):
    labels, rows = table
    data = [tuple([i] + list(r)) for i, r in enumerate(rows)]
    schema = ", ".join(["_seq long"] + [f"`{c}` string" for c in labels])
    df = spark.createDataFrame(data, schema)
    got = {
        r["_id"]: json.loads(r["doc"])
        for r in fold_documents(df, labels, "_seq", ignore_null=ignore_null).collect()
    }
    want = model_fold(labels, rows, ignore_null)
    assert got.keys() == want.keys()
    for rid in want:
        assert got[rid] == _normalize(want[rid], ignore_null), (
            f"id={rid} labels={labels} rows={rows}"
        )


def _normalize(node, ignore_null):
    """Model -> expected JSON: bracket row objects always render as arrays;
    empty bracket-row objects render as {} entries."""
    if isinstance(node, dict):
        return {k: _normalize(v, ignore_null) for k, v in node.items()}
    if isinstance(node, list):
        return [_normalize(v, ignore_null) for v in node]
    return node
