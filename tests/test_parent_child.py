"""ES terms_set + parent/child join queries (terms_set_df / has_child_df /
has_parent_df) on both reader tiers.

terms_set: per-doc minimum_should_match read from a metadata field
(minimum_should_match_field) or computed by a Catalyst expression
(minimum_should_match_script analogue); matched counts DISTINCT supplied
terms present (ES set semantics on keyword arrays).

has_child / has_parent: the ES join-field queries — children reference
parents through a metadata FK column (the shape the reference's
row->document fold produces from repeated column labels,
ColumnSource.java row->doc mapping); score_mode folds child scores.

Live tier: upserts must qualify by their NEWEST version and deleted
docs/parents must drop out immediately.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_jdbc_spark.index import (
    IncrementalIndexReader,
    IndexBuilder,
    IndexReader,
    apply_incremental,
)

SCHEMA = (
    "repo string, path string, commit string, lang string, content string,"
    " tags array<string>, req long, parent string"
)

# parents p0/p1/p2 (parent=NULL); children point at them by path
DOCS = [
    ("r", "p0", "c", "t", "root zero corpus", ["red"], 1, None),
    ("r", "p1", "c", "t", "root one corpus", ["red", "blue"], 2, None),
    ("r", "p2", "c", "t", "root two alpha", ["blue"], 1, None),
    ("r", "k0", "c", "t", "alpha beta gamma", ["red", "blue", "green"], 2, "p0"),
    ("r", "k1", "c", "t", "alpha beta", ["red"], 1, "p0"),
    ("r", "k2", "c", "t", "alpha alpha delta", ["green", "blue"], 2, "p1"),
    ("r", "k3", "c", "t", "gamma delta", ["red", "green"], 3, "p1"),
    ("r", "k4", "c", "t", "beta beta beta", [], 1, "p2"),
    ("r", "k5", "c", "t", "epsilon zeta", ["blue"], 1, "orphan"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pc") / "idx")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _paths(spark, idx, rows, col="doc_id"):
    m = {
        r["doc_id"]: r["path"]
        for r in spark.read.parquet(f"{idx}/docs").select("doc_id", "path").collect()
    }
    return sorted(m[r[col]] for r in rows)


# ---------------- terms_set ----------------


def test_terms_set_msm_field(spark, idx):
    r = IndexReader(spark, idx)
    out = r.terms_set_df("tags", ["red", "blue"], msm_field="req").collect()
    # matched(tags ∩ {red,blue}) >= req:
    # p0 1>=1, p1 2>=2, p2 1>=1, k0 2>=2, k1 1>=1, k2 1<2, k3 1<3,
    # k4 0<1, k5 1>=1
    assert _paths(spark, idx, out) == ["k0", "k1", "k5", "p0", "p1", "p2"]
    got = {r2["matched"] for r2 in out}
    assert got <= {1, 2}


def test_terms_set_set_semantics(spark, idx):
    # duplicate supplied terms count once (array_intersect dedups)
    r = IndexReader(spark, idx)
    a = {x["doc_id"]: x["matched"] for x in r.terms_set_df("tags", ["red", "red", "blue"], msm_field="req").collect()}
    b = {x["doc_id"]: x["matched"] for x in r.terms_set_df("tags", ["red", "blue"], msm_field="req").collect()}
    assert a == b


def test_terms_set_msm_sql(spark, idx):
    r = IndexReader(spark, idx)
    out = r.terms_set_df(
        "tags", ["red", "green"], msm_sql="CASE WHEN parent IS NULL THEN 1 ELSE 2 END"
    ).collect()
    # parents need 1 of {red,green}: p0 ✓, p1 ✓ (red), p2 ✗ (blue only)
    # children need 2: k0 ✓ (red,green), k3 ✓ (red,green); k1/k2 have 1
    assert _paths(spark, idx, out) == ["k0", "k3", "p0", "p1"]


def test_terms_set_errors(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError):
        r.terms_set_df("tags", ["red"])  # neither msm arg
    with pytest.raises(ValueError):
        r.terms_set_df("tags", ["red"], msm_field="req", msm_sql="1")
    with pytest.raises(ValueError):
        r.terms_set_df("tags", [], msm_field="req")
    with pytest.raises(ValueError):
        r.terms_set_df("nope", ["red"], msm_field="req")


# ---------------- has_child ----------------


def test_has_child_counts(spark, idx):
    r = IndexReader(spark, idx)
    out = r.has_child_df("alpha", parent_field="parent", id_field="path").collect()
    # alpha matches k0,k1 (p0), k2 (p1), and parent p2 itself (not a child)
    m = {x["doc_id"]: x["n_children"] for x in out}
    by_path = {
        rr["path"]: m[rr["doc_id"]]
        for rr in spark.read.parquet(f"{idx}/docs").select("doc_id", "path").collect()
        if rr["doc_id"] in m
    }
    assert by_path == {"p0": 2, "p1": 1}


def test_has_child_min_max_children(spark, idx):
    r = IndexReader(spark, idx)
    two = r.has_child_df("alpha", "parent", "path", min_children=2).collect()
    assert _paths(spark, idx, two) == ["p0"]
    one = r.has_child_df("alpha", "parent", "path", max_children=1).collect()
    assert _paths(spark, idx, one) == ["p1"]


def test_has_child_score_modes(spark, idx):
    r = IndexReader(spark, idx)
    scores = {x["doc_id"]: x["score"] for x in r.match_df("alpha beta").collect()}
    docs = {x["doc_id"]: (x["path"], x["parent"]) for x in spark.read.parquet(f"{idx}/docs").select("doc_id", "path", "parent").collect()}
    per_parent: dict[str, list[float]] = {}
    for d, s in scores.items():
        pref = docs[d][1]
        if pref in ("p0", "p1", "p2"):
            per_parent.setdefault(pref, []).append(s)
    for mode, fold in (
        ("sum", sum),
        ("max", max),
        ("min", min),
        ("avg", lambda v: sum(v) / len(v)),
    ):
        out = r.has_child_df("alpha beta", "parent", "path", score_mode=mode).collect()
        got = {docs[x["doc_id"]][0]: x["score"] for x in out}
        want = {p: fold(v) for p, v in per_parent.items()}
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], rel=1e-9)
    none = r.has_child_df("alpha beta", "parent", "path").collect()
    assert {x["score"] for x in none} == {0.0}


def test_has_child_validation(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError):
        r.has_child_df("alpha", "parent", "path", score_mode="prod")
    with pytest.raises(ValueError):
        r.has_child_df("alpha", "parent", "path", min_children=0)
    with pytest.raises(ValueError):
        r.has_child_df("alpha", "nope", "path")


# ---------------- has_parent ----------------


def test_has_parent(spark, idx):
    r = IndexReader(spark, idx)
    # parents matching "root corpus": p0, p1 (p2 says alpha, still has root)
    out = r.has_parent_df("corpus", "parent", "path").collect()
    assert _paths(spark, idx, out) == ["k0", "k1", "k2", "k3"]
    assert {x["score"] for x in out} == {0.0}


def test_has_parent_score_passthrough(spark, idx):
    r = IndexReader(spark, idx)
    pscores = {x["doc_id"]: x["score"] for x in r.match_df("root corpus").collect()}
    docs = {x["path"]: x["doc_id"] for x in spark.read.parquet(f"{idx}/docs").select("doc_id", "path").collect()}
    out = r.has_parent_df("root corpus", "parent", "path", score=True).collect()
    by_doc = {x["doc_id"]: x["score"] for x in out}
    rev = {v: k for k, v in docs.items()}
    for d, s in by_doc.items():
        child_path = rev[d]
        parent_path = dict((c[1], c[7]) for c in DOCS)[child_path]
        assert s == pytest.approx(pscores[docs[parent_path]], rel=1e-9)


# ---------------- live tier ----------------


@pytest.fixture()
def live(spark, tmp_path):
    d = str(tmp_path / "live")
    IndexBuilder(spark, d, partitions=2).build(
        spark.createDataFrame(DOCS, SCHEMA), resume=False
    )
    return d


def _live_paths(r: IncrementalIndexReader, rows):
    m = {
        (x["segment"], x["doc_id"]): x["path"]
        for x in r.live_docs().select("segment", "doc_id", "path").collect()
    }
    return sorted(m[(x["segment"], x["doc_id"])] for x in rows)


def test_live_terms_set_upsert_delete(spark, live):
    # upsert k1's tags away from red; delete p1
    ops = spark.createDataFrame(
        [
            ("r", "k1", "c", "t", "alpha beta", ["green"], 1, "p0", "update"),
            ("r", "p1", "c", "t", "", [], 0, None, "delete"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, live, ops)
    r = IncrementalIndexReader(spark, live)
    out = r.terms_set_df("tags", ["red", "blue"], msm_field="req").collect()
    # k1 no longer has red (newest version wins); p1 deleted
    assert _live_paths(r, out) == ["k0", "k5", "p0", "p2"]


def test_live_has_child_and_parent(spark, live):
    ops = spark.createDataFrame(
        [
            # delete child k1 -> p0 alpha count drops to 1
            ("r", "k1", "c", "t", "", [], 0, None, "delete"),
            # delete parent p1 -> its children lose has_parent
            ("r", "p1", "c", "t", "", [], 0, None, "delete"),
            # new child of p2 matching alpha
            ("r", "k6", "c", "t", "alpha omega", ["red"], 1, "p2", "create"),
        ],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, live, ops)
    r = IncrementalIndexReader(spark, live)
    out = r.has_child_df("alpha", "parent", "path").collect()
    m = {
        (x["segment"], x["doc_id"]): x["path"]
        for x in r.live_docs().select("segment", "doc_id", "path").collect()
    }
    counts = {m[(x["segment"], x["doc_id"])]: x["n_children"] for x in out}
    # k1 deleted (p0 down to k0), p1 deleted (NOT a live parent despite k2
    # still matching), k6 is a fresh live child of p2
    assert counts == {"p0": 1, "p2": 1}
    hp = r.has_parent_df("corpus", "parent", "path").collect()
    # corpus matches p0 only now (p1 deleted); children of p0: k0 (k1 deleted)
    assert _live_paths(r, hp) == ["k0"]


# ---------------- ids / parent_id (the point-lookup variants) ----------------


def test_ids_query(spark, idx):
    r = IndexReader(spark, idx)
    out = r.ids_df(["p0", "k3", "missing"]).collect()
    assert _paths(spark, idx, out) == ["k3", "p0"]
    assert {x["score"] for x in out} == {0.0}
    with pytest.raises(ValueError):
        r.ids_df([])
    with pytest.raises(ValueError):
        r.ids_df(["p0"], id_field="nope")


def test_parent_id_query(spark, idx):
    r = IndexReader(spark, idx)
    out = r.parent_id_df("p1")
    assert _paths(spark, idx, out.collect()) == ["k2", "k3"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(parent), EqualTo(parent,p1)]" in plan


def test_live_ids_and_parent_id(spark, live):
    ops = spark.createDataFrame(
        [("r", "k1", "c", "t", "", [], 0, None, "delete")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, live, ops)
    r = IncrementalIndexReader(spark, live)
    assert _live_paths(r, r.ids_df(["k1", "k2"]).collect()) == ["k2"]
    assert _live_paths(r, r.parent_id_df("p0").collect()) == ["k0"]


# ---------------- DSL leaves over the join/metadata surfaces ----------------


def test_dsl_terms_set_leaf(spark, idx):
    from elasticsearch_jdbc_spark.index import IndexReader

    r = IndexReader(spark, idx)
    body = {"terms_set": {"tags": {
        "terms": ["red", "blue"], "minimum_should_match_field": "req",
        "boost": 3.0,
    }}}
    out = r.search_dsl_df(body, k=None).collect()
    want = {x["doc_id"] for x in r.terms_set_df("tags", ["red", "blue"], msm_field="req").collect()}
    assert {x["doc_id"] for x in out} == want
    assert {x["score"] for x in out} == {3.0}
    # script form routes to msm_sql
    body2 = {"terms_set": {"tags": {
        "terms": ["red", "green"],
        "minimum_should_match_script": {
            "source": "CASE WHEN parent IS NULL THEN 1 ELSE 2 END"},
    }}}
    got2 = {x["doc_id"] for x in r.search_dsl_df(body2, k=None).collect()}
    want2 = {x["doc_id"] for x in r.terms_set_df(
        "tags", ["red", "green"],
        msm_sql="CASE WHEN parent IS NULL THEN 1 ELSE 2 END").collect()}
    assert got2 == want2


def test_dsl_has_child_has_parent_leafs(spark, idx):
    from elasticsearch_jdbc_spark.index import IndexReader

    r = IndexReader(spark, idx)
    body = {"has_child": {
        "query": {"match": {"content": "alpha"}},
        "parent_field": "parent", "id_field": "path",
        "score_mode": "sum",
    }}
    got = {x["doc_id"]: x["score"] for x in r.search_dsl_df(body, k=None).collect()}
    want = {x["doc_id"]: x["score"] for x in r.has_child_df(
        "alpha", "parent", "path", score_mode="sum").collect()}
    assert got == pytest.approx(want) and got
    # plain-string inner query accepted; non-match inner rejected
    got2 = {x["doc_id"] for x in r.search_dsl_df(
        {"has_child": {"query": "alpha", "parent_field": "parent",
                       "id_field": "path"}}, k=None).collect()}
    assert got2 == set(want)
    with pytest.raises(ValueError, match="match only"):
        r.search_dsl_df({"has_child": {
            "query": {"term": {"lang": "t"}},
            "parent_field": "parent", "id_field": "path"}}, k=None)
    bodyp = {"has_parent": {
        "query": {"match": {"content": "alpha"}},
        "parent_field": "parent", "id_field": "path", "score": True,
    }}
    gotp = {x["doc_id"]: x["score"] for x in r.search_dsl_df(bodyp, k=None).collect()}
    wantp = {x["doc_id"]: x["score"] for x in r.has_parent_df(
        "alpha", "parent", "path", score=True).collect()}
    assert gotp == pytest.approx(wantp) and gotp


def test_dsl_distance_feature_leaf(spark, idx):
    from elasticsearch_jdbc_spark.index import IndexReader

    r = IndexReader(spark, idx)
    out = {x["doc_id"]: x["score"] for x in r.search_dsl_df(
        {"distance_feature": {"field": "req", "origin": 2, "pivot": 1,
                              "boost": 4.0}}, k=None).collect()}
    docs = {x["doc_id"]: x["req"] for x in
            spark.read.parquet(f"{idx}/docs").collect()}
    assert set(out) == set(docs)
    for i, req in docs.items():
        assert out[i] == pytest.approx(4.0 * 1.0 / (1.0 + abs(req - 2)))
    with pytest.raises(ValueError, match="metadata column"):
        r.search_dsl_df({"distance_feature": {
            "field": "nope", "origin": 0, "pivot": 1}}, k=None)
    with pytest.raises(ValueError, match="pivot"):
        r.search_dsl_df({"distance_feature": {
            "field": "req", "origin": 0, "pivot": 0}}, k=None)


# ---------------------------------------------------------------- aggs


def test_children_agg_body(spark, idx):
    """ES `children` aggregation: the body switches context from the
    query-scoped PARENT docs to their child docs; sub-aggs count and
    aggregate CHILD rows (the ES contract). Scope 'corpus' -> p0, p1;
    their children k0..k3 bucket by parent with avg(req)."""
    r = IndexReader(spark, idx)
    out = r.aggs_dsl_df(
        {"kids": {"children": {}, "aggs": {
            "by_parent": {"terms": {"field": "parent", "size": 10},
                          "aggs": {"avg_req": {"avg": {"field": "req"}}}},
        }}},
        query={"term": {"content": "corpus"}},
    ).collect()
    got = {
        x["by_parent"]: (
            x["kids"], x["kids_doc_count"], x["by_parent_doc_count"],
            x["avg_req"],
        )
        for x in out
    }
    assert got == {
        "p0": ("children", 4, 2, 1.5),
        "p1": ("children", 4, 2, 2.5),
    }


def test_parent_agg_body(spark, idx):
    """ES `parent` aggregation: context switches to the DISTINCT parent
    docs the scoped rows reference. Scope 'alpha' -> {p2, k0, k1, k2};
    refs {p0, p1} -> 2 parent docs."""
    r = IndexReader(spark, idx)
    out = r.aggs_dsl_df(
        {"par": {"parent": {}, "aggs": {
            "n_req": {"value_count": {"field": "req"}},
        }}},
        query={"term": {"content": "alpha"}},
    ).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["par"], row["par_doc_count"], row["n_req"]) == ("parent", 2, 2)


def test_children_parent_agg_guards(spark, idx):
    r = IndexReader(spark, idx)
    with pytest.raises(ValueError, match="top-level"):
        r.aggs_dsl_df({"t": {"terms": {"field": "parent"}, "aggs": {
            "kids": {"children": {}, "aggs": {
                "n": {"value_count": {"field": "req"}}}}}}})
    with pytest.raises(ValueError, match="join column"):
        r.aggs_dsl_df({"kids": {"children": {"parent_field": "nope"},
                                "aggs": {"n": {"value_count":
                                               {"field": "req"}}}}})


def test_children_agg_live_tier(spark, idx, tmp_path):
    """Live tier: deleting a parent removes its children from the
    children context (the scoped parent set no longer contains it)."""
    import shutil

    d = str(tmp_path / "live")
    shutil.copytree(idx, d)
    body = {"kids": {"children": {}, "aggs": {
        "by_parent": {"terms": {"field": "parent", "size": 10}},
    }}}
    r0 = IncrementalIndexReader(spark, d)
    got0 = {
        x["by_parent"]: x["by_parent_doc_count"]
        for x in r0.aggs_dsl_df(
            body, query={"term": {"content": "corpus"}}).collect()
    }
    assert got0 == {"p0": 2, "p1": 2}
    ops = spark.createDataFrame(
        [("r", "p1", "c", "t", "", None, None, None, "delete")],
        SCHEMA + ", _optype string",
    )
    apply_incremental(spark, d, ops)
    r1 = IncrementalIndexReader(spark, d)
    got1 = {
        x["by_parent"]: x["by_parent_doc_count"]
        for x in r1.aggs_dsl_df(
            body, query={"term": {"content": "corpus"}}).collect()
    }
    assert got1 == {"p0": 2}
