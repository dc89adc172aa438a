"""Row -> document fold: the reference's core operator, Spark-native.

The reference folds consecutive same-`_id` JDBC rows into one JSON document,
promoting colliding scalars to de-duplicated multi-value cells and building
nested objects from dot/bracket column labels
(PlainKeyValueStreamListener.java:132-352, Values.java:43-94,
PlainIndexableObject.java:123-217). Its fold depends on cursor order; Spark's
groupBy is unordered, so adjacency is made explicit with an ordering column
and `sort_array` / `array_sort` — same observable semantics, shuffle-safe
and scale-independent.

Everything here is built from JVM-side built-ins (struct/collect_list/
to_json) — no Python in the hot path, so the fold runs inside whole-stage
codegen except the final shuffle for groupBy(doc key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Control keys (reference ControlKeys.java:27-29): routing metadata carried
# beside the document body, never inside it.
CONTROL_KEYS = (
    "_optype", "_index", "_type", "_id", "_version", "_timestamp",
    "_ttl", "_routing", "_parent", "_source", "_job",
)


def fold_rows(
    df: DataFrame,
    id_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Group-adjacent fold: one output row per id, each value column becomes
    a de-duplicated multi-value array in first-encounter order.

    Mirrors Values.java append-with-dedup: repeated keys append, duplicates
    collapse, a lone null stays null, null never joins a non-empty list
    (Values.java:80-92). Order is made explicit by `order_col` (the
    reference requires ORDER BY _id in the SQL, README.md:490).
    """
    aggs = []
    for c in value_cols:
        # collect (order, value) pairs, sort by order, project value, dedup
        # keeping first occurrence; nulls dropped by collect_list itself
        # (matching "a null never joins a list").
        pair = F.struct(F.col(order_col).alias("o"), F.col(c).alias("v"))
        arr = F.array_distinct(
            F.transform(
                F.array_sort(F.collect_list(F.when(F.col(c).isNotNull(), pair))),
                lambda s: s["v"],
            )
        )
        aggs.append(arr.alias(c))
    return df.groupBy(*id_cols).agg(*aggs)


def render_cell(col: str) -> Column:
    """Render a folded multi-value cell like the reference does
    (Values.java:161-176): 0 values -> null, 1 value -> scalar, else array.
    Output as a JSON fragment string for engine-portable comparison."""
    c = F.col(col)
    # '["v"]' minus the enclosing brackets -> the scalar JSON fragment
    scalar = F.expr(f"substring(to_json(slice({col}, 1, 1)), 2, length(to_json(slice({col}, 1, 1))) - 2)")
    return (
        F.when(F.size(c) == 0, F.lit(None))
        .when(F.size(c) == 1, scalar)
        .otherwise(F.to_json(c))
        .alias(col)
    )


def nested_doc(df: DataFrame, paths: dict[str, str | Column]) -> DataFrame:
    """Dot-path nesting (label `a.b.c` -> {"a":{"b":{"c":v}}}), reference
    PlainKeyValueStreamListener.merge (README.md:493-532).

    paths: flat label -> source column. Builds one `doc` JSON column; field
    order is insertion order of `paths` (LinkedHashMap semantics,
    PlainIndexableObject.java:33-49).
    """
    root: dict = {}
    for label, src in paths.items():
        parts = label.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = F.col(src) if isinstance(src, str) else src

    def build(node) -> Column:
        if isinstance(node, dict):
            return F.struct(*[build(v).alias(k) for k, v in node.items()])
        return node

    return df.withColumn("doc", F.to_json(build(root)))


def ignore_nulls(df: DataFrame, cols: list[str]) -> DataFrame:
    """ignore_null_values: rows whose every value column is null are dropped,
    remaining nulls excluded from rendered docs
    (PlainIndexableObject.java:151-155,182-192)."""
    cond = None
    for c in cols:
        k = F.col(c).isNotNull()
        cond = k if cond is None else (cond | k)
    return df.filter(cond)


def route_optype(df: DataFrame, optype_col: Column) -> DataFrame:
    """Optype router (SinkKeyValueStreamListener.java:57-77): tag each doc
    index/create/update/delete; downstream writers partition on it. Unknown
    optypes fall back to 'index' (reference default optype,
    PlainKeyValueStreamListener.java:205-229)."""
    valid = F.array(*[F.lit(x) for x in ("index", "create", "update", "delete")])
    return df.withColumn(
        "_optype",
        F.when(F.array_contains(valid, optype_col), optype_col).otherwise(F.lit("index")),
    )
