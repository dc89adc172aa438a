"""ES scripted_metric aggregation analogue: the map/combine/reduce custom-
metric harness (ScriptedMetricAggregationBuilder; reference README.md's ES
surface exposes it wherever aggregations run).

ES runs init_script once per shard, map_script per document, combine_script
per shard, and reduce_script once on the coordinator over the shard states.
Here a "shard" is a Spark partition (ungrouped) or a bucket (grouped), the
scripts are plain Python callables cloudpickle-shipped to executors, and the
coordinator reduce runs on the driver over the (tiny) combined partials —
the exact ES execution topology.

One deliberate, documented deviation: map_fn receives Arrow BATCHES (pandas
DataFrames) instead of single rows — the vectorized equivalent of "runs per
document". Row-at-a-time Python in the hot path is the one thing a 100 TB
pipeline cannot afford; a batch-wise map loses no expressiveness (iterate
the rows yourself if you must) and keeps the only Python stage in the plan
Arrow-batched.

Like ES itself documents, correctness requires combine/reduce to be
insensitive to shard count and document order: partitioning is not part of
the contract, so only order/partition-insensitive scripts (sums, maxes,
sketches, set unions) are reproducible — the same caveat as ES.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def scripted_metric(
    df: DataFrame,
    map_fn: Callable,
    combine_fn: Callable,
    reduce_fn: Callable,
    init_fn: Callable = dict,
):
    """Ungrouped scripted_metric: returns reduce_fn's value (the ES
    aggregation's `value`), a plain Python object.

    map_fn(state, batch_pdf) mutates state per Arrow batch;
    combine_fn(state) -> a picklable per-partition partial;
    reduce_fn(list_of_partials) -> the final value.

    Plan: ONE mapInPandas pass emits exactly one pickled partial per
    partition (empty partitions combine their init state, like an ES
    shard with no matching docs); only the partials — bytes, not rows —
    cross to the driver for the coordinator reduce. Cost: one scan, no
    shuffle, driver traffic O(partitions)."""
    out_schema = T.StructType([T.StructField("partial", T.BinaryType(), False)])

    def run_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = init_fn()
        for pdf in batches:
            map_fn(state, pdf)
        yield pd.DataFrame({"partial": [cloudpickle.dumps(combine_fn(state))]})

    partials = [
        cloudpickle.loads(bytes(r["partial"]))
        for r in df.mapInPandas(run_part, out_schema).collect()
    ]
    return reduce_fn(partials)


def scripted_metric_by(
    df: DataFrame,
    group_cols: list[str],
    map_fn: Callable,
    combine_fn: Callable,
    reduce_fn: Callable,
    value_schema: str,
    init_fn: Callable = dict,
) -> DataFrame:
    """Grouped scripted_metric (the agg nested under a terms bucket):
    returns a DataFrame (group_cols..., value fields per `value_schema`,
    a DDL string like 'sumsq double, n bigint'). reduce_fn must return a
    dict matching value_schema.

    Plan: one hash shuffle on the group key, then each bucket runs the
    full map -> combine -> reduce chain inside ONE applyInPandas call (a
    bucket is one 'shard', so reduce sees a single partial — the ES
    topology when a bucket's docs are co-located). Buckets must fit an
    executor's Arrow batch, the standard applyInPandas bound."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    gdefs = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*group_cols).schema.fields
    )
    schema = f"{gdefs}, {value_schema}"
    names = [f.name for f in T.StructType.fromDDL(schema).fields]

    def run_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        state = init_fn()
        map_fn(state, pdf)
        val = reduce_fn([combine_fn(state)])
        row = dict(zip(group_cols, key))
        row.update(val)
        return pd.DataFrame([{n: row[n] for n in names}])

    return df.groupBy(*group_cols).applyInPandas(run_group, schema)
