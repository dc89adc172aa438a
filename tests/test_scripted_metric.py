"""ES scripted_metric analogue: map/combine/reduce over partitions (shards)
with the coordinator reduce on the driver — partition-count invariance is
the contract (same caveat ES documents for its shard states)."""

from __future__ import annotations

import pytest

from elasticsearch_jdbc_spark.operators.scripted import (
    scripted_metric,
    scripted_metric_by,
)


def _fns():
    """Closures pickle by VALUE (tests aren't an importable module on
    executors — the same reason user scripts pass lambdas/closures)."""

    def _map(state, pdf):
        state["s"] = state.get("s", 0.0) + float((pdf["v"] ** 2).sum())
        state["n"] = state.get("n", 0) + len(pdf)

    def _combine(state):
        return state

    def _reduce(partials):
        return {
            "sumsq": sum(p.get("s", 0.0) for p in partials),
            "n": sum(p.get("n", 0) for p in partials),
        }

    return _map, _combine, _reduce


_map, _combine, _reduce = _fns()


def test_ungrouped_partition_invariant(spark):
    rows = [(i, float(i % 17)) for i in range(1000)]
    want = {"sumsq": sum(v * v for _, v in rows), "n": 1000}
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "id long, v double").repartition(parts)
        assert scripted_metric(df, _map, _combine, _reduce) == want


def test_empty_and_init(spark):
    df = spark.createDataFrame([], "id long, v double").repartition(4)
    # empty partitions combine their init state, like empty ES shards
    assert scripted_metric(df, _map, _combine, _reduce) == {"sumsq": 0.0, "n": 0}
    # init_fn seeds per-shard state (the ES init_script)
    got = scripted_metric(
        spark.createDataFrame([(1, 2.0)], "id long, v double").coalesce(1),
        _map,
        _combine,
        _reduce,
        init_fn=lambda: {"s": 100.0, "n": 0},
    )
    assert got == {"sumsq": 104.0, "n": 1}


def test_grouped(spark):
    rows = [(["a", "b"][i % 2], float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: (r["sumsq"], r["n"])
        for r in scripted_metric_by(
            df, ["g"], _map, _combine, _reduce, "sumsq double, n bigint"
        ).collect()
    }
    want = {}
    for g, v in rows:
        s, n = want.get(g, (0.0, 0))
        want[g] = (s + v * v, n + 1)
    assert out == want
    with pytest.raises(ValueError, match="group_cols"):
        scripted_metric_by(df, [], _map, _combine, _reduce, "n bigint")
