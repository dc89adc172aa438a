"""adjacency_matrix / geotile_grid / matrix_stats aggregations: brute
parity on small frames, edge handling, guards."""

from __future__ import annotations

import math

import pytest

from elasticsearch_jdbc_spark.index.aggs import (
    adjacency_matrix,
    geotile_grid,
    matrix_stats,
)


def test_adjacency_matrix(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (10, "a"), (11, "c")],
        "v long, g string",
    )
    got = {
        r["key"]: r["doc_count"]
        for r in adjacency_matrix(
            df, {"small": "v < 10", "ga": "g = 'a'", "odd": "v % 2 = 1"}
        ).collect()
    }
    assert got == {
        "small": 3, "ga": 3, "odd": 3,
        "ga&small": 2, "ga&odd": 1, "odd&small": 2,
    }
    # zero-count intersections omitted
    got2 = adjacency_matrix(df, {"none": "v > 99", "ga": "g = 'a'"}).collect()
    assert {r["key"] for r in got2} == {"ga"}
    with pytest.raises(ValueError, match="at least one"):
        adjacency_matrix(df, {})


def _tile(lat, lon, z):
    lat = max(-85.05112878, min(85.05112878, lat))
    n = 2 ** z
    x = min(int(math.floor((lon + 180.0) / 360.0 * n)), n - 1)
    r = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(r) + 1.0 / math.cos(r)) / math.pi) / 2.0 * n)
    y = min(max(int(y), 0), n - 1)
    return f"{z}/{x}/{y}"


def test_geotile_grid(spark):
    pts = [
        (0.0, 0.0), (51.5, -0.1), (51.5, -0.1), (-33.8, 151.2),
        (89.9, 10.0),   # clamps into the top row
        (12.0, 180.0),  # x clamps to n-1
        (None, 5.0),    # null dropped
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = {r["key"]: r["doc_count"] for r in geotile_grid(df, precision=4).collect()}
    want: dict[str, int] = {}
    for lat, lon in pts:
        if lat is None:
            continue
        k = _tile(lat, lon, 4)
        want[k] = want.get(k, 0) + 1
    assert got == want
    assert got[_tile(51.5, -0.1, 4)] == 2
    with pytest.raises(ValueError, match="precision"):
        geotile_grid(df, precision=30)


def test_matrix_stats(spark):
    xs = [1.0, 2.0, 3.0, 4.0]
    ys = [2.0, 4.0, 6.0, 9.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    rows = {(r["field_a"], r["field_b"]): r for r in matrix_stats(df, ["x", "y"]).collect()}
    mx = sum(xs) / 4
    my = sum(ys) / 4
    var_x = sum((v - mx) ** 2 for v in xs) / 4
    cov = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / 4
    var_y = sum((v - my) ** 2 for v in ys) / 4
    corr = cov / math.sqrt(var_x * var_y)
    d = rows[("x", "x")]
    assert d["count"] == 4 and d["mean_a"] == round(mx, 6)
    assert d["variance_a"] == round(var_x, 6) and d["correlation"] == 1.0
    p = rows[("x", "y")]
    assert p["covariance"] == round(cov, 6)
    assert p["correlation"] == pytest.approx(round(corr, 6), abs=1e-6)
    with pytest.raises(ValueError, match="at least two"):
        matrix_stats(df, ["x"])


def test_frequent_item_sets(spark):
    """ES frequent_item_sets (exact deterministic variant): k-subset
    counts vs itertools brute force, min_support cut, dup-item rule."""
    import itertools as it

    import pytest as _pytest

    from elasticsearch_jdbc_spark.index.aggs import frequent_item_sets

    rows = [
        (["milk", "bread", "eggs"],),
        (["milk", "bread"],),
        (["milk", "bread", "milk"],),  # dup item counts once
        (["eggs", "jam"],),
        ([],),
        (None,),
    ]
    df = spark.createDataFrame(rows, "tags array<string>")
    got = [
        (r["items"], r["set_size"], r["doc_count"], r["support"])
        for r in frequent_item_sets(
            df, "tags", min_support=0.3, max_set_size=3, size=50
        ).collect()
    ]
    # brute force over the 6 rows (n includes empty/null docs)
    counts: dict = {}
    for (tags,) in rows:
        uniq = sorted(set(tags or []))
        for k in (1, 2, 3):
            for sub in it.combinations(uniq, k):
                counts[sub] = counts.get(sub, 0) + 1
    want = [
        ("|".join(s), len(s), c, round(c / 6.0, 6))
        for s, c in counts.items()
        if c >= 2  # ceil(0.3 * 6)
    ]
    want.sort(key=lambda x: (-x[2], x[0]))
    assert got == want
    # milk|bread pair must co-occur in 3 docs (dup counted once)
    assert ("bread|milk", 2, 3, 0.5) in got
    # guards
    with _pytest.raises(ValueError, match="max_set_size"):
        frequent_item_sets(df, "tags", max_set_size=4)
    with _pytest.raises(ValueError, match="min_support"):
        frequent_item_sets(df, "tags", min_support=0.0)


def test_ip_range(spark):
    """ES ip_range: explicit from/to (from-inclusive, to-exclusive) and
    CIDR masks, overlap allowed, malformed/NULL in no bucket."""
    import pytest as _pytest

    from elasticsearch_jdbc_spark.index.aggs import ip_range

    rows = [
        ("10.0.0.4",), ("10.0.200.1",), ("10.255.255.255",),
        ("11.0.0.0",), ("192.168.1.5",), ("192.168.1.255",),
        ("not-an-ip",), ("10.0.0.999",), (None,),
    ]
    df = spark.createDataFrame(rows, "ip string")
    got = {
        r["key"]: r["doc_count"]
        for r in ip_range(
            df,
            "ip",
            [
                {"mask": "10.0.0.0/8"},
                {"mask": "192.168.1.0/24", "key": "office"},
                {"from": "10.0.0.0", "to": "10.0.255.255"},
                {"to": "11.0.0.1", "key": "low"},
            ],
        ).collect()
    }
    assert got == {
        "10.0.0.0/8": 3,
        "office": 2,
        "10.0.0.0-10.0.255.255": 2,  # to-exclusive: .255.255 itself is out
        "low": 4,  # the three 10.* plus 11.0.0.0 (< 11.0.0.1)
    }
    with _pytest.raises(ValueError, match="at least one"):
        ip_range(df, "ip", [])
