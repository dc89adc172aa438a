#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 on Spark AND its oracle_sql() twin on DuckDB, compare
row count, schema (column names), and an order-insensitive value hash
with columns sorted by name — the same comparison CORRECTNESS_r{N}.json
records. Run this before a round ends so the driver file lands clean.

Usage: python scripts/correctness_dryrun.py [name ...]   # default: all
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v):
    """Stringify a cell the way a driver-side hash plausibly would:
    floats rounded to 6 significant decimals, NaN/None unified, nested
    structures JSON-ified deterministically."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb

    import __spark_entry__ as e
    from elasticsearch_jdbc_spark.session import get_spark

    spark = get_spark("dryrun", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    qs, osql = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"sec": None}
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            rec["rows"] = len(rows)
            rec["cols"] = sorted(cols)
            if name in osql:
                odf = con.execute(osql[name]).fetchdf()
                ocols = list(odf.columns)
                orows = [tuple(r) for r in odf.itertuples(index=False)]
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(rows) == len(orows)
                rec["schema_match"] = sorted(cols) == sorted(ocols)
                rec["hash_match"] = value_hash(cols, rows) == value_hash(
                    ocols, orows
                )
                rec["status"] = (
                    "pass"
                    if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                    else "MISMATCH"
                )
            else:
                rec["status"] = "rows_only"
        except Exception as ex:  # noqa: BLE001 — harness surface
            rec["status"] = "ERROR"
            rec["error"] = f"{type(ex).__name__}: {ex}"[:300]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        flag = rec["status"]
        print(f"{flag:>9}  {rec['sec']:>7.2f}s  {name}", flush=True)
    bad = {k: v for k, v in results.items() if v["status"] in ("MISMATCH", "ERROR")}
    print(f"\n{len(results)} run, {len(bad)} bad")
    if bad:
        print(json.dumps(bad, indent=2, default=str))
    with open("/tmp/correctness_dryrun.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
