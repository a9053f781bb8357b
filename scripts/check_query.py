#!/usr/bin/env python
"""Dev helper: driver-style oracle parity check for named queries.

Usage: python scripts/check_query.py name [name ...] [--sf DIR] [--show N]
Mimics the grading driver's compare (name-sorted columns, order-insensitive
rows, exact float repr) at sf0.01 by default.
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=0)
    ap.add_argument("--partitions", default="8")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", args.partitions)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_streaming_project_spark.plans import REGISTRY

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    bad = 0
    for name in args.names:
        q = REGISTRY[name]
        sdf = q.builder(spark, args.sf)
        srows, scols = sdf.collect(), sdf.columns
        if q.oracle is None:
            print(f"ROWSONLY {name} rows={len(srows)}")
            continue
        res = con.execute(q.oracle)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        do = sorted(range(len(dcols)), key=lambda i: dcols[i])
        a = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        b = sorted(tuple(canon(r[i]) for i in do) for r in drows)
        ok = sorted(scols) == sorted(dcols) and a == b
        print(("MATCH" if ok else "MISMATCH"), name, f"rows={len(a)}/{len(b)}")
        if not ok:
            bad += 1
            if sorted(scols) != sorted(dcols):
                print("  spark cols:", sorted(scols))
                print("  duck  cols:", sorted(dcols))
            diff_a = [r for r in a if r not in set(b)][: args.show or 5]
            diff_b = [r for r in b if r not in set(a)][: args.show or 5]
            print("  only-spark:", diff_a)
            print("  only-duck :", diff_b)
        elif args.show:
            print("  sample:", a[: args.show])
        spark.catalog.clearCache()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
