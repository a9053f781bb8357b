#!/usr/bin/env python
"""Fresh-JVM steady-state probe for bench-mover adjudication.

Usage: python scripts/probe_query.py name [--sf DIR] [--runs N]

One query per JVM (run the script once per query): local[32], the bench
harness's shuffle partitions, one warm-up noop-sink run, then N timed
noop-sink runs with the cache cleared between runs. Prints one JSON line
with the warm-up and per-run wall times — the protocol BENCH_NOTES.md
records for every >1.5x-and->1s mover verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spark_streaming_project_spark.plans import REGISTRY

    def run_once() -> float:
        t0 = time.perf_counter()
        REGISTRY[args.name].builder(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    warmup = run_once()
    runs = [round(run_once(), 3) for _ in range(args.runs)]
    print(
        json.dumps(
            {
                "query": args.name,
                "sf": args.sf,
                "warmup_sec": round(warmup, 3),
                "runs_sec": runs,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
