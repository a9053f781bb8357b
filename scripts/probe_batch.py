#!/usr/bin/env python
"""Batch in-JVM probe: run a list of registered queries bench-style (one
untimed warm-up + N timed noop runs, clearCache between) in ONE JVM and
print one JSON line per query. Approximates the bench's in-suite warmth
while isolating a code toggle (env var) across two invocations.

Usage: python scripts/probe_batch.py name1 name2 ... [--runs N]
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from spark_streaming_project_spark.plans import REGISTRY
    from spark_streaming_project_spark.session import get_spark

    spark = get_spark(app_name="probe_batch")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.names:
        def run_once() -> float:
            t0 = time.perf_counter()
            REGISTRY[name].builder(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        warm = run_once()
        spark.catalog.clearCache()
        runs = []
        for _ in range(args.runs):
            runs.append(round(run_once(), 3))
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "warm": round(warm, 3), "runs": runs}),
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
