#!/usr/bin/env python
"""Dump .explain("formatted") for a list of registered queries into
plans/r14/<query>_<suffix>.txt — the before/after plan evidence for the
r14 optimization round (guide §1.1: capture the plan shape before and
after every change).

Usage: python scripts/dump_plans_r14.py before|after [names ...]
Default name list = the r14 touch list below.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r14")

# Queries examined/touched in the r14 optimization round.
TOUCH_LIST = [
    # r14 touched queries
    "rfm_segments",
    "snm_candidate_pairs",
    "snm_blocking_eval",
    "supplier_entity_clusters",
    "ann_probe_sweep",
    "quality_filter_kappa",
    "nb_crossval_accuracy",
    "nb_lang_confusion",
    "neardup_kcore",
    "neardup_centrality_quantized",
    "neardup_hub_distances",
    "bpe_merge_table",
    "customer_decile_mobility",
]


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or TOUCH_LIST
    os.makedirs(OUT, exist_ok=True)

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

    for name in names:
        try:
            df = REGISTRY[name].builder(spark, SF)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
