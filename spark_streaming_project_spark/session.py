"""SparkSession factory.

The reference pins ``master=local[*]`` and ``spark.sql.shuffle.partitions=5``
(Consumer.scala:41-45) because its keyed state is tiny. Our engine targets a
multi-executor cluster: AQE owns runtime partition coalescing and skew-join
splitting, shuffle partitions default to the local core count for tests and
should be raised (or left to AQE) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "spark_streaming_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Scale posture (100 TB readiness):
      - AQE on: runtime shuffle coalescing, skew-join splitting, plan re-opt.
      - Arrow on: any Pandas-UDF boundary moves columnar batches, not rows.
      - UTC session timezone: deterministic event-time semantics everywhere
        (and parity with naive-UTC oracle engines).
      - broadcast threshold left at default 10 MB; dimension tables in the
        star schema (region/nation/supplier) broadcast automatically, and the
        plan builders additionally hint ``F.broadcast`` where the small side
        is known statically.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # r14 (guide §3.1/§9, VERDICT r13 ask #10): let the planner pick
        # shuffled-hash over sort-merge when its size conditions hold, and
        # let AQE rewrite SMJ -> SHJ at runtime when every post-shuffle
        # partition is under the advisory size (64m default). Scale-safe:
        # the choice stays size-driven at runtime (OOM risk is bounded by
        # the same advisory partition size AQE coalesces to); adjudicated
        # with paired same-JVM A/B probes + full-bench runs before
        # adoption (OPTIMIZATION_r14.md). SPARK_GRAFT_PREFER_SMJ=1
        # restores the sort-merge default (measurement toggle, same
        # pattern as SPARK_GRAFT_NO_SPREAD).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "true" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "1"
            else "false",
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "0" if os.environ.get("SPARK_GRAFT_PREFER_SMJ") == "1"
            else "64m",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
