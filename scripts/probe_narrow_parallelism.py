#!/usr/bin/env python
"""r13 measurement probe (guide §1): is heavy narrow compute serialized?

At sf0.1 every input table is ONE small parquet file, so a scan is ONE
partition; any expensive interpreted-HOF pass that sits directly on the
scan (minhash signatures, CDC per-char hashing, shingling) then runs on a
single task regardless of core count. This probe measures the signature /
chunking passes with and without a pre-compute hash repartition and
reports the realized partition counts, to decide whether operators need
an explicit spread (guide §2.5 input skew: "one huge unsplittable file ...
repartition immediately after the read").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(tag, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    print(f"{tag:55s} {dt:7.3f}s  partitions={nparts}")
    return dt


if __name__ == "__main__":
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_streaming_project_spark.operators.chunking import cdc_chunks
    from spark_streaming_project_spark.operators.dedup import minhash_signatures

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # warm the JVM/scan
    docs.write.format("noop").mode("overwrite").save()

    for trial in range(2):
        print(f"--- trial {trial}")
        timed("minhash_signatures (as-is)", minhash_signatures(docs, "text", "doc_id"))
        timed(
            "minhash_signatures (repartition(col))",
            minhash_signatures(docs.repartition(F.col("doc_id")), "text", "doc_id"),
        )
        timed(
            f"minhash_signatures (repartition({n}, col))",
            minhash_signatures(docs.repartition(n, F.col("doc_id")), "text", "doc_id"),
        )
        timed("cdc_chunks (as-is)", cdc_chunks(docs, "text", "doc_id"))
        timed(
            f"cdc_chunks (repartition({n}, col))",
            cdc_chunks(docs.repartition(n, F.col("doc_id")), "text", "doc_id"),
        )
    spark.stop()
