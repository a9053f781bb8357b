"""Source-layer contracts: ns-timestamp reads don't leak session conf, the
footer cache tracks file rewrites, and compaction preserves data."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from spark_streaming_project_spark.sources.batch import load_table

NS_SF = "/root/testdata/sf0.001"
CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_load_table_restores_nanos_conf(spark):
    # events.ts is TIMESTAMP(NANOS) in the driver testdata — the one table
    # that forces the legacy conf on during schema resolution.
    assert spark.conf.get(CONF, None) is None
    df = load_table(spark, NS_SF, "events")
    assert spark.conf.get(CONF, None) is None  # restored, not leaked
    # and the plan still executes correctly after the restore
    assert df.count() > 0
    assert df.schema["ts"].dataType.simpleString() == "timestamp"


def test_load_table_preserves_preexisting_conf(spark):
    spark.conf.set(CONF, "false")
    try:
        load_table(spark, NS_SF, "events").count()
        assert spark.conf.get(CONF) == "false"
    finally:
        spark.conf.unset(CONF)


def test_footer_cache_invalidated_on_rewrite(spark, tmp_path):
    # Copy the ns-timestamp file, read it (caches "ts is ns"), then rewrite
    # the same path with MICROS timestamps: the stale cache must not apply
    # the div-1000 conversion to the already-micros column.
    path = str(tmp_path / "events.parquet")
    shutil.copyfile(os.path.join(NS_SF, "events.parquet"), path)
    first = load_table(spark, str(tmp_path), "events")
    ns_max = first.select(F.max("ts")).collect()[0][0]

    micros = first.select("event_id", "ts").toPandas()
    os.remove(path)
    micros.to_parquet(path, coerce_timestamps="us", index=False)

    second = load_table(spark, str(tmp_path), "events")
    us_max = second.select(F.max("ts")).collect()[0][0]
    assert us_max == ns_max  # a stale ns->us division would shift this by ~1000x
