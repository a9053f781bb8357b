"""Batch readers for the driver testdata star schema.

Parquet-first: Catalyst pushes filters and prunes columns at the scan, so
every plan builder reads through these helpers and relies on pushdown rather
than pre-materializing projections.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan — no cache, no repartition;
    partitioning decisions belong to the consuming operator."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register each table as a temp view so plans can be written in SQL."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
