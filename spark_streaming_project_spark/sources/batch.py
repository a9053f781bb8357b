"""Batch readers for the driver testdata star schema.

Parquet-first: Catalyst pushes filters and prunes columns at the scan, so
every plan builder reads through these helpers and relies on pushdown rather
than pre-materializing projections.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_timestamp_cols_cached(path: str, mtime_ns: int) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects ([PARQUET_TYPE_ILLEGAL]); footer inspection via pyarrow.
    Keyed on (path, mtime) so a rewrite (e.g. ``compact_parquet``, which
    emits micros) invalidates the cached answer instead of mis-applying
    the ns->us conversion to a non-ns column."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )


def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    return _nanos_timestamp_cols_cached(path, os.stat(path).st_mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Plain parquet scan — no cache, no repartition;
    partitioning decisions belong to the consuming operator.

    Nanosecond-timestamp columns (e.g. ``events.ts``) are read as long via
    ``spark.sql.legacy.parquet.nanosAsLong`` and truncated to microsecond
    timestamps (floor division — identical to how micro-precision engines
    ingest ns parquet).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path) if os.path.exists(path) else ()
    if not ns_cols:
        return spark.read.parquet(path)
    # The legacy conf is only consulted while the relation resolves its
    # schema (verified: execution after restore still reads correctly), so
    # scope it to this read instead of leaking it session-wide.
    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


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


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_path: str | None = None,
) -> DataFrame:
    """JSONL document ingest with bad-record QUARANTINE instead of the
    two failure modes ingestion pipelines actually hit: FAILFAST kills a
    100 TB job on one mangled crawl line, and silent PERMISSIVE nulls
    corrupt downstream stats invisibly.

    Reads with an explicit schema (never inference — a schema-inference
    pass is a full extra scan, and drifting inferred types break the
    contract downstream) in PERMISSIVE mode with a ``_corrupt_record``
    capture column. Clean rows come back typed; corrupt lines are
    written verbatim to a per-source subdirectory of ``quarantine_path``
    (single text column — the raw line, replayable after a parser fix)
    when given. Returns the clean frame; callers needing counts
    aggregate the quarantine files.

    The quarantine write is OVERWRITE into ``quarantine_path/src=<md5 of
    source path>``: re-running the same ingest replaces its own slice
    instead of appending duplicate bad lines run-over-run, while distinct
    sources land in distinct subdirs and never clobber each other
    (ADVICE r5).

    Implementation: text scan + ``from_json`` (not ``spark.read.json``)
    — the corrupt marker is then an ORDINARY struct field derived from
    the line, so neither slice trips Spark's internal-corrupt-column
    restriction (SPARK-21610) and no persist/cache is needed; the clean
    frame returned to callers re-reads lazily rather than pinning a
    session-lifetime cache (ADVICE r5).

    Scale shape: one scan, narrow per-line parse, no shuffle; the
    quarantine write is a second scan of only the corrupt subset.
    """
    import hashlib

    full_schema = schema + ", _corrupt_record string"
    parsed = spark.read.text(path).select(
        F.col("value").alias("_raw_line"),
        F.from_json(
            "value",
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("_parsed"),
    )
    if quarantine_path is not None:
        bad = parsed.filter(
            F.col("_parsed._corrupt_record").isNotNull()
        ).select(F.col("_raw_line").alias("raw_line"))
        subdir = hashlib.md5(path.encode()).hexdigest()[:16]
        bad.write.mode("overwrite").text(f"{quarantine_path}/src={subdir}")
    return (
        parsed.filter(F.col("_parsed._corrupt_record").isNull())
        .select("_parsed.*")
        .drop("_corrupt_record")
    )


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_path: str | None = None,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """CSV twin of ``read_jsonl_with_quarantine``: explicit schema (never
    inference), PERMISSIVE parse with a ``_corrupt_record`` capture, bad
    lines quarantined verbatim (overwrite-per-source — re-running an
    ingest replaces its own slice), clean rows back typed.

    Same text-scan + ``from_csv`` formulation (not ``spark.read.csv``) so
    the corrupt marker is an ordinary derived field: no SPARK-21610
    internal-column restriction, no cache pinned. When ``header`` is
    true the first line (matched literally, not positionally — safe
    across partitioned multi-file input where 'first' is undefined) is
    dropped before parsing. One scan, narrow per-line parse, no shuffle.
    """
    import hashlib

    full_schema = schema + ", _corrupt_record string"
    lines = spark.read.text(path)
    if header:
        header_line = sep.join(
            f.split(" ")[0] for f in schema.split(", ")
        )
        lines = lines.filter(F.col("value") != header_line)
    parsed = lines.select(
        F.col("value").alias("_raw_line"),
        F.from_csv(
            "value",
            full_schema,
            {
                "mode": "PERMISSIVE",
                "columnNameOfCorruptRecord": "_corrupt_record",
                "sep": sep,
            },
        ).alias("_parsed"),
    )
    if quarantine_path is not None:
        bad = parsed.filter(
            F.col("_parsed._corrupt_record").isNotNull()
        ).select(F.col("_raw_line").alias("raw_line"))
        subdir = hashlib.md5(path.encode()).hexdigest()[:16]
        bad.write.mode("overwrite").text(f"{quarantine_path}/src={subdir}")
    return (
        parsed.filter(F.col("_parsed._corrupt_record").isNull())
        .select("_parsed.*")
        .drop("_corrupt_record")
    )


def read_evolving_parquet(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time — the operational reality of a
    long-lived 100 TB lake): ``mergeSchema=true`` unions the per-file
    footers into one schema and older files surface the new columns as
    NULL.

    Why a helper and not a bare ``spark.read``: merge-on-read costs a
    footer pass over every file, so the default-off Spark behavior is
    right for hot paths — this entry point makes the trade explicit and
    documents the contract (adds are safe; a TYPE CHANGE of an existing
    column is not evolution, it fails the merge — callers handle that
    with an explicit cast-on-write migration, see compact_parquet)."""
    return (
        spark.read.option("mergeSchema", str(merge_schema).lower())
        .parquet(path)
    )
