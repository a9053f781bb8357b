"""Source-layer contracts: ns-timestamp reads don't leak session conf, the
footer cache tracks file rewrites, and loads work across the timestamp
encodings the driver testdata has shipped (nanos in round 1, micros
TIMESTAMP_NTZ since round 2)."""

from __future__ import annotations

import datetime
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from spark_streaming_project_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"
CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _write_ns_events(path: str, n: int = 10) -> None:
    """A tiny events table with a TIMESTAMP(NANOS) column — the encoding
    round-1 testdata used, which Spark rejects without the legacy conf."""
    base = datetime.datetime(2024, 1, 1)
    ts = [base + datetime.timedelta(seconds=i, microseconds=137) for i in range(n)]
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("ns")),
        }
    )
    pq.write_table(table, path)


def test_load_table_converts_nanos_and_restores_conf(spark, tmp_path):
    _write_ns_events(str(tmp_path / "events.parquet"))
    assert spark.conf.get(CONF, None) is None
    df = load_table(spark, str(tmp_path), "events")
    assert spark.conf.get(CONF, None) is None  # restored, not leaked
    # ns values truncate to micro-precision timestamps
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    first = df.orderBy("event_id").first()
    assert first["ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 137)


def test_load_table_reads_current_testdata(spark):
    # the regenerated driver testdata stores micros; load must pass it
    # through untouched (no ns conversion), whatever the tz flavor.
    assert spark.conf.get(CONF, None) is None
    df = load_table(spark, SF, "events")
    assert spark.conf.get(CONF, None) is None
    assert df.count() > 0
    assert df.schema["ts"].dataType.simpleString() in ("timestamp", "timestamp_ntz")


def test_load_table_preserves_preexisting_conf(spark):
    spark.conf.set(CONF, "false")
    try:
        load_table(spark, SF, "events").count()
        assert spark.conf.get(CONF) == "false"
    finally:
        spark.conf.unset(CONF)


def test_footer_cache_invalidated_on_rewrite(spark, tmp_path):
    # Write an ns-timestamp file, read it (caches "ts is ns"), then rewrite
    # the same path with MICROS timestamps: the stale cache must not apply
    # the div-1000 conversion to the already-micros column.
    path = str(tmp_path / "events.parquet")
    _write_ns_events(path)
    first = load_table(spark, str(tmp_path), "events")
    ns_max = first.select(F.max("ts")).collect()[0][0]

    micros = first.select("event_id", "ts").toPandas()
    os.remove(path)
    micros.to_parquet(path, coerce_timestamps="us", index=False)

    second = load_table(spark, str(tmp_path), "events")
    us_max = second.select(F.max("ts")).collect()[0][0]
    assert us_max == ns_max  # a stale ns->us division would shift this by ~1000x


def test_read_jsonl_with_quarantine_routes_bad_lines(spark, tmp_path):
    """Clean lines come back typed, mangled lines land verbatim in the
    quarantine file, and schema-violating-but-parseable lines stay
    PERMISSIVE-clean (missing field -> NULL)."""
    from spark_streaming_project_spark.sources.batch import (
        read_jsonl_with_quarantine,
    )

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world"}\n'
        '{"doc_id": 2, "text": "ok"}\n'
        "{not json at all\n"
        '{"doc_id": 3}\n'
        '{"doc_id": "4", "text": "typed wrong"}\n'
    )
    qdir = str(tmp_path / "quarantine")
    clean = read_jsonl_with_quarantine(
        spark, str(src), "doc_id long, text string", quarantine_path=qdir
    )
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows[1] == "hello world" and rows[2] == "ok"
    assert rows[3] is None  # missing field is permissive-clean
    assert 4 not in rows  # type violation is corrupt
    bad = [r["raw_line"] for r in spark.read.text(qdir).withColumnRenamed("value", "raw_line").collect()]
    assert any("not json" in b for b in bad)
    assert any('"4"' in b for b in bad)
    assert len(bad) == 2

    # rerunning the same ingest overwrites its own quarantine slice
    # instead of appending duplicates (ADVICE r5)
    clean2 = read_jsonl_with_quarantine(
        spark, str(src), "doc_id long, text string", quarantine_path=qdir
    )
    assert clean2.count() == clean.count()
    assert spark.read.text(qdir).count() == 2
    # the clean frame does not pin a session-lifetime cache
    assert not clean2.storageLevel.useMemory


def test_read_csv_with_quarantine_routes_bad_lines(spark, tmp_path):
    """CSV twin of the JSONL quarantine ingest: typed clean rows,
    malformed lines quarantined verbatim, header dropped literally,
    overwrite-per-source on re-run."""
    from spark_streaming_project_spark.sources.batch import (
        read_csv_with_quarantine,
    )

    src = tmp_path / "docs.csv"
    src.write_text(
        "doc_id,text\n"
        "1,hello world\n"
        "2,ok\n"
        "notanumber,broken type\n"
        "3,\n"
    )
    qdir = str(tmp_path / "csv_quarantine")
    clean = read_csv_with_quarantine(
        spark,
        str(src),
        "doc_id long, text string",
        quarantine_path=qdir,
        header=True,
    )
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows[1] == "hello world" and rows[2] == "ok"
    assert 3 in rows and rows[3] is None  # empty field permissive-clean
    assert None not in rows  # type violation went to quarantine
    bad = [r["value"] for r in spark.read.text(qdir).collect()]
    assert bad == ["notanumber,broken type"]

    clean2 = read_csv_with_quarantine(
        spark,
        str(src),
        "doc_id long, text string",
        quarantine_path=qdir,
        header=True,
    )
    assert clean2.count() == clean.count() == 3
    assert spark.read.text(qdir).count() == 1
    assert not clean2.storageLevel.useMemory


def test_read_evolving_parquet_merges_added_columns(spark, tmp_path):
    """Files written before a column existed read back with NULLs in
    that column under mergeSchema; filters on the new column still push
    down; a type CHANGE of an existing column fails loudly rather than
    merging silently."""
    from spark_streaming_project_spark.sources.batch import (
        read_evolving_parquet,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    df = read_evolving_parquet(spark, path)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)
    assert df.filter(F.col("score") > 9).count() == 1

    # type change is NOT evolution: long -> string must fail the merge
    spark.createDataFrame(
        [("x", "c")], "id string, name string"
    ).write.mode("append").parquet(path)
    import pytest as _pytest

    with _pytest.raises(Exception):
        read_evolving_parquet(spark, path).collect()
