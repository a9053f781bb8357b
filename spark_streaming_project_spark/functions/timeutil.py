"""Timestamp utilities.

The driver testdata stores ``events.ts`` as parquet TIMESTAMP with
``isAdjustedToUTC=false``, which Spark reads as TIMESTAMP_NTZ — and Spark 4
refuses ``CAST(timestamp_ntz AS BIGINT)`` outright (DATATYPE_MISMATCH).
Every operator that needs epoch arithmetic (sessionization gaps, range-join
bucketing) must therefore go through :func:`epoch_seconds`, which picks a
legal, deterministic conversion per timestamp flavor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Seconds since the Unix epoch for timestamp column ``col`` of ``df``.

    - TIMESTAMP (with local time zone): plain ``CAST(... AS BIGINT)``.
    - TIMESTAMP_NTZ: interval subtraction from the epoch wall-clock,
      ``CAST(ts - TIMESTAMP_NTZ '1970-01-01' AS BIGINT)`` — session-timezone
      *independent* (an NTZ→LTZ cast would shift by the driver session's
      zone and wobble across DST transitions), so the same wall-clock input
      always yields the same epoch number on any cluster.

    Sub-second precision is truncated (floor for post-epoch values), matching
    ``CAST(timestamp AS BIGINT)`` semantics. Stays entirely inside
    whole-stage codegen — no UDF, no shuffle.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"CAST(`{col}` - TIMESTAMP_NTZ '1970-01-01 00:00:00' AS BIGINT)"
        )
    if isinstance(dt, TimestampType):
        return F.col(col).cast("long")
    raise TypeError(
        f"epoch_seconds: column {col!r} has non-timestamp type {dt.simpleString()}"
    )


def ensure_event_time(df: DataFrame, col: str) -> DataFrame:
    """Return ``df`` with ``col`` usable as an EVENT-TIME column.

    Watermarks and event-time windows require TIMESTAMP (with local time
    zone) — Spark raises EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    TIMESTAMP_NTZ. NTZ columns are cast, i.e. interpreted as wall-clock in
    the SESSION time zone (this engine pins it to UTC in ``session.py``),
    preserving microsecond precision. Already-LTZ columns pass through
    untouched. Apply at the streaming-source boundary, before
    ``withWatermark``.
    """
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def trunc_hour(df: DataFrame, col: str) -> Column:
    """Top-of-hour truncation in the column's OWN time domain.

    TIMESTAMP_NTZ: pure wall-clock arithmetic — rebuild the timestamp
    from its own year/month/day/hour fields via ``make_timestamp_ntz``
    (field extraction is zone-free on NTZ; minutes, seconds, and
    sub-second precision drop to zero exactly) — so the result is
    session-timezone independent and stays TIMESTAMP_NTZ. Spark's
    ``date_trunc`` round-trips NTZ through the session zone: under
    America/New_York every truncated hour shifts by the offset (and
    straddles DST transitions), which the r09 timezone sweep caught as
    oracle mismatches in every query that OUTPUTS truncated hours.
    TIMESTAMP (with local time zone): ``date_trunc``, the defined
    instant semantics. Whole-stage codegen both ways — no UDF.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        # field extraction is zone-free on NTZ; rebuilding from fields
        # also drops sub-second precision exactly
        return F.expr(
            f"make_timestamp_ntz(year(`{col}`), month(`{col}`), "
            f"day(`{col}`), hour(`{col}`), 0, 0)"
        )
    if isinstance(dt, TimestampType):
        return F.date_trunc("hour", F.col(col))
    raise TypeError(
        f"trunc_hour: column {col!r} has non-timestamp type {dt.simpleString()}"
    )
