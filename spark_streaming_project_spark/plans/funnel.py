"""Product-analytics queries over the events table: ordered conversion
funnel, weekly cohort retention, and conversion-delay statistics.

Engine extension — the reference never uses event time at all (SURVEY.md
§2.9); these are the OLAP shapes an analytics engine is expected to serve
over an event stream, built on the same per-user reduce-first pattern as
``user_sessions``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.funnel import (
    cohort_retention,
    conversion_delay_stats,
    funnel_conversion,
)
from ..sources.batch import load_table
from .registry import register

_STAGES = ["view", "click", "purchase"]

# Matches functions.timeutil.epoch_seconds on TIMESTAMP_NTZ: truncated
# (floored) whole seconds since the epoch, time-zone-free.
_EPOCH = "CAST(floor(epoch(ts)) AS BIGINT)"


@register(
    "funnel_conversion",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN {_EPOCH} END) AS t0,
               min(CASE WHEN event_type = 'click' THEN {_EPOCH} END) AS t1,
               min(CASE WHEN event_type = 'purchase' THEN {_EPOCH} END) AS t2
        FROM events GROUP BY user_id
    ),
    wide AS (
        SELECT count(*) FILTER (WHERE t0 IS NOT NULL) AS r0,
               count(*) FILTER (WHERE t0 IS NOT NULL AND t1 IS NOT NULL
                                AND t1 >= t0) AS r1,
               count(*) FILTER (WHERE t0 IS NOT NULL AND t1 IS NOT NULL
                                AND t1 >= t0 AND t2 IS NOT NULL
                                AND t2 >= t1) AS r2
        FROM per_user
    )
    SELECT 0 AS stage_idx, 'view' AS stage, r0 AS users FROM wide
    UNION ALL SELECT 1, 'click', r1 FROM wide
    UNION ALL SELECT 2, 'purchase', r2 FROM wide
    """,
    tags=("events", "funnel"),
)
def funnel_conversion_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: users whose FIRST
    occurrence of each stage respects stage order. Monotone user counts
    down the funnel; one shuffle over the raw events."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(ev, _STAGES)


@register(
    "cohort_retention",
    oracle=f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
        FROM events
    ),
    cohorts AS (
        SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1
    )
    SELECT cohort_week, week - cohort_week AS week_offset,
           count(DISTINCT user_id) AS users
    FROM uw JOIN cohorts USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("events", "funnel"),
)
def cohort_retention_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: distinct users from each first-
    active epoch-week cohort still active N weeks later."""
    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev)


@register(
    "conversion_delay",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN {_EPOCH} END) AS t0,
               min(CASE WHEN event_type = 'purchase' THEN {_EPOCH} END) AS t1
        FROM events GROUP BY user_id
    ),
    d AS (
        SELECT t1 - t0 AS _delay FROM per_user
        WHERE t0 IS NOT NULL AND t1 IS NOT NULL AND t1 >= t0
    )
    SELECT count(*) AS converters,
           round(CAST(sum(_delay) AS DOUBLE) / count(*), 6) AS mean_delay_sec,
           round(quantile_cont(_delay, 0.5), 6) AS p50_delay_sec,
           round(quantile_cont(_delay, 0.9), 6) AS p90_delay_sec
    FROM d
    """,
    tags=("events", "funnel", "percentile"),
)
def conversion_delay_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view -> first-purchase delay distribution over converting
    users: count, mean, p50, p90 (seconds)."""
    ev = load_table(spark, sf_dir, "events")
    return conversion_delay_stats(ev, "view", "purchase")
