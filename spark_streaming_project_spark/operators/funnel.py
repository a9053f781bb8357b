"""Event-funnel and cohort analytics over the events table.

Engine extension (SURVEY.md §2.9 leaves event-time implicit in the
reference): ordered conversion funnels, weekly cohort retention, and
conversion-delay percentiles — the standard product-analytics shapes an
OLAP engine serves over an event stream.

Scale notes (100 TB):
- Everything reduces per user FIRST (conditional min-aggregates, map-side
  combinable, one shuffle on user_id), then aggregates tiny per-user rows.
  No self-joins, no windows over the raw event stream.
- Week arithmetic is integer epoch-week (epoch // 604800) — pure codegen,
  time-zone-free, and identical in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds

WEEK_SECONDS = 604_800

__all__ = [
    "funnel_conversion",
    "user_first_times",
    "funnel_stage_counts",
    "cohort_retention",
    "conversion_delay_stats",
]


def _first_epoch(sec, event_type: str):
    """Earliest epoch-second at which the user emitted ``event_type``."""
    return F.min(
        F.when(F.col("event_type") == event_type, sec)
    ).alias(f"_t_{event_type}")


def user_first_times(df: DataFrame, stages: list[str]) -> DataFrame:
    """Per-user earliest epoch-second of each stage: ``(user_id, _t_<stage>
    ...)``. A plain min-aggregation, so it runs UNCHANGED as a streaming
    aggregation (per-user state = one long per stage, monotonically
    tightening as events arrive) — the incremental-funnel state table.
    """
    sec = epoch_seconds(df, "ts")
    return df.groupBy("user_id").agg(*[_first_epoch(sec, s) for s in stages])


def funnel_stage_counts(per_user: DataFrame, stages: list[str]) -> DataFrame:
    """Stage roll-up over a :func:`user_first_times` frame (batch, or the
    materialized state of the streaming twin): (stage_idx, stage, users)."""
    # reached[i] = all first-times 0..i present and non-decreasing
    reached_exprs = []
    cond = None
    for i, s in enumerate(stages):
        t = F.col(f"_t_{s}")
        step = t.isNotNull() if i == 0 else (
            t.isNotNull() & (t >= F.col(f"_t_{stages[i-1]}"))
        )
        cond = step if cond is None else (cond & step)
        reached_exprs.append(
            F.sum(cond.cast("bigint")).alias(f"_r{i}")
        )
    wide = per_user.agg(*reached_exprs)
    stack_args = ", ".join(
        f"{i}, '{s}', _r{i}" for i, s in enumerate(stages)
    )
    return wide.select(
        F.expr(
            f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, users)"
        )
    ).select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("users").cast("bigint").alias("users"),
    )


def funnel_conversion(df: DataFrame, stages: list[str]) -> DataFrame:
    """Ordered funnel: users whose FIRST occurrence of each stage respects
    the stage order (first(stage[i]) <= first(stage[i+1]) for every prior
    stage). Returns (stage_idx, stage, users) with users monotonically
    non-increasing down the funnel.

    One conditional-min aggregate per user (single shuffle), then a
    constant number of scalar counts unpivoted via stack() — the raw
    stream is touched exactly once. The per-user stage is streamable as-is
    (:func:`user_first_times`); :func:`funnel_stage_counts` rolls the
    state table up.
    """
    return funnel_stage_counts(user_first_times(df, stages), stages)


def cohort_retention(df: DataFrame) -> DataFrame:
    """Weekly cohort retention: cohort = the user's first active epoch-week;
    one row per (cohort_week, week_offset) counting distinct users active
    ``week_offset`` weeks after their cohort week.

    Two combinable aggregates (first-week per user; distinct user-weeks)
    joined on user_id, then a count per (cohort, offset). The user-week
    frame is |users| x |active weeks| — already tiny relative to raw
    events at any scale.
    """
    sec = epoch_seconds(df, "ts")
    wk = F.floor(sec / WEEK_SECONDS).cast("bigint")
    user_weeks = df.select(
        "user_id", wk.alias("week")
    ).distinct()
    cohorts = user_weeks.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        user_weeks.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("users"))
    )


def conversion_delay_stats(
    df: DataFrame, from_stage: str = "view", to_stage: str = "purchase"
) -> DataFrame:
    """Delay between a user's first ``from_stage`` and first ``to_stage``
    (only users where the conversion happened, i.e. first target >= first
    source): converter count, mean / median / p90 delay in seconds.

    Exact interpolated percentiles over the per-user delay frame — one row
    per converting user, so the percentile aggregate's input is user-
    bounded, not event-bounded.
    """
    sec = epoch_seconds(df, "ts")
    per_user = df.groupBy("user_id").agg(
        _first_epoch(sec, from_stage), _first_epoch(sec, to_stage)
    )
    t0, t1 = F.col(f"_t_{from_stage}"), F.col(f"_t_{to_stage}")
    delays = per_user.filter(
        t0.isNotNull() & t1.isNotNull() & (t1 >= t0)
    ).select((t1 - t0).alias("_delay"))
    return delays.agg(
        F.count("*").alias("converters"),
        F.round(F.sum("_delay").cast("double") / F.count("*"), 6).alias(
            "mean_delay_sec"
        ),
        F.round(F.percentile("_delay", F.lit(0.5)), 6).alias("p50_delay_sec"),
        F.round(F.percentile("_delay", F.lit(0.9)), 6).alias("p90_delay_sec"),
    )
