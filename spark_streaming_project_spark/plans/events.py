"""Event-time queries over the events table — the event-time surface the
reference leaves implicit (SURVEY.md §2.9 X4: no watermarks, no windows, no
event-time at all in the reference; these define the engine's batch
semantics, and streaming/tests run the same logical plans as streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_seconds, trunc_hour
from ..sources.batch import load_table
from .registry import register


def _dec(col, scale: int = 6):
    return (F.col(col) if isinstance(col, str) else col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Tumbling event-time window (batch twin of the streaming windowed count).
# F.window (not date_trunc): window() operates natively in the column's
# timestamp domain, so a TIMESTAMP_NTZ input yields NTZ wall-clock window
# bounds in ANY session time zone. date_trunc round-trips NTZ through the
# session zone (verified: mismatches DuckDB under America/New_York).
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS event_count,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("events", "window-time"),
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# JSON props extraction (the engine's semi-structured path beyond from_json).
# ---------------------------------------------------------------------------


@register(
    "events_props_buckets",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS event_count
    FROM events
    WHERE props IS NOT NULL
    GROUP BY 1
    """,
    tags=("events", "json"),
)
def events_props_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(F.col("props").isNotNull())
        .select((k % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("event_count"))
    )


# ---------------------------------------------------------------------------
# Batch sessionization: lag-gap + running flag-sum (SNIPPETS/guide pattern).
# Streaming twin uses session_window; this is the deterministic batch oracle.
# ---------------------------------------------------------------------------


@register(
    "user_sessions",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessioned AS (
        SELECT user_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, count(DISTINCT session_id) AS session_count,
           count(*) AS event_count
    FROM sessioned
    GROUP BY user_id
    """,
    tags=("events", "sessionization"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.timeutil import epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # epoch_seconds handles the testdata's TIMESTAMP_NTZ (a bare
    # .cast("long") is illegal on NTZ in Spark 4).
    sec = epoch_seconds(ev, "ts")
    gap = sec - F.lag(sec).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)).alias(
            "new_session"
        ),
    )
    sessioned = flagged.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return sessioned.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("session_count"),
        F.count("*").alias("event_count"),
    )


# ---------------------------------------------------------------------------
# As-of join (scale extension; reference has no joins — SURVEY.md §2.8).
# union+window formulation: one shuffle on the key, no range-candidate blowup.
# ---------------------------------------------------------------------------


@register(
    "purchase_asof_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           v.view_event_id, v.view_ts, v.view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT e.event_id AS view_event_id, e.ts AS view_ts,
               e.value AS view_value
        FROM events e
        WHERE e.event_type = 'view'
          AND e.user_id = p.user_id AND e.ts <= p.ts
        ORDER BY e.ts DESC, e.event_id DESC
        LIMIT 1
    ) v ON true
    """,
    tags=("events", "asof-join"),
)
def purchase_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase enriched with the user's most recent prior-or-equal
    view event (NULLs when none). Ties on view ts -> largest event_id."""
    from ..operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"), "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="view_ts",
        right_tiebreak="view_event_id",
    )


# ---------------------------------------------------------------------------
# Range (interval) join via bin-and-filter equi-join — not Spark's default
# nested-loop inequality join.
# ---------------------------------------------------------------------------


@register(
    "error_aftermath_clicks",
    oracle="""
    SELECT err.event_id AS incident_id, err.user_id,
           count(*) AS n_clicks, min(c.ts) AS first_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'error') err
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = err.user_id
     AND c.ts >= err.ts AND c.ts < err.ts + INTERVAL 1 DAY
    GROUP BY 1, 2
    """,
    tags=("events", "range-join"),
)
def error_aftermath_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: the user's clicks in the day after it
    (incidents with zero clicks omitted — inner semantics)."""
    from ..operators.joins import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("w_end"),
    )
    matched = range_join_binned(
        clicks, incidents, on="user_id", ts_col="click_ts",
        start_col="w_start", end_col="w_end", bucket_seconds=6 * 3600,
    )
    return matched.groupBy("incident_id", "user_id").agg(
        F.count("*").alias("n_clicks"),
        F.min("click_ts").alias("first_click_ts"),
    )


# ---------------------------------------------------------------------------
# Sliding event-time window (each event lands in width/slide windows; the
# oracle unnests the two hour-aligned starts covering each event).
# ---------------------------------------------------------------------------


@register(
    "events_sliding_2h",
    oracle="""
    SELECT ws AS window_start, event_type, count(*) AS event_count
    FROM (
        SELECT unnest([date_trunc('hour', ts),
                       date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
               event_type
        FROM events
    )
    GROUP BY 1, 2
    """,
    tags=("events", "window-time", "sliding"),
)
def events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: every event is counted in the two
    windows covering it (F.window with slide < width)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


# ---------------------------------------------------------------------------
# Trailing event-time window aggregate (RANGE frame): the per-event rolling
# feature a fraud/abuse pipeline computes — distinct from the tumbling/
# sliding window queries above, which aggregate per bucket, not per row.
# ---------------------------------------------------------------------------


@register(
    "user_trailing_1h",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               CAST(value AS DECIMAL(18, 6)) AS v
        FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           round(CAST(sum(v) OVER w AS DOUBLE), 6) AS sum_value_1h
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "window"),
)
def user_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour activity: event count and value sum over a
    RANGE frame keyed by integer epoch seconds. The frame is SET-based
    (every row whose second falls in [t-3599, t]), so tie order inside a
    second cannot change the result; sums run in DECIMAL so partial-sum
    order cannot either — the aggregate is bit-deterministic across engines
    and shuffle layouts. One hash exchange on user_id, per-partition sort:
    the same cost envelope as any windowed feature at 100 TB."""
    from ..functions.timeutil import epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    sec = epoch_seconds(ev, "ts")
    base = ev.select(
        "event_id",
        "user_id",
        sec.alias("sec"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_1h"),
        F.round(F.sum("v").over(w).cast("double"), 6).alias("sum_value_1h"),
    )


# ---------------------------------------------------------------------------
# Gap-filled hourly series: time-series densification (the missing-bucket
# problem every dashboard hits — hours with zero events must exist as rows).
# ---------------------------------------------------------------------------


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', ts) AS h, event_type FROM events
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM base),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT h, event_type, count(*) AS c FROM base GROUP BY 1, 2
    )
    SELECT g.hour_start, t.event_type,
           coalesce(c.c, CAST(0 AS BIGINT)) AS event_count
    FROM grid g
    CROSS JOIN types t
    LEFT JOIN counts c ON c.h = g.hour_start AND c.event_type = t.event_type
    """,
    tags=("events", "window-time", "gapfill"),
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly (hour x event_type) series with explicit zero rows for
    silent hours — the densification a charting/alerting layer needs (a
    silent hour IS the signal for an error-rate alert).

    Shape: the grid is sequence(min_hour, max_hour) exploded from a
    one-row bounds aggregate (interval arithmetic stays in the column's
    native timestamp domain — NTZ-safe like events_hourly's F.window),
    cross-joined against the distinct type dimension via broadcast
    nested-loop (both sides bounded: hours x types, never event-count
    sized), then ONE left equi-join against the hourly counts. At 100 TB
    the grid is still hours x types rows — the fact table never appears
    twice.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "1 hour").getField("start").alias("h"), "event_type"
    )
    counts = base.groupBy("h", "event_type").agg(F.count("*").alias("c"))
    bounds = base.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour_start")
    )
    types = ev.select(F.col("event_type").alias("_ty")).distinct()
    return (
        grid.join(F.broadcast(types))
        .join(
            counts,
            (F.col("hour_start") == F.col("h"))
            & (F.col("_ty") == counts["event_type"]),
            "left",
        )
        .select(
            "hour_start",
            F.col("_ty").alias("event_type"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("event_count"),
        )
    )


# ---------------------------------------------------------------------------
# Forward fill (LOCF) — the other half of time-series repair: carry the
# last observed purchase value to every subsequent event of the user.
# ---------------------------------------------------------------------------


@register(
    "user_value_locf",
    oracle="""
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_purchase_value
    FROM events
    """,
    tags=("events", "window", "gapfill"),
)
def user_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event annotated with the
    user's most recent purchase value (NULL until the first purchase).
    One per-user ordered window, ignoreNulls last() — values are carried
    verbatim (no arithmetic), so the fill is engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.last(x, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection over the DENSE hourly series (composes
# on events_hourly_gapfill — silent hours participate as zeros, which is
# exactly what makes an outage detectable).
# ---------------------------------------------------------------------------


@register(
    "hourly_anomalies",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', ts) AS h, event_type FROM events
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM base),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (SELECT h, event_type, count(*) AS c FROM base GROUP BY 1, 2),
    dense AS (
        SELECT g.hour_start, t.event_type,
               coalesce(c.c, CAST(0 AS BIGINT)) AS event_count
        FROM grid g CROSS JOIN types t
        LEFT JOIN counts c ON c.h = g.hour_start AND c.event_type = t.event_type
    ),
    rolled AS (
        SELECT hour_start, event_type, event_count,
               count(*) OVER w AS n,
               sum(event_count) OVER w AS sx,
               sum(event_count * event_count) OVER w AS sxx
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_start, event_count,
           round((CAST(event_count AS DOUBLE)
                  - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS z
    FROM rolled
    WHERE n = 24
      AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
      AND abs((CAST(event_count AS DOUBLE)
               - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) > 3.0
    """,
    tags=("events", "window", "anomaly"),
)
def hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event count sits > 3 sigma from the trailing-24h mean,
    per event type, over the GAP-FILLED series (a silent hour scores as 0
    and can trip the alert — the whole point of densification first).

    Determinism: counts are integers, so the rolling mean/std come from
    exact integer window sums (sx, sxx) with one terminal FP division —
    the same exact-sums discipline as doc_length_corr. Frame excludes the
    current row (a spike must not mask itself) and requires a full 24h
    history.
    """
    return anomalies_over_dense(events_hourly_gapfill(spark, sf_dir))


def anomalies_over_dense(dense: DataFrame) -> DataFrame:
    """The detection core over ANY dense (hour_start, event_type,
    event_count) frame — reused by the batch query above and by the
    streaming composition (incrementally-maintained hourly state
    densified per refresh; parity-tested in tests/test_streaming_llm.py).
    """
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(-24, -1)
    )
    n = F.count("*").over(w)
    sx = F.sum("event_count").over(w)
    sxx = F.sum(F.col("event_count") * F.col("event_count")).over(w)
    rolled = dense.select(
        "event_type",
        "hour_start",
        "event_count",
        n.alias("n"),
        sx.alias("sx"),
        sxx.alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    var_num = nd * sxxd - sxd * sxd
    z = (F.col("event_count").cast("double") - sxd / nd) / F.sqrt(
        var_num / (nd * nd)
    )
    return (
        rolled.filter((F.col("n") == 24) & (var_num > 0) & (F.abs(z) > 3.0))
        .select("event_type", "hour_start", "event_count", F.round(z, 6).alias("z"))
    )


def densify_hourly(counts: DataFrame) -> DataFrame:
    """Gap-fill a sparse (h, event_type, c) hourly-count frame into the
    dense grid (zero rows for silent hours) — the state-table twin of
    events_hourly_gapfill's internals, for counts maintained
    incrementally rather than derived from raw events."""
    bounds = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("hour_start")
    )
    types = counts.select(F.col("event_type").alias("_ty")).distinct()
    return (
        grid.join(F.broadcast(types))
        .join(
            counts,
            (F.col("hour_start") == F.col("h"))
            & (F.col("_ty") == counts["event_type"]),
            "left",
        )
        .select(
            "hour_start",
            F.col("_ty").alias("event_type"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("event_count"),
        )
    )


# ---------------------------------------------------------------------------
# Winsorization: robust-statistics clamp of the value column at per-type
# p01/p99 — the outlier treatment an analytics pipeline applies before
# averaging heavy-tailed metrics.
# ---------------------------------------------------------------------------


@register(
    "value_winsorized",
    oracle="""
    WITH th AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS lo,
               quantile_cont(value, 0.99) AS hi
        FROM events WHERE value IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type,
           count(*) AS n,
           count(*) FILTER (WHERE value < lo) AS clamped_low,
           count(*) FILTER (WHERE value > hi) AS clamped_high,
           round(CAST(sum(CAST(CASE WHEN value < lo THEN lo
                                    WHEN value > hi THEN hi
                                    ELSE value END AS DECIMAL(18,6)))
                      AS DOUBLE) / count(*), 6) AS winsorized_mean
    FROM events e JOIN th USING (event_type)
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
    tags=("events", "percentile", "robust"),
)
def value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized mean of event values (clamped at the type's
    exact p01/p99): two passes — a per-type percentile aggregate
    broadcast back onto the scan, then a decimal-exact clamped sum. The
    robust mean a dashboard should show for heavy-tailed value columns.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    th = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("lo"),
        F.percentile("value", F.lit(0.99)).alias("hi"),
    )
    clamped = F.when(F.col("value") < F.col("lo"), F.col("lo")).when(
        F.col("value") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("value"))
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias(
                "clamped_low"
            ),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias(
                "clamped_high"
            ),
            F.round(
                F.sum(clamped.cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("winsorized_mean"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, count(*) AS n_transitions
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           round(CAST(n_transitions AS DOUBLE)
                 / CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                        AS DOUBLE), 6) AS p
    FROM trans
    """,
    tags=("events", "sequence", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current), the behavioral-model summary a product
    pipeline derives from clickstreams. Scale shape: one user-keyed window
    (same exchange sessionization uses), then a tiny (n_types^2)-row
    aggregate; the normalizing window runs over that aggregate, not the
    fact table. Ordering is total (ts, event_id), so lead() is
    deterministic under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    trans = (
        pairs.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double"),
            6,
        ).alias("p"),
    )


@register(
    "hourly_cusum_changepoints",
    oracle="""
    WITH base AS (
        SELECT date_trunc('hour', ts) AS h, event_type FROM events
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM base),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (SELECT h, event_type, count(*) AS c FROM base GROUP BY 1, 2),
    dense AS (
        SELECT g.hour_start, t.event_type,
               coalesce(cnt.c, CAST(0 AS BIGINT)) AS event_count
        FROM grid g CROSS JOIN types t
        LEFT JOIN cnt ON cnt.h = g.hour_start AND cnt.event_type = t.event_type
    ),
    stats AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(event_count) AS BIGINT) AS sx,
               CAST(sum(event_count * event_count) AS BIGINT) AS sxx
        FROM dense GROUP BY 1
    ),
    pref AS (
        SELECT d.event_type, d.hour_start, s.n, s.sx, s.sxx,
               sum(s.n * d.event_count - s.sx) OVER w AS c
        FROM dense d JOIN stats s USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    sides AS (
        SELECT event_type, hour_start, n, sx, sxx,
               c - min(c) OVER w AS up,
               max(c) OVER w - c AS down
        FROM pref
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ranked AS (
        SELECT event_type, 'up' AS direction, hour_start AS peak_at,
               up AS s, n, sx, sxx,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY up DESC, hour_start ASC) AS rn
        FROM sides
        UNION ALL
        SELECT event_type, 'down' AS direction, hour_start AS peak_at,
               down AS s, n, sx, sxx,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY down DESC, hour_start ASC) AS rn
        FROM sides
    )
    SELECT event_type, direction, peak_at,
           round(CAST(s AS DOUBLE) / n, 6) AS cusum,
           round(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS sigma,
           CAST(s AS DOUBLE) / n
               > 4.0 * sqrt((CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
               AS flagged
    FROM ranked WHERE rn = 1
    """,
    tags=("events", "window", "anomaly"),
)
def hourly_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint location per event type over the gap-filled
    hourly series: where the level most likely SHIFTED (peak of the
    reflected cumulative deviation, both directions) and whether the
    shift clears 4 sigma — the sequential-detection complement to
    hourly_anomalies' pointwise z-scores (a slow drift never trips a
    3-sigma point test but accumulates in the CUSUM). Exact integer
    prefix sums via the closed form S+ = C - running_min(C); see
    operators/profiling.cusum_changepoints."""
    from ..operators.profiling import cusum_changepoints

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "1 hour").getField("start").alias("h"), "event_type"
    )
    counts = base.groupBy("h", "event_type").agg(F.count("*").alias("c"))
    bounds = base.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
            "hour_start"
        )
    )
    types = ev.select("event_type").distinct()
    dense = (
        grid.crossJoin(F.broadcast(types))
        .join(
            counts.withColumnRenamed("h", "hour_start"),
            ["hour_start", "event_type"],
            "left",
        )
        .select(
            "event_type",
            "hour_start",
            F.coalesce("c", F.lit(0).cast("long")).alias("event_count"),
        )
    )
    return cusum_changepoints(
        dense, "event_type", "hour_start", "event_count"
    )


@register(
    "session_window_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessioned AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    tags=("events", "sessionization"),
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation (dynamic gap-merged
    event-time windows — the same operator the streaming leg uses) in
    batch, one row per (user, session): start, end (= last event + gap),
    event count. The oracle derives identical sessions with the lag-gap
    island method, pinning that the built-in operator and the manual
    formulation agree — so either engine form can stand in for the
    other. One shuffle on user_id; sessions merge inside the
    aggregation, no self-join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "late_event_profile",
    oracle="""
    WITH arr AS (
        SELECT event_id, ts,
               CAST(floor(epoch(ts)) AS BIGINT) AS sec
        FROM events
    ),
    runmax AS (
        SELECT event_id, ts, sec,
               max(sec) OVER (
                   ORDER BY event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS high_water
        FROM arr
    )
    SELECT date_trunc('hour', ts) AS hour_start,
           count(*) AS n_events,
           CAST(sum(CASE WHEN sec + 600 < high_water THEN 1 ELSE 0 END)
                AS BIGINT) AS n_late,
           round(sum(CASE WHEN sec + 600 < high_water THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS late_rate
    FROM runmax GROUP BY 1 ORDER BY 1
    """,
    tags=("events", "streaming-design", "profiling"),
)
def late_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Would-be-late-data profile: per event-time hour, how many events
    arrive (arrival order = event_id) more than 10 minutes behind the
    event-time high-water mark — exactly the rows a 10-minute watermark
    would drop. The sizing diagnostic you run BEFORE choosing a
    watermark delay. The global high-water mark is an inclusive running
    MAX over the arrival order, computed with the range-partitioned
    prefix machinery (max monoid) — no single-task window."""
    from ..functions.timeutil import epoch_seconds
    from ..operators.windows import range_partitioned_running_max

    ev = load_table(spark, sf_dir, "events")
    arr = ev.select(
        "event_id", "ts", epoch_seconds(ev, "ts").alias("sec")
    )
    rm = range_partitioned_running_max(
        arr, order=[F.asc("event_id")], value_cols=["sec"]
    )
    late = (F.col("sec") + 600 < F.col("runmax_sec")).cast("long")
    return (
        rm.groupBy(trunc_hour(rm, "ts").alias("hour_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(late).alias("n_late"),
            F.round(F.sum(late) / F.count("*"), 6).alias("late_rate"),
        )
        .orderBy("hour_start")
    )


@register(
    "event_burstiness",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    agg AS (
        SELECT event_type, count(*) AS n,
               sum(CAST(c AS DECIMAL(38,0))) AS sx,
               sum(CAST(c * c AS DECIMAL(38,0))) AS sxx
        FROM hourly GROUP BY 1
    )
    SELECT event_type, n AS n_hours,
           round(CAST(sx AS DOUBLE) / n, 6) AS mean_per_hour,
           round(CASE WHEN sx > 0 THEN
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 END, 6) AS fano
    FROM agg ORDER BY event_type
    """,
    tags=("events", "profiling", "robust-stats"),
)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of hourly counts, over
    OBSERVED hours) per event type: ~1 is Poisson-like traffic, >>1 is
    bursty — the dispersion number that decides whether rate-based
    anomaly thresholds are even meaningful. Population variance from
    DECIMAL-exact count sums, one terminal double expression; one
    hourly aggregate then a per-type fold."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", trunc_hour(ev, "ts").alias("h")
    ).agg(F.count("*").alias("c"))
    dec = lambda c: c.cast("decimal(38,0)")
    agg = hourly.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec(F.col("c"))).alias("sx"),
        F.sum(dec(F.col("c") * F.col("c"))).alias("sxx"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(F.col("sx").cast("double") / n, 6).alias("mean_per_hour"),
        F.round(
            F.when(
                F.col("sx") > 0,
                (
                    n * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                / (n * F.col("sx").cast("double")),
            ),
            6,
        ).alias("fano"),
    ).orderBy("event_type")


@register(
    "salted_user_tier_activity",
    oracle="""
    WITH dim AS (
        SELECT user_id, user_id % 5 AS tier, min(ts) AS first_seen
        FROM events GROUP BY user_id
    )
    SELECT d.tier,
           count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           min(d.first_seen) AS earliest_first_seen
    FROM events e JOIN dim d USING (user_id)
    GROUP BY d.tier ORDER BY d.tier
    """,
    tags=("events", "joins", "skew"),
)
def salted_user_tier_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tier activity through a MEASURED-salt skewed join: the salt
    factor comes from choose_salt_factor's hottest-key probe (1 when the
    key distribution is flat — no replication paid), the join runs
    through skew_salted_join, and the oracle is the PLAIN join — pinning
    on the gate that salting is semantically invisible, its only effect
    being shuffle-key spread."""
    from ..operators.joins import choose_salt_factor, skew_salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(
        (F.col("user_id") % 5).alias("tier"),
        F.min("ts").alias("first_seen"),
    )
    factor = choose_salt_factor(ev, "user_id", target_rows_per_task=2000)
    joined = skew_salted_join(
        ev.select("user_id", "event_id"), dim, "user_id",
        salt_factor=max(factor, 1),
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min("first_seen").alias("earliest_first_seen"),
        )
        .orderBy("tier")
    )


@register(
    "conversion_ztest",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(user_id % 2 AS INTEGER) AS exposed,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) >= 14
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT exposed, count(*) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM per_user GROUP BY exposed
    ),
    wide AS (
        SELECT
            (SELECT n FROM g WHERE exposed = 1) AS n1,
            (SELECT conv FROM g WHERE exposed = 1) AS c1,
            (SELECT n FROM g WHERE exposed = 0) AS n0,
            (SELECT conv FROM g WHERE exposed = 0) AS c0
    )
    SELECT n1 AS exposed_users, c1 AS exposed_conversions,
           n0 AS control_users, c0 AS control_conversions,
           round(CAST(c1 AS DOUBLE) / n1, 6) AS rate_exposed,
           round(CAST(c0 AS DOUBLE) / n0, 6) AS rate_control,
           round((CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
                 / sqrt((CAST(c1 + c0 AS DOUBLE) / (n1 + n0))
                        * (1.0 - CAST(c1 + c0 AS DOUBLE) / (n1 + n0))
                        * (1.0 / n1 + 1.0 / n0)), 6) AS z_stat
    FROM wide
    """,
    tags=("events", "hypothesis-test", "robust-stats"),
)
def conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic A/B split (user_id
    parity) on a non-trivial conversion (>= 14 purchase events): the
    pooled-variance z statistic from exact integer user/conversion
    counts with a fixed double op sequence — the experiment-readout
    primitive. On this synthetic corpus the split is a true A/A, so the
    honest expectation (and result) is |z| small — the query certifies
    the MACHINERY, the same shape scores any real assignment column.
    One user-keyed aggregate, two scalar groups."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("user_id") % 2).cast("int")).alias("exposed"),
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).cast("int").alias("converted"),
    )
    g = per_user.groupBy("exposed").agg(
        F.count("*").alias("n"), F.sum("converted").cast("long").alias("conv")
    )
    e = g.filter(F.col("exposed") == 1).select(
        F.col("n").alias("n1"), F.col("conv").alias("c1")
    )
    c = g.filter(F.col("exposed") == 0).select(
        F.col("n").alias("n0"), F.col("conv").alias("c0")
    )
    wide = e.crossJoin(F.broadcast(c))
    p1 = F.col("c1").cast("double") / F.col("n1")
    p0 = F.col("c0").cast("double") / F.col("n0")
    pp = (F.col("c1") + F.col("c0")).cast("double") / (
        F.col("n1") + F.col("n0")
    )
    return wide.select(
        F.col("n1").alias("exposed_users"),
        F.col("c1").alias("exposed_conversions"),
        F.col("n0").alias("control_users"),
        F.col("c0").alias("control_conversions"),
        F.round(p1, 6).alias("rate_exposed"),
        F.round(p0, 6).alias("rate_control"),
        F.round(
            (p1 - p0)
            / F.sqrt(
                pp * (1.0 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n0"))
            ),
            6,
        ).alias("z_stat"),
    )


@register(
    "top_event_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    paths AS (
        SELECT concat(event_type, '>', e2, '>', e3) AS path
        FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    ),
    counted AS (SELECT path, count(*) AS n FROM paths GROUP BY 1)
    SELECT path, n FROM counted ORDER BY n DESC, path ASC LIMIT 15
    """,
    tags=("events", "paths", "topk"),
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 15 most-travelled 3-step event paths (per-user event-time
    order, overlapping windows) — the path-mining table behind every
    'how do users actually reach purchase?' question. Per-user windows
    (bounded partitions), one path-keyed count, TakeOrdered cut with a
    total order."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = seq.filter(
        F.col("e2").isNotNull() & F.col("e3").isNotNull()
    ).select(
        F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Time-series diagnostics completion: autocorrelation (is there a daily
# cycle worth modelling?) and truncated-EWMA smoothing (the trend line an
# ops dashboard draws). Both run over the DENSE gap-filled hourly series —
# silent hours are real zeros — and both avoid per-type unbounded windows:
# every lagged pair comes from an equi-join on (event_type, shifted hour),
# so the shuffled unit is the bounded hours x types grid, never the raw
# event stream twice.
# ---------------------------------------------------------------------------

_DENSE_HOURLY_CTE = """
    base AS (
        SELECT date_trunc('hour', ts) AS h, event_type FROM events
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM base),
    grid AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (SELECT h, event_type, count(*) AS c FROM base GROUP BY 1, 2),
    dense AS (
        SELECT g.hour_start, t.event_type,
               coalesce(c.c, CAST(0 AS BIGINT)) AS event_count
        FROM grid g CROSS JOIN types t
        LEFT JOIN counts c ON c.h = g.hour_start AND c.event_type = t.event_type
    )
"""

_ACF_MAX_LAG = 24


@register(
    "hourly_autocorrelation",
    oracle=f"""
    WITH {_DENSE_HOURLY_CTE},
    stats AS (
        SELECT event_type, count(*) AS n, sum(event_count) AS s
        FROM dense GROUP BY 1
    ),
    dev AS (
        SELECT d.hour_start, d.event_type,
               st.n * d.event_count - st.s AS dv
        FROM dense d JOIN stats st USING (event_type)
    ),
    den AS (
        SELECT event_type, sum(dv * dv) AS den FROM dev GROUP BY 1
    ),
    lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG} + 1)) AS lag),
    num AS (
        SELECT a.event_type, l.lag,
               count(*) AS n_pairs, sum(a.dv * b.dv) AS num
        FROM dev a CROSS JOIN lags l
        JOIN dev b ON b.event_type = a.event_type
                  AND b.hour_start = a.hour_start + to_hours(l.lag)
        GROUP BY 1, 2
    )
    SELECT n.event_type, CAST(n.lag AS INT) AS lag,
           CAST(n.n_pairs AS BIGINT) AS n_pairs,
           round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS acf
    FROM num n JOIN den d USING (event_type)
    WHERE d.den > 0
    """,
    tags=("events", "timeseries", "autocorrelation"),
)
def hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the dense hourly count series per event
    type, lags 1..24 — the is-there-a-daily-cycle diagnostic that decides
    whether a seasonal model (or a per-hour-of-day baseline) is worth
    building, and the quantitative cousin of event_burstiness.

    Determinism: with S = sum(x) and n = series length, the mean-centered
    deviation n*x_t - S is an INTEGER, so r_k = sum(dv_t * dv_{t+k}) /
    sum(dv_t^2) is a ratio of two exact integer sums (the n^2 factors
    cancel) with ONE terminal double division — order-free, engine-exact.
    Scale: stats and the denominator are one grouped pass over the
    hours x types grid; lagged pairs come from a <=24x fan-out equi-join
    on (event_type, shifted hour) — never an unbounded per-type window,
    never the raw event table twice. Product sums are DECIMAL(38,0).
    """
    return autocorrelation_over_dense(events_hourly_gapfill(spark, sf_dir))


def autocorrelation_over_dense(dense: DataFrame) -> DataFrame:
    """The ACF core over ANY dense (hour_start, event_type, event_count)
    frame — reused by the batch query above and by the streaming
    composition (incrementally-maintained hourly state densified per
    refresh; parity-tested in tests/test_streaming_llm.py), the same
    seam as anomalies_over_dense."""
    stats = dense.groupBy("event_type").agg(
        F.count("*").alias("_n"), F.sum("event_count").alias("_s")
    )
    dev = dense.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "hour_start",
        (F.col("_n") * F.col("event_count") - F.col("_s"))
        .cast("long")
        .alias("dv"),
    )
    dec = lambda c: c.cast("decimal(38,0)")
    den = dev.groupBy("event_type").agg(
        F.sum(dec(F.col("dv")) * F.col("dv")).alias("_den")
    )
    lags = F.explode(
        F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))
    ).alias("lag")
    a = dev.select("event_type", "hour_start", F.col("dv").alias("_dva"), lags)
    b = dev.select(
        "event_type",
        F.col("hour_start").alias("_hb"),
        F.col("dv").alias("_dvb"),
    )
    num = (
        a.join(
            b,
            (a["event_type"] == b["event_type"])
            & (
                b["_hb"]
                == F.timestamp_add("HOUR", F.col("lag"), F.col("hour_start"))
            ),
        )
        .drop(b["event_type"])
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(dec(F.col("_dva")) * F.col("_dvb")).alias("_num"),
        )
    )
    return (
        num.join(F.broadcast(den), "event_type")
        .filter(F.col("_den") > 0)
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                F.col("_num").cast("double") / F.col("_den").cast("double"), 6
            ).alias("acf"),
        )
    )


# Truncated EWMA: s_t = sum_j w_j * x_{t-j} / sum_j w_j over a FIXED
# 24-lag memory (w_j = 0.7^j). The infinite-memory recurrence is a linear
# scan — inherently sequential and float-order-dependent; truncating at
# K=24 (residual weight 0.7^24 ~ 1.9e-4) turns it into a bounded windowed
# weighted sum: order-free, engine-exact, and shuffle-bounded by the
# hours x types grid. Weights enter BOTH engines as identical python-repr
# double literals (the RBO discipline) and every term is 1e-9-quantized.
_EWMA_K = 24
_EWMA_W = [0.7**j for j in range(_EWMA_K)]
_EWMA_WSUM = repr(sum(_EWMA_W))


@register(
    "hourly_ewma_trend",
    oracle=f"""
    WITH {_DENSE_HOURLY_CTE},
    wts AS (
        SELECT unnest(range(0, {_EWMA_K})) AS j,
               unnest([{", ".join(repr(w) for w in _EWMA_W)}]) AS wt
    ),
    terms AS (
        SELECT a.event_type, a.hour_start, a.event_count,
               CAST(round(w.wt * b.event_count * 1e9) AS BIGINT) AS tq
        FROM dense a CROSS JOIN wts w
        JOIN dense b ON b.event_type = a.event_type
                    AND b.hour_start = a.hour_start - to_hours(w.j)
    )
    SELECT event_type, hour_start, any_value(event_count) AS event_count,
           round(CAST(sum(tq) AS DOUBLE) / 1e9 / {_EWMA_WSUM}, 6) AS ewma
    FROM terms
    GROUP BY 1, 2
    HAVING count(*) = {_EWMA_K}
    """,
    tags=("events", "timeseries", "smoothing"),
)
def hourly_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the dense hourly count
    series per event type (beta=0.7, 24-hour truncated memory, full
    window required) — the smoothed trend line a dashboard draws over the
    spiky raw series, and the baseline hourly_anomalies deviates from.

    Scale: the lagged terms come from a <=24x fan-out equi-join of the
    hours x types grid against itself on (event_type, shifted hour) —
    the same no-unbounded-window shape as hourly_autocorrelation; the
    raw event table is scanned once (inside the gap-fill). Each term
    w_j * x is quantized to 1e-9 BIGINTs before the order-free sum; one
    terminal double division per output row."""
    return ewma_over_dense(events_hourly_gapfill(spark, sf_dir))


def ewma_over_dense(dense: DataFrame) -> DataFrame:
    """The truncated-EWMA core over ANY dense (hour_start, event_type,
    event_count) frame — the anomalies_over_dense composition seam; the
    streaming leg runs it over incrementally-maintained hourly state
    (parity-tested in tests/test_streaming_llm.py)."""
    wts = F.array(*[F.lit(w) for w in _EWMA_W])
    a = dense.select(
        "event_type",
        "hour_start",
        "event_count",
        F.explode(F.sequence(F.lit(0), F.lit(_EWMA_K - 1))).alias("j"),
    ).withColumn("wt", F.element_at(wts, F.col("j") + 1))
    b = dense.select(
        "event_type",
        F.col("hour_start").alias("_hb"),
        F.col("event_count").alias("_xb"),
    )
    terms = a.join(
        b,
        (a["event_type"] == b["event_type"])
        & (
            b["_hb"]
            == F.timestamp_add("HOUR", -F.col("j"), F.col("hour_start"))
        ),
    ).drop(b["event_type"])
    return (
        terms.groupBy("event_type", "hour_start")
        .agg(
            F.any_value(F.col("event_count")).alias("event_count"),
            F.sum(
                F.round(F.col("wt") * F.col("_xb") * 1e9).cast("long")
            ).alias("_sq"),
            F.count("*").alias("_nw"),
        )
        .filter(F.col("_nw") == _EWMA_K)
        .select(
            "event_type",
            "hour_start",
            F.col("event_count").cast("long").alias("event_count"),
            F.round(
                F.col("_sq").cast("double") / 1e9 / float(_EWMA_WSUM), 6
            ).alias("ewma"),
        )
    )


# ---------------------------------------------------------------------------
# Hour-of-day seasonal baseline + residual outliers: the MODEL for the
# cycle hourly_autocorrelation detects. A per-(type, hour-of-day) mean is
# the simplest seasonal profile; the biggest |observed - expected| hours
# are the alerts a flat trailing-window z-score (hourly_anomalies) gets
# wrong twice a day at the cycle's peaks and troughs.
# ---------------------------------------------------------------------------


@register(
    "seasonal_hourly_baseline",
    oracle=f"""
    WITH {_DENSE_HOURLY_CTE},
    hod AS (
        SELECT hour_start, event_type, event_count,
               EXTRACT(hour FROM hour_start) AS hh
        FROM dense
    ),
    hodbase AS (
        SELECT event_type, hh, count(*) AS n_h, sum(event_count) AS s_h
        FROM hod GROUP BY 1, 2
    )
    SELECT event_type, hour_start,
           CAST(event_count AS BIGINT) AS event_count,
           round(CAST(s_h AS DOUBLE) / CAST(n_h AS DOUBLE), 6) AS expected,
           round(CAST(n_h * event_count - s_h AS DOUBLE)
                 / CAST(n_h AS DOUBLE), 6) AS residual
    FROM hod JOIN hodbase USING (event_type, hh)
    ORDER BY abs(CAST(n_h * event_count - s_h AS DOUBLE)
                 / CAST(n_h AS DOUBLE)) DESC,
             event_type ASC, hour_start ASC
    LIMIT 50
    """,
    tags=("events", "timeseries", "seasonal"),
)
def seasonal_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 50 hours deviating most from their hour-of-day seasonal
    baseline, per event type: observed count, the per-(type, hour-of-day)
    expected mean, and the residual — seasonality-aware anomaly triage
    over the dense gap-filled series.

    Determinism: the deviation n_h*x - s_h is an exact INTEGER per row
    (n_h, s_h are the hour-of-day class's count/sum), divided once for
    display and once (unrounded) for ordering, with a total
    (event_type, hour_start) tie-break. Scale: one grouped pass over the
    hours x types grid builds the <=types x 24-row baseline, broadcast
    back — never a second event scan, no window at all."""
    return seasonal_over_dense(events_hourly_gapfill(spark, sf_dir))


def seasonal_over_dense(dense: DataFrame) -> DataFrame:
    """The seasonal-residual core over ANY dense (hour_start, event_type,
    event_count) frame — the anomalies_over_dense composition seam
    (streaming parity in tests/test_streaming_llm.py)."""
    hod = dense.withColumn("hh", F.hour("hour_start"))
    base = hod.groupBy("event_type", "hh").agg(
        F.count("*").alias("n_h"), F.sum("event_count").alias("s_h")
    )
    dev = (F.col("n_h") * F.col("event_count") - F.col("s_h")).cast("long")
    resid = dev.cast("double") / F.col("n_h").cast("double")
    return (
        hod.join(F.broadcast(base), ["event_type", "hh"])
        .select(
            "event_type",
            "hour_start",
            F.col("event_count").cast("long").alias("event_count"),
            F.round(
                F.col("s_h").cast("double") / F.col("n_h").cast("double"), 6
            ).alias("expected"),
            F.round(resid, 6).alias("residual"),
            F.abs(resid).alias("_ord"),
        )
        .orderBy(
            F.desc("_ord"), F.asc("event_type"), F.asc("hour_start")
        )
        .limit(50)
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# Stationary distribution of the event-type Markov chain — where user
# behavior settles in the long run, the one-vector summary of
# event_transition_matrix. The chain solve is O(states^2) on a
# states^2-bounded frame, so it runs driver-side (the IVF-centroid /
# union-find-chooser class of bounded collect); the distributed work is
# the transition count aggregate. All iteration arithmetic is INTEGER
# (1e-9-quantized probabilities, floor(x+0.5) rounding, integer-div
# renormalization), so a 16-step unrolled CTE replays it bit-for-bit.
# ---------------------------------------------------------------------------

_MARKOV_ITERS = 16


def _markov_oracle() -> str:
    its = []
    prev = "it0"
    for k in range(1, _MARKOV_ITERS + 1):
        its.append(
            f"""it{k} AS (
        SELECT s.state, CAST(coalesce(x.d, 0) AS BIGINT) AS d
        FROM states s LEFT JOIN (
            SELECT m.j AS state,
                   CAST((sum(p.d * m.p) + 500000000) // 1000000000
                        AS BIGINT) AS d
            FROM {prev} p JOIN mat m ON m.i = p.state GROUP BY 1
        ) x USING (state)
    )"""
        )
        prev = f"it{k}"
    return f"""
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ),
    trans AS (
        SELECT from_type, to_type, count(*) AS n
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2
    ),
    states AS (
        SELECT DISTINCT from_type AS state FROM trans
        UNION SELECT DISTINCT to_type FROM trans
    ),
    rowtot AS (SELECT from_type, sum(n) AS r FROM trans GROUP BY 1),
    obs AS (
        SELECT t.from_type AS i, t.to_type AS j,
               CAST(floor(1e9 * CAST(t.n AS DOUBLE) / CAST(rt.r AS DOUBLE)
                          + 0.5) AS BIGINT) AS p
        FROM trans t JOIN rowtot rt USING (from_type)
    ),
    dangling AS (
        SELECT state AS i, state AS j, CAST(1000000000 AS BIGINT) AS p
        FROM states
        WHERE state NOT IN (SELECT from_type FROM trans)
    ),
    mat AS (SELECT * FROM obs UNION ALL SELECT * FROM dangling),
    nstates AS (SELECT count(*) AS s FROM states),
    it0 AS (
        SELECT state, CAST(1000000000 // s AS BIGINT) AS d
        FROM states CROSS JOIN nstates
    ),
    {",".join(its)}
    SELECT state AS event_type, d AS prob_q,
           CAST(d AS DOUBLE) / 1e9 AS stationary_prob
    FROM it{_MARKOV_ITERS} ORDER BY event_type
    """


def _markov_entropy_oracle() -> str:
    """Same 16-step chain, finished with the quantized entropy terms."""
    base = _markov_oracle()
    head, _, _ = base.rpartition("SELECT state AS event_type")
    return (
        head.rstrip()
        + ",\n    "
        + f"""hterm AS (
        SELECT m.i AS state,
               CAST(floor(1e9 * (CAST(m.p AS DOUBLE) / 1e9)
                          * ln(1e9 / CAST(m.p AS DOUBLE)) + 0.5)
                    AS BIGINT) AS hq
        FROM mat m WHERE m.p > 0
    ),
    hsum AS (SELECT state, sum(hq) AS hq FROM hterm GROUP BY 1)
    SELECT f.state AS event_type,
           CAST(f.d AS DOUBLE) / 1e9 AS stationary_prob,
           CAST(coalesce(h.hq, 0) AS DOUBLE) / 1e9 AS cond_entropy_nats,
           CAST((f.d * coalesce(h.hq, 0) + 500000000) // 1000000000
                AS BIGINT) AS rate_contrib_q
    FROM it{_MARKOV_ITERS} f LEFT JOIN hsum h USING (state)
    ORDER BY event_type
    """
    )


@register(
    "event_markov_stationary",
    oracle=_markov_oracle(),
    tags=("events", "sequence", "markov", "iterative"),
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type chain after 16
    quantized power-iteration steps from uniform — the long-run share of
    attention each event type commands, with dangling states (no
    outgoing transitions) given a self-loop (the PageRank fix).

    Determinism: transition probabilities are 1e-9-quantized BIGINTs via
    floor(x+0.5) (one double division each); every iteration is integer
    multiply-sum + half-up integer division — the logreg unrolled-CTE
    discipline, so the oracle replays all 16 steps exactly. Scale: the
    ONLY data-proportional work is the distributed lead()+count pass
    (same exchange as sessionization); the collected matrix is
    states^2-bounded and the solve is driver-side python."""
    states, _mat, d = _markov_solve(spark, sf_dir)
    rows = [(s, d[s], d[s] / 1e9) for s in states]
    return spark.createDataFrame(
        rows, "event_type string, prob_q long, stationary_prob double"
    )


def _markov_solve(
    spark: SparkSession, sf_dir: str
) -> tuple[list, dict, dict]:
    """Distributed transition counts -> quantized matrix + 16-step solve
    (states, mat[(i,j)] -> p_q, d[state] -> pi_q) — shared by the
    stationary and entropy-rate queries; arithmetic mirrors the unrolled
    CTE oracles exactly."""
    import math

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    trans = (
        pairs.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    counts = {(r.from_type, r.to_type): r.n for r in trans}
    states = sorted(
        {i for i, _ in counts} | {j for _, j in counts}
    )
    rowtot: dict[str, int] = {}
    for (i, _), n in counts.items():
        rowtot[i] = rowtot.get(i, 0) + n
    mat: dict[tuple[str, str], int] = {
        (i, j): int(math.floor(1e9 * n / rowtot[i] + 0.5))
        for (i, j), n in counts.items()
    }
    for s in states:
        if s not in rowtot:
            mat[(s, s)] = 1_000_000_000
    d = {s: 1_000_000_000 // len(states) for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt = {s: 0 for s in states}
        for (i, j), p in mat.items():
            nxt[j] += d[i] * p
        d = {s: (v + 500_000_000) // 1_000_000_000 for s, v in nxt.items()}
    return states, mat, d


@register(
    "event_markov_entropy_rate",
    oracle=_markov_entropy_oracle(),
    tags=("events", "sequence", "markov", "iterative"),
)
def event_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy and stationary-weighted entropy-rate
    contributions of the event-type chain: H_i = -sum_j p_ij ln p_ij in
    nats, and rate_contrib_q = the 1e-9-quantized pi_i * H_i term whose
    sum over states is the chain's entropy rate — how predictable the
    NEXT event is from the current one, the information-theoretic summary
    behind event_transition_matrix (uniform rows -> ln(S); deterministic
    rows -> 0; dangling self-loops contribute exactly 0).

    Determinism: each -p ln p term is computed from the 1e-9-quantized
    transition integers with ONE fixed double expression and re-quantized
    via floor(x+0.5); the pi weighting is pure integer multiply +
    half-up integer division. Scale: same shape as
    event_markov_stationary (one distributed count pass, states^2
    driver solve)."""
    import math

    states, mat, d = _markov_solve(spark, sf_dir)
    hq: dict[str, int] = {s: 0 for s in states}
    for (i, _j), p in mat.items():
        if p > 0:
            hq[i] += int(
                math.floor(1e9 * (p / 1e9) * math.log(1e9 / p) + 0.5)
            )
    rows = [
        (
            s,
            d[s] / 1e9,
            hq[s] / 1e9,
            (d[s] * hq[s] + 500_000_000) // 1_000_000_000,
        )
        for s in states
    ]
    return spark.createDataFrame(
        rows,
        "event_type string, stationary_prob double, "
        "cond_entropy_nats double, rate_contrib_q long",
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution: per-channel conversion credit under the three
# standard models (first-touch, last-touch, linear), computed from a
# bounded-lookback interval join — the marketing-analytics shape every
# event warehouse runs, and at scale the trap is the touch x conversion
# join, which range_join_binned keeps an equi-join.
# ---------------------------------------------------------------------------


def _attribution_touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared attribution first stage: (touch, purchase) pairs within the
    6h lookback, built by the binned interval equi-join (4 bucket
    replicas per purchase window, never an inequality nested loop)."""
    from ..operators.joins import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("channel"),
    )
    conv = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (F.col("ts") - F.expr("INTERVAL 6 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    return range_join_binned(
        touches, conv, on="user_id", ts_col="touch_ts",
        start_col="w_start", end_col="w_end", bucket_seconds=2 * 3600,
    )


@register(
    "purchase_attribution",
    oracle="""
    WITH conv AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT e.event_type AS channel, e.ts, e.event_id, p.purchase_id
        FROM events e
        JOIN conv p
          ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL 6 HOUR AND e.ts < p.ts
        WHERE e.event_type IN ('click', 'view')
    ),
    ranked AS (
        SELECT channel, purchase_id,
               row_number() OVER (
                   PARTITION BY purchase_id ORDER BY ts, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY purchase_id) AS n
        FROM touch
    )
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(count(DISTINCT purchase_id) AS BIGINT) AS touched_purchases,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(sum(CASE WHEN rn = n THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch,
           CAST(sum((2000000000 + n) // (2 * n)) AS BIGINT) AS linear_nanos,
           round(CAST(sum((2000000000 + n) // (2 * n)) AS DOUBLE) / 1e9, 6)
               AS linear_credit
    FROM ranked
    GROUP BY channel
    ORDER BY channel
    """,
    tags=("events", "attribution", "range-join"),
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion credit per touch channel (click / view) for every
    purchase, under first-touch, last-touch, and linear attribution over
    a 6-hour lookback window (touches strictly before the purchase).

    Determinism: touch order within a purchase is (ts, event_id) — a
    total order — and linear credit is the half-up integer
    round(1e9/n) in nanocredits, so the per-channel sums are exact
    integers cross-engine (the float `linear_credit` is a single
    division of that exact sum).

    Scale: the touch x purchase pairing is `range_join_binned` — an
    EQUI-join on (user_id, 2h-bucket) with bounded interval fan-out of
    ceil(6h/2h)+1 = 4 replicas per purchase — never an inequality
    nested loop; per-purchase ranking is a keyed window whose partition
    size is capped by the lookback fan-in. One final channel-keyed
    aggregate (5 channels)."""
    matched = _attribution_touches(spark, sf_dir)
    w = Window.partitionBy("purchase_id").orderBy("touch_ts", "touch_id")
    ranked = matched.select(
        "channel",
        "purchase_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("purchase_id")).alias("n"),
    )
    nanos = F.expr("(2000000000 + n) div (2 * n)")
    return (
        ranked.groupBy("channel")
        .agg(
            F.count("*").alias("n_touches"),
            F.countDistinct("purchase_id").alias("touched_purchases"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("first_touch"),
            F.sum(F.when(F.col("rn") == F.col("n"), 1).otherwise(0))
            .cast("long")
            .alias("last_touch"),
            F.sum(nanos).cast("long").alias("linear_nanos"),
            F.round(
                F.sum(nanos).cast("double") / F.lit(1e9), 6
            ).alias("linear_credit"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Rollup lattice (continuous-aggregate reuse, the hypertable pattern):
# hour partials are computed ONCE from raw events; day re-aggregates the
# hour partials and week re-aggregates day — every measure is a monoid
# (count-sum / sum / max), so reuse is EXACT, and the oracle proves it by
# computing each grain directly from the raw table.
# ---------------------------------------------------------------------------


@register(
    "events_rollup_lattice",
    oracle="""
    SELECT 'hour' AS grain,
           date_trunc('hour', ts) AS bucket_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP),
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT),
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP),
           CAST(count(*) AS BIGINT),
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT),
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
    FROM events GROUP BY 2
    ORDER BY grain, bucket_start
    """,
    tags=("events", "window-time", "rollup", "lattice"),
)
def events_rollup_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour -> day -> week rollup lattice over event counts, value-cents
    sums, and value-cents maxima — the continuous-aggregate /
    hypertable-rollup pattern: raw data is scanned ONCE (hour partials);
    each coarser grain re-aggregates the next finer one, which is exact
    because every measure is a commutative monoid (count rolls up as
    sum-of-counts, sum as sum, max as max). The DuckDB oracle computes
    all three grains directly from the raw table, so a green row IS the
    proof that partial reuse loses nothing.

    Buckets come from F.window (native in the timestamp domain — the
    module-header NTZ note); the week window uses startTime='4 days' to
    shift epoch-aligned 7-day windows onto Mondays, matching
    date_trunc('week'). Scale: at 100 TB the hour partials are the only
    data-proportional aggregate; they are then COLLECTED as an
    hours-bounded sidecar (|hours| rows — ~88k for a decade, the same
    bounded-driver-read class as the range-partition offset sidecars),
    so day/week derive from a local frame and the raw table is scanned
    exactly once — without this the three union branches each replay
    the scan (verified in the physical plan before the fix). The same
    partials are what the incremental-agg sink maintains under
    streaming ingest."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    hour_rows = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("total_cents"),
            F.max(cents).alias("max_cents"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "n_events",
            "total_cents",
            "max_cents",
        )
        .collect()
    )
    hour = spark.createDataFrame(
        hour_rows,
        "bucket_start timestamp_ntz, n_events bigint, "
        "total_cents bigint, max_cents bigint",
    )
    def _rollup(finer: DataFrame, duration: str, start: str | None) -> DataFrame:
        w = (
            F.window("bucket_start", duration, duration, start)
            if start
            else F.window("bucket_start", duration)
        )
        return (
            finer.groupBy(w.alias("w"))
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("total_cents").alias("total_cents"),
                F.max("max_cents").alias("max_cents"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                "n_events",
                "total_cents",
                "max_cents",
            )
        )

    day = _rollup(hour, "1 day", None)
    week = _rollup(day, "7 days", "4 days")
    tag = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("grain"),
        "bucket_start",
        "n_events",
        "total_cents",
        "max_cents",
    )
    return (
        tag(hour, "hour")
        .unionByName(tag(day, "day"))
        .unionByName(tag(week, "week"))
        .orderBy("grain", "bucket_start")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — the data-driven alternative to the
# positional first/last/linear models of purchase_attribution: credit a
# channel by how much the chain's conversion probability DROPS when the
# channel is removed (transitions into it redirected to NULL). Same
# quantized-integer iteration discipline as event_markov_stationary, so
# the oracle replays the whole solve bit-for-bit.
# ---------------------------------------------------------------------------

_ATTR_ITERS = 16
_ATTR_CHANNELS = ("click", "view")


def _attr_journeys_sql() -> str:
    """Shared CTE prefix: purchase-terminated journeys -> quantized
    transition matrix over {START, channels} -> {channels, CONV, NULL}."""
    return """
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS st,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isconv
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase')
    ),
    seq AS (
        SELECT *, coalesce(sum(isconv) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS jid
        FROM ev
    ),
    jrows AS (
        SELECT user_id, jid, st,
               row_number() OVER (
                   PARTITION BY user_id, jid ORDER BY ts, event_id
               ) AS rn,
               count(*) OVER (PARTITION BY user_id, jid) AS cnt,
               lead(st) OVER (
                   PARTITION BY user_id, jid ORDER BY ts, event_id
               ) AS nxt
        FROM seq
    ),
    trans AS (
        SELECT 'START' AS i, st AS j FROM jrows WHERE rn = 1
        UNION ALL
        SELECT st, nxt FROM jrows WHERE nxt IS NOT NULL
        UNION ALL
        SELECT st, 'NULL' FROM jrows WHERE rn = cnt AND st <> 'CONV'
    ),
    tc AS (SELECT i, j, count(*) AS n FROM trans GROUP BY 1, 2),
    rowtot AS (SELECT i, sum(n) AS r FROM tc GROUP BY 1),
    mat AS MATERIALIZED (
        SELECT t.i, t.j,
               CAST(floor(1e9 * CAST(t.n AS DOUBLE) / CAST(rt.r AS DOUBLE)
                          + 0.5) AS BIGINT) AS p
        FROM tc t JOIN rowtot rt USING (i)
    ),
    tstates AS MATERIALIZED (SELECT DISTINCT i AS state FROM mat)"""


def _attribution_markov_oracle() -> str:
    scen = [("full", "")] + [(c, c) for c in _ATTR_CHANNELS]
    ctes = []
    for tag, pinned in scen:
        ctes.append(
            f"s_{tag}_it0 AS MATERIALIZED (SELECT state, CAST(0 AS BIGINT) AS v"
            " FROM tstates)"
        )
        for k in range(1, _ATTR_ITERS + 1):
            ctes.append(
                f"""s_{tag}_it{k} AS MATERIALIZED (
        SELECT ts.state,
               CASE WHEN ts.state = '{pinned}' THEN CAST(0 AS BIGINT)
                    ELSE CAST(coalesce(x.v, 0) AS BIGINT) END AS v
        FROM tstates ts LEFT JOIN (
            SELECT m.i AS state,
                   CAST((sum(m.p * CASE WHEN m.j = 'CONV'
                                        THEN 1000000000
                                        WHEN m.j = 'NULL' THEN 0
                                        WHEN m.j = '{pinned}' THEN 0
                                        ELSE coalesce(pv.v, 0) END)
                         + 500000000) // 1000000000 AS BIGINT) AS v
            FROM mat m
            LEFT JOIN s_{tag}_it{k - 1} pv ON pv.state = m.j
            GROUP BY 1
        ) x USING (state)
    )"""
            )
    last = f"it{_ATTR_ITERS}"
    rc_union = "\n        UNION ALL\n        ".join(
        f"SELECT '{c}' AS channel, v FROM s_{c}_{last} WHERE state = 'START'"
        for c in _ATTR_CHANNELS
    )
    return (
        _attr_journeys_sql()
        + ",\n    "
        + ",\n    ".join(ctes)
        + f""",
    base AS (SELECT v FROM s_full_{last} WHERE state = 'START'),
    rc AS (
        {rc_union}
    ),
    tot AS (
        SELECT count(*) AS n FROM events WHERE event_type = 'purchase'
    ),
    re AS (
        SELECT rc.channel, rc.v AS rv, b.v AS bv,
               CAST(1000000000
                    - (rc.v * 1000000000 + b.v // 2) // b.v
                    AS BIGINT) AS re_q
        FROM rc CROSS JOIN base b
    ),
    resum AS (SELECT sum(re_q) AS s FROM re)
    SELECT re.channel,
           CAST(re.bv AS DOUBLE) / 1e9 AS base_conv_prob,
           CAST(re.rv AS DOUBLE) / 1e9 AS removal_conv_prob,
           CAST(re.re_q AS DOUBLE) / 1e9 AS removal_effect,
           CAST(t.n * re.re_q AS DOUBLE) / CAST(rs.s AS DOUBLE)
               AS attributed_conversions
    FROM re CROSS JOIN tot t CROSS JOIN resum rs
    ORDER BY re.channel
    """
    )


@register(
    "attribution_markov_removal",
    oracle=_attribution_markov_oracle(),
    tags=("events", "attribution", "markov", "iterative"),
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain (removal-effect) attribution: per-user event streams
    become purchase-terminated journeys START -> touches -> CONV/NULL;
    the quantized transition chain's absorption probability into CONV is
    solved by 16 integer power-iteration steps, once for the full chain
    and once per channel with that channel's inbound mass redirected to
    NULL (equivalently: its value pinned to 0). A channel's removal
    effect 1 - P_removed/P_full, normalized across channels, apportions
    the observed conversions.

    Determinism: probabilities are 1e-9-quantized BIGINTs; every
    iteration is integer multiply-sum + ONE half-up integer division per
    state, and the removal ratio is a single half-up integer division —
    the oracle unrolls all 3x16 steps and replays them bit-for-bit
    (the logreg/stationary discipline applied to an absorption solve).

    Scale: the only data-proportional work is journey construction —
    two user-keyed window passes (prefix conversion count, then
    per-journey rank/lead) on the SAME exchange as sessionization — and
    a transition count aggregate whose key domain is (channels+1) x
    (channels+2); the solve itself is driver-side on that bounded
    matrix. Reference has no attribution; this extends the funnel/
    session family (SURVEY.md §2 events analytics)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*(_ATTR_CHANNELS + ("purchase",)))
    )
    st = F.when(F.col("event_type") == "purchase", F.lit("CONV")).otherwise(
        F.col("event_type")
    )
    isconv = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        st.alias("st"),
        F.coalesce(
            F.sum(isconv).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("jid"),
    )
    wj = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    jrows = seq.select(
        "st",
        F.row_number().over(wj).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id", "jid")).alias("cnt"),
        F.lead("st").over(wj).alias("nxt"),
    )
    trans = (
        jrows.filter(F.col("rn") == 1)
        .select(F.lit("START").alias("i"), F.col("st").alias("j"))
        .unionByName(
            jrows.filter(F.col("nxt").isNotNull()).select(
                F.col("st").alias("i"), F.col("nxt").alias("j")
            )
        )
        .unionByName(
            jrows.filter(
                (F.col("rn") == F.col("cnt")) & (F.col("st") != "CONV")
            ).select(F.col("st").alias("i"), F.lit("NULL").alias("j"))
        )
        .groupBy("i", "j")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    import math

    counts = {(r.i, r.j): r.n for r in trans}
    rowtot: dict[str, int] = {}
    for (i, _), n in counts.items():
        rowtot[i] = rowtot.get(i, 0) + n
    mat = {
        (i, j): int(math.floor(1e9 * n / rowtot[i] + 0.5))
        for (i, j), n in counts.items()
    }
    transient = sorted(rowtot)

    def solve(pinned: str) -> int:
        v = {s: 0 for s in transient}
        for _ in range(_ATTR_ITERS):
            nxt = {}
            for s in transient:
                if s == pinned:
                    nxt[s] = 0
                    continue
                acc = 0
                for (i, j), p in mat.items():
                    if i != s:
                        continue
                    if j == "CONV":
                        acc += p * 1_000_000_000
                    elif j == "NULL" or j == pinned:
                        continue
                    else:
                        acc += p * v.get(j, 0)
                nxt[s] = (acc + 500_000_000) // 1_000_000_000
            v = nxt
        return v.get("START", 0)

    base = solve("")
    total_conv = sum(n for (i, j), n in counts.items() if j == "CONV")
    rc = {c: solve(c) for c in _ATTR_CHANNELS}
    re_q = {
        c: (
            1_000_000_000 - (rc[c] * 1_000_000_000 + base // 2) // base
            if base
            else 0
        )
        for c in _ATTR_CHANNELS
    }
    sum_re = sum(re_q.values())
    rows = [
        (
            c,
            base / 1e9,
            rc[c] / 1e9,
            re_q[c] / 1e9,
            (total_conv * re_q[c]) / sum_re if sum_re else 0.0,
        )
        for c in _ATTR_CHANNELS
    ]
    return spark.createDataFrame(
        rows,
        "channel string, base_conv_prob double, removal_conv_prob double, "
        "removal_effect double, attributed_conversions double",
    ).orderBy("channel")


# ---------------------------------------------------------------------------
# Linear time-decay attribution: the fourth model over the same bounded-
# lookback touch frame. LINEAR decay (weight = remaining window fraction)
# rather than exponential, deliberately: 2^(-dt/h) would ride each
# engine's libm pow() and diverge in the last ulp, while the linear
# weight is ONE half-up integer division — exact cross-engine.
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 6 * 3600 * 1_000_000  # the 6h lookback in microseconds


@register(
    "purchase_attribution_time_decay",
    oracle=f"""
    WITH conv AS (
        SELECT event_id AS purchase_id, user_id, ts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT e.event_type AS channel,
               epoch_us(p.ts) - epoch_us(e.ts) AS age_us
        FROM events e
        JOIN conv p
          ON e.user_id = p.user_id
         AND e.ts >= p.ts - INTERVAL 6 HOUR AND e.ts < p.ts
        WHERE e.event_type IN ('click', 'view')
    ),
    weighted AS (
        SELECT channel,
               (({_ATTR_WINDOW_US} - age_us) * 1000000
                + {_ATTR_WINDOW_US // 2}) // {_ATTR_WINDOW_US} AS w_q
        FROM touch
    ),
    per AS (
        SELECT channel,
               CAST(count(*) AS BIGINT) AS n_touches,
               CAST(sum(w_q) AS BIGINT) AS decay_q
        FROM weighted GROUP BY channel
    ),
    tot AS (SELECT sum(decay_q) AS t FROM per)
    SELECT channel, n_touches, decay_q,
           CAST(decay_q AS DOUBLE) / CAST(t AS DOUBLE) AS decay_share
    FROM per CROSS JOIN tot
    ORDER BY channel
    """,
    tags=("events", "attribution", "range-join"),
)
def purchase_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-channel conversion credit under LINEAR time decay: each touch
    in the 6h lookback weighs (remaining window)/(window) at micro-unit
    quantization — a fresh touch ~1e6, a touch at the window edge ~0 —
    summed per channel, with the share one double division of exact
    integer sums. Microsecond ages via timestampdiff (NTZ-safe,
    codegen); weight is one half-up integer division so the model is
    bit-exact cross-engine (exponential decay would diverge on libm
    pow). Same binned interval equi-join and channel-keyed aggregate
    shape as purchase_attribution."""
    matched = _attribution_touches(spark, sf_dir)
    w_q = F.expr(
        f"(({_ATTR_WINDOW_US} - timestampdiff(MICROSECOND, touch_ts, w_end))"
        f" * 1000000 + {_ATTR_WINDOW_US // 2}) div {_ATTR_WINDOW_US}"
    )
    per = matched.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.sum(w_q).cast("long").alias("decay_q"),
    )
    tot = per.agg(F.sum("decay_q").alias("_t"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "channel",
            "n_touches",
            "decay_q",
            (F.col("decay_q").cast("double") / F.col("_t").cast("double"))
            .alias("decay_share"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Holt-Winters triple exponential smoothing (additive, m=24) over the
# dense hourly series — the forecasting completion of the time-series
# family (gapfill -> ACF -> EWMA -> seasonal baseline -> CUSUM -> HW).
# Smoothing factors are POWER-OF-2 rationals (alpha=1/4, beta=1/8,
# gamma=1/4), so every update is integer multiply-add + ONE sign-safe
# half-up division: the whole recursion is exact integer state, and the
# oracle replays it with a SEQUENTIAL RECURSIVE CTE carrying
# (level, trend, 24-slot seasonal LIST) — the recursion-as-data twin of
# the unrolled-CTE discipline, for depths (720 hours) no unroll could.
# ---------------------------------------------------------------------------

_HW_Q = 1_000_000


def _hw_ssdiv(w: str, d: int) -> str:
    return (
        f"CASE WHEN ({w}) >= 0 THEN (({w}) + {d // 2}) // {d} "
        f"ELSE -((-({w}) + {d // 2}) // {d}) END"
    )


def _hw_oracle() -> str:
    q = _HW_Q
    l_new = _hw_ssdiv(
        f"(d.y * {q} - r.s[CAST((r.t % 24) AS INTEGER) + 1])"
        " + 3 * (r.l + r.b)",
        4,
    )
    b_new = _hw_ssdiv("(x.l_new - x.lprev) + 7 * x.bprev", 8)
    s_new = _hw_ssdiv(f"(x.y * {q} - x.l_new) + 3 * x.sprev", 4)
    l0 = _hw_ssdiv(f"ysum * {q}", 24)
    return f"""
    WITH RECURSIVE
    hc AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS y
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
    dense AS (
        SELECT g.h AS hour_start, CAST(coalesce(hc.y, 0) AS BIGINT) AS y,
               CAST(row_number() OVER (ORDER BY g.h) - 1 AS BIGINT) AS idx
        FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
        LEFT JOIN hc ON hc.h = g.h
    ),
    nrows AS (SELECT count(*) AS n FROM dense),
    l0 AS (
        SELECT CAST({l0} AS BIGINT) AS l
        FROM (SELECT sum(y) AS ysum FROM dense WHERE idx < 24)
    ),
    s0 AS (
        SELECT list(y * {q} - l0.l ORDER BY idx) AS s
        FROM dense, l0 WHERE idx < 24
    ),
    rec AS (
        SELECT FALSE AS emit, CAST(24 AS BIGINT) AS t,
               CAST(NULL AS TIMESTAMP) AS hour_start,
               CAST(NULL AS BIGINT) AS y,
               l0.l AS l, CAST(0 AS BIGINT) AS b, s0.s AS s,
               CAST(NULL AS BIGINT) AS snew, CAST(NULL AS BIGINT) AS fitted
        FROM l0, s0
        UNION ALL
        SELECT TRUE, x.t, x.hour_start, x.y,
               x.l_new,
               CAST({b_new} AS BIGINT),
               x.slist[1:x.pos] || [CAST({s_new} AS BIGINT)]
                   || x.slist[x.pos + 2:],
               CAST({s_new} AS BIGINT),
               x.fitted
        FROM (
            SELECT r.t + 1 AS t, d.hour_start, d.y,
                   r.l AS lprev, r.b AS bprev, r.s AS slist,
                   CAST((r.t % 24) AS INTEGER) AS pos,
                   r.s[CAST((r.t % 24) AS INTEGER) + 1] AS sprev,
                   CAST({l_new} AS BIGINT) AS l_new,
                   r.l + r.b + r.s[CAST((r.t % 24) AS INTEGER) + 1]
                       AS fitted
            FROM rec r JOIN dense d ON d.idx = r.t
            WHERE r.t < (SELECT n FROM nrows)
        ) x
    )
    SELECT hour_start, y AS event_count, l AS level_q, b AS trend_q,
           snew AS seasonal_q, fitted AS fitted_q,
           CAST(y * {q} - fitted AS BIGINT) AS resid_q,
           CAST(fitted AS DOUBLE) / 1e6 AS forecast
    FROM rec WHERE emit ORDER BY hour_start
    """


@register(
    "hourly_holt_winters",
    oracle=_hw_oracle(),
    tags=("events", "timeseries", "forecast", "iterative"),
)
def hourly_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + 24h seasonality) over the
    dense hourly event counts: per hour from t=24 on, the one-step-ahead
    forecast fitted = l + b + s_prev BEFORE seeing the hour, then the
    exact-integer state update. alpha/beta/gamma are 1/4, 1/8, 1/4 —
    power-of-2 rationals, so each update is multiply-add plus one
    sign-safe half-up division and the whole recursion replays
    bit-for-bit. Init: l0 = half-up mean of the first day, b0 = 0,
    s0_j = y_j*Q - l0.

    Scale: the hourly count aggregate is the only data-proportional
    work; the dense series is an hours-bounded sidecar (the rollup-
    lattice class) and the 720-step recursion is driver-side integer
    arithmetic. The oracle is a SEQUENTIAL recursive CTE carrying
    (level, trend, seasonal LIST) — recursion as data, where a 720-deep
    unroll is impossible."""
    from ..operators.pca import ssdiv

    q = _HW_Q
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("h")
    ).agg(F.count("*").alias("y"))
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    dense = (
        bounds.select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h")
        )
        .join(hourly, "h", "left")
        .select("h", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"))
        .orderBy("h")
        .collect()
    )
    schema = (
        "hour_start timestamp_ntz, event_count long, level_q long, "
        "trend_q long, seasonal_q long, fitted_q long, resid_q long, "
        "forecast double"
    )
    out = hw_recurse([(r.h, r.y) for r in dense])
    return spark.createDataFrame(out, schema).orderBy("hour_start")


def hw_recurse(dense: list) -> list:
    """The exact-integer Holt-Winters recursion over an ordered dense
    (hour, count) list — shared by the batch builder and the streaming
    over-drained-state parity test. Returns the output tuples of
    hourly_holt_winters."""
    from ..operators.pca import ssdiv

    q = _HW_Q
    n = len(dense)
    if n <= 24:
        return []
    ys = [y for _, y in dense]
    l = ssdiv(sum(ys[:24]) * q, 24)
    b = 0
    s = [ys[j] * q - l for j in range(24)]
    out = []
    for t in range(24, n):
        sprev = s[t % 24]
        fitted = l + b + sprev
        lprev = l
        l = ssdiv((ys[t] * q - sprev) + 3 * (l + b), 4)
        b = ssdiv((l - lprev) + 7 * b, 8)
        snew = ssdiv((ys[t] * q - l) + 3 * sprev, 4)
        s[t % 24] = snew
        out.append(
            (
                dense[t][0],
                ys[t],
                l,
                b,
                snew,
                fitted,
                ys[t] * q - fitted,
                fitted / 1e6,
            )
        )
    return out


# ---------------------------------------------------------------------------
# Multi-window error burn rate (the SRE alerting shape): 1h and trailing
# 6h error-rate vs a 5% budget, alert when BOTH windows burn — fast
# windows catch pages, slow windows suppress flappy ones. Trailing
# aggregation rides the lag-JOIN skeleton (bounded 6x fan-out on the
# shifted hour), not an unpartitioned window.
# ---------------------------------------------------------------------------

_BURN_BUDGET_CENTI = 5  # 5% error budget


@register(
    "error_burn_rate",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               count(*) AS total,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT)
                   AS errors
        FROM events GROUP BY 1
    ),
    trail6 AS (
        SELECT cur.h,
               CAST(sum(prev.total) AS BIGINT) AS total6,
               CAST(sum(prev.errors) AS BIGINT) AS errors6,
               CAST(count(*) AS BIGINT) AS hours_present
        FROM hourly cur
        JOIN hourly prev
          ON prev.h >= cur.h - INTERVAL 5 HOUR AND prev.h <= cur.h
        GROUP BY 1
    )
    SELECT c.h AS hour_start,
           CAST(c.total AS BIGINT) AS total,
           c.errors,
           round(CAST(c.errors AS DOUBLE) / CAST(c.total AS DOUBLE), 6)
               AS rate_1h,
           round(CAST(t.errors6 AS DOUBLE) / CAST(t.total6 AS DOUBLE), 6)
               AS rate_6h,
           round(CAST(c.errors AS DOUBLE) / CAST(c.total AS DOUBLE)
                 / {_BURN_BUDGET_CENTI / 100.0!r}, 6) AS burn_1h,
           round(CAST(t.errors6 AS DOUBLE) / CAST(t.total6 AS DOUBLE)
                 / {_BURN_BUDGET_CENTI / 100.0!r}, 6) AS burn_6h,
           (c.errors * 100 > {2 * _BURN_BUDGET_CENTI} * c.total
            AND t.errors6 * 100 > {_BURN_BUDGET_CENTI} * t.total6)
               AS page
    FROM hourly c JOIN trail6 t USING (h)
    ORDER BY hour_start
    """,
    tags=("events", "timeseries", "ops"),
)
def error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn per hour: the 1h rate and the trailing-6h rate
    against a 5% budget, with the two-window page condition (fast burn
    > 2x budget AND slow burn > 1x budget — fast windows page quickly,
    slow windows suppress flapping). The page flag is INTEGER
    cross-multiplication (errors*100 > budget*total), so alerting never
    depends on float rounding; the rate/burn doubles are display
    columns. Trailing 6h is a bounded 6x lag-join over the hours frame
    (the ACF skeleton) — no unpartitioned window; hours with no events
    simply have no row (documented: rates are over observed traffic)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("h")
    ).agg(
        F.count("*").alias("total"),
        F.count_if(F.col("event_type") == "error")
        .cast("long")
        .alias("errors"),
    )
    # trailing 6h as a bounded EQUI-join: each hour row fans out to the
    # 6 window anchors it contributes to (the ACF lag-join skeleton) —
    # never an inequality join the planner would nest-loop
    contrib = hourly.select(
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.expr("INTERVAL 5 HOUR"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("_anchor"),
        F.col("total").alias("_pt"),
        F.col("errors").alias("_pe"),
    )
    trailing = (
        hourly.select(F.col("h"))
        .join(contrib, F.col("_anchor") == F.col("h"))
        .groupBy("h")
        .agg(
            F.sum("_pt").cast("long").alias("total6"),
            F.sum("_pe").cast("long").alias("errors6"),
        )
    )
    budget = _BURN_BUDGET_CENTI
    r1 = F.col("errors").cast("double") / F.col("total").cast("double")
    r6 = F.col("errors6").cast("double") / F.col("total6").cast("double")
    return (
        hourly.join(trailing, "h")
        .select(
            F.col("h").alias("hour_start"),
            F.col("total").cast("long").alias("total"),
            "errors",
            F.round(r1, 6).alias("rate_1h"),
            F.round(r6, 6).alias("rate_6h"),
            F.round(r1 / F.lit(budget / 100.0), 6).alias("burn_1h"),
            F.round(r6 / F.lit(budget / 100.0), 6).alias("burn_6h"),
            (
                (F.col("errors") * 100 > 2 * budget * F.col("total"))
                & (F.col("errors6") * 100 > budget * F.col("total6"))
            ).alias("page"),
        )
        .orderBy("hour_start")
    )


# ---------------------------------------------------------------------------
# Token-bucket rate-limiter audit: the CLAMPED running recursion
# (min/max resets) that plain window functions cannot express — the
# inventory / rate-limit / queue-depth state shape — solved with the
# Holt-Winters discipline: hours-bounded sidecar + exact integer
# recursion, sequential recursive-CTE oracle.
# ---------------------------------------------------------------------------

_TB_CAPACITY = 40
_TB_REFILL = 10


@register(
    "hourly_token_bucket",
    oracle=f"""
    WITH RECURSIVE
    hc AS (
        SELECT date_trunc('hour', ts) AS h, count(*) AS y
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
    dense AS (
        SELECT g.h AS hour_start, CAST(coalesce(hc.y, 0) AS BIGINT)
                   AS arrivals,
               CAST(row_number() OVER (ORDER BY g.h) - 1 AS BIGINT) AS idx
        FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM bounds) g
        LEFT JOIN hc ON hc.h = g.h
    ),
    nrows AS (SELECT count(*) AS n FROM dense),
    rec AS (
        SELECT CAST(-1 AS BIGINT) AS idx,
               CAST(NULL AS TIMESTAMP) AS hour_start,
               CAST(NULL AS BIGINT) AS arrivals,
               CAST(NULL AS BIGINT) AS served,
               CAST(NULL AS BIGINT) AS throttled,
               CAST({_TB_CAPACITY} AS BIGINT) AS bucket
        UNION ALL
        SELECT x.idx, x.hour_start, x.arrivals,
               x.served, x.arrivals - x.served,
               least({_TB_CAPACITY}, x.avail - x.served)
        FROM (
            SELECT d.idx, d.hour_start, d.arrivals,
                   least(r.bucket + {_TB_REFILL}, {_TB_CAPACITY})
                       AS avail_cap,
                   r.bucket + {_TB_REFILL} AS avail,
                   least(d.arrivals,
                         least(r.bucket + {_TB_REFILL}, {_TB_CAPACITY}))
                       AS served
            FROM rec r JOIN dense d ON d.idx = r.idx + 1
            WHERE r.idx + 1 < (SELECT n FROM nrows)
        ) x
    )
    SELECT hour_start, arrivals, served, throttled,
           bucket AS bucket_after
    FROM rec WHERE idx >= 0 ORDER BY hour_start
    """,
    tags=("events", "timeseries", "ops", "iterative"),
)
def hourly_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate-limiter replay over the dense hourly arrivals:
    capacity {cap}, refill {ref}/hour; each hour serves
    min(arrivals, min(bucket + refill, capacity)) and the rest is
    throttled. The clamped state v_t = min(cap, f(v_t-1)) is the
    recursion plain windows cannot express (no prefix-sum trick
    survives a min/max reset) — the inventory / queue-depth / rate-
    limit family. Pure integer state over the hours-bounded sidecar;
    the oracle replays it with the sequential recursive CTE (the
    Holt-Winters technique with scalar state). Note the serve rule
    caps available tokens at capacity BEFORE serving (bucket never
    exceeds cap even transiently).""".format(
        cap=_TB_CAPACITY, ref=_TB_REFILL
    )
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.window("ts", "1 hour").getField("start").alias("h")
    ).agg(F.count("*").alias("y"))
    dense = (
        hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h")
        )
        .join(hourly, "h", "left")
        .select(
            "h", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
        )
        .orderBy("h")
        .collect()
    )
    bucket = _TB_CAPACITY
    out = []
    for r in dense:
        avail = min(bucket + _TB_REFILL, _TB_CAPACITY)
        served = min(r.y, avail)
        bucket = min(_TB_CAPACITY, (bucket + _TB_REFILL) - served)
        out.append((r.h, r.y, served, r.y - served, bucket))
    return spark.createDataFrame(
        out,
        "hour_start timestamp_ntz, arrivals long, served long, "
        "throttled long, bucket_after long",
    ).orderBy("hour_start")


# ---------------------------------------------------------------------------
# Sequential probability ratio test (Wald SPRT): the sequential member
# of the stats family (z-test / chi-square / Mann-Whitney are all
# fixed-horizon). H0: conversion p = 0.3 vs H1: p = 0.5 at
# alpha = beta = 0.05; users arrive in (first_ts, user_id) order and the
# quantized log-likelihood ratio walks until it crosses ln(19) (accept
# H1) or -ln(19) (accept H0). LLR steps are two integer constants, so
# the walk is an exact prefix sum — computed by the range-partitioned
# running-sum machinery, never a single-task global window.
# ---------------------------------------------------------------------------

_SPRT_UP = 510825624        # ln(0.5/0.3) * 1e9, half-up
_SPRT_DOWN = -336472237   # ln(0.5/0.7) * 1e9 (sign-safe: negated quantized ln(7/5))
_SPRT_A = 2944438979         # ln(19) * 1e9
_SPRT_B = -2944438979


@register(
    "conversion_sprt",
    oracle=f"""
    WITH u AS (
        SELECT user_id, min(ts) AS fts,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM events GROUP BY 1
    ),
    st AS (
        SELECT user_id, fts,
               CASE WHEN conv = 1 THEN {_SPRT_UP}
                    ELSE {_SPRT_DOWN} END AS step
        FROM u
    ),
    r AS (
        SELECT *,
               sum(step) OVER (
                   ORDER BY fts, user_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS llr,
               row_number() OVER (ORDER BY fts, user_id) AS rn
        FROM st
    ),
    x AS (
        SELECT rn, llr FROM r
        WHERE llr >= {_SPRT_A} OR llr <= {_SPRT_B}
        ORDER BY rn LIMIT 1
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(step) AS BIGINT) AS final_llr_q
        FROM st
    )
    SELECT tot.n_users, tot.final_llr_q,
           CAST(x.rn AS BIGINT) AS crossing_n,
           CAST(x.llr AS BIGINT) AS crossing_llr_q,
           CASE WHEN x.rn IS NULL THEN 'continue'
                WHEN x.llr >= {_SPRT_A} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision
    FROM tot LEFT JOIN x ON true
    """.format(_SPRT_UP=_SPRT_UP, _SPRT_DOWN=_SPRT_DOWN,
               _SPRT_A=_SPRT_A, _SPRT_B=_SPRT_B),
    tags=("events", "stats", "sequential"),
)
def conversion_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT on the per-user conversion stream in arrival order
    (first event ts, user_id tiebreak): accept H1 (p>=0.5) when the
    quantized LLR walk crosses +ln(19), accept H0 (p<=0.3) at -ln(19),
    else 'continue'. The walk is an exact integer prefix sum via
    range_partitioned_running_sum (bounded-sidecar, no global window);
    the crossing row is a TakeOrdered limit-1; the report is one row of
    scalar joins. The sequential complement of conversion_ztest: the
    test that STOPS as soon as the evidence suffices."""
    from ..operators.windows import range_partitioned_running_sum

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("fts"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    stepped = users.select(
        "user_id",
        "fts",
        F.when(F.col("conv") == 1, F.lit(_SPRT_UP))
        .otherwise(F.lit(_SPRT_DOWN))
        .cast("long")
        .alias("step"),
        F.lit(1).cast("long").alias("one"),
    )
    walk = range_partitioned_running_sum(
        stepped,
        order=[F.asc("fts"), F.asc("user_id")],
        value_cols=["step", "one"],
    )
    crossing = (
        walk.filter(
            (F.col("running_step") >= _SPRT_A)
            | (F.col("running_step") <= _SPRT_B)
        )
        .orderBy("fts", "user_id")
        .limit(1)
        .select(
            F.col("running_one").alias("crossing_n"),
            F.col("running_step").alias("crossing_llr_q"),
        )
    )
    tot = stepped.agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("step").cast("long").alias("final_llr_q"),
    )
    return tot.join(F.broadcast(crossing), how="left").select(
        "n_users",
        "final_llr_q",
        F.col("crossing_n").cast("long").alias("crossing_n"),
        F.col("crossing_llr_q").cast("long").alias("crossing_llr_q"),
        F.when(F.col("crossing_n").isNull(), F.lit("continue"))
        .when(F.col("crossing_llr_q") >= _SPRT_A, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# CUPED variance reduction (Deng et al. 2013): adjust the experiment
# metric by the pre-period covariate — the standard trick that cuts A/B
# variance by the squared pre/post correlation. Everything derives from
# integer sufficient statistics, so the adjusted means are single fixed
# double expressions (no per-row double accumulation anywhere).
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"


@register(
    "ab_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(coalesce(sum(CASE WHEN ts < {_CUPED_SPLIT}
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS pre,
               CAST(coalesce(sum(CASE WHEN ts >= {_CUPED_SPLIT}
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                    AS BIGINT) AS post
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pre) AS BIGINT) AS sx,
               CAST(sum(post) AS BIGINT) AS sy,
               CAST(sum(pre * pre) AS BIGINT) AS sxx,
               CAST(sum(post * post) AS BIGINT) AS syy,
               CAST(sum(pre * post) AS BIGINT) AS sxy
        FROM per_user
    ),
    v AS (
        SELECT variant,
               CAST(count(*) AS BIGINT) AS n_v,
               CAST(sum(pre) AS BIGINT) AS sx_v,
               CAST(sum(post) AS BIGINT) AS sy_v
        FROM per_user GROUP BY 1
    )
    SELECT CAST(v.variant AS BIGINT) AS variant, v.n_v AS n_users,
           CAST(v.sy_v AS DOUBLE) / v.n_v AS mean_post_cents,
           CAST(v.sx_v AS DOUBLE) / v.n_v AS mean_pre_cents,
           CAST(v.sy_v AS DOUBLE) / v.n_v
             - (CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
                / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE))
               * (CAST(v.sx_v AS DOUBLE) / v.n_v
                  - CAST(g.sx AS DOUBLE) / g.n)
               AS cuped_adjusted_mean,
           CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
             / CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE) AS theta,
           CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
             * CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE)
             / (CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)
                * CAST(g.n * g.syy - g.sy * g.sy AS DOUBLE))
               AS variance_reduction
    FROM v CROSS JOIN g
    ORDER BY variant
    """,
    tags=("events", "stats", "experimentation"),
)
def ab_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B metric: per variant (user_id parity), the
    post-period mean value adjusted by theta x (pre-period deviation),
    with theta = cov(pre, post)/var(pre) and the variance-reduction
    factor rho^2 — the covariate trick that shrinks experiment
    confidence intervals by the squared pre/post correlation without
    touching the point estimate's expectation.

    Determinism: per-user pre/post are integer cents; every reported
    double (means, theta, rho^2, adjusted mean) is ONE fixed expression
    over the six BIGINT sufficient sums — no per-row double
    accumulation, so no float fold order exists. Scale: one user-keyed
    aggregate + two bounded rollups (variant and global) cross-joined
    back (broadcast one-row scalar)."""
    split = F.expr(_CUPED_SPLIT)
    cents = F.round(F.col("value") * 100).cast("long")
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(F.when(F.col("ts") < split, cents)), F.lit(0))
        .cast("long")
        .alias("pre"),
        F.coalesce(F.sum(F.when(F.col("ts") >= split, cents)), F.lit(0))
        .cast("long")
        .alias("post"),
    ).withColumn("variant", F.col("user_id") % 2)
    g = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pre").cast("long").alias("sx"),
        F.sum("post").cast("long").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).cast("long").alias("sxx"),
        F.sum(F.col("post") * F.col("post")).cast("long").alias("syy"),
        F.sum(F.col("pre") * F.col("post")).cast("long").alias("sxy"),
    )
    v = per_user.groupBy("variant").agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum("pre").cast("long").alias("sx_v"),
        F.sum("post").cast("long").alias("sy_v"),
    )
    covn = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    varxn = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    varyn = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    theta = covn / varxn
    return (
        v.join(F.broadcast(g))
        .select(
            F.col("variant").cast("long").alias("variant"),
            F.col("n_v").alias("n_users"),
            (F.col("sy_v").cast("double") / F.col("n_v")).alias(
                "mean_post_cents"
            ),
            (F.col("sx_v").cast("double") / F.col("n_v")).alias(
                "mean_pre_cents"
            ),
            (
                F.col("sy_v").cast("double") / F.col("n_v")
                - theta
                * (
                    F.col("sx_v").cast("double") / F.col("n_v")
                    - F.col("sx").cast("double") / F.col("n")
                )
            ).alias("cuped_adjusted_mean"),
            theta.alias("theta"),
            (covn * covn / (varxn * varyn)).alias("variance_reduction"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Experiment power planning: the minimum detectable effect at 80% power
# and two-sided alpha = 0.05, from the OBSERVED metric variance — the
# third leg of the experimentation family (conversion_ztest decides,
# ab_cuped_adjustment shrinks variance, this sizes the next test).
# ---------------------------------------------------------------------------

_MDE_Z_ALPHA_Q = 1959963985  # 1.96 (two-sided 5%), 1e-9-quantized
_MDE_Z_BETA_Q = 841621234   # 0.8416 (80% power), 1e-9-quantized


@register(
    "ab_mde_planning",
    oracle="""
    WITH per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT)), 0)
                    AS BIGINT) AS cents
        FROM events GROUP BY 1
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(cents) AS BIGINT) AS s,
               CAST(sum(cents * cents) AS BIGINT) AS ss,
               CAST(count(*) FILTER (variant = 0) AS BIGINT) AS n_a,
               CAST(count(*) FILTER (variant = 1) AS BIGINT) AS n_b
        FROM per_user
    )
    SELECT n AS n_users, n_a, n_b,
           CAST(s AS DOUBLE) / n AS mean_cents,
           (CAST(n * ss - s * s AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               AS var_cents,
           (1959963985 / 1e9 + 841621234 / 1e9)
             * sqrt((CAST(n * ss - s * s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b))
               AS mde_abs_cents,
           (1959963985 / 1e9 + 841621234 / 1e9)
             * sqrt((CAST(n * ss - s * s AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                    * (1.0 / n_a + 1.0 / n_b))
             / (CAST(s AS DOUBLE) / n)
               AS mde_rel
    FROM g
    """,
    tags=("events", "stats", "experimentation"),
)
def ab_mde_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect for the per-user value metric at the
    observed split sizes: MDE = (z_alpha/2 + z_beta) * sqrt(var *
    (1/nA + 1/nB)) with population variance from exact integer
    sufficient sums — absolute (cents) and relative to the control-free
    pooled mean. z constants are 1e-9-quantized literals shared with
    the oracle, and every double is one fixed expression over BIGINTs.
    One user-keyed aggregate + one global rollup."""
    cents = F.round(F.col("value") * 100).cast("long")
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(F.sum(cents), F.lit(0)).cast("long").alias("cents")
    ).withColumn("variant", F.col("user_id") % 2)
    g = per_user.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
        F.count_if(F.col("variant") == 0).cast("long").alias("n_a"),
        F.count_if(F.col("variant") == 1).cast("long").alias("n_b"),
    )
    var = (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast(
        "double"
    ) / (F.col("n").cast("double") * F.col("n").cast("double"))
    z = F.lit(_MDE_Z_ALPHA_Q) / F.lit(1e9) + F.lit(_MDE_Z_BETA_Q) / F.lit(
        1e9
    )
    mde = z * F.sqrt(
        var * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return g.select(
        F.col("n").alias("n_users"),
        "n_a",
        "n_b",
        (F.col("s").cast("double") / F.col("n")).alias("mean_cents"),
        var.alias("var_cents"),
        mde.alias("mde_abs_cents"),
        (mde / (F.col("s").cast("double") / F.col("n"))).alias("mde_rel"),
    )


# ---------------------------------------------------------------------------
# CUSUM drift detection (r09): the change-point sibling of the EWMA /
# Holt-Winters / autocorrelation tier. The one-sided CUSUM recursion
# S_t = max(0, S_{t-1} + dev_t) is sequential, but equals the prefix-sum
# identity S_t = P_t - min(0, min_{i<=t} P_i) — pure window functions,
# so both engines replay it exactly. All arithmetic is INTEGER (mu is the
# floored mean hourly count, allowance k = max(1, mu/20)), so there is no
# FP boundary to flip an alarm between engines.
# ---------------------------------------------------------------------------


@register(
    "hourly_cusum_alarms",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    params AS (
        SELECT CAST(floor(sum(n) / count(*)) AS BIGINT) AS mu,
               greatest(CAST(1 AS BIGINT),
                        CAST(floor(sum(n) / count(*) / 20) AS BIGINT)) AS k
        FROM hourly
    ),
    pref AS (
        SELECT hour, n,
               sum(n - mu - k) OVER (ORDER BY hour
                   ROWS UNBOUNDED PRECEDING) AS p,
               mu, k
        FROM hourly, params
    ),
    stat AS (
        -- CAST: DuckDB's windowed sum over BIGINT is HUGEINT, which
        -- degrades to float in pandas readers and breaks the hash gate
        SELECT hour, n,
               CAST(p - least(CAST(0 AS BIGINT),
                         min(p) OVER (ORDER BY hour
                             ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS cusum,
               5 * (mu + k) / 10 AS h
        FROM pref
    )
    SELECT hour, n AS n_events, cusum AS cusum_stat,
           cusum > h AS alarm
    FROM stat ORDER BY hour
    """,
    tags=("events", "timeseries", "drift"),
)
def hourly_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM over hourly event volume: alarms when the
    cumulative positive deviation from the baseline rate exceeds the
    decision interval — the classic 'slow drift the threshold alarm
    misses' detector (a +10% sustained shift alarms in a few hours while
    staying under any per-hour threshold). Expressed as prefix sums +
    running min (the max-reset recursion's closed form), one ordered
    window over the HOURS frame — bounded at 100 TB because the window
    runs on the hourly aggregate, never the event log; integer
    arithmetic end-to-end so the oracle replays bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    return cusum_over_hourly(hourly_event_counts(ev))


def hourly_event_counts(ev: DataFrame) -> DataFrame:
    """(hour, n) additive count frame — a sum-monoid, so the
    incremental-agg sink maintains it per micro-batch and the streaming
    CUSUM equals batch exactly (tests/test_streaming_llm.py)."""
    from ..functions.timeutil import trunc_hour

    return ev.groupBy(
        trunc_hour(ev, "ts").alias("hour")
    ).agg(F.count("*").cast("bigint").alias("n"))


def cusum_over_hourly(hourly: DataFrame) -> DataFrame:
    """Read-side stage: CUSUM statistic + alarms from any (hour, n)
    count frame — batch-computed or drained streaming state."""
    params = hourly.agg(
        F.floor(F.sum("n") / F.count("*")).cast("bigint").alias("mu"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.floor(F.sum("n") / F.count("*") / 20).cast("bigint"),
        ).alias("k"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    pref = hourly.crossJoin(F.broadcast(params)).select(
        "hour",
        "n",
        F.sum(F.col("n") - F.col("mu") - F.col("k")).over(w).alias("p"),
        "mu",
        "k",
    )
    cusum = F.col("p") - F.least(
        F.lit(0).cast("bigint"), F.min("p").over(w)
    )
    h = 5 * (F.col("mu") + F.col("k")) / 10
    return pref.select(
        "hour",
        F.col("n").alias("n_events"),
        cusum.alias("cusum_stat"),
        (cusum > h).alias("alarm"),
    ).orderBy("hour")


@register(
    "session_gap_sensitivity",
    oracle="""
    WITH g AS (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN NULL
                    ELSE date_diff('second', lag(ts) OVER w, ts) END AS gap
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    agg AS (
        SELECT count(DISTINCT user_id) AS users,
               sum(CASE WHEN gap IS NULL OR gap > 900 THEN 1 ELSE 0 END) AS s15,
               sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS s30,
               sum(CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END) AS s60
        FROM g
    )
    SELECT 15 AS gap_minutes, CAST(s15 AS BIGINT) AS n_sessions,
           round(s15 / CAST(users AS DOUBLE), 6) AS sessions_per_user
    FROM agg
    UNION ALL
    SELECT 30, CAST(s30 AS BIGINT), round(s30 / CAST(users AS DOUBLE), 6)
    FROM agg
    UNION ALL
    SELECT 60, CAST(s60 AS BIGINT), round(s60 / CAST(users AS DOUBLE), 6)
    FROM agg
    ORDER BY gap_minutes
    """,
    tags=("events", "sessionization", "calibration"),
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization tuning table (r09): total session count and
    sessions-per-user at inactivity gaps of 15/30/60 minutes — the
    calibration a team reads before hard-coding '30 minutes' into every
    downstream metric (if the count is still moving fast at 30m, the
    choice is load-bearing and deserves a decision record). ONE window
    pass computes all three thresholds as conditional sums — the
    ann_probe_sweep discipline applied to sessionization; at 100 TB this
    is the same user-keyed sort user_sessions already pays, amortized
    over every threshold probed."""
    from ..functions.timeutil import epoch_seconds

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    sec = epoch_seconds(ev, "ts")
    gap = sec - F.lag(sec).over(w)
    flags = ev.select(
        "user_id",
        *[
            F.when(gap.isNull() | (gap > m * 60), 1)
            .otherwise(0)
            .alias(f"_s{m}")
            for m in (15, 30, 60)
        ],
    )
    agg = flags.agg(
        F.countDistinct("user_id").alias("users"),
        *[F.sum(f"_s{m}").alias(f"s{m}") for m in (15, 30, 60)],
    )
    rows = [
        agg.select(
            F.lit(m).alias("gap_minutes"),
            F.col(f"s{m}").cast("bigint").alias("n_sessions"),
            F.round(
                F.col(f"s{m}") / F.col("users").cast("double"), 6
            ).alias("sessions_per_user"),
        )
        for m in (15, 30, 60)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("gap_minutes")


# ---------------------------------------------------------------------------
# Interarrival profile: is each event type Poisson-like or bursty at the
# ARRIVAL level? Complements event_burstiness (hourly Fano factor) with the
# gap-level lens: lag() deltas in exact integer seconds, CV and tail share
# from exact sums only (tail test is the integer cross-multiplied form of
# gap > 2 * mean — no division, no FP drift).
# ---------------------------------------------------------------------------


@register(
    "interarrival_profile",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               date_diff('second',
                         lag(ts) OVER (PARTITION BY event_type
                                       ORDER BY ts, event_id),
                         ts) AS gap
        FROM events WHERE ts IS NOT NULL
    ),
    g AS (SELECT event_type, gap FROM gaps WHERE gap IS NOT NULL),
    agg AS (
        SELECT event_type,
               count(*) AS n,
               sum(CAST(gap AS DECIMAL(38,0))) AS sx,
               sum(CAST(gap * gap AS DECIMAL(38,0))) AS sxx
        FROM g GROUP BY 1
    ),
    tail AS (
        SELECT g.event_type,
               count(*) FILTER (WHERE CAST(g.gap AS DECIMAL(38,0)) * a.n
                                      > 2 * a.sx) AS n_tail
        FROM g JOIN agg a ON a.event_type = g.event_type
        GROUP BY 1
    )
    SELECT a.event_type,
           CAST(a.n AS BIGINT) AS n_gaps,
           round(CAST(a.sx AS DOUBLE) / a.n, 6) AS mean_gap_sec,
           round(CASE WHEN a.sx > 0 THEN
                   sqrt(greatest(CAST(a.n AS DOUBLE) * CAST(a.sxx AS DOUBLE)
                        - CAST(a.sx AS DOUBLE) * CAST(a.sx AS DOUBLE), 0))
                   / CAST(a.sx AS DOUBLE)
                 ELSE 0 END, 6) AS gap_cv,
           round(CAST(t.n_tail AS DOUBLE) / a.n, 6) AS tail_share
    FROM agg a JOIN tail t ON t.event_type = a.event_type
    ORDER BY 1
    """,
    tags=("events", "window", "profiling"),
)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: interarrival mean, coefficient of variation, and
    the share of gaps exceeding twice the mean. A Poisson arrival process
    has CV ~ 1 and tail_share ~ e^-2; CV >> 1 flags bursty types whose
    windows/watermarks need wider lateness budgets.

    Determinism: gaps are exact integer seconds from a total order
    (ts, event_id); CV uses the n*sxx - sx^2 identity over DECIMAL sums;
    the tail predicate is cross-multiplied (gap * n > 2 * sx) so both
    engines compare exact integers — the only FP is the final single-pass
    divisions.

    Scale shape: the lag runs per (event_type, DAY) bucket — a single
    per-type window caps parallelism at the number of types (measured:
    the 100x overlay sat on 5 tasks for 31 s) — plus one boundary gap
    per bucket stitched from per-bucket first/last (ts, event_id)
    structs over the bounded types x days frame. day = date(ts) is
    monotone in ts, so the bucketed gap MULTISET equals the global-sort
    one and every aggregate below is unchanged (the DuckDB oracle keeps
    the simple global form). NULL timestamps are filtered in BOTH
    engines before the window (Spark orders NULLS FIRST, DuckDB NULLS
    LAST — an unfiltered NULL row would sit next to a different
    neighbor in each engine and change one gap)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn("_day", F.to_date("ts"))
    )
    # epoch seconds via the NTZ-safe helper: unix_timestamp() on an NTZ
    # column round-trips through the session timezone and would shift
    # gaps straddling a DST transition by +-3600 s under a non-UTC
    # session (functions/timeutil.py; pinned by the tz-invariance test)
    ev = ev.withColumn("_sec", epoch_seconds(ev, "ts"))
    w_in = Window.partitionBy("event_type", "_day").orderBy("ts", "event_id")
    in_gaps = (
        ev.withColumn("gap", F.col("_sec") - F.lag("_sec").over(w_in))
        .filter(F.col("gap").isNotNull())
        .select("event_type", "gap")
    )
    # _sec rides LAST in the ordering structs so min/max still compare by
    # (ts, event_id) and merely carry the precomputed epoch along
    per_bucket = ev.groupBy("event_type", "_day").agg(
        F.min(F.struct("ts", "event_id", "_sec")).alias("_first"),
        F.max(F.struct("ts", "event_id", "_sec")).alias("_last"),
    )
    w_b = Window.partitionBy("event_type").orderBy("_day")
    boundary = (
        per_bucket.withColumn("_prev_last", F.lag("_last").over(w_b))
        .filter(F.col("_prev_last").isNotNull())
        .select(
            "event_type",
            (F.col("_first._sec") - F.col("_prev_last._sec")).alias("gap"),
        )
    )
    gaps = in_gaps.unionByName(boundary)
    agg = gaps.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("gap") * F.col("gap")).cast("decimal(38,0)")).alias("sxx"),
    )
    tail = (
        gaps.join(agg, "event_type")
        .groupBy("event_type")
        .agg(
            F.count_if(
                F.col("gap").cast("decimal(38,0)") * F.col("n") > 2 * F.col("sx")
            ).alias("n_tail")
        )
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    return (
        agg.join(tail, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.round(sx_d / n_d, 6).alias("mean_gap_sec"),
            F.round(
                F.when(
                    F.col("sx") > 0,
                    F.sqrt(F.greatest(n_d * sxx_d - sx_d * sx_d, F.lit(0.0)))
                    / sx_d,
                ).otherwise(0.0),
                6,
            ).alias("gap_cv"),
            F.round(F.col("n_tail").cast("double") / n_d, 6).alias("tail_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# In-session ordered conversion: the product metric sessionization exists
# FOR — of sessions that saw a view, how many purchased AFTER that view in
# the SAME session? Composes the 30-minute-gap sessionizer with a
# per-session conditional-min funnel (the funnel_conversion discipline at
# session grain instead of user grain).
# ---------------------------------------------------------------------------


@register(
    "session_conversion_rate",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessioned AS (
        SELECT user_id, ts, event_type,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               max(CASE WHEN event_type = 'purchase' THEN ts END)
                   AS last_purchase
        FROM sessioned GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(*) FILTER (WHERE first_view IS NOT NULL) AS BIGINT)
               AS sessions_with_view,
           CAST(count(*) FILTER (WHERE last_purchase > first_view)
                AS BIGINT) AS converted_sessions,
           round(CAST(count(*) FILTER (WHERE last_purchase > first_view)
                      AS DOUBLE)
                 / nullif(count(*) FILTER (WHERE first_view IS NOT NULL), 0),
                 6) AS view_to_purchase_rate
    FROM per_session
    """,
    tags=("events", "sessionization", "funnel"),
)
def session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Of sessions containing a view, the share that purchased strictly
    AFTER the first view within the same 30-minute-gap session — the
    ordered in-session funnel (a purchase before any view does not
    count; comparison is on exact timestamps so both engines agree).

    Scale shape: one user-keyed sessionization window pass (the same
    exchange user_sessions pays), then per-session conditional min/max —
    map-side combinable — and a global count fold. Nothing wider than the
    user key ever shuffles."""
    from ..functions.timeutil import epoch_seconds

    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    sec = epoch_seconds(ev, "ts")
    gap = sec - F.lag(sec).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_session = sessioned.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    converted = F.count_if(F.col("last_purchase") > F.col("first_view"))
    with_view = F.count_if(F.col("first_view").isNotNull())
    return per_session.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        with_view.cast("bigint").alias("sessions_with_view"),
        converted.cast("bigint").alias("converted_sessions"),
        F.round(
            converted.cast("double")
            / F.nullif(with_view.cast("double"), F.lit(0.0)),
            6,
        ).alias("view_to_purchase_rate"),
    )
