"""Time-window operators over the events stream table (SURVEY.md §2
D17–D20).

Reference analog: the "time-aware" sketch variants are the only
event-time logic in the reference (`sketch/.../timeaware` [C-low]);
windowing here is the general substrate those and Structured Streaming
forms build on. Each query is written in *batch* mode against the same
`F.window`/`F.session_window` expressions the streaming forms use
(streaming/windows.py), so the oracle can check the exact semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..plans.registry import register
from ..scratch import scratch
from ._util import finite_or_null, money_sum, money_sum_sql, t

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "events_windows",
    oracle=f"""
SELECT 'tumbling_1d' AS kind, strftime(date_trunc('day', ts), '%Y-%m-%d') AS window_start,
       event_type, count(*) AS n, {money_sum_sql('value')} AS total_value
FROM events GROUP BY 1, 2, 3
UNION ALL
SELECT 'sliding_2d' AS kind, strftime(date_trunc('day', ts) - to_days(off), '%Y-%m-%d') AS window_start,
       event_type, count(*) AS n, {money_sum_sql('value')} AS total_value
FROM events CROSS JOIN (VALUES (0), (1)) AS offs(off)
GROUP BY 1, 2, 3
""",
    tags=("D17",),
    doc="Tumbling and sliding event-time windows in one query "
    "discriminated by `kind` (consolidated from events_tumbling_daily / "
    "events_sliding_2d). 'tumbling_1d': 1-day windows, start == "
    "date_trunc since windows align to the epoch (batch dual of the "
    "streaming form). 'sliding_2d': 2-day width, 1-day slide — every "
    "event lands in two overlapping windows; the oracle replicates via "
    "the offset-unnest identity.",
)
def events_windows(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    tumbling = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
        .select(
            F.lit("tumbling_1d").alias("kind"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
        .select(
            F.lit("sliding_2d").alias("kind"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return tumbling.unionByName(sliding)


@register(
    "events_session_windows",
    oracle=f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), m AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
       max(us) - min(us) AS dur_us
FROM s GROUP BY user_id, sid
""",
    tags=("D18",),
)
def events_session_windows(spark, sf_dir):
    """Session windows (30-min gap) per user via F.session_window — the
    same expression the streaming form uses. Oracle is the classic
    lag+cumsum island construction.

    Scale: session_window is a single shuffle on user_id + sort within
    partition; skewed users are bounded by per-user event counts.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("dur_us"),
        )
        .select("user_id", "session_start_us", "n_events", "dur_us")
    )


@register(
    "events_dedup_keep_first",
    oracle="""
SELECT user_id, event_type, event_id, round(CAST(value AS DOUBLE), 4) AS value
FROM (SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
""",
    tags=("D20",),
)
def events_dedup_keep_first(spark, sf_dir):
    """Keyed dedup keeping the earliest record — the deterministic batch
    dual of streaming dropDuplicates (which keeps the first arrival)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round(F.col("value"), 4).alias("value"))
    )


@register(
    "events_multires_rollup",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(CAST(CASE WHEN isfinite(CAST(value AS DOUBLE)) THEN value END AS DECIMAL(18,6))) AS tv
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT date_trunc('day', h) AS d, event_type,
         CAST(sum(n) AS BIGINT) AS n, sum(tv) AS tv
  FROM hourly GROUP BY 1, 2
),
monthly AS (
  SELECT date_trunc('month', d) AS m, event_type,
         CAST(sum(n) AS BIGINT) AS n, sum(tv) AS tv
  FROM daily GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi FROM events
),
grid AS (
  SELECT et.event_type, gs.h
  FROM (SELECT DISTINCT event_type FROM events) et
  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM span) gs
)
SELECT 'hour' AS grain, strftime(h, '%Y-%m-%d %H:00') AS bucket, event_type,
       n, round(CAST(tv AS DOUBLE), 4) AS total_value FROM hourly
UNION ALL
SELECT 'day', strftime(d, '%Y-%m-%d'), event_type, n,
       round(CAST(tv AS DOUBLE), 4) FROM daily
UNION ALL
SELECT 'month', strftime(m, '%Y-%m'), event_type, n,
       round(CAST(tv AS DOUBLE), 4) FROM monthly
UNION ALL
SELECT 'hour_filled', strftime(g.h, '%Y-%m-%d %H:00'), g.event_type,
       coalesce(a.n, 0), CAST(NULL AS DOUBLE)
FROM grid g LEFT JOIN hourly a ON a.event_type = g.event_type AND a.h = g.h
""",
    tags=("D17", "D11", "D9"),
    doc="Multi-resolution rollup (hypertable continuous-aggregate "
    "pattern) plus the regular-grid gap fill, in one query discriminated "
    "by `grain` (gap fill consolidated from events_hourly_gap_fill — it "
    "re-aggregates the same hourly level). hour/day/month: hourly "
    "aggregate computed once from raw events, daily derived by "
    "re-aggregating hourly, monthly from daily — each level reads the "
    "previous level's output, never rescans raw data; sums stay DECIMAL "
    "through the cascade (exact, re-aggregation-safe) and round only at "
    "output. 'hour_filled': a regular hourly grid per event type over "
    "the observed span, zero-filled where no events landed — the grid is "
    "sequence()+explode on a 1-row global-span aggregate (broadcast, no "
    "driver collect) left-joined against the SAME persisted hourly "
    "level. At 100 TB the raw scan happens exactly once, each rollup "
    "level shuffles |previous level| rows (~1000x smaller), and the "
    "grid side stays tiny (hours x types).",
)
def events_multires_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(finite_or_null(F.col("value")).cast("decimal(18,6)")).alias("tv"),
        )
    )
    hourly = scratch(hourly)  # feeds daily, the gap-fill join, AND output
    daily = scratch(
        hourly.groupBy(F.date_trunc("day", F.col("h")).alias("d"), "event_type")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("tv").alias("tv"))
    )
    monthly = daily.groupBy(
        F.date_trunc("month", F.col("d")).alias("m"), "event_type"
    ).agg(F.sum("n").cast("long").alias("n"), F.sum("tv").alias("tv"))

    def lvl(df, grain, col, fmt):
        return df.select(
            F.lit(grain).alias("grain"),
            F.date_format(F.col(col), fmt).alias("bucket"),
            "event_type",
            "n",
            F.round(F.col("tv").cast("double"), 4).alias("total_value"),
        )

    # hour_filled: zero-filled regular grid over the observed span.
    # Span and type set derive from the PERSISTED hourly level, not the
    # raw table (min/max commute with date_trunc('hour'), and every
    # event_type survives into hourly) — the raw scan stays exactly one.
    span = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    filled = (
        grid.join(hourly.select("h", "event_type", "n"), ["event_type", "h"], "left")
        .select(
            F.lit("hour_filled").alias("grain"),
            F.date_format(F.col("h"), "yyyy-MM-dd HH:00").alias("bucket"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.lit(None).cast("double").alias("total_value"),
        )
    )

    return (
        lvl(hourly, "hour", "h", "yyyy-MM-dd HH:00")
        .unionAll(lvl(daily, "day", "d", "yyyy-MM-dd"))
        .unionAll(lvl(monthly, "month", "m", "yyyy-MM"))
        .unionAll(filled)
    )
