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
from ._util import money_sum, money_sum_sql, t

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@register(
    "events_tumbling_daily",
    oracle=f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n, {money_sum_sql('value')} AS total_value
FROM events GROUP BY 1, 2
""",
    tags=("D17",),
)
def events_tumbling_daily(spark, sf_dir):
    """Tumbling 1-day window aggregation (batch dual of the streaming
    form). Window start == date_trunc since windows align to the epoch."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), money_sum(F.col("value")).alias("total_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "event_type", "n", "total_value")
    )


@register(
    "events_sliding_2d",
    oracle="""
SELECT strftime(date_trunc('day', ts) - to_days(off), '%Y-%m-%d') AS window_start,
       event_type, count(*) AS n
FROM events CROSS JOIN (VALUES (0), (1)) AS offs(off)
GROUP BY 1, 2
""",
    tags=("D17",),
)
def events_sliding_2d(spark, sf_dir):
    """Sliding window (2-day width, 1-day slide): every event lands in two
    overlapping windows. Oracle replicates via the offset-unnest identity."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("window_start"), "event_type", "n")
    )


@register(
    "events_session_windows",
    oracle=f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
), m AS (
  SELECT user_id, us,
         CASE WHEN prev IS NULL OR us - prev >= {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
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
         count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS tv
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
)
SELECT 'hour' AS grain, strftime(h, '%Y-%m-%d %H:00') AS bucket, event_type,
       n, round(CAST(tv AS DOUBLE), 4) AS total_value FROM hourly
UNION ALL
SELECT 'day', strftime(d, '%Y-%m-%d'), event_type, n,
       round(CAST(tv AS DOUBLE), 4) FROM daily
UNION ALL
SELECT 'month', strftime(m, '%Y-%m'), event_type, n,
       round(CAST(tv AS DOUBLE), 4) FROM monthly
""",
    tags=("D17", "D11"),
    doc="Multi-resolution rollup (hypertable continuous-aggregate "
    "pattern): hourly aggregate computed once from raw events, daily "
    "derived by re-aggregating hourly, monthly from daily — each level "
    "reads the previous level's output, never rescans raw data. Sums "
    "stay DECIMAL through the cascade (exact, re-aggregation-safe) and "
    "round only at output. At 100 TB this is the materialized-rollup "
    "shape: the raw scan happens exactly once and each further level "
    "shuffles |previous level| rows (~1000x smaller).",
)
def events_multires_rollup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("tv"),
        )
        .persist()  # hourly feeds daily AND output; daily feeds monthly AND output
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", F.col("h")).alias("d"), "event_type")
        .agg(F.sum("n").cast("long").alias("n"), F.sum("tv").alias("tv"))
        .persist()
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

    return (
        lvl(hourly, "hour", "h", "yyyy-MM-dd HH:00")
        .unionAll(lvl(daily, "day", "d", "yyyy-MM-dd"))
        .unionAll(lvl(monthly, "month", "m", "yyyy-MM"))
    )
