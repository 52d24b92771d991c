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
