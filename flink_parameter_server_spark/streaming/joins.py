"""Stream-stream interval join (SURVEY.md §2 D17–D21 family).

No reference analog (the reference's only two-stream interaction is the
worker<->server loop); this is the Structured Streaming two-stream
surface: both sides watermarked, join condition = equi-key + event-time
interval, state bounded by the interval + watermark.

Scale: state per key is bounded by (interval + watermark delay) x rate;
the join shuffles both streams on user_id exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windows import stream_events

ATTRIBUTION_WINDOW = "1 hour"


def purchase_click_attribution_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (purchase, prior click within 1h) pair per user — the
    streaming attribution join. Batch dual: plain inner join with the
    same interval predicate."""
    ev = stream_events(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
    ).select("purchase_id", "click_id", "user_id", (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"))
