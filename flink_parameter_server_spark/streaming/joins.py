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

from ..operators._util import finite_or_null
from .windows import stream_events

ATTRIBUTION_WINDOW = "1 hour"


def purchase_click_attribution_stream(
    spark: SparkSession, sf_dir: str, how: str = "inner"
) -> DataFrame:
    """Every (purchase, prior click within 1h) pair per user — the
    streaming attribution join. Batch dual: plain inner join with the
    same interval predicate.

    how='leftOuter' adds the outer facet: a purchase with NO qualifying
    click emits one null-click row once the watermark proves no match
    can still arrive — i.e. when the global (min-policy) watermark
    passes p_ts, since the latest possible matching click has
    c_ts == p_ts. Purchases newer than the final watermark stay in
    state and are unreported (same discipline as open sessions)."""
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
        how,
    ).select("purchase_id", "click_id", "user_id", (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"))


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with the static
    customer dimension, then aggregated per (segment, event_type).

    The static side needs no watermark and holds no state — Spark
    re-resolves it each micro-batch and (being dimension-sized)
    broadcasts it into the stream; at 100 TB the dimension shuffles
    instead and the same program runs as a co-partitioned join. The
    aggregate runs in complete mode downstream (no event-time key), so
    its state is bounded by |segments| x |event types|.
    """
    from ..operators._util import t

    ev = stream_events(spark, sf_dir)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        ev.join(cust, "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(finite_or_null(F.col("value")).cast("decimal(18,6)")).cast("double"), 6
            ).alias("total_value"),
        )
    )
