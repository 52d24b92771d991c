"""Streaming sink + custom-stateful depth (SURVEY.md §2 D2/D21):

- foreachBatch idempotent upsert: the production exactly-once file-sink
  pattern — each micro-batch writes its updated aggregate rows to a
  directory KEYED BY batch id (a replayed batch overwrites the same
  directory, so retries are idempotent); readers resolve the latest
  update per key by max batch id. This is how Spark streams upsert into
  warehouse tables without a transactional format.

- event-time-timeout sessionization: applyInPandasWithState with
  GroupStateTimeout.EventTimeTimeout — sessions close EITHER when a
  later event for the same user arrives past the gap (in-data close) OR
  when the watermark passes last_event + gap (timeout close, firing in
  the trailing no-data micro-batch). This is the state-timeout facet of
  D21 that the NoTimeout online-PS kernel doesn't exercise.
"""

from __future__ import annotations

import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators._util import money_sum
from .windows import stream_events, stream_shuffle_partitions

SESSION_GAP_US = 30 * 60 * 1_000_000  # mirror operators/windows.py gap
SESSION_GAP_MS = SESSION_GAP_US // 1000
WM_DELAY_MS = 3_600_000  # 1 hour watermark

SESS_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)
SESS_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("n_events", LongType()),
        StructField("dur_us", LongType()),
        StructField("close_reason", StringType()),
    ]
)


def _session_timeout_fn(key, pdf_iter, state: GroupState):
    user_id = key[0]

    def row(start, last, n, reason):
        return {
            "user_id": user_id,
            "session_start_us": start,
            "n_events": n,
            "dur_us": last - start,
            "close_reason": reason,
        }

    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([row(start, last, n, "timeout")])
        return

    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if not chunks:
        return
    us = (
        pd.concat(chunks, ignore_index=True)["us"]
        .sort_values()
        .to_numpy()
    )
    if state.exists:
        start, last, n = state.get
    else:
        start = last = 0
        n = 0  # first event initializes the session in the loop
    closed = []
    for u in us:
        u = int(u)
        if n == 0:
            start = last = u
            n = 1
        elif u - last > SESSION_GAP_US:
            closed.append(row(start, last, n, "data"))
            start = last = u
            n = 1
        elif start - u > SESSION_GAP_US:
            # A cross-batch straggler more than a gap BEFORE the open
            # session's start belongs to an earlier island whose peers
            # (if any) already closed — retroactive merging is
            # impossible, so emit it as its own immediately-closed
            # singleton tagged 'late' and leave the open session
            # untouched. Only reachable multi-batch with out-of-order
            # files (watermark delay 1h > gap 30m); in-order and
            # single-batch data never hits this branch, so the batch
            # island oracle is unaffected where it applies.
            closed.append(row(u, u, 1, "late"))
        else:
            # Out-of-order continuation (an event from a later micro-batch
            # that is EARLIER in event time, still within the watermark,
            # within the gap of the session bounds): extend the bounds,
            # never shrink them.
            last = max(last, u)
            start = min(start, u)
            n += 1
    state.update((start, last, n))
    # A key whose events arrive in a later micro-batch can have
    # last + gap already behind the current watermark; an un-clamped
    # timeout timestamp would make the state store throw. Clamp to
    # watermark + 1 so the session times out on the next watermark
    # advance instead of crashing the query.
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last // 1000 + SESSION_GAP_MS, wm + 1))
    if closed:
        yield pd.DataFrame(closed)


def session_timeout_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D21 with EventTimeTimeout: custom sessionization on keyed state."""
    ev = stream_events(spark, sf_dir).select(
        "user_id", F.unix_micros(F.col("ts")).alias("us"), F.col("ts")
    )
    return (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_timeout_fn,
            outputStructType=SESS_OUT,
            stateStructType=SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 exactly-once sink: update-mode agg -> per-batch idempotent
    directory writes -> latest-update-per-key resolution on read."""
    out = tempfile.mkdtemp(prefix="fps_upsert_")
    ev = stream_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("value")).alias("total_value"),
    )

    def sink(batch_df, batch_id):
        # idempotence: a replayed batch id rewrites the SAME directory
        batch_df.write.mode("overwrite").parquet(f"{out}/bid={batch_id}")

    with stream_shuffle_partitions(spark):
        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", f"{out}/_chk")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    upd = spark.read.parquet(out)  # bid discovered as a partition column
    w = Window.partitionBy("event_type").orderBy(F.desc("bid"))
    return (
        upd.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("event_type", "n", "total_value")
    )
